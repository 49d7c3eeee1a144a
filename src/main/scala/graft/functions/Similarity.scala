package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Baseline: brute-force cosine top-k — a broadcast join of the (small)
  * query set against the corpus, dot products as codegen'd
  * zip_with/aggregate expressions, top-k per query via window. Scale path:
  * random-hyperplane LSH bucketing — each vector lands in one bucket,
  * candidates are bucket-local, recall traded via `planes`/multi-probe.
  */
object Similarity {

  /** Dot product of two float-array columns (higher-order-function form;
    * kept as the composable/spec variant — see `cosine` for the hot path).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, x) => acc + x))

  /** Cosine similarity via the native Catalyst expression
    * (graft.plans.CosineSimilarity): one fused loop with codegen instead
    * of three interpreted lambda chains. Zero vectors → 0.0.
    */
  def cosine(a: Column, b: Column): Column = graft.plans.CosineSimilarity(a, b)

  /** Reference implementation from composable built-ins (used to
    * cross-check the native expression in tests).
    */
  def cosineHof(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0, lit(0.0)).otherwise(d / nn)
  }

  /** Bounded top-k per group via the custom Catalyst aggregate
    * (graft.plans.TopKAggregate): map-side partial heaps cut each
    * partition to ≤k rows per group before the exchange. The window
    * row_number() this replaced shuffled and sorted EVERY scored row —
    * |corpus|×|queries| rows through one sort, the round-1 scale-killer.
    */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.plans.TopKAggregate(
        org.apache.spark.sql.graftbridge.Bridge.expression(score),
        org.apache.spark.sql.graftbridge.Bridge.expression(id),
        k).toAggregateExpression())

  private def explodeTopK(grouped: DataFrame, idCol: String): DataFrame =
    grouped.select(col("query_id"), posexplode(col("__top")))
      .select(col("query_id"), col("col.id").as(idCol),
        round(col("col.score"), 6).as("cosine"),
        (col("pos") + 1).cast("long").as("rank")) // long like SQL row_number()

  /** Brute-force cosine top-k: for each query row, the k nearest corpus
    * rows. Queries are broadcast (must be small); the corpus is scanned
    * once — at 100 TB this is the exact-answer baseline you run on a
    * filtered candidate set, not the whole corpus.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, queryIdCol: String,
                     k: Int = 10): DataFrame = {
    val q = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("__qvec"))
    val scored = corpus.select(col(idCol), col(vecCol))
      .join(broadcast(q), col(idCol) =!= col("query_id")) // all pairs vs broadcast queries
      .withColumn("cosine", cosine(col(vecCol), col("__qvec")))
    val grouped = scored.groupBy(col("query_id"))
      .agg(topKByScore(col("cosine"), col(idCol).cast("long"), k).as("__top"))
    explodeTopK(grouped, idCol)
  }

  /** Random-hyperplane LSH bucket id: sign bit per pseudo-random plane.
    * Planes are derived from xxhash64 of (dimension, plane) — fully
    * deterministic, no stored model; a plane's weight for dimension d is
    * a hash-derived value in [-1, 1). `table` offsets the plane ids so
    * each hash table draws an independent set of planes. Computed by the
    * native fused expression (graft.plans.HyperplaneBucket) — one loop,
    * cached weight vectors, stays in codegen.
    */
  def hyperplaneBucket(vec: Column, planes: Int, table: Int = 0): Column =
    graft.plans.HyperplaneBucket(vec, planes, table)

  /** Composable reference formulation (interpreted higher-order
    * functions) — kept to cross-check the native expression in tests;
    * bit-identical buckets by construction.
    */
  def hyperplaneBucketHof(vec: Column, planes: Int, table: Int = 0): Column = {
    val bits = (0 until planes).map { p =>
      val planeId = table * planes + p
      // projection = Σ_d vec[d] * w(plane, d); w derived from xxhash64(d, plane)
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, d) => x * (pmod(xxhash64(d, lit(planeId)), lit(2000001)).cast("double") / lit(1000000.0) - lit(1.0))),
        lit(0.0d), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed approximate top-k: queries join only their probe
    * buckets. Recall is tuned three ways (standard LSH knobs):
    *   - `planes` down → bigger buckets (more candidates per probe);
    *   - `probeBits` up → multi-probe: also search every bucket within
    *     Hamming distance ≤ probeBits of the query's bucket
    *     (near-boundary neighbors land exactly there) — query-side
    *     fan-out only, corpus state unchanged;
    *   - `tables` up → OR-construction over independent hyperplane sets:
    *     a neighbor is found if ANY table buckets it with the query.
    *     Corpus-side state grows ×tables (the classic LSH space/recall
    *     trade); candidate pairs found by several tables are deduped
    *     before scoring so the top-k heap never sees a duplicate id.
    * The IVF-style scale path where brute force is unaffordable: per
    * query the work is |probes| bucket lookups against a bucket-hashed
    * corpus, not a corpus scan.
    */
  // ---------- IVF (inverted-file) ANN ----------

  /** Normalize to unit length (zero vectors pass through). */
  private def unit(v: Array[Float]): Array[Float] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v else v.map(x => (x / n).toFloat)
  }

  private def dotF(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i); i += 1 }
    s
  }

  /** Indexes of the `nProbe` centroids with the largest dot product
    * against the (normalized) vector — the cells a query scans.
    */
  def nearestCells(centroids: Array[Array[Float]], v: Array[Float], nProbe: Int): Array[Int] = {
    val u = unit(v)
    val scored = centroids.indices.map(i => (dotF(centroids(i), u), i))
    scored.sortBy { case (d, i) => (-d, i) }.take(math.min(nProbe, centroids.length))
      .map(_._2).toArray
  }

  /** Allocation-free argmax for the corpus-side assignment — the widest
    * loop in ivfTopK runs this once per vector, where the sort-based
    * nearestCells(.., 1) would box and sort all nlist centroids per row.
    * Ties break to the lowest index, matching nearestCells' ordering.
    */
  def nearestCell(centroids: Array[Array[Float]], v: Array[Float]): Int = {
    val u = unit(v)
    var best = 0
    var bestD = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val d = dotF(centroids(c), u)
      if (d > bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Spherical k-means coarse quantizer trained on a bounded seeded
    * per-partition reservoir sample — driver-side Lloyd iterations over
    * ≤ sampleRows vectors (nlist × sample × dim flops per iteration, ms
    * at these sizes), deterministic, no stored model: like the
    * hash-derived LSH planes, the index is reproducible from (seed,
    * corpus) alone. Empty cells re-seed from the sample.
    */
  def trainIvfCentroids(corpus: DataFrame, vecCol: String, nlist: Int,
                        sampleRows: Int = 10000, iterations: Int = 5,
                        seed: Long = 42): Array[Array[Float]] = {
    val vecs = corpus.select(col(vecCol)).rdd.flatMap { r =>
      if (r.isNullAt(0)) None else Some(r.getAs[scala.collection.Seq[Float]](0).toArray)
    }
    val sample = graft.spark.Sampling.reservoirSample(vecs, sampleRows, seed)
    require(sample.nonEmpty, "cannot train IVF centroids on an empty corpus")
    val normed = sample.map(unit)
    val k = math.min(nlist, normed.length)
    val rng = new java.util.Random(seed)
    val centroids = Array.tabulate(k)(_ => normed(rng.nextInt(normed.length)).clone())
    val dim = normed(0).length
    var iter = 0
    while (iter < iterations) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      normed.foreach { v =>
        var best = 0
        var bestD = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          val d = dotF(centroids(c), v)
          if (d > bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        // ragged dims (a truncated embedding is a realistic data-quality
        // defect): sum only the overlap, like dotF — never index past a
        // short vector
        var i = 0
        val lim = math.min(dim, v.length)
        while (i < lim) { sums(best)(i) += v(i); i += 1 }
      }
      var c = 0
      while (c < k) {
        if (counts(c) == 0) centroids(c) = normed(rng.nextInt(normed.length)).clone()
        else centroids(c) = unit(Array.tabulate(dim)(i => (sums(c)(i) / counts(c)).toFloat))
        c += 1
      }
      iter += 1
    }
    centroids
  }

  /** IVF approximate top-k: the coarse quantizer partitions the corpus
    * into nlist cells (each vector in exactly ONE cell); a query scans
    * only its nProbe nearest cells. The classic scale path where brute
    * force is unaffordable and the data clusters geometrically (LSH's
    * data-independent planes can't adapt to cluster structure; IVF's
    * centroids do — complementary recall/cost trades). Scale shape: one
    * small centroid broadcast, assignment a narrow map, candidates =
    * ~nProbe/nlist of the corpus per query, bounded-heap top-k; no
    * dedup needed (cells are disjoint, probes distinct).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, queryIdCol: String,
              k: Int = 10, nlist: Int = 64, nProbe: Int = 4,
              sampleRows: Int = 10000, iterations: Int = 5,
              seed: Long = 42): DataFrame = {
    require(nlist >= 1 && nProbe >= 1 && nProbe <= nlist,
      s"need 1 <= nProbe <= nlist, got nProbe=$nProbe nlist=$nlist")
    val spark = corpus.sparkSession
    val centroids = trainIvfCentroids(corpus, vecCol, nlist, sampleRows, iterations, seed)
    val bc = spark.sparkContext.broadcast(centroids)
    // query side: tiny broadcast set, a UDF is fine. Corpus side: the
    // widest map in the query — the native IvfCell expression keeps it in
    // WholeStageCodegen (null vector → null cell, which no probe matches)
    val probesUdf = udf { (v: scala.collection.Seq[Float]) =>
      if (v == null) Array.empty[Int] else nearestCells(bc.value, v.toArray, nProbe)
    }
    val c = corpus.select(col(idCol), col(vecCol))
      .withColumn("__cell", graft.plans.IvfCell(col(vecCol), bc))
    val q = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("__qvec"))
      .withColumn("__cell", explode(probesUdf(col("__qvec"))))
    val scored = c.join(broadcast(q), Seq("__cell"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cosine", cosine(col(vecCol), col("__qvec")))
    val grouped = scored.groupBy(col("query_id"))
      .agg(topKByScore(col("cosine"), col(idCol).cast("long"), k).as("__top"))
    explodeTopK(grouped, idCol)
  }

  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, queryIdCol: String,
              k: Int = 10, planes: Int = 8, probeBits: Int = 1,
              tables: Int = 1): DataFrame = {
    require(probeBits >= 0 && probeBits <= 2, s"probeBits in 0..2, got $probeBits")
    require(tables >= 1 && tables <= 16, s"tables in 1..16, got $tables")
    require(planes >= 1 && planes <= 30, s"planes in 1..30, got $planes")
    // combined bucket id: (table index << 32) | table-local sign bits
    def tb(t: Int): Column = lit(t.toLong << 32)
    val corpusBuckets = (0 until tables).map(t =>
      tb(t).bitwiseOR(hyperplaneBucket(col(vecCol), planes, t)))
    val c = corpus.select(col(idCol), col(vecCol))
      .withColumn("__bucket", explode(array(corpusBuckets: _*)))
    // within one table, probe buckets are pairwise distinct and each
    // corpus row lives in exactly one bucket — duplicates only arise
    // across tables
    val probes: Seq[Column] = (0 until tables).flatMap { t =>
      val base = hyperplaneBucket(col("__qvec"), planes, t)
      Seq(tb(t).bitwiseOR(base)) ++
        (if (probeBits >= 1)
          (0 until planes).map(p => tb(t).bitwiseOR(base.bitwiseXOR(lit(1L << p)))) else Nil) ++
        (if (probeBits >= 2)
          (for { a <- 0 until planes; b <- (a + 1) until planes }
            yield tb(t).bitwiseOR(base.bitwiseXOR(lit((1L << a) | (1L << b))))) else Nil)
    }
    val q = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("__qvec"))
      .withColumn("__bucket", explode(array(probes: _*)))
    val cand = c.join(broadcast(q), Seq("__bucket"))
      .filter(col(idCol) =!= col("query_id"))
    val deduped = if (tables > 1) cand.dropDuplicates("query_id", idCol) else cand
    val scored = deduped.withColumn("cosine", cosine(col(vecCol), col("__qvec")))
    val grouped = scored.groupBy(col("query_id"))
      .agg(topKByScore(col("cosine"), col(idCol).cast("long"), k).as("__top"))
    explodeTopK(grouped, idCol)
  }
}
