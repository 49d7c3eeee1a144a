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
        round(col("col.score"), 6).as("cosine"), (col("pos") + 1).as("rank"))

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
    * a hash-derived value in [-1, 1).
    */
  def hyperplaneBucket(vec: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      // projection = Σ_d vec[d] * w(p, d); w derived from xxhash64(d, p)
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, d) => x * (pmod(xxhash64(d, lit(p)), lit(2000001)).cast("double") / lit(1000000.0) - lit(1.0))),
        lit(0.0d), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed approximate top-k: queries join only their bucket.
    * Recall is tuned by lowering `planes` (bigger buckets) — the
    * IVF-style scale path where brute force is unaffordable.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, queryIdCol: String,
              k: Int = 10, planes: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol))
      .withColumn("__bucket", hyperplaneBucket(col(vecCol), planes))
    val q = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("__qvec"))
      .withColumn("__bucket", hyperplaneBucket(col("__qvec"), planes))
    val scored = c.join(broadcast(q), Seq("__bucket"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cosine", cosine(col(vecCol), col("__qvec")))
    val grouped = scored.groupBy(col("query_id"))
      .agg(topKByScore(col("cosine"), col(idCol).cast("long"), k).as("__top"))
    explodeTopK(grouped, idCol)
  }
}
