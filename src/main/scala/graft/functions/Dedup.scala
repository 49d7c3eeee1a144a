package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for web-scale training data.
  *
  * Scale notes: exact dedup is one hash-shuffle on the dedup key; MinHash
  * LSH shuffles (band, bandHash) buckets instead of all-pairs (candidate
  * generation is linear, verification only within buckets); SimHash is one
  * narrow pass producing a 64-bit signature. All signatures are built with
  * codegen'd expressions (xxhash64), no Python, no crossJoin.
  */
object Dedup {

  /** Exact dedup: keep the row with the smallest `idCol` per `keyCol`
    * value. One shuffle; for 100 TB use the fingerprint (64-bit) as the
    * key rather than the full text to keep shuffle rows small.
    */
  def exact(df: DataFrame, keyCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact dedup at the 100 TB shape: group on a 64-bit fingerprint of
    * the text instead of the text itself, so the aggregation shuffle
    * moves 8-byte keys + ids rather than whole documents; kept rows are
    * then recovered with a semi-join on the id. xxhash64 collisions
    * (~N²/2⁶⁵) trade a vanishing false-merge rate for that; use `exact`
    * when byte-certainty matters more than shuffle volume.
    */
  def exactByFingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = df.select(col(idCol), xxhash64(col(textCol)).as("__fp"))
      .groupBy(col("__fp")).agg(min(col(idCol)).as(idCol))
      .select(idCol)
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Word shingles of size k, lowercased, distinct. */
  def shingles(text: Column, k: Int = 3): Column = {
    val tokens = split(lower(trim(text)), "\\s+")
    val n = size(tokens)
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(n - k, lit(0))),
          i => when(i + k <= n, concat_ws(" ", slice(tokens, i + 1, lit(k))))),
        s => s.isNotNull))
  }

  /** MinHash signature: K min-hashes over the shingle set, computed by
    * the fused native expression (graft.plans.MinHashSignature) — a
    * narrow per-row map inside WholeStageCodegen. No explode, no shuffle:
    * the previous explode→groupBy formulation moved |corpus|×|shingles|
    * rows through an aggregation and was the round-1 bench's dominant
    * cost. Docs with fewer than shingleSize tokens have no shingle set
    * and are dropped (same as the aggregation path).
    *
    * Returns df with columns: idCol, minhash (array<long> length K).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 32, shingleSize: Int = 3): DataFrame =
    df.select(col(idCol),
        graft.plans.MinHashSignature(col(textCol), k, shingleSize).as("minhash"))
      .filter(col("minhash").isNotNull)

  /** Hot-bucket guard for LSH self-joins: a bucket with B members
    * produces B² candidate pairs, and real web data HAS degenerate
    * buckets (boilerplate-only pages, empty docs) — one of them turns
    * the join quadratic. Buckets above the cap are dropped from
    * candidate generation. Members of a dropped bucket can still pair
    * via their other (cooler) bands; a cluster hot in EVERY band is an
    * exact-duplicate family, which is `exact` dedup's job (run it
    * first), not near-dup LSH's.
    */
  final val DefaultMaxBucketSize = 1000

  private def dropHotBuckets(banded: DataFrame, bucketCols: Seq[String],
                             maxBucketSize: Int): DataFrame = {
    // Broadcast the HOT side: buckets over the cap are a handful of
    // degenerate clusters even at 10^12 docs, while the cool side is
    // corpus-scale (≈ one row per distinct bucket) — broadcasting the
    // cool side would OOM the driver at 100 TB.
    val hot = banded.groupBy(bucketCols.map(col): _*).count()
      .filter(col("count") > maxBucketSize)
      .select(bucketCols.map(col): _*)
    banded.join(broadcast(hot), bucketCols, "left_anti")
  }

  /** LSH banding: candidate pairs from rows sharing any (band, bandHash)
    * bucket, then verified with exact shingle Jaccard ≥ threshold.
    * bands×rowsPerBand must equal the signature length.
    *
    * Scale shape: shingles are computed ONCE over the corpus (for the
    * signatures); verification re-shingles only the candidate pairs —
    * texts are joined to the (small) candidate set first, so the second
    * shingle pass is O(candidates), not a second corpus pass. Hot
    * buckets are capped before the self-join (see DefaultMaxBucketSize).
    *
    * Returns pairs (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                            k: Int = 32, bands: Int = 8, shingleSize: Int = 3,
                            threshold: Double = 0.7,
                            maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rowsPerBand = k / bands
    val sigs = minhashSignatures(df, idCol, textCol, k, shingleSize)

    val banded = sigs.select(
      col(idCol),
      posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",",
            (0 until rowsPerBand).map(r =>
              element_at(col("minhash"), (b * rowsPerBand + r + 1).cast("int")).cast("string")): _*), b))
      ).as(Seq("band", "bucket")))
      // (id, band, bucket) is read three times below (hot-bucket count +
      // both sides of the self-join); persisting the tiny bucket table
      // stops the signature scan from running three times over the corpus
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cool = dropHotBuckets(banded, Seq("band", "bucket"), maxBucketSize)

    // localCheckpoint(eager) materializes the (small) candidate-pair set
    // so the banded cache can be released here instead of leaking for the
    // session's lifetime; the verification joins below read only the
    // checkpointed pairs plus the raw texts.
    val candidates = cool.alias("a")
      .join(cool.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
      .localCheckpoint(true)
    banded.unpersist()

    // verify with exact Jaccard, shingling only candidate rows: join the
    // raw text to the candidate ids FIRST, then shingle the joined pairs.
    // ngramJaccard is the NATIVE fused expression — Catalyst substitutes
    // it into both the join condition and the output projection, and the
    // interpreted-HOF formulation it replaced cost ~4 ms per evaluation
    // there (the round-4 q_minhash regression hunt).
    val texts = df.select(col(idCol), col(textCol))
    val verified = candidates
      .join(texts.select(col(idCol).as("id_a"), col(textCol).as("__ta")), "id_a")
      .join(texts.select(col(idCol).as("id_b"), col(textCol).as("__tb")), "id_b")
      .withColumn("jaccard", ngramJaccard(col("__ta"), col("__tb"), shingleSize))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
    verified
  }

  /** SimHash 64-bit signature via bit-vote aggregation — expression-only:
    * explode tokens, hash, explode 64 bit positions? That would be 64×
    * row blowup; instead vote with 64 conditional sums per id (codegen'd,
    * one aggregation pass).
    */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = df.select(col(idCol),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("__tok"))
      .withColumn("__h", xxhash64(col("__tok")))
    val votes = (0 until 64).map { b =>
      sum(when(col("__h").bitwiseAND(lit(1L << b)) =!= 0, 1).otherwise(-1)).as(s"__v$b")
    }
    val voted = exploded.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"__v$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    voted.select(col(idCol), sig.as("simhash"))
  }

  /** SimHash near-duplicate pairs via 4×16-bit band buckets. Pigeonhole:
    * two signatures at Hamming distance ≤ 3 differ in at most 3 of the 4
    * bands, so they MATCH on at least one band — candidate generation is
    * exact (recall 1.0 at the signature level) and bucket-join shaped,
    * no all-pairs. Verification is a codegen'd popcount of the XOR on
    * the candidate pairs; signatures (8 bytes) ride the join, so no
    * second corpus pass. Hot buckets capped like the MinHash path (a
    * degenerate all-identical corpus lands in one bucket).
    *
    * Returns (id_a, id_b, hamming) with id_a < id_b, hamming ≤ maxHamming.
    */
  def simhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                            maxHamming: Int = 3,
                            maxBucketSize: Int = DefaultMaxBucketSize): DataFrame =
    simhashNearDuplicatesFromSigs(simhashSignatures(df, idCol, textCol), idCol,
      maxHamming, maxBucketSize)

  /** Same detector over PRECOMPUTED (idCol, simhash) signatures — for
    * callers that also need the signatures themselves (validation,
    * manifests): the aggregation pass over the corpus runs once, not
    * per consumer.
    */
  def simhashNearDuplicatesFromSigs(sigs: DataFrame, idCol: String,
                                    maxHamming: Int = 3,
                                    maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-band LSH is exact only to Hamming 3, got $maxHamming")
    val banded = sigs.select(col(idCol), col("simhash"),
        posexplode(array((0 until 4).map(b =>
          shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xffffL))): _*))
          .as(Seq("band", "bits")))
      // read twice + hot-bucket count; the signature aggregation above is
      // worth computing once
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cool = dropHotBuckets(banded, Seq("band", "bits"), maxBucketSize)
    val pairs = cool.alias("a")
      .join(cool.alias("b"),
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .localCheckpoint(true)
    banded.unpersist()
    pairs
  }

  /** Collapse near-duplicate PAIRS (any detector's output: minhash /
    * simhash / embedding) into connected-component clusters labeled by
    * their MINIMUM member id — the operator a real pipeline runs after
    * pair detection, since near-duplication is transitive in practice
    * (a~b and b~c should keep ONE of {a,b,c}, not two).
    *
    * Min-label propagation over the undirected pair graph: each
    * iteration joins labels across edges and takes the per-node min; it
    * converges in O(cluster diameter) rounds. Near-dup clusters are
    * small and dense (families of variants of one page), so a handful
    * of rounds suffices; each round is one join + one aggregation, both
    * keyed shuffles on 8-byte ids — no vertex ever holds its whole
    * cluster in memory, so a 10^9-member boilerplate family is fine.
    * Lineage is cut per round (localCheckpoint) so the plan doesn't grow
    * with iterations. Throws if `maxIterations` rounds don't converge
    * (an unconverged labeling could split a cluster — never return one
    * silently); pathological diameters that large mean the pair set is
    * chain-shaped, which near-dup families aren't.
    *
    * Returns (id, cluster_id) for every id APPEARING IN PAIRS; rows with
    * no near-dup pair are their own implicit singleton cluster.
    */
  def nearDupClusters(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
                      maxIterations: Int = 25): DataFrame = {
    val edges = pairs.select(col(idA).cast("long").as("src"), col(idB).cast("long").as("dst"))
    val undirected = edges
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true) // reused every round; detector lineage cut once
    var labels = undirected.select(col("src").as("nid")).distinct()
      .withColumn("lbl", col("nid"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIterations) {
      val viaNeighbors = undirected
        .join(labels, undirected("dst") === labels("nid"))
        .select(undirected("src").as("nid"), col("lbl"))
      val updated = labels.select(col("nid"), col("lbl")).union(viaNeighbors)
        .groupBy("nid").agg(min("lbl").as("lbl"))
        .localCheckpoint(true)
      val changed = updated.alias("u")
        .join(labels.select(col("nid"), col("lbl").as("prev")), "nid")
        .filter(col("lbl") =!= col("prev")).count()
      labels = updated
      converged = changed == 0
      iter += 1
    }
    require(converged,
      s"near-dup clustering did not converge in $maxIterations rounds — pair graph has a " +
        "path longer than that; raise maxIterations")
    labels.select(col("nid").as("id"), col("lbl").as("cluster_id"))
  }

  /** Keep one canonical row (the minimum id) per near-dup cluster: drops
    * every non-canonical member of `pairs`' connected components from
    * `df`. Rows in no pair are kept untouched. The 100 TB shape: the
    * loser set is a fraction of the corpus (ids only), recovered against
    * the full table with an anti-join on the 8-byte id.
    */
  def dropNearDuplicates(df: DataFrame, idCol: String, pairs: DataFrame,
                         idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    val losers = nearDupClusters(pairs, idA, idB)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** n-gram Jaccard similarity between two text columns, as the native
    * fused Catalyst expression (graft.plans.NgramJaccard) — one codegen'd
    * call per pair instead of ~8 interpreted HOF walks.
    */
  def ngramJaccard(a: Column, b: Column, k: Int = 3): Column =
    graft.plans.NgramJaccard(a, b, k)

  /** Composable reference formulation (interpreted higher-order
    * functions) — kept to cross-check the native expression in tests;
    * identical values by construction.
    */
  def ngramJaccardHof(a: Column, b: Column, k: Int = 3): Column = {
    val sa = shingles(a, k)
    val sb = shingles(b, k)
    when(size(array_union(sa, sb)) === 0, lit(0.0))
      .otherwise(size(array_intersect(sa, sb)).cast("double") / size(array_union(sa, sb)))
  }

  /** Embedding cosine near-duplicate pairs via multi-table random-
    * hyperplane LSH + exact cosine verification. Like lshTopK
    * (OR-construction over `tables` independent plane sets, combined
    * bucket id = (table << 32) | sign bits): a pair is a candidate if ANY
    * table buckets the two vectors together, so recall at tight
    * thresholds no longer hangs on a single bucketing's boundary luck.
    * Candidate pairs are generated from an id+bucket table (vectors are
    * NOT carried through the ×tables explode or the self-join — they are
    * joined back onto the deduped pair set for verification), hot buckets
    * capped per table, pairs deduped across tables before scoring.
    */
  def embeddingNearDuplicates(df: DataFrame, idCol: String, vecCol: String,
                              planes: Int = 12, threshold: Double = 0.95,
                              maxBucketSize: Int = DefaultMaxBucketSize,
                              tables: Int = 4): DataFrame = {
    require(tables >= 1 && tables <= 16, s"tables in 1..16, got $tables")
    val tableBuckets = (0 until tables).map(t =>
      lit(t.toLong << 32).bitwiseOR(Similarity.hyperplaneBucket(col(vecCol), planes, t)))
    val bucketed = df.select(col(idCol),
        explode(array(tableBuckets: _*)).as("__bucket"))
      // read three times (bucket count + both join sides); the hyperplane
      // projections are worth computing once
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cool = dropHotBuckets(bucketed, Seq("__bucket"), maxBucketSize)
    val candidates = cool.alias("a")
      .join(cool.alias("b"),
        col("a.__bucket") === col("b.__bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
      .localCheckpoint(true)
    bucketed.unpersist()
    val vecs = df.select(col(idCol), col(vecCol))
    candidates
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("__va")), "id_a")
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("__vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("__va"), col("__vb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
