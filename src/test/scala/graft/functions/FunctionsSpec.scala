package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Training-data pipeline operator tests: dedup recall on planted
  * duplicates, similarity correctness (native expression vs composable
  * reference), text features, multimodal plumbing.
  */
class FunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private def embeddings = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("native cosine expression matches the composable HOF version") {
    val e = embeddings.limit(50)
    val pairs = e.alias("a").crossJoin(e.alias("b")).limit(500)
      .select(
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("fast"),
        Similarity.cosineHof(col("a.embedding"), col("b.embedding")).as("ref"))
    // HOF zip_with multiplies in FLOAT before the double sum; the native
    // expression promotes to double first — agree to float precision
    val bad = pairs.filter(abs(col("fast") - col("ref")) > 1e-5).count()
    assert(bad == 0, s"$bad pairs diverge between native and HOF cosine")
  }

  test("brute-force topK: self is most similar when included, ordering sane") {
    val q = embeddings.filter(col("vec_id") < 3)
    val res = Similarity.bruteForceTopK(embeddings, q, "vec_id", "embedding", "vec_id", k = 5)
      .collect()
    assert(res.length == 15)
    res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val cosines = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(cosines.sameElements(cosines.sorted.reverse), "ranks not in descending cosine order")
    }
  }

  test("native hyperplane bucket matches the composable HOF formulation bit-for-bit") {
    for (table <- Seq(0, 1)) {
      val bad = embeddings.limit(200).select(
        Similarity.hyperplaneBucket(col("embedding"), 8, table).as("fast"),
        Similarity.hyperplaneBucketHof(col("embedding"), 8, table).as("ref"))
        .filter(col("fast") =!= col("ref")).count()
      assert(bad == 0, s"$bad rows diverge between native and HOF buckets (table=$table)")
    }
  }

  test("LSH multi-probe + multi-table recovers recall that single-probe loses") {
    val q = embeddings.orderBy("vec_id").limit(8)
    val exact = Similarity.bruteForceTopK(embeddings, q, "vec_id", "embedding", "vec_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(probeBits: Int, tables: Int): Double = {
      val approx = Similarity.lshTopK(embeddings, q, "vec_id", "embedding", "vec_id",
          k = 5, planes = 4, probeBits = probeBits, tables = tables)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.count(approx.contains).toDouble / exact.size
    }
    val single = recallOf(0, 1)
    val multi = recallOf(1, 2)
    assert(multi >= single, s"multi-probe/table recall $multi below single-probe $single")
    assert(multi >= 0.5, s"Hamming-1 ×2-table recall too low: $multi (single-probe was $single)")
  }

  test("IVF top-k: recall vs brute force rises with nProbe, full probe is near-exact") {
    val q = embeddings.orderBy("vec_id").limit(8)
    val exact = Similarity.bruteForceTopK(embeddings, q, "vec_id", "embedding", "vec_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(nProbe: Int): Double = {
      val got = Similarity.ivfTopK(embeddings, q, "vec_id", "embedding", "vec_id",
        k = 5, nlist = 16, nProbe = nProbe)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val narrow = recallOf(1)
    val wide = recallOf(8)
    val full = recallOf(16) // probing every cell scans the whole corpus
    assert(wide >= narrow, s"recall fell with more probes: $narrow -> $wide")
    assert(wide >= 0.5, s"nProbe=8/16 recall $wide too low")
    // ≥ 0.98 not == 1.0: exact cosine TIES at the k boundary may
    // tie-break differently between the two plans' partial heaps
    assert(full >= 0.98, s"full-probe IVF must match brute force, got $full")
  }

  test("IVF cell assignment: native expression matches nearestCell, no UDF in the plan") {
    val centroids = Similarity.trainIvfCentroids(embeddings, "embedding", nlist = 16)
    val bc = spark.sparkContext.broadcast(centroids)
    val assigned = embeddings.limit(300).select(col("vec_id"),
      graft.plans.IvfCell(col("embedding"), bc).as("cell"), col("embedding"))
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"corpus-side cell assignment is not a native expression:\n$plan")
    assigned.collect().foreach { r =>
      val v = r.getAs[scala.collection.Seq[Float]](2).toArray
      assert(r.getInt(1) == Similarity.nearestCell(centroids, v),
        s"vec ${r.getLong(0)}: expression cell ${r.getInt(1)} != nearestCell")
    }
  }

  test("minhash near-dup finds planted near-duplicates") {
    val base = docs.select("doc_id", "text")
    val planted = base.filter(col("doc_id") < 10).select(
      (col("doc_id") + 1000000).as("doc_id"),
      expr("substring(text, instr(text, ' ') + 1)").as("text"))
    val pairs = Dedup.minhashNearDuplicates(base.union(planted), "doc_id", "text",
      k = 32, bands = 8, shingleSize = 3, threshold = 0.5).collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 10L).map(i => (i, i + 1000000)).toSet
    val recall = expected.count(found.contains).toDouble / expected.size
    assert(recall >= 0.8, s"planted-duplicate recall $recall, found ${found.size} pairs")
  }

  test("minhash near-dup survives a degenerate corpus (hot buckets capped, no quadratic join)") {
    // 10k identical docs: every band maps them to the same bucket —
    // uncapped this is a 10^8-pair self-join. With the cap the job
    // completes fast; the identical family is exact-dedup's job.
    val spark0 = spark
    import spark0.implicits._
    val degenerate = (0L until 10000L).map(i => (i, "the same boilerplate page content here"))
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val n = Dedup.minhashNearDuplicates(degenerate, "doc_id", "text",
      k = 32, bands = 8, threshold = 0.5, maxBucketSize = 100).count()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 60, s"degenerate corpus took $sec s — bucket cap not effective")
    assert(n == 0, s"capped hot buckets must yield no candidate pairs, got $n")
  }

  test("native ngram jaccard matches the composable HOF version exactly") {
    val spark0 = spark
    import spark0.implicits._
    val d = docs.select(col("doc_id"), col("text"))
    val b = d.select(col("doc_id").as("doc_id_b"), col("text").as("text_b"))
    val pairs = d.join(b, col("doc_id_b") === col("doc_id") + 1)
    for (k <- Seq(1, 3, 5)) {
      val bad = pairs.select(
        Dedup.ngramJaccard(col("text"), col("text_b"), k).as("fast"),
        Dedup.ngramJaccardHof(col("text"), col("text_b"), k).as("ref"))
        .filter(col("fast") =!= col("ref")).count()
      assert(bad == 0, s"$bad pairs diverge between native and HOF jaccard at k=$k")
    }
    // edge cases: empty, whitespace-only, shorter than k, unicode case
    val edge = Seq(("", ""), ("   ", "a b c"), ("a b", "a b c d"),
      ("ÄŐÜ foo BAR baz quux", "äőü foo bar baz quux"), ("one", "one"))
      .toDF("ta", "tb")
    val badEdge = edge.select(
      Dedup.ngramJaccard(col("ta"), col("tb"), 3).as("fast"),
      Dedup.ngramJaccardHof(col("ta"), col("tb"), 3).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(badEdge == 0, "edge-case divergence between native and HOF jaccard")
  }

  test("near-dup clusters: transitive pairs collapse to min-id components; dedup keeps canonicals") {
    val spark0 = spark
    import spark0.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("id_a", "id_b")
    val clusters = Dedup.nearDupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
    val df = (1L to 25L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicates(df, "doc_id", pairs).collect().map(_.getLong(0)).toSet
    assert(kept == (1L to 25L).toSet -- Set(2L, 3L, 4L, 11L, 21L, 22L))
    // a chain of diameter 19 still converges to one component
    val chain = (1L until 20L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.nearDupClusters(chain).collect()
    assert(cc.map(_.getLong(1)).toSet == Set(1L) && cc.length == 20)
  }

  test("exact dedup keeps exactly one row per duplicated key") {
    val dup = docs.select("doc_id", "text")
      .union(docs.select((col("doc_id") + 5000).as("doc_id"), col("text")).limit(50))
    val deduped = Dedup.exact(dup, "text", "doc_id")
    assert(deduped.count() == docs.count())
    assert(deduped.filter(col("doc_id") >= 5000).count() == 0, "kept the wrong copy")
  }

  test("fingerprint dedup keeps the same rows as full-text exact dedup") {
    val byText = Dedup.exact(docs, "text", "doc_id").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val byFp = Dedup.exactByFingerprint(docs, "doc_id", "text").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(byFp == byText, s"fingerprint dedup diverged: ${byFp.size} vs ${byText.size} kept")
  }

  test("simhash near-dup: planted single-word edits surface; identical docs at hamming 0") {
    val spark0 = spark
    import spark0.implicits._
    val rng = new scala.util.Random(17)
    val words = Array("alpha", "beta", "gamma", "delta", "web", "page", "crawl",
      "content", "token", "corpus", "filter", "train", "model", "data", "text", "lang")
    val base = (0 until 50).map { i =>
      (i.toLong, Array.fill(200)(words(rng.nextInt(words.length))).mkString(" "))
    }
    // planted: one word replaced → a handful of vote flips at most
    val near = base.take(25).map { case (id, t) =>
      val toks = t.split(" ")
      toks(100) = "REPLACED"
      (id + 1000, toks.mkString(" "))
    }
    // and 5 byte-identical copies → hamming exactly 0
    val same = base.slice(30, 35).map { case (id, t) => (id + 2000, t) }
    val df = (base ++ near ++ same).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDuplicates(df, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val sameRecall = (30 until 35).count(i => pairs.get((i.toLong, i.toLong + 2000)).contains(0))
    assert(sameRecall == 5, s"identical copies must pair at hamming 0, got $sameRecall/5")
    val nearRecall = (0 until 25).count(i => pairs.contains((i.toLong, i.toLong + 1000))) / 25.0
    assert(nearRecall >= 0.8, s"single-word-edit recall $nearRecall < 0.8")
  }

  test("simhash: near-identical texts get near-identical signatures") {
    val base = docs.select("doc_id", "text").limit(20)
    val twisted = base.select((col("doc_id") + 1000).as("doc_id"),
      concat(col("text"), lit(" extraword")).as("text"))
    val sigs = Dedup.simhashSignatures(base.union(twisted), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 20L).foreach { i =>
      val hamming = java.lang.Long.bitCount(sigs(i) ^ sigs(i + 1000))
      assert(hamming <= 8, s"doc $i: hamming $hamming too far for a 1-word change")
    }
  }

  test("embedding near-dup recalls planted scaled copies") {
    val e = embeddings.select("vec_id", "embedding")
    val planted = e.filter(col("vec_id") < 5).select(
      (col("vec_id") + 1000000).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.01f)).as("embedding"))
    val pairs = Dedup.embeddingNearDuplicates(e.union(planted), "vec_id", "embedding",
      planes = 8, threshold = 0.98).collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 5L).foreach(i => assert(found.contains((i, i + 1000000)), s"missed planted pair $i"))
  }

  test("text features: deterministic and in range") {
    val feats = docs.select(
      TextOps.tokenCount(col("text")).as("tokens"),
      TextOps.punctRatio(col("text")).as("punct"),
      TextOps.qualityScore(col("text")).as("quality"),
      TextOps.fingerprintUdf(col("text")).as("fp")).collect()
    assert(feats.forall(_.getInt(0) > 0))
    assert(feats.forall(r => r.getDouble(1) >= 0 && r.getDouble(1) <= 1))
    assert(feats.forall(r => r.getDouble(2) >= 0 && r.getDouble(2) <= 1))
    assert(feats.map(_.getLong(3)).distinct.length > 400, "fingerprints should mostly be unique")
  }

  test("language id: high accuracy where text actually differs by language") {
    // the documents table's lang labels are uncorrelated with its shared
    // vocabulary, so use WebGen pages whose per-lang vocab slices differ
    val pages = graft.spark.WebGen.pages(spark, 3000, seed = 5, partitions = 2)
      .toDF().select(col("text"), col("lang"))
    val profiles = TextOps.trainLangProfiles(pages, "text", "lang", sampleRows = 2000, gram = "word")
    val scored = pages.select(col("lang"),
      TextOps.langIdUdf(profiles, gram = "word")(col("text")).as("pred"))
    val acc = scored.filter(col("lang") === col("pred")).count().toDouble / scored.count()
    assert(acc > 0.7, s"langid accuracy $acc")
  }

  test("language id: training on lang-CLUSTERED input covers every language") {
    // web crawls arrive clustered by language; limit(n) training saw only
    // the head cluster. Reservoir training must cover all languages and
    // match shuffled-input accuracy.
    val pages = graft.spark.WebGen.pages(spark, 3000, seed = 5, partitions = 2)
      .toDF().select(col("text"), col("lang"))
    val allLangs = pages.select("lang").distinct().collect().map(_.getString(0)).toSet
    val sorted = pages.orderBy("lang").repartitionByRange(4, col("lang"))
    val profSorted = TextOps.trainLangProfiles(sorted, "text", "lang",
      sampleRows = 500, gram = "word")
    assert(profSorted.keySet == allLangs,
      s"sorted-input training missed langs: ${allLangs -- profSorted.keySet}")
    val accSorted = {
      val scored = pages.select(col("lang"),
        TextOps.langIdUdf(profSorted, gram = "word")(col("text")).as("pred"))
      scored.filter(col("lang") === col("pred")).count().toDouble / scored.count()
    }
    assert(accSorted > 0.7, s"langid accuracy after sorted-input training: $accSorted")
  }

  test("multimodal: metadata extraction and feature batching plumbing") {
    val blobs = docs.limit(100).select(col("doc_id"), col("text").cast("binary").as("blob"))
    val meta = blobs.select(col("doc_id"), Multimodal.extractMetaUdf(col("blob")).as("m")).collect()
    assert(meta.length == 100)
    val feats = Multimodal.extractFeatures(blobs, "doc_id", "blob", dim = 32, batchSize = 16).collect()
    assert(feats.length == 100)
    assert(feats.forall(_.feature.length == 32))
    // deterministic: same blob → same feature
    val f2 = Multimodal.extractFeatures(blobs, "doc_id", "blob", dim = 32, batchSize = 7).collect()
    assert(feats.sortBy(_.id).zip(f2.sortBy(_.id)).forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("multimodal meta parses real PNG and JPEG headers (true dimensions, not fakes)") {
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    def png(w: Int, h: Int): Array[Byte] =
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
        be32(13) ++ "IHDR".getBytes("ASCII") ++ be32(w) ++ be32(h) ++
        Array[Byte](8, 6, 0, 0, 0) ++ be32(0)
    def jpeg(w: Int, h: Int): Array[Byte] =
      Array[Byte](0xff.toByte, 0xd8.toByte) ++ // SOI
        Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++ new Array[Byte](14) ++ // APP0
        Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(17) ++ Array[Byte](8) ++ // SOF0, precision
        be16(h) ++ be16(w) ++ new Array[Byte](10)

    val mPng = Multimodal.FakeDecoder.meta(png(640, 480))
    assert(mPng.format == "png" && mPng.width == 640 && mPng.height == 480 && mPng.frames == 1, s"$mPng")
    val mJpeg = Multimodal.FakeDecoder.meta(jpeg(1920, 1080))
    assert(mJpeg.format == "jpeg" && mJpeg.width == 1920 && mJpeg.height == 1080, s"$mJpeg")
    // large dims exercise the u16/u32 big-endian paths
    val mBig = Multimodal.FakeDecoder.meta(png(100000, 70000))
    assert(mBig.width == 100000 && mBig.height == 70000)
    // non-media bytes still take the deterministic stub path
    val mTxt = Multimodal.FakeDecoder.meta("just some text".getBytes("UTF-8"))
    assert(mTxt.format == "unknown" && mTxt.width >= 64)
    // and through the Spark column surface
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, png(320, 200)), (2L, jpeg(64, 32))).toDF("id", "blob")
    val out = df.select(col("id"), Multimodal.extractMetaUdf(col("blob")).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "png" && out(0).getInt(2) == 320 && out(0).getInt(3) == 200)
    assert(out(1).getString(1) == "jpeg" && out(1).getInt(2) == 64 && out(1).getInt(3) == 32)
  }

  test("multimodal meta parses real GIF and WAV headers") {
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    val gif = "GIF89a".getBytes("ASCII") ++ le16(800) ++ le16(600) ++ Array[Byte](0, 0, 0)
    val mGif = Multimodal.FakeDecoder.meta(gif)
    assert(mGif.format == "gif" && mGif.width == 800 && mGif.height == 600, s"$mGif")

    // 2-channel 44.1 kHz 16-bit WAV with 1000 samples per channel
    val dataBytes = 1000 * 2 * 2
    val wav = "RIFF".getBytes("ASCII") ++ le32(36 + dataBytes) ++ "WAVE".getBytes("ASCII") ++
      "fmt ".getBytes("ASCII") ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
      le32(44100 * 4) ++ le16(4) ++ le16(16) ++
      "data".getBytes("ASCII") ++ le32(dataBytes) ++ new Array[Byte](dataBytes)
    val mWav = Multimodal.FakeDecoder.meta(wav)
    assert(mWav.format == "wav" && mWav.width == 44100 && mWav.height == 2 && mWav.frames == 1000,
      s"$mWav")

    // truncated/corrupt WAV falls back to the deterministic stub, never throws
    val mBad = Multimodal.FakeDecoder.meta("RIFFxxxxWAVEbroken".getBytes("ASCII"))
    assert(mBad.format == "wav" && mBad.width >= 64)

    // a chunk whose u32 size would overflow a signed int must fall back
    // cleanly, not index with a truncated negative offset
    val evil = "RIFF".getBytes("ASCII") ++ le32(100) ++ "WAVE".getBytes("ASCII") ++
      "junk".getBytes("ASCII") ++ le32(0x90000000) ++ new Array[Byte](64)
    val mEvil = Multimodal.FakeDecoder.meta(evil)
    assert(mEvil.format == "wav" && mEvil.width >= 64) // stub path, no throw
  }

  test("multimodal meta parses real MP4 box trees (tkhd dims, stsz frame count)") {
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(payload.length + 8)
      bb.putInt(payload.length + 8).put(tpe.getBytes("ASCII")).put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", "isom".getBytes("ASCII") ++ new Array[Byte](4))
    // tkhd v0: 84-byte payload, width/height as 16.16 fixed at 76/80
    val tkhd = {
      val bb = java.nio.ByteBuffer.allocate(84)
      bb.putInt(76, 640 << 16)
      bb.putInt(80, 360 << 16)
      box("tkhd", bb.array())
    }
    // stsz: version/flags, sample_size=0, sample_count=901
    val stsz = {
      val bb = java.nio.ByteBuffer.allocate(12)
      bb.putInt(8, 901)
      box("stsz", bb.array())
    }
    val trak = box("trak", tkhd ++ box("mdia", box("minf", box("stbl", stsz))))
    val mp4 = ftyp ++ box("moov", trak)
    val m = Multimodal.FakeDecoder.meta(mp4)
    assert(m.format == "mp4" && m.width == 640 && m.height == 360 && m.frames == 901, s"$m")

    // audio-only mp4 (tkhd 0×0): frames still from stsz, dims stay 0
    val audioTkhd = box("tkhd", new Array[Byte](84))
    val audio = ftyp ++ box("moov", box("trak", audioTkhd ++ box("mdia", box("minf", box("stbl", stsz)))))
    val mA = Multimodal.FakeDecoder.meta(audio)
    assert(mA.format == "mp4" && mA.width == 0 && mA.frames == 901, s"$mA")

    // truncated/corrupt box tree: stub fallback, never a throw
    val mBad = Multimodal.FakeDecoder.meta(ftyp ++ "moovgarbage".getBytes("ASCII"))
    assert(mBad.format == "mp4" && mBad.width >= 64)
  }

  test("embedding near-dup: multi-table OR-construction recovers boundary pairs single-table misses") {
    val spark0 = spark
    import spark0.implicits._
    // 40 base unit vectors + near-copies at cosine ≈ 0.995 — close enough
    // to pass the 0.98 verification threshold, far enough that at
    // planes=12 a single bucketing provably splits some pairs across a
    // hyperplane (deterministic: seeded vectors, hash-derived planes)
    val rng = new scala.util.Random(1234)
    val dim = 16
    def normalize(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val rows = (0 until 40).flatMap { i =>
      val base = normalize(Array.fill(dim)(rng.nextGaussian().toFloat))
      val noise = Array.fill(dim)((rng.nextGaussian() * 0.025).toFloat)
      val near = normalize(base.zip(noise).map { case (a, b) => a + b })
      Seq((i.toLong, base), (i.toLong + 1000, near))
    }
    val df = rows.toDF("vec_id", "embedding")
    def recallOf(tables: Int): Double = {
      val pairs = Dedup.embeddingNearDuplicates(df, "vec_id", "embedding",
        planes = 12, threshold = 0.98, tables = tables)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (0 until 40).count(i => pairs.contains((i.toLong, i.toLong + 1000))) / 40.0
    }
    val single = recallOf(1)
    val multi = recallOf(8)
    assert(single < 1.0, s"single-table recall $single — boundary pairs not boundary enough")
    assert(multi == 1.0, s"multi-table recall $multi < 1 (single was $single)")
    assert(multi > single)
  }
}
