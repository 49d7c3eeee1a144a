package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline.
  * Everything here is built from codegen'd `functions._` expressions where
  * possible; the two model-driven ops (language ID, fingerprint) use one
  * compact Scala UDF each over data broadcast from a driver-side sample.
  */
object TextOps {

  /** Whitespace token count, pure expression (stays in codegen). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: word-boundary pieces plus intra-word splits
    * every ~4 chars, the usual pre-tokenizer upper bound heuristic.
    */
  def subwordCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")) +
        (length(regexp_replace(text, "\\s+", "")) / lit(4)).cast("int"))

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double") / length(text))

  /** Uppercase ratio over letters. */
  def upperRatio(text: Column): Column = {
    val letters = length(regexp_replace(text, "[^\\p{L}]", ""))
    when(letters === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[^\\p{Lu}]", "")).cast("double") / letters)
  }

  /** Mean word length. */
  def meanWordLength(text: Column): Column = {
    val tokens = tokenCount(text)
    when(tokens === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "\\s+", "")).cast("double") / tokens)
  }

  /** Stopword ratio against a provided list (column-level, codegen'd:
    * the list becomes an array literal; no UDF).
    */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val tokens = split(lower(trim(text)), "\\s+")
    val hits = size(array_intersect(tokens, array(stopwords.map(lit): _*)))
    // ratio of *distinct* stopwords seen is robust for word-salad text;
    // combine with token-level containment for a usable quality feature
    val contained = size(filter(tokens, t => array_contains(array(stopwords.map(lit): _*), t)))
    when(size(tokens) === 0, lit(0.0)).otherwise(contained.cast("double") / size(tokens))
  }

  /** Composite quality score in [0,1]: length, word-shape and punctuation
    * heuristics — the usual web-text quality filter features.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val wordLen = meanWordLength(text)
    val wordShape = when(wordLen.between(3.0, 12.0), lit(1.0)).otherwise(lit(0.3))
    val punct = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val upper = lit(1.0) - least(upperRatio(text) * 2.0, lit(1.0))
    round((lenScore * 0.4 + wordShape * 0.3 + punct * 0.2 + upper * 0.1), 4)
  }

  /** Language ID by character n-gram profile match.
    *
    * Profiles are learned from a labeled sample (driver-side, bounded) and
    * broadcast inside the returned UDF closure; scoring is a single pass
    * over the document's trigrams. Self-contained — no external models.
    */
  def langIdUdf(profiles: Map[String, Map[String, Double]],
                gram: String = "char3"): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      if (text == null || text.length < 3) null
      else {
        val counts = ngramCounts(text, cap = 2000, gram)
        var bestLang: String = null
        var bestScore = Double.MinValue
        profiles.foreach { case (lang, profile) =>
          var score = 0.0
          counts.foreach { case (g, c) => score += profile.getOrElse(g, 0.0) * c }
          if (score > bestScore) { bestScore = score; bestLang = lang }
        }
        bestLang
      }
    }

  /** Train per-language trigram profiles from (text, lang) rows, with
    * DISCRIMINATIVE weights: weight(g) = log(p_lang(g) / p_global(g)).
    * Trigrams every language shares get ~0 weight; only characteristic
    * ones vote. Bounded: `sampleRows` rows, top `topK` per language by
    * |weight|·frequency.
    */
  def trainLangProfiles(df: DataFrame, textCol: String, langCol: String,
                        sampleRows: Int = 5000, topK: Int = 400,
                        gram: String = "char3"): Map[String, Map[String, Double]] = {
    // Reservoir over the WHOLE input, not limit(n): web crawls arrive
    // clustered by language, and a head sample would train profiles for
    // only the first cluster's language (same flaw class as the round-3
    // pinStringCodecs fix).
    val sample = graft.spark.Sampling.reservoirSample(
      df.select(col(textCol), col(langCol))
        .filter(col(textCol).isNotNull && col(langCol).isNotNull)
        .rdd, sampleRows, seed = 0x1a2bL)
    val global = new scala.collection.mutable.HashMap[String, Long]()
    val perLang = sample.groupBy(_.getString(1)).map { case (lang, rows) =>
      val counts = new scala.collection.mutable.HashMap[String, Long]()
      rows.foreach { r =>
        ngramCounts(r.getString(0), cap = 5000, gram).foreach { case (g, c) =>
          counts.update(g, counts.getOrElse(g, 0L) + c)
          global.update(g, global.getOrElse(g, 0L) + c)
        }
      }
      lang -> counts
    }
    val globalTotal = math.max(1L, global.values.sum)
    perLang.map { case (lang, counts) =>
      val total = math.max(1L, counts.values.sum)
      val weighted = counts.toSeq.map { case (g, c) =>
        val pLang = c.toDouble / total
        val pGlobal = global(g).toDouble / globalTotal
        (g, math.log(pLang / pGlobal), c)
      }
      val top = weighted.sortBy { case (_, w, c) => -math.abs(w) * c }.take(topK)
      lang -> top.map { case (g, w, _) => g -> w }.toMap
    }
  }

  /** `gram` = "char3" (sliding character trigrams — the usual language-ID
    * unit for natural text) or "word" (whitespace tokens — the right unit
    * when languages differ by vocabulary rather than orthography).
    */
  private def ngramCounts(text: String, cap: Int, gram: String): Map[String, Int] = {
    val t = text.toLowerCase
    val m = new scala.collection.mutable.HashMap[String, Int]()
    if (gram == "word") {
      var taken = 0
      var start = 0
      val len = t.length
      var i = 0
      while (i <= len && taken < cap) {
        if (i == len || Character.isWhitespace(t.charAt(i))) {
          if (i > start) {
            m.update(t.substring(start, i), m.getOrElse(t.substring(start, i), 0) + 1)
            taken += 1
          }
          start = i + 1
        }
        i += 1
      }
    } else {
      var i = 0
      val n = math.min(t.length - 2, cap)
      while (i < n) {
        val g = t.substring(i, i + 3)
        m.update(g, m.getOrElse(g, 0) + 1)
        i += 1
      }
    }
    m.toMap
  }

  /** 64-bit whitespace-normalized document fingerprint as a pure
    * built-in expression: stays inside WholeStageCodegen (no UDF
    * boundary) and is reproducible by any engine with xxhash64 +
    * regexp_replace — the right default for manifest-recorded
    * fingerprints. Equal fingerprints ⇒ near-certain exact duplicates.
    */
  def fingerprintCol(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    xxhash64(regexp_replace(trim(text), "\\s+", " "))

  /** FNV-64 variant of the fingerprint as a UDF — kept for callers that
    * need the exact FNV contract (streaming dedup state hashes with the
    * Scala [[fingerprint]]); prefer [[fingerprintCol]] in queries.
    */
  val fingerprintUdf: org.apache.spark.sql.expressions.UserDefinedFunction = udf { (text: String) =>
    if (text == null) null else java.lang.Long.valueOf(fingerprint(text))
  }

  def fingerprint(text: String): Long = {
    var h = 1469598103934665603L // FNV offset basis
    var i = 0
    var lastWasSpace = true
    while (i < text.length) {
      val c = text.charAt(i)
      val isSpace = Character.isWhitespace(c)
      if (!isSpace) {
        h ^= c.toLong
        h *= 1099511628211L
        lastWasSpace = false
      } else if (!lastWasSpace) {
        h ^= ' '.toLong
        h *= 1099511628211L
        lastWasSpace = true
      }
      i += 1
    }
    h
  }
}
