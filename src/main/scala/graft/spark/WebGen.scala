package graft.spark

import org.apache.spark.sql.{Dataset, SparkSession}

/** Common-Crawl-style web page row — the input_hint schema. */
final case class Page(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Deterministic, splittable synthetic web-page generator: any partition
  * regenerates its rows independently from (seed, rowId) — the reference's
  * seeded-Random fixture idea (test/ApacheOrcDotNet.Test/RoundTrip_Test.cs
  * seed 123) made order-independent for distributed use.
  *
  * lang is Zipfian over 40 codes and hosts are Zipfian over `hosts` — the
  * skew shape the salting in EncodeJob must absorb.
  */
object WebGen {

  final val Langs: Array[String] = Array(
    "en", "ru", "de", "ja", "es", "fr", "zh", "it", "pt", "nl",
    "pl", "tr", "vi", "ko", "id", "sv", "ar", "cs", "fa", "el",
    "hu", "da", "fi", "ro", "th", "uk", "no", "he", "hi", "sk",
    "bg", "lt", "hr", "sr", "sl", "et", "lv", "ms", "bn", "ca")

  private val vocab: Array[String] = {
    // deterministic pseudo-vocabulary; per-lang slices overlap partially.
    // Syllables drawn from a mixed hash per word — (i*31 + j*17) % 20 style
    // indexing collapses to only lcm(20,4)=20 distinct strings.
    val syllables = Array("ka", "to", "ne", "ri", "mo", "sa", "lu", "ve", "di", "pa",
      "ze", "qu", "an", "or", "il", "us", "em", "ta", "be", "no")
    (0 until 4000).map { i =>
      var h = mix(0x5eedf00dL ^ i.toLong)
      val n = 3 + (h & 3).toInt
      val sb = new StringBuilder(n * 2)
      var j = 0
      while (j < n) {
        h = mix(h)
        sb ++= syllables(((h >>> 17) % syllables.length).toInt)
        j += 1
      }
      sb.toString
    }.toArray
  }

  /** splitmix64 — public-domain mixing function; keyed on (seed, rowId). */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def rand(seed: Long, rowId: Long, stream: Int): Long =
    mix(mix(seed ^ (stream.toLong << 48)) ^ rowId)

  /** Zipf-ish rank draw over n items: rank ~ floor(n^u) biases to 0. */
  private def zipfRank(r: Long, n: Int): Int = {
    val u = ((r >>> 11).toDouble / (1L << 53).toDouble) // [0,1)
    math.min(n - 1, math.floor(math.pow(n.toDouble, u) - 1).toInt.max(0))
  }

  def page(seed: Long, rowId: Long, hosts: Int = 10000, avgTextWords: Int = 300): Page = {
    val lang = Langs(zipfRank(rand(seed, rowId, 0), Langs.length))
    val host = zipfRank(rand(seed, rowId, 1), hosts)
    val slug = java.lang.Long.toHexString(rand(seed, rowId, 2))
    val url = s"https://host$host.example.org/$lang/page/$slug"

    val baseTs = 1704067200L * 1000000L // 2024-01-01T00:00:00Z micros
    val offset = math.abs(rand(seed, rowId, 3)) % (180L * 86400 * 1000000) // 180 days
    val micros = baseTs + (offset / 1000L) * 1000L // millisecond precision
    val ts = new java.sql.Timestamp(micros / 1000L)
    ts.setNanos(((micros % 1000000L) * 1000L).toInt)

    val langOffset = Langs.indexOf(lang) * 97
    val words = {
      val r0 = rand(seed, rowId, 4)
      val n = avgTextWords / 2 + (math.abs(r0) % avgTextWords).toInt
      val sb = new StringBuilder(n * 7)
      var r = r0
      var i = 0
      while (i < n) {
        r = mix(r)
        if (i > 0) sb += ' '
        sb ++= vocab((langOffset + (math.abs(r) % 600L).toInt) % vocab.length)
        i += 1
      }
      sb.toString
    }
    val html = s"<html><head><title>$slug</title></head><body><p>$words</p></body></html>"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    Page(url, ts, html, words, lang)
  }

  /** Distributed generation: `spark.range` is already partitioned; each
    * task regenerates only its ids (no data movement, no driver memory).
    */
  def pages(spark: SparkSession, rows: Long, seed: Long = 42L,
            partitions: Int = 32): Dataset[Page] = {
    import spark.implicits._
    spark.range(0, rows, 1, partitions).map(id => page(seed, id))
  }
}
