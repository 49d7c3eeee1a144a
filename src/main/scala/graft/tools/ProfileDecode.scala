package graft.tools

import graft.columns.ColumnCodec
import graft.core.ZlibBlock

/** Single-threaded per-column DECODE profile on WebGen-shaped data — the
  * read-side mirror of ProfileEncode: isolates zlib inflate vs FSST
  * expansion vs RLEv2 vs slice bookkeeping so decode tuning targets are
  * measured, not guessed. Throughput is reported against the DECODED
  * (raw) bytes, matching how the bench reports decode GB/s.
  */
object ProfileDecode {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toInt).getOrElse(20000)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pages = graft.spark.WebGen.pages(spark, rows, 42, 4).collect()
    spark.stop()

    val texts = pages.map(_.text)
    val htmls = pages.map(_.html)
    val langs = pages.map(_.lang)
    val micros = pages.map(_.warc_ts.getTime * 1000L)
    val present = Array.fill(pages.length)(true)
    val textRaw = texts.map(_.length.toLong).sum
    val htmlRaw = htmls.map(_.length.toLong).sum

    def timeIt(name: String, rawBytes: Long)(f: => Long): Unit = {
      f // warm
      var best = Double.MaxValue
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$name%-28s raw=${rawBytes / 1e6}%8.1f MB  sec=$best%7.3f  MB/s=${rawBytes / 1e6 / best}%8.1f")
    }

    // encode once (not timed), decode repeatedly
    val fsstCs = ColumnCodec.encodeStringFsst(texts, present)
    val directCs = ColumnCodec.encodeStringDirect(texts, present)
    val dictCs = ColumnCodec.encodeStringDict(langs, present)
    val binCs = ColumnCodec.encodeBinary(htmls, present)
    val tsCs = ColumnCodec.encodeTimestamp(micros, present)
    val fsstZ = fsstCs.streams.map { case (k, v) => k -> ZlibBlock.compress(v) }

    timeIt("text FSST decode (no zlib)", textRaw) {
      ColumnCodec.decodeStrSlices(fsstCs)._1.buf.length.toLong
    }
    timeIt("text zlib + FSST decode", textRaw) {
      val streams = fsstZ.map { case (k, v) => k -> ZlibBlock.decompress(v) }
      ColumnCodec.decodeStrSlices(fsstCs.copy(streams = streams))._1.buf.length.toLong
    }
    timeIt("text DIRECT slice decode", textRaw) {
      ColumnCodec.decodeStrSlices(directCs)._1.starts.length.toLong
    }
    timeIt("lang dict decode", langs.map(_.length.toLong).sum) {
      ColumnCodec.decodeStrSlices(dictCs)._1.starts.length.toLong
    }
    timeIt("html binary slice decode", htmlRaw) {
      ColumnCodec.decodeBinarySlices(binCs)._1.starts.length.toLong
    }
    timeIt("warc_ts FoR decode", rows * 8L) {
      ColumnCodec.decodeTimestamp(tsCs)._1.length.toLong
    }
  }
}
