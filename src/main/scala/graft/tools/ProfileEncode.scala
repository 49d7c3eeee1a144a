package graft.tools

import graft.columns.{CodecSelector, ColumnCodec}
import graft.core.ZlibBlock

/** Single-threaded per-column codec profile on WebGen-shaped data — no
  * Spark, no scheduler: isolates where an encode core-second actually
  * goes (FSST match loop vs zlib vs RLEv2 vs buffer churn) so the tuning
  * target is measured, not guessed.
  */
object ProfileEncode {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toInt).getOrElse(20000)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pages = graft.spark.WebGen.pages(spark, rows, 42, 4).collect()
    spark.stop()

    val urls = pages.map(_.url)
    val texts = pages.map(_.text)
    val htmls = pages.map(_.html)
    val langs = pages.map(_.lang)
    val micros = pages.map(_.warc_ts.getTime * 1000L)
    val present = Array.fill(pages.length)(true)

    def timeIt(name: String, rawBytes: Long)(f: => Long): Unit = {
      f // warm
      var best = Double.MaxValue
      var encoded = 0L
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        encoded = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$name%-28s raw=${rawBytes / 1e6}%8.1f MB  sec=$best%7.3f  MB/s=${rawBytes / 1e6 / best}%8.1f  out=${encoded / 1e6}%8.1f MB")
    }

    val textRaw = texts.map(_.length.toLong).sum
    val htmlRaw = htmls.map(_.length.toLong).sum
    val urlRaw = urls.map(_.length.toLong).sum

    println(s"rows=$rows codecChoices: url=${CodecSelector.chooseStringCodec(CodecSelector.stringStats(urls.take(5000)))} " +
      s"text=${CodecSelector.chooseStringCodec(CodecSelector.stringStats(texts.take(5000)))} " +
      s"lang=${CodecSelector.chooseStringCodec(CodecSelector.stringStats(langs.take(5000)))}")

    timeIt("text FSST encode (no zlib)", textRaw) {
      ColumnCodec.encodeStringFsst(texts, present).streams.valuesIterator.map(_.length.toLong).sum
    }
    timeIt("text FSST + zlib", textRaw) {
      ColumnCodec.encodeStringFsst(texts, present).streams.valuesIterator.map(v => ZlibBlock.compress(v).length.toLong).sum
    }
    timeIt("text DIRECT + zlib", textRaw) {
      ColumnCodec.encodeStringDirect(texts, present).streams.valuesIterator.map(v => ZlibBlock.compress(v).length.toLong).sum
    }
    timeIt("url FSST + zlib", urlRaw) {
      ColumnCodec.encodeStringFsst(urls, present).streams.valuesIterator.map(v => ZlibBlock.compress(v).length.toLong).sum
    }
    timeIt("html binary + zlib", htmlRaw) {
      ColumnCodec.encodeBinary(htmls, present).streams.valuesIterator.map(v => ZlibBlock.compress(v).length.toLong).sum
    }
    timeIt("lang dict + zlib", langs.map(_.length.toLong).sum) {
      ColumnCodec.encodeStringDict(langs, present).streams.valuesIterator.map(v => ZlibBlock.compress(v).length.toLong).sum
    }
    timeIt("warc_ts FoR + zlib", rows * 8L) {
      ColumnCodec.encodeTimestamp(micros, present).streams.valuesIterator.map(v => ZlibBlock.compress(v).length.toLong).sum
    }
    val total = textRaw + htmlRaw + urlRaw + langs.map(_.length.toLong).sum + rows * 8L
    println(f"total raw ${total / 1e6}%.1f MB for $rows rows")
  }
}
