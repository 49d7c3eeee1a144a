package graft.core

import org.scalatest.funsuite.AnyFunSuite

class BlockCompressionSpec extends AnyFunSuite {

  private val kinds = BlockCompression.All

  test("all kinds round trip compressible, incompressible, empty, and tiny payloads") {
    val r = new scala.util.Random(42)
    val compressible = ("the quick brown fox jumps over the lazy dog " * 20000).getBytes("UTF-8")
    val incompressible = new Array[Byte](512 * 1024)
    r.nextBytes(incompressible)
    val tiny = Array[Byte](7)
    val empty = Array.emptyByteArray
    for (kind <- kinds; payload <- Seq(compressible, incompressible, tiny, empty)) {
      val rt = BlockCompression.decompress(kind, BlockCompression.compress(kind, payload))
      assert(rt.toSeq == payload.toSeq, s"$kind failed on ${payload.length}-byte payload")
    }
  }

  test("zstd and lz4 actually compress; incompressible data stays ~raw (skip-if-bigger)") {
    val text = ("article content page the www http " * 30000).getBytes("UTF-8")
    val zstd = BlockCompression.compress(BlockCompression.Zstd, text)
    val lz4 = BlockCompression.compress(BlockCompression.Lz4, text)
    assert(zstd.length < text.length / 5, s"zstd ${zstd.length} vs ${text.length}")
    assert(lz4.length < text.length / 2, s"lz4 ${lz4.length} vs ${text.length}")

    val r = new scala.util.Random(1)
    val noise = new Array[Byte](256 * 1024)
    r.nextBytes(noise)
    for (kind <- Seq(BlockCompression.Zstd, BlockCompression.Lz4)) {
      val out = BlockCompression.compress(kind, noise)
      assert(out.length <= noise.length + 16, s"$kind grew incompressible data: ${out.length}")
    }
  }

  test("zstd is size-competitive with the zlib parity path on web-like text") {
    val r = new scala.util.Random(7)
    val words = Array("content", "article", "the", "page", "http", "www", "href", "div")
    val text = (0 until 20000).map(i =>
      s"unique-$i " + (0 until 12).map(_ => words(r.nextInt(words.length))).mkString(" "))
      .mkString("\n").getBytes("UTF-8")
    val zlib = BlockCompression.compress(BlockCompression.Zlib, text)
    val zstd = BlockCompression.compress(BlockCompression.Zstd, text)
    // zstd-1 must be within 15% of deflate BEST_SPEED's size (it is
    // usually smaller; the bound leaves slack for corpus quirks)
    assert(zstd.length <= zlib.length * 1.15,
      s"zstd ${zstd.length} much worse than zlib ${zlib.length}")
  }

  test("unknown kind is rejected") {
    intercept[IllegalArgumentException](BlockCompression.compress("lzo", Array[Byte](1)))
    intercept[IllegalArgumentException](BlockCompression.decompress("lzo", Array[Byte](1)))
  }
}
