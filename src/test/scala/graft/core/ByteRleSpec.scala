package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Golden vectors from /root/reference/test/ApacheOrcDotNet.Test/Encodings/
  * ByteRunLengthEncoding_Test.cs and BitEncoding_Test.cs (ORC-spec-defined).
  */
class ByteRleSpec extends AnyFunSuite {

  private def encode(xs: Array[Byte]): Array[Byte] = {
    val out = new ByteBuf()
    ByteRle.write(out, xs)
    out.toArray
  }

  private def roundTrip(xs: Array[Byte]): Unit = {
    val bytes = encode(xs)
    val in = new BytesIn(bytes)
    assert(ByteRle.readAll(in).toSeq == xs.toSeq)
    assert(!in.hasMore)
  }

  test("golden: run of 100 zeros") {
    assert(encode(Array.fill[Byte](100)(0)).toSeq == Seq[Byte](0x61, 0x00))
  }

  test("golden: two literals") {
    assert(encode(Array[Byte](0x44, 0x45)).toSeq == Seq(0xfe.toByte, 0x44.toByte, 0x45.toByte))
  }

  test("golden: run-literal-run") {
    assert(encode(Array[Byte](1, 1, 1, 2, 3, 4, 5, 5, 5)).toSeq ==
      Seq[Byte](0x00, 0x01, 0xfd.toByte, 0x02, 0x03, 0x04, 0x00, 0x05))
  }

  test("long run splits at 130") {
    roundTrip(Array.fill[Byte](500)(7))
    val bytes = encode(Array.fill[Byte](130)(7))
    assert(bytes.toSeq == Seq[Byte](127, 7))
  }

  test("long literal splits at 128") {
    roundTrip(Array.tabulate[Byte](300)(i => (i % 251).toByte))
  }

  test("bit codec golden: single true then falses") {
    val out = new ByteBuf()
    BitCodec.write(out, Array(true, false, false, false, false, false, false, false))
    assert(out.toArray.toSeq == Seq(0xff.toByte, 0x80.toByte))
  }

  test("bit codec round trips") {
    val rng = new scala.util.Random(123)
    for (n <- Seq(1, 7, 8, 9, 63, 64, 65, 10000)) {
      val xs = Array.fill(n)(rng.nextBoolean())
      val out = new ByteBuf()
      BitCodec.write(out, xs)
      assert(BitCodec.read(new BytesIn(out.toArray), n).toSeq == xs.toSeq)
    }
  }

  test("property: byte RLE round trips") {
    val prop = Prop.forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)),
                           Gen.choose(1, 50), Gen.choose(0, 255)) {
      (xs: List[Byte], runLen: Int, runByte: Int) =>
        val combined = (xs ++ List.fill(runLen)(runByte.toByte) ++ xs).toArray
        ByteRle.readAll(new BytesIn(encode(xs.toArray))).toSeq == xs &&
          ByteRle.readAll(new BytesIn(encode(combined))).toSeq == combined.toSeq
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }
}
