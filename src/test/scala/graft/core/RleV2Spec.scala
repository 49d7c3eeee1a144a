package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** RLEv2 golden-byte vectors + round-trips. Vectors are ORC-format-defined
  * and ported from the reference suite (/root/reference/test/
  * ApacheOrcDotNet.Test/Encodings/IntegerRunLengthEncodingV2_Test.cs).
  */
class RleV2Spec extends AnyFunSuite {

  private def encode(xs: Array[Long], signed: Boolean, aligned: Boolean): Array[Byte] = {
    val out = new ByteBuf()
    RleV2Writer.write(out, xs, signed, aligned)
    out.toArray
  }

  private def decodeAll(bytes: Array[Byte], signed: Boolean): Array[Long] = {
    val in = new BytesIn(bytes)
    val result = RleV2Reader.readAll(in, signed)
    assert(!in.hasMore, "stream not fully consumed")
    result
  }

  private def roundTrip(xs: Array[Long], signed: Boolean, aligned: Boolean,
                        expectedLen: Int = -1): Unit = {
    val bytes = encode(xs, signed, aligned)
    if (expectedLen >= 0) assert(bytes.length == expectedLen, s"encoded length ${bytes.length} != $expectedLen")
    assert(decodeAll(bytes, signed).toSeq == xs.toSeq)
  }

  private def hex(s: String): Array[Byte] =
    s.split("\\s+").filter(_.nonEmpty).map(b => Integer.parseInt(b, 16).toByte)

  test("golden: SHORT_REPEAT write+read") {
    val longs = Array[Long](10000, 10000, 10000, 10000, 10000)
    val bytes = hex("0a 27 10")
    assert(encode(longs, signed = false, aligned = false).toSeq == bytes.toSeq)
    assert(decodeAll(bytes, signed = false).toSeq == longs.toSeq)
  }

  test("golden: DIRECT write+read") {
    val longs = Array[Long](23713, 43806, 57005, 48879)
    val bytes = hex("5e 03 5c a1 ab 1e de ad be ef")
    assert(encode(longs, signed = false, aligned = false).toSeq == bytes.toSeq)
    assert(decodeAll(bytes, signed = false).toSeq == longs.toSeq)
  }

  test("golden: PATCHED_BASE write+read") {
    val longs = Array[Long](2030, 2000, 2020, 1000000, 2040, 2050, 2060, 2070, 2080, 2090,
      2100, 2110, 2120, 2130, 2140, 2150, 2160, 2170, 2180, 2190)
    val bytes = hex("8e 13 2b 21 07 d0 1e 00 14 70 28 32 3c 46 50 5a 64 6e 78 82 8c 96 a0 aa b4 be fc e8")
    assert(encode(longs, signed = false, aligned = false).toSeq == bytes.toSeq)
    assert(decodeAll(bytes, signed = false).toSeq == longs.toSeq)
  }

  test("golden: DELTA write+read (aligned)") {
    val longs = Array[Long](2, 3, 5, 7, 11, 13, 17, 19, 23, 29)
    val bytes = hex("c6 09 02 02 22 42 42 46")
    assert(encode(longs, signed = false, aligned = true).toSeq == bytes.toSeq)
    assert(decodeAll(bytes, signed = false).toSeq == longs.toSeq)
  }

  test("golden: DELTA fixed width-0 signed") {
    val longs = Array.fill[Long](0x120)(6)
    val bytes = hex("c1 1f 0c 00")
    assert(encode(longs, signed = true, aligned = false).toSeq == bytes.toSeq)
    assert(decodeAll(bytes, signed = true).toSeq == longs.toSeq)
  }

  test("short repeat round trips") {
    roundTrip(Array.fill[Long](10)(1), signed = false, aligned = false)
    roundTrip(Array.fill[Long](10)(-1), signed = true, aligned = false)
    for (v <- Seq(0xffffL, 0xffffffL, 0xffffffffL, 0x11223344L, 0x1122334455L,
                  0x112233445566L, 0x11223344556677L, 0x1122334455667788L))
      roundTrip(Array.fill[Long](4)(v), signed = false, aligned = false)
  }

  test("direct round trips") {
    val longs = Array[Long](-5, 5, -5, 5)
    roundTrip(longs, signed = true, aligned = false)
    roundTrip(longs, signed = true, aligned = true)
  }

  test("delta round trips") {
    roundTrip(Array.fill[Long](12)(10000), signed = false, aligned = true)
    roundTrip(Array.fill[Long](12)(10000), signed = true, aligned = false)
    roundTrip(Array.fill[Long](12)(-10000), signed = true, aligned = true)
    roundTrip(Array[Long](500, 400, 350, 325, 310), signed = true, aligned = false)
    roundTrip(Array[Long](500, 600, 650, 675, 710), signed = true, aligned = false)
  }

  test("delta overflow falls back to direct") {
    roundTrip(Array(4513343538618202719L, 4513343538618202711L, 2911390882471569739L, -9181829309989854913L), signed = true, aligned = false)
    roundTrip(Array(Long.MaxValue, 4513343538618202711L, 2911390882471569739L, Long.MinValue), signed = true, aligned = false)
    roundTrip(Array(-4513343538618202711L, -2911390882471569739L, -2L, Long.MaxValue), signed = true, aligned = false)
  }

  test("single extreme values") {
    for (v <- Seq(Int.MinValue.toLong, Int.MaxValue.toLong, Long.MinValue, Long.MaxValue))
      roundTrip(Array(v), signed = true, aligned = false)
  }

  test("expected encoded lengths (from Java ORC corpus)") {
    roundTrip(Array.fill[Long](5120)(123), signed = true, aligned = false, expectedLen = 50)
    roundTrip(Array.tabulate[Long](5120)(i => i % 512), signed = true, aligned = false, expectedLen = 40)
    roundTrip(Array.tabulate[Long](5120)(i => 512 - (i % 512)), signed = true, aligned = false, expectedLen = 50)
    roundTrip(Array.tabulate[Long](5120)(i => (i % 512) + (i % 512) * 100), signed = true, aligned = false, expectedLen = 50)
    roundTrip(Array.tabulate[Long](5120)(i => (512 - i % 512) + (i % 512) * 100), signed = true, aligned = false, expectedLen = 60)
    roundTrip(Array.fill[Long](5)(10), signed = true, aligned = false, expectedLen = 2)
    roundTrip((0L +: Array.tabulate[Long](511)(i => i.toLong)), signed = true, aligned = false, expectedLen = 642)
  }

  test("patched base with negative min (reference corpus)") {
    val base = Array[Long](
      20, 2, 3, 2, 1, 3, 17, 71, 35, 2, 1, 139, 2, 2, 3, 1783, 475, 2, 1,
      1, 3, 1, 3, 2, 32, 1, 2, 3, 1, 8, 30, 1, 3, 414, 1, 1, 135, 3, 3, 1,
      414, 2, 1, 2, 2, 594, 2, 5, 6, 4, 11, 1, 2, 2, 1, 1, 52, 4, 1, 2, 7,
      1, 17, 334, 1, 2, 1, 2, 2, 6, 1, 266, 1, 2, 217, 2, 6, 2, 13, 2, 2,
      1, 2, 3, 5, 1, 2, 1, 7244, 11813, 1, 33, 2)
    val tail = Array[Long](
      1, 2, 3, 13, 1, 92, 3, 13, 5, 14, 9, 141, 12, 6, 15, 25, 1, 1, 1, 46,
      2, 1, 1, 141, 3, 1, 1, 1, 1, 2, 1, 4, 34, 5, 78, 8, 1, 2, 2, 1, 9, 10,
      2, 1, 4, 13, 1, 5, 4, 4, 19, 5, 1, 1, 1, 68, 33, 399, 1, 1885, 25, 5,
      2, 4, 1, 1, 2, 16, 1, 2966, 3, 1, 1, 25501, 1, 1, 1, 66, 1, 3, 8, 131,
      14, 5, 1, 2, 2, 1, 1, 8, 1, 1, 2, 1, 5, 9, 2, 3, 112, 13, 2, 2, 1, 5,
      10, 3, 1, 1, 13, 2, 3, 4, 1, 3, 1, 1, 2, 1, 1, 2, 4, 2, 207, 1, 1, 2,
      4, 3, 3, 2, 2, 16)
    for (mid <- Seq(-13L, -1L, 0L))
      roundTrip(base ++ Array(mid) ++ tail, signed = true, aligned = false)
    roundTrip(Array[Long](13, 13, 11, 8, 13, 10, 10, 11, 11, 14, 11, 7, 13, 12, 12, 11, 15, 12,
      12, 9, 8, 10, 13, 11, 8, 6, 5, 6, 11, 7, 15, 10, 7, 6, 8, 7, 9, 9, 11,
      33, 11, 3, 7, 4, 6, 10, 14, 12, 5, 14, 7, 6), signed = true, aligned = false)
  }

  test("patched base: patch at window edge positions") {
    val rng = new scala.util.Random(7)
    for (pos <- Seq(0, 1, 255, 256, 510, 511)) {
      val longs = Array.fill[Long](5120)(rng.nextInt(100).toLong)
      longs(pos) = 20000
      roundTrip(longs, signed = true, aligned = false)
    }
  }

  test("patched base: Long.MaxValue patches") {
    val rng = new scala.util.Random(11)
    val a = Array.fill[Long](5120)(rng.nextInt(60).toLong)
    a(511) = Long.MaxValue
    roundTrip(a, signed = true, aligned = false)
    val b = Array.fill[Long](5120)(rng.nextInt(60).toLong)
    b(128) = Long.MaxValue; b(256) = Long.MaxValue; b(511) = Long.MaxValue
    roundTrip(b, signed = true, aligned = false)
    roundTrip(Array[Long](371946367L, 11963367L, 68639400007L, 100233367L, 6367L, 10026367L,
      3670000L, 3602367L, 4719226367L, 7196367L, 444442L, 210267L, 21033L,
      160267L, 400267L, 23634347L, 16027L, 46026367L, Long.MaxValue, 33333L), signed = true, aligned = false)
    val seq = Array[Long](371292224226367L, 119622332222267L, 686329400222007L, 100233333222367L,
      636272333322222L, 10202633223267L, 36700222022230L, 36023226224227L,
      47192226364427L, 71963622222447L, 22244444222222L, 21220263327442L,
      21032233332232L, 16026322232227L, 40022262272212L, 23634342227222L,
      16022222222227L, 46026362222227L, 46026362222227L, 33322222222323L)
    roundTrip(Array.fill(25)(seq).flatten :+ Long.MaxValue, signed = true, aligned = false)
  }

  test("direct large negatives") {
    roundTrip(Array(-7486502418706614742L, 0L, 1L, 1L, -5535739865598783616L), signed = true, aligned = false)
  }

  test("seeded fuzz: random ints and longs") {
    val rng = new scala.util.Random(123)
    roundTrip(Array.fill[Long](100000)(rng.nextInt(Int.MaxValue).toLong), signed = true, aligned = false)
    roundTrip(Array.fill[Long](100000)(rng.nextLong()), signed = true, aligned = false)
    val zipf = Array.fill[Long](50000)(if (rng.nextInt(10) == 0) rng.nextLong() else rng.nextInt(100).toLong)
    roundTrip(zipf, signed = true, aligned = false)
  }

  test("property: round trip arbitrary longs, all flag combos") {
    val gens = Gen.oneOf(
      Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue)),
      Gen.nonEmptyListOf(Gen.choose(-100L, 100L)),
      Gen.choose(1, 2000).flatMap(n => Gen.choose(-50L, 50L).map(v => List.fill(n)(v))),
      for {
        n <- Gen.choose(1, 1500)
        start <- Gen.choose(-100000L, 100000L)
        stride <- Gen.choose(-1000L, 1000L)
      } yield List.tabulate(n)(i => start + i * stride)
    )
    val prop = Prop.forAll(gens, Gen.oneOf(true, false), Gen.oneOf(true, false)) {
      (xs: List[Long], signed: Boolean, aligned: Boolean) =>
        val arr = if (signed) xs.toArray else xs.toArray.map(_ & Long.MaxValue)
        val bytes = encode(arr, signed, aligned)
        decodeAll(bytes, signed).toSeq == arr.toSeq
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }
}
