package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

/** Bloom filter invariants: ZERO false negatives (a false negative would
  * silently drop matching rows at decode — correctness, not tuning), a
  * false-positive rate near the target, and a byte-exact
  * serialize/deserialize round trip.
  */
class BloomSpec extends AnyFunSuite {

  private def bytes(s: String) = s.getBytes(StandardCharsets.UTF_8)

  test("no false negatives over 20k string members, round-tripped") {
    val b = new Bloom.Builder
    (0 until 20000).foreach(i => b.addBytes(bytes(s"https://example.org/page/$i")))
    val filter = Bloom.deserialize(Bloom.serialize(b.build()))
    (0 until 20000).foreach { i =>
      val (h1, h2) = Bloom.hashPair(bytes(s"https://example.org/page/$i"))
      assert(filter.mightContain(h1, h2), s"false negative at $i")
    }
  }

  test("false-positive rate lands near the 5% target") {
    val b = new Bloom.Builder
    (0 until 20000).foreach(i => b.addBytes(bytes(s"member-$i")))
    val filter = b.build()
    val fp = (0 until 20000).count { i =>
      val (h1, h2) = Bloom.hashPair(bytes(s"NONmember-$i"))
      filter.mightContain(h1, h2)
    }
    val rate = fp / 20000.0
    assert(rate < 0.10, s"fp rate $rate far above the 0.05 target")
    assert(rate > 0.001, s"fp rate $rate implausibly low — sizing broken?")
  }

  test("long members: no false negatives, distinct non-members mostly rejected") {
    val b = new Bloom.Builder
    (0L until 5000L).foreach(i => b.addLong(i * 7919))
    val filter = Bloom.deserialize(Bloom.serialize(b.build()))
    (0L until 5000L).foreach { i =>
      val (h1, h2) = Bloom.hashPairLong(i * 7919)
      assert(filter.mightContain(h1, h2))
    }
    val fp = (0L until 5000L).count { i =>
      val (h1, h2) = Bloom.hashPairLong(i * 7919 + 1)
      filter.mightContain(h1, h2)
    }
    assert(fp / 5000.0 < 0.10)
  }

  test("xxh64 matches the spec vector and Spark's XXH64 on random inputs") {
    // XXH64 of empty input with seed 0 is 0xEF46DB3751D8E999 (xxHash spec)
    assert(Bloom.xxh64(Array.emptyByteArray, 0, 0, 0L) == 0xEF46DB3751D8E999L)
    // cross-oracle: Spark ships a production XXH64 — every length class
    // (tail <4, <8, <32, multi-lane) and several seeds must agree
    val rng = new scala.util.Random(99)
    for (len <- 0 to 100; seed <- Seq(0L, 42L, -1L)) {
      val data = Array.fill(len)(rng.nextInt().toByte)
      val expected = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        data, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, seed)
      val got = Bloom.xxh64(data, 0, len, seed)
      assert(got == expected, f"len=$len seed=$seed: got $got%x expected $expected%x")
    }
  }
}
