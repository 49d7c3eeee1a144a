package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.ByteBuffer

/** Cross-implementation oracle: our RLEv2 streams must interoperate with
  * Java ORC (orc-core 2.2.2, on the unmanaged classpath) in BOTH
  * directions — our encode read by RunLengthIntegerReaderV2, and
  * RunLengthIntegerWriterV2 output read by our decoder. This replaces the
  * reference repo's orc-tools validation of its writer output
  * (/root/reference/src/ApacheOrcDotNet.WriterTest.App/results.txt).
  *
  * Note: byte-for-byte equality with Java is NOT asserted — the reference
  * (and therefore we) deliberately excludes the first delta from the
  * delta-width computation where Java includes it
  * (IntegerRunLengthEncodingV2Writer.cs:116-117). Interop of decoded
  * values is the binding invariant.
  */
class OrcCrossOracleSpec extends AnyFunSuite {

  private def javaDecode(bytes: Array[Byte], signed: Boolean, count: Int): Array[Long] = {
    val chunk = new org.apache.orc.impl.BufferChunk(ByteBuffer.wrap(bytes), 0L)
    val in = org.apache.orc.impl.InStream.create("test", chunk, 0L, bytes.length.toLong)
    val reader = new org.apache.orc.impl.RunLengthIntegerReaderV2(in, signed, false)
    val out = new Array[Long](count)
    var i = 0
    while (i < count) { out(i) = reader.next(); i += 1 }
    assert(!reader.hasNext, "java reader has leftover values")
    out
  }

  private def javaEncode(values: Array[Long], signed: Boolean, aligned: Boolean): Array[Byte] = {
    val collected = new java.io.ByteArrayOutputStream()
    val receiver = new org.apache.orc.PhysicalWriter.OutputReceiver {
      override def output(buffer: ByteBuffer): Unit = {
        val arr = new Array[Byte](buffer.remaining())
        buffer.get(arr)
        collected.write(arr)
      }
      override def suppress(): Unit = ()
    }
    val out = new org.apache.orc.impl.OutStream("test",
      new org.apache.orc.impl.writer.StreamOptions(128 * 1024), receiver)
    val writer = new org.apache.orc.impl.RunLengthIntegerWriterV2(out, signed, aligned)
    values.foreach(writer.write)
    writer.flush()
    collected.toByteArray
  }

  private def ourEncode(values: Array[Long], signed: Boolean, aligned: Boolean): Array[Byte] = {
    val buf = new ByteBuf()
    RleV2Writer.write(buf, values, signed, aligned)
    buf.toArray
  }

  private val shapes: Seq[(String, Array[Long])] = {
    val rng = new scala.util.Random(2024)
    Seq(
      "constant" -> Array.fill[Long](5000)(42),
      "short repeats" -> Array.tabulate[Long](999)(i => (i / 7).toLong),
      "ascending" -> Array.tabulate[Long](5000)(_.toLong),
      "descending" -> Array.tabulate[Long](5000)(i => (5000 - i).toLong),
      "random small" -> Array.fill[Long](5000)(rng.nextInt(100).toLong),
      "random full-range" -> Array.fill[Long](5000)(rng.nextLong()),
      "patched shape" -> Array.tabulate[Long](5000)(i => if (i % 97 == 0) 1000000L + i else (i % 50).toLong),
      "negatives" -> Array.fill[Long](5000)(rng.nextInt(2000).toLong - 1000),
      "single" -> Array[Long](Long.MinValue),
      "strided" -> Array.tabulate[Long](3000)(i => i.toLong * 1234)
    )
  }

  test("our RLEv2 encode is readable by Java ORC's reader (signed and unsigned)") {
    shapes.foreach { case (name, values) =>
      for (aligned <- Seq(false, true)) {
        val decodedS = javaDecode(ourEncode(values, signed = true, aligned), signed = true, values.length)
        assert(decodedS.sameElements(values), s"signed/$aligned: $name")
        val unsignedValues = values.map(_ & Long.MaxValue)
        val decodedU = javaDecode(ourEncode(unsignedValues, signed = false, aligned), signed = false, values.length)
        assert(decodedU.sameElements(unsignedValues), s"unsigned/$aligned: $name")
      }
    }
  }

  test("Java ORC's writer output is readable by our decoder") {
    shapes.foreach { case (name, values) =>
      for (aligned <- Seq(false, true)) {
        val javaBytes = javaEncode(values, signed = true, aligned)
        val decoded = RleV2Reader.readAll(new BytesIn(javaBytes), signed = true)
        assert(decoded.sameElements(values), s"signed/$aligned: $name")
      }
    }
  }

  // ---------- ByteRLE (PRESENT / boolean / byte streams) ----------

  private def javaByteEncode(values: Array[Byte]): Array[Byte] = {
    val collected = new java.io.ByteArrayOutputStream()
    val receiver = new org.apache.orc.PhysicalWriter.OutputReceiver {
      override def output(buffer: ByteBuffer): Unit = {
        val arr = new Array[Byte](buffer.remaining())
        buffer.get(arr)
        collected.write(arr)
      }
      override def suppress(): Unit = ()
    }
    val out = new org.apache.orc.impl.OutStream("test",
      new org.apache.orc.impl.writer.StreamOptions(128 * 1024), receiver)
    val writer = new org.apache.orc.impl.RunLengthByteWriter(out)
    values.foreach(writer.write)
    writer.flush()
    collected.toByteArray
  }

  private def javaByteDecode(bytes: Array[Byte], count: Int): Array[Byte] = {
    val chunk = new org.apache.orc.impl.BufferChunk(ByteBuffer.wrap(bytes), 0L)
    val in = org.apache.orc.impl.InStream.create("test", chunk, 0L, bytes.length.toLong)
    val reader = new org.apache.orc.impl.RunLengthByteReader(in)
    val out = new Array[Byte](count)
    var i = 0
    while (i < count) { out(i) = reader.next(); i += 1 }
    out
  }

  private val byteShapes: Seq[(String, Array[Byte])] = {
    val rng = new scala.util.Random(7)
    Seq(
      "runs" -> Array.tabulate[Byte](4000)(i => (i / 130).toByte),
      "literals" -> Array.fill[Byte](4000)(rng.nextInt(256).toByte),
      "mixed" -> Array.tabulate[Byte](4000)(i => if ((i / 100) % 2 == 0) 7 else rng.nextInt(256).toByte),
      "tiny" -> Array[Byte](1, 1, 1),
      "two" -> Array[Byte](5, 9))
  }

  test("our decimal big-varints interoperate with Java ORC's BigInteger serialization") {
    import java.math.BigInteger
    val rng = new scala.util.Random(7)
    val vals: Seq[BigInteger] =
      Seq(
        new BigInteger("99999999999999999999999999999999999999"), // 38 nines
        new BigInteger("-99999999999999999999999999999999999999"),
        BigInteger.ZERO, BigInteger.ONE, BigInteger.valueOf(-1L),
        BigInteger.valueOf(Long.MaxValue), BigInteger.valueOf(Long.MinValue),
        BigInteger.valueOf(Long.MaxValue).add(BigInteger.ONE),
        BigInteger.valueOf(Long.MinValue).subtract(BigInteger.ONE)) ++
        (0 until 500).map(i => new BigInteger(1 + rng.nextInt(127), rng.self)
          .multiply(BigInteger.valueOf(if (i % 2 == 0) 1 else -1)))

    // ours → Java: the mantissa DATA stream of DECIMAL128 must be exactly
    // what orc-core's decimal reader consumes
    val buf = new ByteBuf()
    vals.foreach(v => BitOps.writeBigVarIntSigned(buf, v))
    val in = new java.io.ByteArrayInputStream(buf.toArray)
    vals.foreach { v =>
      val got = org.apache.orc.impl.SerializationUtils.readBigInteger(in)
      assert(got == v, s"java read $got, expected $v")
    }
    assert(in.read() == -1, "java reader left bytes behind")

    // Java → ours
    val bos = new java.io.ByteArrayOutputStream()
    vals.foreach(v => org.apache.orc.impl.SerializationUtils.writeBigInteger(bos, v))
    val bin = new BytesIn(bos.toByteArray)
    vals.foreach { v =>
      val got = BitOps.readBigVarIntSigned(bin)
      assert(got == v, s"we read $got, expected $v")
    }
    assert(!bin.hasMore, "our reader left bytes behind")
  }

  test("our ByteRLE interoperates with Java ORC in both directions") {
    byteShapes.foreach { case (name, values) =>
      val ours = { val b = new ByteBuf(); ByteRle.write(b, values); b.toArray }
      assert(javaByteDecode(ours, values.length).sameElements(values), s"ours→java: $name")
      val javaBytes = javaByteEncode(values)
      val decoded = ByteRle.readAll(new BytesIn(javaBytes))
      assert(decoded.sameElements(values), s"java→ours: $name")
    }
  }
}
