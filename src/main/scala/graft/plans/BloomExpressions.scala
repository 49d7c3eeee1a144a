package graft.plans

import graft.core.Bloom
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface for bloom filters: `bloom_agg(value[, expected])` builds a
  * serialized filter per group (string/binary/integer inputs),
  * `bloom_contains(bloom, value)` probes one.
  *
  * Scale shape: the aggregation buffer is a FIXED-size bitset
  * (Bloom.FixedBuilder) sized from `expected` distinct values (default
  * 100k) — partial buffers are constant-size and merge with a bitwise
  * OR, so a 100M-row group costs the same buffer as a 100-row one
  * (over-cardinality degrades fpp, never correctness). The serialized
  * value carries a one-byte TYPE TAG ('B' for byte-hashed
  * binary/string, 'L' for long-hashed integers) and bloom_contains
  * rejects a mismatched probe type instead of silently hashing the
  * wrong representation into a false negative.
  */
case class BloomAgg(child: Expression, expected: Int = BloomAgg.DefaultExpected,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Bloom.FixedBuilder] {

  require(expected > 0, "bloom_agg expected-cardinality must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType | StringType | LongType | IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_agg expects binary/string/long/int, got $dt")
    }

  private def typeTag: Byte = child.dataType match {
    case BinaryType | StringType  => BloomAgg.TagBytes
    case LongType | IntegerType   => BloomAgg.TagLong
    case other                    => throw new IllegalStateException(other.toString)
  }

  override def createAggregationBuffer(): Bloom.FixedBuilder =
    new Bloom.FixedBuilder(expected)

  override def update(b: Bloom.FixedBuilder, input: InternalRow): Bloom.FixedBuilder = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case BinaryType  => b.addBytes(v.asInstanceOf[Array[Byte]])
      case StringType  => b.addBytes(v.asInstanceOf[UTF8String].getBytes)
      case LongType    => b.addLong(v.asInstanceOf[Long])
      case IntegerType => b.addLong(v.asInstanceOf[Int].toLong)
      case other       => throw new IllegalStateException(other.toString)
    }
    b
  }

  override def merge(a: Bloom.FixedBuilder, b: Bloom.FixedBuilder): Bloom.FixedBuilder = {
    a.or(b)
    a
  }

  override def eval(b: Bloom.FixedBuilder): Any =
    Bloom.serializeTagged(b.build(), typeTag) // same envelope as chunk blooms

  override def serialize(b: Bloom.FixedBuilder): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + b.words.length * 8)
    bb.putInt(b.words.length)
    b.words.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Bloom.FixedBuilder = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val b = new Bloom.FixedBuilder(expected)
    require(b.words.length == n, s"bloom buffer size mismatch: ${b.words.length} vs $n")
    var i = 0
    while (i < n) { b.words(i) = bb.getLong(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomAgg =
    copy(child = c(0))
  override def prettyName: String = "bloom_agg"
}

object BloomAgg {
  final val DefaultExpected = 100000
  final val TagBytes: Byte = Bloom.TagBytes
  final val TagLong: Byte = Bloom.TagLong
}

/** bloom_contains(bloomBytes, value) — true when the filter might contain
  * the value (definite-no is exact; yes has the build-time fpp). Rejects
  * probe types that mismatch the filter's build-type tag. The last
  * deserialized filter is memoized by blob identity, so probing a
  * broadcast/constant bloom pays one parse, not one per row.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val valOk = right.dataType match {
      case BinaryType | StringType | LongType | IntegerType => true
      case _ => false
    }
    if (left.dataType == BinaryType && valOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom_contains expects (binary, binary|string|long|int), got (${left.dataType}, ${right.dataType})")
  }

  @transient private var lastBlob: Array[Byte] = _
  @transient private var lastBloom: Bloom = _

  override def nullSafeEval(b: Any, v: Any): Any = {
    val blob = b.asInstanceOf[Array[Byte]]
    require(blob.length >= 2, "not a bloom value: blob too short")
    val probeTag = right.dataType match {
      case BinaryType | StringType => BloomAgg.TagBytes
      case _                       => BloomAgg.TagLong
    }
    // identity hit first (constant/broadcast bloom: one parse total), then
    // content equality (per-group blobs from a join materialize a fresh
    // array per row — Arrays.equals is a fraction of a re-deserialize and
    // exact, so repeated probes of the same group's filter stay cheap)
    if (!(blob eq lastBlob) &&
        !(lastBlob != null && java.util.Arrays.equals(blob, lastBlob))) {
      val (tag, bloom) = Bloom.deserializeTagged(blob) // tag 0 = legacy untagged
      if (tag != 0) {
        require(tag == Bloom.TagBytes || tag == Bloom.TagLong,
          s"unrecognized bloom type tag '${tag.toChar}' — not a bloom_agg/chunk bloom value")
        require(tag == probeTag,
          s"bloom_contains type mismatch: filter built over ${if (tag == Bloom.TagLong) "integers" else "strings/bytes"}, " +
            s"probed with ${right.dataType.simpleString} — the hash representations differ, which would " +
            "silently produce false negatives")
      }
      lastBloom = bloom
      lastBlob = blob
    }
    val (h1, h2) = right.dataType match {
      case BinaryType  => Bloom.hashPair(v.asInstanceOf[Array[Byte]])
      case StringType  => Bloom.hashPair(v.asInstanceOf[UTF8String].getBytes)
      case LongType    => Bloom.hashPairLong(v.asInstanceOf[Long])
      case IntegerType => Bloom.hashPairLong(v.asInstanceOf[Int].toLong)
      case other       => throw new IllegalStateException(other.toString)
    }
    java.lang.Boolean.valueOf(lastBloom.mightContain(h1, h2))
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bloom_contains"
}
