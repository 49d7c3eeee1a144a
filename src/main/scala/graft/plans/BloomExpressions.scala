package graft.plans

import graft.core.Bloom
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface for the chunk-level bloom filter: `bloom_agg(value)`
  * builds a serialized filter per group (string/binary/integer inputs),
  * `bloom_contains(bloom, value)` probes one. The same build/probe hash
  * path as the encode-side chunk blooms, so SQL users can pre-compute
  * membership sketches over arbitrary groupings (per partition, per day,
  * per host) and probe them without touching the engine API.
  */
case class BloomAgg(child: Expression,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Bloom.Builder] {

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

  override def createAggregationBuffer(): Bloom.Builder = new Bloom.Builder

  override def update(b: Bloom.Builder, input: InternalRow): Bloom.Builder = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case BinaryType => b.addBytes(v.asInstanceOf[Array[Byte]])
      case StringType => b.addBytes(v.asInstanceOf[UTF8String].getBytes)
      case LongType   => b.addLong(v.asInstanceOf[Long])
      case IntegerType => b.addLong(v.asInstanceOf[Int].toLong)
      case other      => throw new IllegalStateException(other.toString)
    }
    b
  }

  override def merge(a: Bloom.Builder, b: Bloom.Builder): Bloom.Builder = {
    a.mergeFrom(b)
    a
  }

  override def eval(b: Bloom.Builder): Any = Bloom.serialize(b.build())

  override def serialize(b: Bloom.Builder): Array[Byte] = {
    val hs = b.hashPairs
    val bb = java.nio.ByteBuffer.allocate(4 + hs.length * 8)
    bb.putInt(hs.length)
    hs.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Bloom.Builder = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val b = new Bloom.Builder
    var i = 0
    while (i < n) { b.addPair(bb.getLong(), bb.getLong()); i += 2 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomAgg =
    copy(child = c(0))
  override def prettyName: String = "bloom_agg"
}

/** bloom_contains(bloomBytes, value) — true when the filter might contain
  * the value (definite-no is exact; yes has the build-time fpp). The last
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
    if (!(blob eq lastBlob)) {
      lastBloom = Bloom.deserialize(blob)
      lastBlob = blob
    }
    val (h1, h2) = right.dataType match {
      case BinaryType => Bloom.hashPair(v.asInstanceOf[Array[Byte]])
      case StringType => Bloom.hashPair(v.asInstanceOf[UTF8String].getBytes)
      case LongType   => Bloom.hashPairLong(v.asInstanceOf[Long])
      case IntegerType => Bloom.hashPairLong(v.asInstanceOf[Int].toLong)
      case other      => throw new IllegalStateException(other.toString)
    }
    java.lang.Boolean.valueOf(lastBloom.mightContain(h1, h2))
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bloom_contains"
}
