package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two
  * ARRAY<FLOAT> columns.
  *
  * The composable alternative (zip_with + aggregate) builds per-row lambda
  * closures that Catalyst cannot fuse into whole-stage codegen; this
  * expression is a single tight loop over the two ArrayData buffers with a
  * codegen body, so a brute-force top-k scan stays inside
  * WholeStageCodegen. Used by graft.functions.Similarity.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity expects array<float>, got ${left.dataType} and ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    java.lang.Double.valueOf(CosineSimilarity.compute(x, y))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.CosineSimilarity.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_similarity"
}

object CosineSimilarity {
  /** Shared kernel for both interpreted eval and generated code. */
  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val a = x.getFloat(i).toDouble
      val b = y.getFloat(i).toDouble
      dot += a * b
      nx += a * a
      ny += b * b
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
  }
}

/** ARRAY<FLOAT> → raw IEEE-754 little-endian bytes (4 per element) —
  * the shred side of graft's float-vector column support: the encoded
  * payload rides the existing binary codec (DATA + LENGTH streams,
  * PRESENT for row nulls), so embeddings are first-class in graft
  * tables. Codegen'd: the conversion fuses into the shred projection.
  * Null ELEMENTS are rejected loudly (the payload has no slot for them;
  * row-level nulls are fine and ride PRESENT). The reference descopes
  * List types entirely (StripeWriter.cs:321 throws) — this is the
  * LLM-pipeline extension, not parity.
  */
case class FloatVecToBytes(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with Serializable {

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"float_vec_to_bytes expects array<float>, got $dt")
    }

  override def nullSafeEval(v: Any): Any =
    FloatVecToBytes.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.FloatVecToBytes.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "float_vec_to_bytes"
}

object FloatVecToBytes {
  def compute(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n * 4)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          "graft float-vector columns cannot hold null ELEMENTS (row-level " +
            "nulls are supported); clean the array or store it as separate columns")
      val bits = java.lang.Float.floatToRawIntBits(a.getFloat(i))
      val o = i * 4
      out(o) = bits.toByte
      out(o + 1) = (bits >>> 8).toByte
      out(o + 2) = (bits >>> 16).toByte
      out(o + 3) = (bits >>> 24).toByte
      i += 1
    }
    out
  }

  def apply(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(FloatVecToBytes(Bridge.expression(c)))
  }
}

/** Inverse of [[FloatVecToBytes]]: IEEE-LE bytes → ARRAY<FLOAT> (unshred
  * side + the DSv2 reader's logical projection). Emits UnsafeArrayData
  * over a primitive float[] — no boxing on the decode hot path.
  */
case class BytesToFloatVec(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bytes_to_float_vec expects binary, got $dt")
    }

  override def nullSafeEval(v: Any): Any =
    BytesToFloatVec.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.plans.BytesToFloatVec.compute($b)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bytes_to_float_vec"
}

object BytesToFloatVec {
  def compute(b: Array[Byte]): ArrayData = {
    require(b.length % 4 == 0,
      s"float-vector payload length ${b.length} is not a multiple of 4 — corrupt column?")
    val n = b.length / 4
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val o = i * 4
      val bits = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
      out(i) = java.lang.Float.intBitsToFloat(bits)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  def apply(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(BytesToFloatVec(Bridge.expression(c)))
  }
}
