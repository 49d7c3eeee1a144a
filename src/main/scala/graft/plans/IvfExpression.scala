package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression for the IVF coarse-quantizer cell of an
  * ARRAY<FLOAT> embedding: argmax over dot products against the broadcast
  * centroid matrix, one fused loop, inside WholeStageCodegen. Replaces the
  * per-row Scala UDF on ivfTopK's corpus side (the widest map in the
  * query), which boxed every embedding into a scala Seq.
  *
  * The centroids ride a Broadcast handle — shipped to each executor once,
  * referenced from generated code via the plan's reference array — so the
  * expression itself stays a few bytes in the serialized plan.
  *
  * Equivalent to Similarity.nearestCell(centroids, unit(v)): centroids are
  * unit-normalized at training, so argmax_c dot(v, c) == argmax_c
  * dot(v/||v||, c) for every ||v|| > 0, and the ||v|| == 0 row scores 0
  * against every centroid on both paths. Ties break to the lowest index,
  * matching nearestCell.
  */
case class IvfCell(child: Expression, centroids: Broadcast[Array[Array[Float]]])
    extends UnaryExpression with Serializable {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ivf_cell expects array<float>, got $dt")
    }

  override def nullSafeEval(v: Any): Any =
    Integer.valueOf(IvfCell.compute(v.asInstanceOf[ArrayData], centroids.value))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("ivfCentroids", centroids,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.IvfCell.compute($c, (float[][]) $bc.value());")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "ivf_cell"
}

object IvfCell {

  def compute(vec: ArrayData, centroids: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      // ragged dims: dot over the overlap only, like Similarity.dotF
      val n = math.min(vec.numElements(), cen.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += vec.getFloat(i).toDouble * cen(i); i += 1 }
      if (s > bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  /** Column-level entry point. */
  def apply(vec: Column, centroids: Broadcast[Array[Array[Float]]]): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(IvfCell(Bridge.expression(vec), centroids))
  }
}
