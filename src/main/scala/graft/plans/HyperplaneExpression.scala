package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression for the random-hyperplane LSH bucket id of
  * an ARRAY<FLOAT> embedding: one fused loop computing all `planes`
  * projections per row. Bit-for-bit the same buckets as the composable
  * formulation in Similarity.hyperplaneBucketHof (weight for (plane p,
  * dim d) = pmod(xxhash64(d, p), 2000001)/1e6 - 1 with xxhash64's
  * int-chaining semantics), which Catalyst evaluates through interpreted
  * higher-order lambdas — `planes` separate aggregate() walks per row.
  * Here: one pass over the vector, `planes` running sums.
  */
case class HyperplaneBucket(child: Expression, planes: Int, table: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_bucket expects array<float>, got $dt")
    }

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(
      HyperplaneBucket.compute(v.asInstanceOf[ArrayData], planes, table))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HyperplaneBucket.compute($c, $planes, $table);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "hyperplane_bucket"
}

object HyperplaneBucket {

  /** w(plane, d) replicating xxhash64(d, lit(plane)) exactly: Spark's
    * XxHash64 chains children left-to-right from seed 42 with the
    * int-width hash for IntegerType inputs.
    */
  private def rawWeight(planeId: Int, d: Int): Double = {
    val h = XXH64.hashInt(planeId, XXH64.hashInt(d, 42L))
    java.lang.Math.floorMod(h, 2000001L).toDouble / 1000000.0 - 1.0
  }

  /** Per-plane weight vectors are pure functions of (planeId, dim) —
    * cache them per executor instead of rehashing per row.
    */
  private val weightCache = new java.util.concurrent.ConcurrentHashMap[Integer, Array[Double]]()

  private def weights(planeId: Int, dims: Int): Array[Double] = {
    val cached = weightCache.get(planeId)
    if (cached != null && cached.length >= dims) return cached
    val w = new Array[Double](math.max(dims, 64))
    var d = 0
    while (d < w.length) { w(d) = rawWeight(planeId, d); d += 1 }
    weightCache.put(planeId, w)
    w
  }

  def compute(vec: ArrayData, planes: Int, table: Int): Long = {
    val n = vec.numElements()
    var bits = 0L
    var p = 0
    while (p < planes) {
      val w = weights(table * planes + p, n)
      var s = 0.0
      var d = 0
      while (d < n) { s += vec.getFloat(d) * w(d); d += 1 }
      if (s >= 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  /** Column-level entry point. */
  def apply(vec: Column, planes: Int, table: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(HyperplaneBucket(Bridge.expression(vec), planes, table))
  }
}
