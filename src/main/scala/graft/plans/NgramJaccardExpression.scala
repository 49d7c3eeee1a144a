package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fused expression for word-k-gram Jaccard similarity of two
  * STRING columns: one pass building both shingle hash-sets, one
  * intersection count — inside WholeStageCodegen.
  *
  * Replaces the composable HOF formulation (split → transform → slice →
  * concat_ws → array_distinct → array_intersect/union), which Catalyst
  * evaluates through interpreted lambda chains at ~4 ms per call on
  * web-page-sized texts — and SUBSTITUTES into both a join condition and
  * the output projection when used as a verification predicate (the
  * round-4 q_minhash regression). Semantics match the HOF version
  * exactly — same trim/lower/split building blocks (UTF8String ops, the
  * ones the built-in expressions call), same i + k <= n shingle window,
  * same |∩| / |∪| with the empty-union → 0.0 convention — so the DuckDB
  * oracle for q_ngram_jaccard is unchanged.
  */
case class NgramJaccard(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with Serializable {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_jaccard expects (string, string), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(NgramJaccard.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.NgramJaccard.compute($a, $b, $k);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "ngram_jaccard"
}

object NgramJaccard {

  private val SpacePattern = java.util.regex.Pattern.compile("\\s+")

  /** Distinct k-shingle set of `text` (trim → lower → split on \s+ → all
    * windows of k consecutive tokens joined by one space), mirroring
    * Dedup.shingles' HOF construction token for token.
    */
  def shingleSet(text: UTF8String, k: Int): java.util.HashSet[String] = {
    // same building blocks the built-in expressions use: UTF8String.trim /
    // toLowerCase, then the \s+ split (Java regex, limit -1 — identical
    // token list to StringSplit, including the [""] result on empty input)
    val t = text.trim().toLowerCase.toString
    val tokens = SpacePattern.split(t, -1)
    val n = tokens.length
    val out = new java.util.HashSet[String]()
    // HOF window: i in [0, max(n - k, 0)] with the i + k <= n guard
    val last = math.max(n - k, 0)
    var i = 0
    while (i <= last) {
      if (i + k <= n) {
        val sb = new java.lang.StringBuilder(tokens(i))
        var j = 1
        while (j < k) { sb.append(' ').append(tokens(i + j)); j += 1 }
        out.add(sb.toString)
      }
      i += 1
    }
    out
  }

  def compute(a: UTF8String, b: UTF8String, k: Int): Double = {
    val sa = shingleSet(a, k)
    val sb = shingleSet(b, k)
    val (small, large) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
    var inter = 0
    val it = small.iterator()
    while (it.hasNext) if (large.contains(it.next())) inter += 1
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Column-level entry point. */
  def apply(a: Column, b: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(NgramJaccard(Bridge.expression(a), Bridge.expression(b), k))
  }
}
