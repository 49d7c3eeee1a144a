package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a Z-order (Morton) key over 2–6
  * columns: each value maps to unsigned-order-preserving 64-bit "key
  * bits" (the same order spaces the chunk stride indexes use —
  * sign-flipped longs, IEEE sortable bits, 8-byte string prefixes),
  * rescales into the full 64-bit domain via per-column [lo, hi] bounds,
  * and the rescaled keys' bits interleave MSB-first into one
  * signed-comparable long. Sorting by the key clusters rows along EVERY
  * participating dimension at once, so chunk min/max ranges become
  * selective for predicates on any of the columns — the multi-column
  * clustering story (Delta's OPTIMIZE ZORDER) where a lexicographic sort
  * only ever serves its leading column.
  *
  * The bounds are what make the key WORK on real data: without them a
  * column of ids in [0, 10^6) varies only in bits the 64/n-bit-per-column
  * interleave never samples, and the key degenerates to a constant. The
  * write path (`zorderColumns`) samples bounds automatically; the bare
  * SQL function `zorder_key(...)` uses full-range bounds and is only
  * meaningful for values pre-scaled across the whole domain. Values
  * outside the bounds clamp to the ends — clustering degrades gracefully
  * at the tails, correctness never depends on it (pruning always uses
  * the real chunk statistics).
  *
  * Granularity caveat: long/int/date/timestamp/decimal dimensions
  * rescale LINEARLY and cluster at full bit resolution. Double/float
  * dimensions live in IEEE bit space, which is log-scaled — linear
  * values collapse into exponent-band slivers, so a zero-spanning double
  * clusters at roughly sign + exponent granularity (rank/histogram
  * z-values would fix this at the cost of a second pass). Prefer integer
  * or fixed-point dimensions when the column is a candidate key.
  *
  * Null sorts first (key bits 0). The key is for CLUSTERING only: it is
  * not a lexicographic order of the inputs, so the writer never
  * advertises it through the sort claim / SupportsReportOrdering.
  */
case class ZOrderKey(children: Seq[Expression], bounds: Seq[(Long, Long)])
    extends Expression with Serializable {

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2 || children.size > 6)
      TypeCheckResult.TypeCheckFailure(s"zorder_key takes 2 to 6 columns, got ${children.size}")
    else if (bounds.size != children.size)
      TypeCheckResult.TypeCheckFailure(s"${bounds.size} bounds for ${children.size} columns")
    else children.map(_.dataType).find(dt => !ZOrderKey.supported(dt)) match {
      case Some(dt) => TypeCheckResult.TypeCheckFailure(s"zorder_key cannot order $dt")
      case None     => TypeCheckResult.TypeCheckSuccess
    }

  // span MSB-alignment shift per column, from the bounds
  private lazy val shifts: Array[Int] =
    bounds.map { case (lo, hi) => java.lang.Long.numberOfLeadingZeros(hi - lo) }.toArray

  override def eval(input: InternalRow): Any = {
    val n = children.size
    val keys = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      val u = if (v == null) 0L else ZOrderKey.bitsOf(v, children(i).dataType)
      keys(i) = ZOrderKey.rescale(u, bounds(i)._1, bounds(i)._2, shifts(i))
      i += 1
    }
    java.lang.Long.valueOf(ZOrderKey.interleave(keys))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val arr = ctx.freshName("zkeys")
    val evals = children.map(_.genCode(ctx))
    // Long.MinValue is not a writable Java literal (JLS 3.10.1) and shows
    // up constantly here (key bits of value 0 are exactly MIN_VALUE)
    def jlit(l: Long): String =
      if (l == Long.MinValue) "java.lang.Long.MIN_VALUE" else s"${l}L"
    val fill = children.zipWithIndex.map { case (c, i) =>
      val e = evals(i)
      val (lo, hi) = bounds(i)
      s"""${e.code}
$arr[$i] = graft.plans.ZOrderKey.rescale(
  ${e.isNull} ? 0L : ${ZOrderKey.bitsCode(c.dataType, e.value.toString)},
  ${jlit(lo)}, ${jlit(hi)}, ${shifts(i)});"""
    }.mkString("\n")
    val decl = s"long[] $arr = new long[${children.size}];"
    ev.copy(
      code = code"""
$decl
$fill
long ${ev.value} = graft.plans.ZOrderKey.interleave($arr);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(children = cs)
  override def prettyName: String = "zorder_key"
}

object ZOrderKey {

  /** Full 64-bit range: rescale is the identity. */
  def fullRange(n: Int): Seq[(Long, Long)] = Seq.fill(n)((0L, -1L))

  private[plans] def supported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DateType |
         TimestampType | TimestampNTZType | DoubleType | FloatType |
         StringType | BooleanType => true
    case d: DecimalType => d.precision <= 18
    case _ => false
  }

  /** Unsigned-order-preserving 64-bit key bits per type — INTERNAL
    * (Catalyst) values; codegen emits the same mappings via bitsCode.
    */
  private[plans] def bitsOf(v: Any, dt: DataType): Long = dt match {
    case LongType | TimestampType | TimestampNTZType => v.asInstanceOf[Long] ^ Long.MinValue
    case IntegerType | DateType => v.asInstanceOf[Int].toLong ^ Long.MinValue
    case ShortType              => v.asInstanceOf[Short].toLong ^ Long.MinValue
    case ByteType               => v.asInstanceOf[Byte].toLong ^ Long.MinValue
    case BooleanType            => if (v.asInstanceOf[Boolean]) 1L else 0L
    case DoubleType             => bitsDouble(v.asInstanceOf[Double])
    case FloatType              => bitsFloat(v.asInstanceOf[Float])
    case StringType             => bitsString(v.asInstanceOf[UTF8String])
    case _: DecimalType =>
      v.asInstanceOf[org.apache.spark.sql.types.Decimal].toUnscaledLong ^ Long.MinValue
    case other => throw new IllegalStateException(s"zorder_key: $other")
  }

  /** Java snippet computing the same mapping for codegen. */
  private[plans] def bitsCode(dt: DataType, v: String): String = dt match {
    case LongType | TimestampType | TimestampNTZType => s"($v ^ java.lang.Long.MIN_VALUE)"
    case IntegerType | DateType | ShortType | ByteType =>
      s"(((long) $v) ^ java.lang.Long.MIN_VALUE)"
    case BooleanType    => s"($v ? 1L : 0L)"
    case DoubleType     => s"graft.plans.ZOrderKey.bitsDouble($v)"
    case FloatType      => s"graft.plans.ZOrderKey.bitsFloat($v)"
    case StringType     => s"graft.plans.ZOrderKey.bitsString($v)"
    case _: DecimalType => s"($v.toUnscaledLong() ^ java.lang.Long.MIN_VALUE)"
    case other          => throw new IllegalStateException(s"zorder_key: $other")
  }

  /** The same mapping for EXTERNAL (driver/Row) values — what the
    * bounds-sampling agg returns.
    */
  def bitsOfExternal(v: Any, dt: DataType): Long = (v, dt) match {
    case (s: String, StringType) => bitsString(UTF8String.fromString(s))
    case (t: java.sql.Timestamp, _) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t) ^ Long.MinValue
    case (i: java.time.Instant, _) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(i) ^ Long.MinValue
    case (d: java.sql.Date, _) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d).toLong ^ Long.MinValue
    case (d: java.time.LocalDate, _) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateToDays(d).toLong ^ Long.MinValue
    case (t: java.time.LocalDateTime, _) =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateTimeToMicros(t) ^ Long.MinValue
    case (b: java.math.BigDecimal, dec: DecimalType) =>
      b.movePointRight(dec.scale).longValueExact() ^ Long.MinValue
    case (b: scala.math.BigDecimal, dec: DecimalType) =>
      b.underlying().movePointRight(dec.scale).longValueExact() ^ Long.MinValue
    case _ => bitsOf(v, dt) // primitives box identically
  }

  /** IEEE total-order bits (NaN above +Inf). The flip-sign-bit-or-all
    * transform is UNSIGNED-comparable as it stands: -inf..-0 map to
    * 0x0000..7FFF and +0..+inf/NaN to 0x8000..FFFF (an extra ^MIN here
    * would put negatives above positives — caught in review, exercised
    * by the negative-range spec case).
    */
  def bitsDouble(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    b ^ ((b >> 63) | Long.MinValue)
  }

  def bitsFloat(f: Float): Long = {
    val b = java.lang.Float.floatToIntBits(f)
    val s = b ^ ((b >> 31) | Int.MinValue) // unsigned-int-comparable
    (s.toLong & 0xffffffffL) << 32 // zero-extend, widen to the key's top bits
  }

  /** First 8 UTF-8 bytes, big-endian, unsigned byte order. */
  def bitsString(s: UTF8String): Long = {
    val b = s.getBytes
    var k = 0L
    var i = 0
    while (i < 8) {
      k = (k << 8) | (if (i < b.length) (b(i) & 0xffL) else 0L)
      i += 1
    }
    k
  }

  /** Clamp `u` into unsigned [lo, hi] and shift the span onto the MSBs,
    * so the interleave's 64/n-bit-per-column sampling sees the bits that
    * actually vary. shift = numberOfLeadingZeros(hi - lo); the full-range
    * bound (0, -1) makes this the identity.
    */
  def rescale(u: Long, lo: Long, hi: Long, shift: Int): Long =
    if (java.lang.Long.compareUnsigned(u, lo) <= 0) 0L
    else if (java.lang.Long.compareUnsigned(u, hi) >= 0) (hi - lo) << shift
    else (u - lo) << shift

  /** MSB-first round-robin bit interleave of unsigned-order keys → one
    * signed-comparable long (top bit flipped at the end so a plain
    * ORDER BY walks the Z-curve).
    */
  def interleave(u: Array[Long]): Long = {
    val n = u.length
    var z = 0L
    var p = 0
    while (p < 64) {
      val bit = (u(p % n) >>> (63 - p / n)) & 1L
      z |= bit << (63 - p)
      p += 1
    }
    z ^ Long.MinValue
  }

  /** Column-level entry point with explicit bounds in key-bit space
    * (see bitsOfExternal to derive them from values).
    */
  def withBounds(bounds: Seq[(Long, Long)], cols: Column*): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(ZOrderKey(cols.map(Bridge.expression), bounds))
  }

  /** Column-level entry point, full-range bounds (pre-scaled inputs). */
  def apply(cols: Column*): Column = withBounds(fullRange(cols.size), cols: _*)
}
