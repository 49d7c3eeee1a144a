package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k heap per group: keeps the k (score, id) pairs with the
  * highest score (ties broken by lowest id), as a TypedImperativeAggregate
  * so Spark runs it with a MAP-SIDE PARTIAL step — each partition reduces
  * to at most k entries per group BEFORE the exchange. The window
  * row_number() formulation this replaces shuffled and fully sorted every
  * scored row per query (|corpus|×|queries| rows through one sort); here
  * the exchange carries ≤ k×partitions rows per group and nothing is ever
  * globally sorted. The reference has no ANN operator — this is north-rule
  * pipeline scope built Spark-native (custom Catalyst aggregate beats a
  * UDAF beats collect-and-sort).
  *
  * Result: array<struct<score:double, id:bigint>> sorted by (score desc,
  * id asc).
  */
case class TopKAggregate(scoreExpr: Expression, idExpr: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKAggregate.Heap] {

  require(k > 0, "top-k needs k > 0")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKAggregate.ResultType

  override def createAggregationBuffer(): TopKAggregate.Heap = new TopKAggregate.Heap(k)

  override def update(heap: TopKAggregate.Heap, input: InternalRow): TopKAggregate.Heap = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      heap.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    heap
  }

  override def merge(a: TopKAggregate.Heap, b: TopKAggregate.Heap): TopKAggregate.Heap = {
    b.foreach(a.offer)
    a
  }

  override def eval(heap: TopKAggregate.Heap): Any = {
    val sorted = heap.sortedDesc
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(heap: TopKAggregate.Heap): Array[Byte] = heap.toBytes
  override def deserialize(bytes: Array[Byte]): TopKAggregate.Heap = TopKAggregate.Heap.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKAggregate = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAggregate = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKAggregate =
    copy(scoreExpr = c(0), idExpr = c(1))
  override def prettyName: String = "topk_by_score"
}

object TopKAggregate {
  val ResultType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  /** Min-heap of (score, id) with "worst" = lowest score / highest id at
    * the root, bounded at k entries. Plain arrays, no boxing.
    */
  final class Heap(val k: Int) {
    private var scores = new Array[Double](math.min(k, 64))
    private var ids = new Array[Long](math.min(k, 64))
    private var n = 0

    // a is WORSE than b (evicted first): lower score, or equal score and higher id
    @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
      sa < sb || (sa == sb && ia > ib)

    private def ensure(): Unit = if (n == scores.length && n < k) {
      val cap = math.min(k, scores.length * 2)
      scores = java.util.Arrays.copyOf(scores, cap)
      ids = java.util.Arrays.copyOf(ids, cap)
    }

    def offer(s: Double, i: Long): Unit = {
      if (n < k) {
        ensure()
        scores(n) = s; ids(n) = i; n += 1
        siftUp(n - 1)
      } else if (worse(scores(0), ids(0), s, i)) { // beats the current worst
        scores(0) = s; ids(0) = i
        siftDown(0)
      }
    }

    private def siftUp(start: Int): Unit = {
      var c = start
      while (c > 0) {
        val p = (c - 1) >> 1
        if (worse(scores(c), ids(c), scores(p), ids(p))) {
          swap(c, p); c = p
        } else return
      }
    }

    private def siftDown(start: Int): Unit = {
      var p = start
      while (true) {
        val l = 2 * p + 1
        val r = l + 1
        var w = p // worst of the triple stays at the root
        if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == p) return
        swap(p, w); p = w
      }
    }

    @inline private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(scores(i), ids(i)); i += 1 }
    }

    def sortedDesc: Array[(Double, Long)] = {
      val out = Array.tabulate(n)(i => (scores(i), ids(i)))
      scala.util.Sorting.stableSort(out,
        (a: (Double, Long), b: (Double, Long)) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
      out
    }

    def toBytes: Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + n * 16)
      bb.putInt(k); bb.putInt(n)
      var i = 0
      while (i < n) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
      bb.array()
    }
  }

  object Heap {
    def fromBytes(bytes: Array[Byte]): Heap = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val h = new Heap(bb.getInt())
      val n = bb.getInt()
      var i = 0
      while (i < n) { h.offer(bb.getDouble(), bb.getLong()); i += 1 }
      h
    }
  }
}
