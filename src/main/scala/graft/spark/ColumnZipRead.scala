package graft.spark

import org.apache.spark.{NarrowDependency, Partition, TaskContext}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.reflect.ClassTag

/** Zero-shuffle full (and multi-column) reads on the COLUMN-PARTITIONED
  * chunk layout.
  *
  * `partitionByColumn = true` buys scan-level IO pruning for narrow
  * projections, but it breaks the colocated read's invariant (a file no
  * longer holds whole chunk GROUPS — it holds one column's chunks), so
  * full-table reads used to fall back to the shuffled decode. At 100 TB
  * that fallback re-moves every stream blob over the network once. This
  * path recovers the no-Exchange plan:
  *
  *  1. one pinned one-file-per-partition scan PER COLUMN (the `column=`
  *     partition filter prunes every other column's files at the scan);
  *  2. a metadata-only probe (part_id per file, blobs never read) checks
  *     the writer's layout invariant — each file holds exactly one encode
  *     task's chunks for one column — and derives, per column, the
  *     permutation onto a common part_id order;
  *  3. partitions are REORDERED with a narrow dependency (no shuffle) and
  *     the k column RDDs are zip-merged element-wise: files of the same
  *     encode task list the same chunk_ids in the same order, so row i of
  *     each aligned file is the same chunk's column row;
  *  4. assembled groups decode with the shared UnsafeRow group decoder.
  *
  * Every zip step revalidates (part_id, chunk_id) equality at runtime, so
  * a violated assumption throws rather than mis-assembling rows. When the
  * probe itself fails (externally compacted/rotated files, duplicated
  * part_ids), [[readBackColumnZipped]] returns None and the caller falls
  * back to the always-correct shuffled decode.
  */
object ColumnZipRead {

  /** Narrow-dependency partition reorder: output partition j computes
    * parent partition perm(j). No serialization, no exchange.
    */
  private final class ReorderedPartition(val index: Int) extends Partition

  private final class ReorderedRDD[T: ClassTag](parent: RDD[T], perm: Array[Int])
      extends RDD[T](parent.sparkContext,
        Seq(new NarrowDependency[T](parent) {
          def getParents(pid: Int): Seq[Int] = Seq(perm(pid))
        })) {
    override def getPartitions: Array[Partition] =
      Array.tabulate(perm.length)(new ReorderedPartition(_))
    override def compute(split: Partition, ctx: TaskContext): Iterator[T] =
      parent.iterator(parent.partitions(perm(split.index)), ctx)
    override protected def getPreferredLocations(split: Partition): Seq[String] =
      parent.preferredLocations(parent.partitions(perm(split.index)))
  }

  /** Element-wise zip of two aligned iterators with hard length check. */
  private def zipStrict[A, B, C](a: Iterator[A], b: Iterator[B])(f: (A, B) => C): Iterator[C] =
    new Iterator[C] {
      def hasNext: Boolean = {
        val ha = a.hasNext
        require(ha == b.hasNext, "column files misaligned: different chunk counts")
        ha
      }
      def next(): C = f(a.next(), b.next())
    }

  /** The zipped read, or None when the layout probe says the per-column
    * file sets don't satisfy the writer's invariant.
    */
  def readBackColumnZipped(spark: SparkSession, outDir: String, specs: Array[ColumnSpec],
                           chunksOf: String => RDD[EncodedChunk],
                           keysOf: String => Array[Long]): Option[DataFrame] = {
    // ---- alignment probe: per column, partition index -> part_id ----
    val keys: Array[Array[Long]] = specs.map(s => keysOf(s.name))
    val n = keys.head.length
    if (n == 0) return None
    if (keys.exists(k => k.length != n || k.exists(_ < 0) || k.distinct.length != n))
      return None // empty files, rotated files (duplicate part_id), or count skew
    val targetOrder = keys.head
    if (keys.exists(k => k.sorted.toSeq != targetOrder.sorted.toSeq))
      return None // different part_id sets per column

    // ---- per-column scans, reordered onto the common part_id order ----
    val aligned: Array[RDD[EncodedChunk]] = specs.indices.toArray.map { c =>
      val idx = keys(c).zipWithIndex.toMap
      val perm = targetOrder.map(idx)
      val rdd = chunksOf(specs(c).name)
      if (perm.indices.forall(j => perm(j) == j)) rdd
      else new ReorderedRDD(rdd, perm)
    }

    // ---- k-way element-wise zip into whole chunk groups ----
    val k = specs.length
    var acc: RDD[Array[EncodedChunk]] = aligned(0).map { c =>
      val g = new Array[EncodedChunk](k)
      g(0) = c
      g
    }
    var c = 1
    while (c < k) {
      val ci = c // stable capture for the closure
      acc = acc.zipPartitions(aligned(ci), preservesPartitioning = true) { (ga, cb) =>
        zipStrict(ga, cb) { (g, chunk) =>
          require(g(0).part_id == chunk.part_id && g(0).chunk_id == chunk.chunk_id,
            s"column files misaligned: group (${g(0).part_id},${g(0).chunk_id}) " +
              s"vs ${chunk.column} chunk (${chunk.part_id},${chunk.chunk_id})")
          g(ci) = chunk
          g
        }
      }
      c += 1
    }
    Some(TableEncoder.unshred(TableEncoder.decodeGroups(spark, acc, specs), specs))
  }
}
