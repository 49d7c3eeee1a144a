package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Rewrite-with-sort: the sortColumns write option clusters rows within
  * each encode partition, which (a) makes chunk min/max ranges
  * near-disjoint so point/range pruning skips most chunks, and (b) is
  * reported back to Catalyst as a per-partition ordering
  * (SupportsReportOrdering) guarded by a dir-wide claim that appends
  * under a different sort conservatively drop.
  */
class SortedWriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val tmp = Files.createTempDirectory("graft-sorted").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-sorted-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** ids in adversarially shuffled order (reversed bit pattern) so an
    * unsorted write gets full-width chunk ranges.
    */
  private def shuffled(n: Long): DataFrame =
    spark.range(n).select(
      (col("id") * 2654435761L % n).as("id"),
      concat(lit("txt"), col("id")).as("s"))

  private def scanOrdering(df: DataFrame): Seq[_] = {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.outputOrdering
    }.head
  }

  test("sortColumns write: per-partition sorted data, ordering reported, pruning sharpened") {
    val sortedOut = s"$tmp/sorted"
    val plainOut = s"$tmp/plain"
    val df = shuffled(20000)
    df.write.format("graft").mode("overwrite")
      .option("numPartitions", "2").option("chunkTargetBytes", "32768")
      .option("sortColumns", "id").save(sortedOut)
    df.write.format("graft").mode("overwrite")
      .option("numPartitions", "2").option("chunkTargetBytes", "32768").save(plainOut)
    assert(EncodeJob.sortColumnsFromDisk(spark, sortedOut) == Seq("id"))
    assert(EncodeJob.sortColumnsFromDisk(spark, plainOut).isEmpty)

    // rows come back sorted within every scan partition
    val src = spark.read.format("graft").load(sortedOut)
    val unsortedParts = src.select("id").rdd.mapPartitions { it =>
      var prev = Long.MinValue; var bad = 0
      it.foreach { r => val v = r.getLong(0); if (v < prev) bad += 1; prev = v }
      Iterator.single(bad)
    }.collect().sum
    assert(unsortedParts == 0, s"$unsortedParts out-of-order rows")
    // same rows as the unsorted write
    assert(src.count() == 20000 && src.select("id").distinct().count() == 20000)

    // the claim reaches Catalyst as a scan output ordering
    assert(scanOrdering(src.select("id", "s")).nonEmpty, "ordering not reported")
    // a two-column claim degrades to its in-schema PREFIX, never to a lie
    val twoOut = s"$tmp/two-col"
    df.withColumn("k", col("id") % 10).write.format("graft").mode("overwrite")
      .option("numPartitions", "2").option("sortColumns", "id,k").save(twoOut)
    val two = spark.read.format("graft").load(twoOut)
    assert(scanOrdering(two.select("id", "s")).size == 1, "prefix [id] should survive")
    assert(scanOrdering(two.select("k", "s")).isEmpty, "non-prefix column must not be claimed")
    // ...but never for columns outside the read schema or on time travel
    assert(scanOrdering(spark.read.format("graft").load(sortedOut).select("s")).isEmpty)
    assert(scanOrdering(spark.read.format("graft").option("asOfBatch", "0")
      .load(sortedOut).select("id")).isEmpty)

    // clustered chunks: a point lookup decompresses strictly less than on
    // the unsorted layout of the SAME data
    def lookupBytes(out: String): Long = {
      graft.core.BlockCompression.resetCounters()
      spark.read.format("graft").load(out).filter(col("id") === 12345L).collect()
      graft.core.BlockCompression.decompressInputBytes
    }
    val sortedBytes = lookupBytes(sortedOut)
    val plainBytes = lookupBytes(plainOut)
    assert(sortedBytes < plainBytes,
      s"sorted layout not pruning better: $sortedBytes vs $plainBytes")
  }

  test("appends under a different sort drop the claim; full compact restores it") {
    val out = s"$tmp/claims"
    shuffled(2000).write.format("graft").mode("overwrite")
      .option("numPartitions", "2").option("sortColumns", "id").save(out)
    assert(EncodeJob.sortColumnsFromDisk(spark, out) == Seq("id"))
    // same-sort append keeps the claim
    shuffled(2000).select(col("id") + 2000 as "id", col("s"))
      .write.format("graft").mode("append")
      .option("numPartitions", "2").option("sortColumns", "id").save(out)
    assert(EncodeJob.sortColumnsFromDisk(spark, out) == Seq("id"))
    // unsorted append drops it — the dir can no longer promise an order
    shuffled(100).select(col("id") + 4000 as "id", col("s"))
      .write.format("graft").mode("append").option("numPartitions", "2").save(out)
    assert(EncodeJob.sortColumnsFromDisk(spark, out).isEmpty)
    assert(scanOrdering(spark.read.format("graft").load(out).select("id")).isEmpty)
    // rewrite-with-sort: a full compact under sortColumns makes the claim
    // true again (the compacted batch is the only visible one)
    EncodeJob.compact(spark, out, targetPartitions = 2, sortColumns = Seq("id"))
    assert(EncodeJob.sortColumnsFromDisk(spark, out) == Seq("id"))
    assert(scanOrdering(spark.read.format("graft").load(out).select("id")).nonEmpty)
    assert(spark.read.format("graft").load(out).count() == 4100)
  }
}
