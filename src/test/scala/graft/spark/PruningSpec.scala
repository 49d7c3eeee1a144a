package graft.spark

import graft.columns.Codecs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Stats-driven chunk pruning + per-column stats correctness. */
class PruningSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("decodePruned skips non-overlapping chunks and returns exact rows") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val clustered = li.repartitionByRange(4, col("l_orderkey")).sortWithinPartitions("l_orderkey")
    val specs = TableEncoder.columnSpecs(li.schema, Map.empty)
    val chunks = TableEncoder.encode(TableEncoder.shred(clustered, specs), specs, strideRows = 500)
      .persist()

    val totalChunkGroups = chunks.filter(col("column") === "l_orderkey").count()
    assert(totalChunkGroups > 4, "need multiple chunks for the pruning test to be meaningful")

    val lo = 500L; val hi = 700L
    val decoded = TableEncoder.unshred(
      TableEncoder.decodePruned(chunks, specs, "l_orderkey", lo, hi), specs)
    // pruned decode returns a superset restricted to overlapping chunks
    val exact = decoded.filter(col("l_orderkey").between(lo, hi))
    val expected = li.filter(col("l_orderkey").between(lo, hi))
    assert(exact.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(exact).count() == 0)

    // and it must actually have pruned: decoded rows < total rows
    assert(decoded.count() < li.count(), "pruning removed nothing")
    chunks.unpersist()
  }

  test("byte columns route through ByteRLE and carry sum stats") {
    val df = spark.range(0, 3000)
      .select(col("id"), (col("id") % 100).cast("byte").as("b"))
    val specs = TableEncoder.columnSpecs(df.schema, Map.empty)
    val chunks = TableEncoder.encode(TableEncoder.shred(df, specs), specs)
    val byCol = chunks.collect().groupBy(_.column)
    assert(byCol("b").forall(_.codec == Codecs.ByteRleC))
    val idSum = byCol("id").flatMap(_.sum_val).sum
    assert(idSum == (0L until 3000L).sum, s"sum stat wrong: $idSum")
    // decode restores byte values
    val decoded = TableEncoder.unshred(TableEncoder.decode(chunks, specs), specs)
    assert(decoded.exceptAll(df).count() == 0)
    assert(df.exceptAll(decoded).count() == 0)
  }
}
