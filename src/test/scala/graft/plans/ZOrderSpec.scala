package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Z-order clustering: the zorder_key expression interleaves the
  * unsigned-order bits of 2-6 columns so one per-partition sort clusters
  * EVERY participating dimension — chunk min/max pruning then serves
  * predicates on any of them, where a lexicographic sort only ever
  * serves its leading column.
  */
class ZOrderSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val tmp = Files.createTempDirectory("graft-zorder").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-zorder-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("zorder_key: locality, type coverage, null handling, codegen = interpreted") {
    // 2-d grid: close points in (x, y) get close z keys — verify the
    // defining property: sorting by z groups each 4x4 tile contiguously
    val s2 = spark
    import s2.implicits._
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val b = (ZOrderKey.bitsOfExternal(0L, org.apache.spark.sql.types.LongType),
      ZOrderKey.bitsOfExternal(63L, org.apache.spark.sql.types.LongType))
    val keyed = grid.select(col("x"), col("y"),
      ZOrderKey.withBounds(Seq(b, b), col("x"), col("y")).as("z")).orderBy("z").collect()
    // consecutive rows in z order differ by a small step for exactly 7/8
    // of transitions on a perfect Morton curve (every odd step moves
    // within a 2x2 cell; half the even steps cross cells) — assert the
    // exact curve property with a little slack for the clamp ends
    val smallSteps = keyed.sliding(2).count { case Array(a, b) =>
      math.abs(a.getLong(0) - b.getLong(0)) + math.abs(a.getLong(1) - b.getLong(1)) <= 2
    }
    assert(smallSteps >= keyed.length * 7 / 8 - 8, s"$smallSteps of ${keyed.length}")

    // unsigned key order must hold across SIGN for floats/doubles — the
    // flip-sign-bit-or-all transform is already unsigned-comparable; an
    // extra ^MIN (the original bug) put negatives above positives and
    // degenerated any zero-spanning dimension to a 1-bit sign flag
    val ds = Seq(Double.NegativeInfinity, -40.0, -1.0, -0.0, 0.0, 1.0, 40.0,
      Double.PositiveInfinity, Double.NaN)
    assert(ds.map(ZOrderKey.bitsDouble).sliding(2).forall {
      case Seq(a, b) => java.lang.Long.compareUnsigned(a, b) < 0
    }, "bitsDouble not unsigned-ordered across signs")
    val fsq = Seq(Float.NegativeInfinity, -40.0f, -1.0f, -0.0f, 0.0f, 1.0f, 40.0f,
      Float.PositiveInfinity, Float.NaN)
    assert(fsq.map(ZOrderKey.bitsFloat).sliding(2).forall {
      case Seq(a, b) => java.lang.Long.compareUnsigned(a, b) < 0
    }, "bitsFloat not unsigned-ordered across signs")
    // end-to-end on a zero-spanning double dimension: IEEE bit space is
    // log-scaled, so linear doubles cluster coarsely (sign + exponent
    // granularity) — but with the sign bug every value clamps to one of
    // two points and the filter keeps ~everything. Gate at 3/4: the bug
    // measures ~100%, the fix ~50% here
    val signed = spark.range(24000).select(
      ((col("id") * 2654435761L % 400) - 200).cast("double").as("d"),
      (col("id") % 100).as("k"), concat(lit("p"), col("id")).as("s"))
    val sOut = s"$tmp/signed"
    signed.write.format("graft").mode("overwrite").option("numPartitions", "2")
      .option("chunkTargetBytes", "8192").option("zorderColumns", "d,k").save(sOut)
    graft.core.BlockCompression.resetCounters()
    spark.read.format("graft").load(sOut).filter(col("d") === -150.0).collect()
    val negBytes = graft.core.BlockCompression.decompressInputBytes
    graft.core.BlockCompression.resetCounters()
    spark.read.format("graft").load(sOut).collect()
    val allBytes = graft.core.BlockCompression.decompressInputBytes
    assert(negBytes * 4 < allBytes * 3, s"negative-range z pruning: $negBytes of $allBytes")
    // the same zero-spanning range as a LONG dimension rescales linearly
    // (no IEEE voids) and must prune hard
    val lOut = s"$tmp/signed-long"
    signed.select((col("d").cast("long")).as("d"), col("k"), col("s"))
      .write.format("graft").mode("overwrite").option("numPartitions", "2")
      .option("chunkTargetBytes", "8192").option("zorderColumns", "d,k").save(lOut)
    graft.core.BlockCompression.resetCounters()
    spark.read.format("graft").load(lOut).filter(col("d") === -150L).collect()
    val negL = graft.core.BlockCompression.decompressInputBytes
    graft.core.BlockCompression.resetCounters()
    spark.read.format("graft").load(lOut).collect()
    val allL = graft.core.BlockCompression.decompressInputBytes
    assert(negL * 2 < allL, s"negative-range LONG z pruning: $negL of $allL")

    // SQL surface + mixed types + nulls evaluate without error and agree
    // between codegen and interpreted paths
    val df = spark.range(1000).select(col("id"),
      (col("id") % 97).cast("double").as("d"),
      concat(lit("k"), col("id") % 13).as("s"),
      when(col("id") % 5 === 0, col("id")).as("n"))
    df.createOrReplaceTempView("zt")
    val viaSql = spark.sql("SELECT zorder_key(id, d, s, n) AS z FROM zt ORDER BY z")
      .collect().map(_.getLong(0))
    val interpreted = df.collect().map { r =>
      ZOrderKey.interleave(Array(
        ZOrderKey.bitsOf(r.getLong(0), org.apache.spark.sql.types.LongType),
        ZOrderKey.bitsOf(r.getDouble(1), org.apache.spark.sql.types.DoubleType),
        ZOrderKey.bitsOf(org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(2)),
          org.apache.spark.sql.types.StringType),
        if (r.isNullAt(3)) 0L
        else ZOrderKey.bitsOf(r.getLong(3), org.apache.spark.sql.types.LongType)))
    }.sorted
    assert(viaSql.toSeq == interpreted.toSeq)
  }

  test("zorderColumns write: predicates on EITHER dimension prune; 1-d sort only serves its leading column") {
    // two independent dimensions, adversarially shuffled input
    val df = spark.range(40000).select(
      (col("id") * 2654435761L % 200).as("a"),
      (col("id") * 40503L % 200).as("b"),
      concat(lit("pay"), col("id")).as("s"))
    val zOut = s"$tmp/z"
    val aOut = s"$tmp/a-sorted"
    df.write.format("graft").mode("overwrite").option("numPartitions", "2")
      .option("chunkTargetBytes", "32768").option("zorderColumns", "a,b").save(zOut)
    df.write.format("graft").mode("overwrite").option("numPartitions", "2")
      .option("chunkTargetBytes", "32768").option("sortColumns", "a").save(aOut)

    def bytes(out: String, filter: org.apache.spark.sql.Column): Long = {
      graft.core.BlockCompression.resetCounters()
      spark.read.format("graft").load(out).filter(filter).collect()
      graft.core.BlockCompression.decompressInputBytes
    }
    def fullBytes(out: String): Long = {
      graft.core.BlockCompression.resetCounters()
      spark.read.format("graft").load(out).collect()
      graft.core.BlockCompression.decompressInputBytes
    }
    // same rows from both layouts
    assert(spark.read.format("graft").load(zOut).count() == 40000)
    val zFull = fullBytes(zOut)
    val zA = bytes(zOut, col("a") === 7L)
    val zB = bytes(zOut, col("b") === 7L)
    val aA = bytes(aOut, col("a") === 7L)
    val aB = bytes(aOut, col("b") === 7L)
    val aFull = fullBytes(aOut)
    // z-order: BOTH dimensions prune well below a full decode
    assert(zA * 2 < zFull, s"z-layout a-filter: $zA of $zFull")
    assert(zB * 2 < zFull, s"z-layout b-filter: $zB of $zFull")
    // lexicographic: leading column prunes, trailing column cannot
    assert(aA * 2 < aFull, s"a-layout a-filter: $aA of $aFull")
    assert(zB < aB, s"z-layout must beat 1-d layout on the second dim: $zB vs $aB")
    // no ordering claim for z (it is not a lexicographic order)
    assert(EncodeJob.sortColumnsFromDisk(spark, zOut).isEmpty)
  }

  private def EncodeJob = graft.spark.EncodeJob
}
