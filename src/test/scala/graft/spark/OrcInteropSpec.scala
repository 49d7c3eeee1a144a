package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Product-API ORC interop gate: the files [[OrcInterop]] writes are read
  * by Spark's STOCK ORC reader (Java orc-core underneath — the
  * independent implementation), and [[OrcInterop.readOrcFile]] reads files
  * written by Spark's stock ORC sink. OrcFileAssemblySpec proves the
  * stream encoders conform at the assembly level; this spec proves the
  * shipped API does.
  */
class OrcInteropSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-orc-$tag").toString

  /** All-types frame with nulls, dict-shaped and direct-shaped strings,
    * binary, timestamps (post-2015: the pre-epoch fraction convention
    * differs across ORC readers), dates, both decimal widths.
    */
  private def allTypes(n: Int): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val langs = Array("en", "de", "fr", "es", "pt")
    (0 until n).map { i =>
      (i.toLong * 31 - 5000,
        if (i % 97 == 0) None else Some(i * 7),
        langs(i % langs.length),
        s"https://example.com/page/$i?q=${i % 1000}",
        if (i % 13 == 0) None else Some(i * 0.25 - 100.0),
        i.toFloat / 3f,
        i % 3 == 0,
        (i % 251 - 120).toByte,
        (i % 1000 - 500).toShort,
        s"blob-${i % 500}".getBytes("UTF-8"),
        java.sql.Timestamp.valueOf(java.time.LocalDateTime.of(2020, 1, 1, 0, 0, 0)
          .plusSeconds(i.toLong * 12345).plusNanos((i % 1000) * 1000L * 1000L)),
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(10000 + i % 5000)),
        BigDecimal(i.toLong * 997 - 1000000, 2),
        // >64-bit mantissa built as a STRING: a scala BigDecimal in a tuple
        // encoder pins Decimal(38,18), which can't hold 28 integer digits
        new java.math.BigDecimal(new java.math.BigInteger("12345678901234567890123456789012")
          .add(java.math.BigInteger.valueOf(i.toLong * 7919))
          .multiply(java.math.BigInteger.valueOf(if (i % 2 == 0) 1 else -1)), 4).toPlainString)
    }.toDF("id", "n_int", "lang", "url", "price", "score", "flag", "tiny", "small",
        "payload", "ts", "day", "amount", "big")
      .withColumn("amount", col("amount").cast("decimal(12,2)"))
      .withColumn("big", col("big").cast("decimal(38,4)"))
  }

  /** Order-insensitive full-content comparison via stringified sorted rows. */
  private def canon(df: DataFrame): Seq[String] =
    df.collect().map { r =>
      (0 until r.length).map { i =>
        r.get(i) match {
          case null                => "NULL"
          case b: Array[Byte]      => java.util.Base64.getEncoder.encodeToString(b)
          case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
          case v                   => v.toString
        }
      }.mkString("|")
    }.sorted.toSeq

  test("Spark's stock ORC reader reads OrcInterop output (all types, nulls, multi-stripe)") {
    val df = allTypes(5000).repartition(3)
    val dir = tmpDir("write")
    val infos = OrcInterop.writeOrcFiles(df, dir, stripeRows = 700) // several stripes per file
    assert(infos.length == 3)
    assert(infos.map(_.rows).sum == 5000)
    val back = spark.read.orc(dir)
    assert(canon(back) == canon(df))
    // the independent reader really is Java orc-core: check one file's tail
    val reader = org.apache.orc.OrcFile.createReader(
      new org.apache.hadoop.fs.Path(infos.head.path),
      org.apache.orc.OrcFile.readerOptions(new org.apache.hadoop.conf.Configuration()))
    assert(reader.getNumberOfRows == infos.head.rows)
    assert(reader.getStripes.size() > 1, "expected multiple stripes")
  }

  test("writeOrcFile writes a single file at the exact path") {
    val df = allTypes(200)
    val path = tmpDir("single") + "/out.orc"
    val info = OrcInterop.writeOrcFile(df, path)
    assert(info.rows == 200 && info.path == path)
    assert(canon(spark.read.orc(path)) == canon(df))
  }

  test("readOrcFile reads files written by Spark's stock ORC sink (zlib)") {
    val spark0 = spark
    import spark0.implicits._
    val langs = Array("en", "de", "fr", "es")
    val df = (0 until 4000).map { i =>
      (i.toLong * 7 - 100,
        if (i % 11 == 0) None else Some(i * 3),
        langs(i % langs.length),
        s"host-$i.example.org/${i % 777}",
        i * 1.5 - 10,
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(15000 + i % 900)),
        BigDecimal(i.toLong * 31 - 5000, 2))
    }.toDF("id", "n_int", "lang", "url", "price", "day", "amount")
      .withColumn("amount", col("amount").cast("decimal(12,2)"))
    val dir = tmpDir("javaorc")
    df.coalesce(2).write.mode("overwrite").option("compression", "zlib").orc(dir)
    val back = OrcInterop.readOrcFile(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(canon(back) == canon(df))
  }

  test("graft-to-graft ORC round trip (own writer, own reader)") {
    val df = allTypes(3000).repartition(2)
    val dir = tmpDir("rt")
    OrcInterop.writeOrcFiles(df, dir, stripeRows = 997)
    val back = OrcInterop.readOrcFile(spark, dir)
    // own reader restores TIMESTAMP as TimestampType; compare content
    assert(canon(back) == canon(df))
  }
}
