package graft.tools

import graft.spark.{EncodeJob, WebGen}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Drives the encode→commit→decode pipeline end-to-end from the command
  * line: synthesizes web pages (or reads a parquet table), encodes with
  * codec auto-selection + salting, writes chunks+manifest, decodes, and
  * verifies the bit-identity invariant per url.
  *
  * Usage: runMain graft.tools.EncodeDemo <rows|path.parquet> <outDir> [cpus]
  */
object EncodeDemo {
  def main(args: Array[String]): Unit = {
    val source = args.lift(0).getOrElse("50000")
    val outDir = args.lift(1).getOrElse("/tmp/graft-demo")
    val cpus = args.lift(2).orElse(sys.env.get("SPARK_GRAFT_CPUS")).getOrElse("8")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-encode-demo")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (df, keyCol) =
      if (source.endsWith(".parquet")) (spark.read.parquet(source), None)
      else (WebGen.pages(spark, source.toLong, seed = 42, partitions = cpus.toInt).toDF(), Some("lang"))

    val inputRows = df.count()
    val t0 = System.nanoTime()
    val result = EncodeJob.run(df, EncodeJob.Config(outDir, cpus.toInt * 2, keyCol))
    val encodeSec = (System.nanoTime() - t0) / 1e9

    val metrics = spark.read.parquet(result.chunkDir)
      .groupBy("column", "codec")
      .agg(sum("raw_bytes").as("raw"), sum("encoded_bytes").as("enc"),
        count(lit(1)).as("chunks"))
      .orderBy("column")
    println(f"== encoded $inputRows%d rows in $encodeSec%.1f s ==")
    metrics.show(50, truncate = false)
    val totals = metrics.agg(sum("raw"), sum("enc")).first()
    val raw = totals.getLong(0); val enc = totals.getLong(1)
    println(f"total raw=$raw%d enc=$enc%d ratio=${enc.toDouble / raw}%.3f bytes/row=${enc.toDouble / inputRows}%.1f")

    val t1 = System.nanoTime()
    val decoded = EncodeJob.readBack(spark, outDir, result.specs)
    val decodedRows = decoded.count()
    println(f"decoded $decodedRows%d rows in ${(System.nanoTime() - t1) / 1e9}%.1f s")

    if (keyCol.isDefined) {
      // hashes, not raw text: equality is the only question, and a
      // misestimated broadcast of a full-text side at 2M+ rows blows
      // spark.driver.maxResultSize
      val orig = df.select(col("url"), md5(col("html")).as("oh"), md5(col("text").cast("binary")).as("ot"))
      val dec = decoded.select(col("url"), md5(col("html")).as("dh"), md5(col("text").cast("binary")).as("dt"))
      val bad = orig.hint("merge").join(dec, "url")
        .filter(col("oh") =!= col("dh") || col("ot") =!= col("dt")).count()
      println(s"bit-identity check: $bad mismatching urls (must be 0)")
      if (bad != 0) sys.exit(1)
    } else {
      val lost = df.exceptAll(decoded).count()
      val extra = decoded.exceptAll(df).count()
      println(s"multiset check: lost=$lost extra=$extra (must be 0/0)")
      if (lost != 0 || extra != 0) sys.exit(1)
    }
    spark.stop()
  }
}
