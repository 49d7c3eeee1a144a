package graft

import graft.spark.{EncodeJob, TableEncoder, WebGen}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main. Prints ONE JSON line:
  * {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
  *  "encode":{"raw_gb":..,"gbps32":..,"gbps8":..,"scaling_efficiency":..,
  *            "bytes_per_doc":..,"compression_ratio":..}}
  *
  * The scaling section evidences the north rule's N→4N criterion in this
  * sandbox: the same encode job on the same input at local[8] vs local[32],
  * efficiency = (T8 / T32) / 4.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** One full encode pass over `rows` generated pages; returns (seconds,
    * rawBytes, encodedBytes). Generation cost is excluded by timing only
    * the encode stage over a pre-materialized cached input.
    */
  private def encodeBench(spark: SparkSession, rows: Long, cpus: Int): (Double, Long, Long) = {
    import spark.implicits._
    val pages = WebGen.pages(spark, rows, seed = 42, partitions = cpus).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rawBytes = pages.select(
      sum(length(col("url")) + length(col("text")) + octet_length(col("html")) + lit(16))).first().getLong(0)

    val codecs = EncodeJob.pinStringCodecs(pages, 5000)
    val specs = TableEncoder.columnSpecs(pages.schema, codecs)
    val shredded = TableEncoder.shred(pages, specs)

    // warmup (JIT) on a slice
    TableEncoder.encode(shredded.limit(2000), specs).foreach(_ => ())

    val t0 = System.nanoTime()
    val encodedBytes = TableEncoder.encode(shredded, specs)
      .agg(sum(col("encoded_bytes"))).first().getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    pages.unpersist()
    (sec, rawBytes, encodedBytes)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "100000").toLong

    // -------- headline queries at local[cpus] --------
    var spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // -------- encode throughput at local[cpus] --------
    val (secN, rawBytes, encodedBytes) = encodeBench(spark, benchRows, cpus)
    spark.stop()

    // -------- same job at quarter parallelism (N vs 4N evidence) --------
    val lowCpus = math.max(1, cpus / 4)
    spark = session(lowCpus)
    val (secLow, _, _) = encodeBench(spark, benchRows, lowCpus)
    spark.stop()

    val gbpsN = rawBytes / 1e9 / secN
    val gbpsLow = rawBytes / 1e9 / secLow
    val efficiency = (secLow / secN) / (cpus.toDouble / lowCpus)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val encodeJson =
      f"""{"rows":$benchRows,"raw_gb":${rawBytes / 1e9}%.3f,"sec$cpus%d":$secN%.2f,"sec$lowCpus%d":$secLow%.2f,""" +
        f""""gbps$cpus%d":$gbpsN%.3f,"gbps$lowCpus%d":$gbpsLow%.3f,"scaling_efficiency":$efficiency%.3f,""" +
        f""""bytes_per_doc":${encodedBytes.toDouble / benchRows}%.1f,"compression_ratio":${encodedBytes.toDouble / rawBytes}%.4f}"""
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","encode":$encodeJson}""")
  }
}
