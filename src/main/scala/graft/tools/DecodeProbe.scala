package graft.tools

import graft.spark.{EncodeJob, TableEncoder, WebGen}
import org.apache.spark.sql.SparkSession

/** Diagnoses decode parallelism/throughput for both read-back paths. */
object DecodeProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(200000L)
    val cpus = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val tmp = java.nio.file.Files.createTempDirectory("decode-probe").toString
    val pages = WebGen.pages(spark, rows, 42, cpus * 3).toDF()
    val res = EncodeJob.run(pages, EncodeJob.Config(tmp, cpus, Some("lang")))

    def time(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }

    val coloc = EncodeJob.readBackColocated(spark, tmp, res.specs)
    println(s"colocated partitions: ${coloc.rdd.getNumPartitions}")
    time("readBackColocated")(EncodeJob.readBackColocated(spark, tmp, res.specs).count())
    time("readBack (groupByKey)")(EncodeJob.readBack(spark, tmp, res.specs).count())
    // decode stage only, no unshred
    time("decodeSequential raw") {
      val chunks = spark.read.parquet(EncodeJob.chunkDir(tmp)).as[graft.spark.EncodedChunk]
      TableEncoder.decodeSequential(chunks, res.specs).count()
    }
    time("seq + unshred (no pin)") {
      val chunks = spark.read.parquet(EncodeJob.chunkDir(tmp)).as[graft.spark.EncodedChunk]
      TableEncoder.unshred(TableEncoder.decodeSequential(chunks, res.specs), res.specs).count()
    }
    time("seq + pin (no unshred)") {
      val chunks = spark.read.parquet(EncodeJob.chunkDir(tmp)).as[graft.spark.EncodedChunk]
      val d = TableEncoder.decodeSequential(chunks, res.specs)
      org.apache.spark.sql.graftbridge.Bridge
        .internalCreateDataFrame(spark, d.queryExecution.toRdd, d.schema).count()
    }
    // repeats at the end: separates JIT/GC order effects from real cost
    time("readBackColocated #2")(EncodeJob.readBackColocated(spark, tmp, res.specs).count())
    time("seq + unshred #2") {
      val chunks = spark.read.parquet(EncodeJob.chunkDir(tmp)).as[graft.spark.EncodedChunk]
      TableEncoder.unshred(TableEncoder.decodeSequential(chunks, res.specs), res.specs).count()
    }
    spark.stop()
  }
}
