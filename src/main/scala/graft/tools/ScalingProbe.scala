package graft.tools

import graft.spark.{EncodeJob, TableEncoder, WebGen}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnoses encode scaling: runs the same encode at several parallelism
  * levels, twice each (warm + timed), interleaved, in one JVM — separates
  * JIT warmup from genuine contention.
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(100000L)
    val levels = args.lift(1).map(_.split(',').map(_.toInt).toSeq).getOrElse(Seq(32, 8, 32, 8))

    levels.foreach { cpus =>
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(s"probe-$cpus")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._

      // no cache: generation is deterministic splittable CPU work included
      // in the timed region at every level — identical total work, no GC
      // pressure from a multi-GB row cache
      val waves = args.lift(2).map(_.toInt).getOrElse(3)
      val pages = WebGen.pages(spark, rows, seed = 42, partitions = cpus * waves).toDF()
      val codecs = EncodeJob.pinStringCodecs(pages, 5000)
      val specs = TableEncoder.columnSpecs(pages.schema, codecs)
      val shredded = TableEncoder.shred(pages, specs)

      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        val enc = TableEncoder.encode(shredded, specs).agg(sum(col("encoded_bytes"))).first().getLong(0)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"PROBE cpus=$cpus%2d pass=$pass sec=$sec%.2f enc=$enc")
      }
      spark.stop()
    }
  }
}
