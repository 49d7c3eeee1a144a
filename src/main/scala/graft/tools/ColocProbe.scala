package graft.tools

import graft.spark.{EncodeJob, TableEncoder, WebGen}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bisects the readBackColocated slowdown: times each sub-step. */
object ColocProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val tmp = java.nio.file.Files.createTempDirectory("coloc-probe").toString
    val pages = WebGen.pages(spark, rows, 42, 96).toDF()
    val res = EncodeJob.run(pages, EncodeJob.Config(tmp, 32, Some("lang")))

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cp] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    (1 to 3).foreach { i =>
      val ok = t(s"layoutOk #$i")(EncodeJob.colocatedLayoutOk(spark, tmp, res.specs))
      println(s"[cp] layoutOk = $ok")
      t(s"committedChunks count #$i")(
        spark.read.parquet(EncodeJob.chunkDir(tmp)).count())
      t(s"colocated #$i")(EncodeJob.readBackColocated(spark, tmp, res.specs).count())
      t(s"shuffled #$i")(EncodeJob.readBackShuffled(spark, tmp, res.specs).count())
    }
    spark.stop()
  }
}
