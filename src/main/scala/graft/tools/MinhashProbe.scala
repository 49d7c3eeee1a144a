package graft.tools

import graft.functions.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the minhash near-dup pipeline at one sf dir. */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mh] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val planted = docs.filter(col("doc_id") < 20).select(
      (col("doc_id") + 1000000).as("doc_id"),
      expr("substring(text, instr(text, ' ') + 1)").as("text"))
    val all = docs.union(planted)
    t("warm scan")(all.count())
    t("signatures only")(Dedup.minhashSignatures(all, "doc_id", "text", 32, 3).count())
    t("signatures again")(Dedup.minhashSignatures(all, "doc_id", "text", 32, 3).count())
    t("full pipeline p1")(Dedup.minhashNearDuplicates(all, "doc_id", "text", 32, 8, 3, 0.5).count())
    t("full pipeline p2")(Dedup.minhashNearDuplicates(all, "doc_id", "text", 32, 8, 3, 0.5).count())
    // candidates without verification
    spark.stop()
  }
}
