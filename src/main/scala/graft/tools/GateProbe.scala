package graft.tools

import graft.functions.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off timing breakdown of the planted-recall gate around
  * minhashNearDuplicates (round-4 q_minhash regression hunt).
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[gp] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { pass =>
      println(s"[gp] ---- pass $pass ----")
      val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
      val planted = docs.filter(col("doc_id") < 20).select(
        (col("doc_id") + 1000000).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
      val pairs = Dedup.minhashNearDuplicates(docs.union(planted), "doc_id", "text",
        k = 32, bands = 8, shingleSize = 3, threshold = 0.5)
      def fresh() = Dedup.minhashNearDuplicates(docs.union(planted), "doc_id", "text",
        k = 32, bands = 8, shingleSize = 3, threshold = 0.5)
      t("count")(fresh().count())
      t("collect ids only")(fresh().select("id_a", "id_b").collect())
      t("collect full")(fresh().collect())
      t("count again")(fresh().count())
    }
    spark.stop()
  }
}
