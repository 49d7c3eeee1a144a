package graft.tools
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val interesting = Seq("q1_agg", "q_join_agg", "q_topk", "q_text_stats",
      "q_minhash_neardup", "q_ann_cosine", "q_embed_neardup", "q_bloom_lookup",
      "q_source_agg", "q_sorted_scan", "q_zorder_scan", "q_catalog", "q_compaction",
      "q_update", "q_merge", "rt_embeddings")
    interesting.foreach { name =>
      println(s"\n######## $name ########")
      val df = graft.SparkEntry.queries(name)(spark, dir)
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
