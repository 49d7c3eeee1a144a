package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway probe: where exactly does Spark 4.1 fail UPDATE / MERGE on a
  * V2 table WITHOUT SupportsRowLevelOperations — analysis or planning?
  * Decides whether plan interception can ride experimental strategies
  * (planner-time failure) or needs an analyzer rule (analysis-time).
  */
object DmlProbe {
  def main(args: Array[String]): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("dmlprobe").toString
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("dml-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.catalog.gprobe", "graft.spark.source.GraftCatalog")
      .config("spark.sql.catalog.gprobe.warehouse", tmp)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("id", "s", "v")
      .write.saveAsTable("gprobe.db.t")

    def attempt(label: String)(body: => Any): Unit =
      try { body; println(s"== $label: OK") }
      catch { case e: Throwable =>
        println(s"== $label: ${e.getClass.getName}: ${e.getMessage.linesIterator.take(3).mkString(" | ")}")
      }

    attempt("UPDATE analyze only") {
      val qe = spark.sessionState.executePlan(
        spark.sessionState.sqlParser.parsePlan("UPDATE gprobe.db.t SET v = v + 1 WHERE id = 2"))
      println("analyzed:\n" + qe.analyzed.treeString)
    }
    attempt("UPDATE full") {
      spark.sql("UPDATE gprobe.db.t SET v = v + 1 WHERE id = 2").collect()
    }
    attempt("MERGE analyze only") {
      val qe = spark.sessionState.executePlan(spark.sessionState.sqlParser.parsePlan(
        """MERGE INTO gprobe.db.t t USING (SELECT 2 AS id, 99 AS v) s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET t.v = s.v
          |WHEN NOT MATCHED THEN INSERT (id, s, v) VALUES (s.id, 'x', s.v)""".stripMargin))
      println("analyzed:\n" + qe.analyzed.treeString)
    }
    attempt("MERGE full") {
      spark.sql(
        """MERGE INTO gprobe.db.t t USING (SELECT 2 AS id, 99 AS v) s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET t.v = s.v
          |WHEN NOT MATCHED THEN INSERT (id, s, v) VALUES (s.id, 'x', s.v)""".stripMargin).collect()
    }
    spark.stop()
  }
}
