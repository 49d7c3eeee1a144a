package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe for the SQL DML surface: UPDATE and MERGE INTO routed
  * through GraftDmlStrategy on a catalog table, checked against the
  * expected row sets. (The durable coverage lives in GraftCatalogSpec;
  * this main is the fast inner loop.)
  */
object DmlProbe {
  def main(args: Array[String]): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("dmlprobe").toString
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("dml-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.catalog.gprobe", "graft.spark.source.GraftCatalog")
      .config("spark.sql.catalog.gprobe.warehouse", tmp)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE gprobe.db")
    spark.sql("CREATE TABLE gprobe.db.t (id BIGINT, s STRING, v BIGINT) USING graft " +
      "TBLPROPERTIES ('numPartitions'='2')")
    spark.sql("INSERT INTO gprobe.db.t SELECT id, concat('s', id), id * 10 FROM range(10)")

    def show(label: String): Unit = {
      val rows = spark.sql("SELECT * FROM gprobe.db.t ORDER BY id").collect()
        .map(_.toString).mkString(" ")
      println(s"== $label: $rows")
    }

    spark.sql("UPDATE gprobe.db.t SET v = v + 1, s = concat(s, '!') WHERE id >= 8")
    show("after UPDATE")
    assert(spark.sql("SELECT sum(v) FROM gprobe.db.t").first().getLong(0) ==
      (0 until 10).map(_ * 10L).sum + 2, "update sum mismatch")
    assert(spark.sql("SELECT count(*) FROM gprobe.db.t WHERE s LIKE '%!'").first().getLong(0) == 2)

    spark.sql(
      """MERGE INTO gprobe.db.t t USING (SELECT * FROM VALUES (8L, 800L), (20L, 2000L), (21L, 1L) AS s(id, v)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.v = s.v
        |WHEN NOT MATCHED AND s.v > 100 THEN INSERT (id, s, v) VALUES (s.id, 'new', s.v)""".stripMargin)
    show("after MERGE")
    assert(spark.sql("SELECT v FROM gprobe.db.t WHERE id = 8").first().getLong(0) == 800L)
    assert(spark.sql("SELECT count(*) FROM gprobe.db.t").first().getLong(0) == 11) // 21 filtered by insert cond
    assert(spark.sql("SELECT s FROM gprobe.db.t WHERE id = 20").first().getString(0) == "new")

    // matched DELETE + not-matched-by-source
    spark.sql(
      """MERGE INTO gprobe.db.t t USING (SELECT 20L AS id) s ON t.id = s.id
        |WHEN MATCHED THEN DELETE
        |WHEN NOT MATCHED BY SOURCE AND t.id >= 9 THEN UPDATE SET t.v = -1""".stripMargin)
    show("after MERGE 2")
    assert(spark.sql("SELECT count(*) FROM gprobe.db.t WHERE id = 20").first().getLong(0) == 0)
    assert(spark.sql("SELECT count(*) FROM gprobe.db.t WHERE v = -1").first().getLong(0) == 1)

    // cardinality violation must error
    val dup = try {
      spark.sql(
        """MERGE INTO gprobe.db.t t USING (SELECT * FROM VALUES (1L), (1L) AS s(id)) s
          |ON t.id = s.id WHEN MATCHED THEN DELETE""".stripMargin)
      "NO ERROR"
    } catch { case e: Throwable => "error: " + e.getMessage.take(80) }
    println(s"== duplicate-match MERGE: $dup")

    // UPDATE on a multi-batch dir must be selective: check via compaction records
    spark.sql("INSERT INTO gprobe.db.t SELECT id, 'b2', id FROM range(100, 110)")
    val recordsBefore = graft.spark.EncodeJob.compactions(spark, s"$tmp/db/t").size
    spark.sql("UPDATE gprobe.db.t SET v = 0 WHERE id = 105")
    val recs = graft.spark.EncodeJob.compactions(spark, s"$tmp/db/t")
    println(s"== selective UPDATE replaced batches: ${recs.drop(recordsBefore).map(_.replaces).mkString(",")}")
    assert(spark.sql("SELECT v FROM gprobe.db.t WHERE id = 105").first().getLong(0) == 0)
    println("== ALL OK")
    spark.stop()
  }
}
