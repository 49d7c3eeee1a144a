package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Round-6 optimization harness (guide §1): per-query wall time + Spark
  * JOB COUNT (each job carries fixed scheduler/planning latency that
  * dominates at bench scale and is pure overhead at 100 TB), optional
  * subset, optional explain capture. Separate main — graft.Bench is the
  * frozen driver contract and stays untouched.
  *
  * Usage:
  *   sbt "runMain graft.tools.BenchExtra [rounds] [query ...]"
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32),
  *      GRAFT_EXPLAIN_DIR (write <query>.txt explain("formatted") when set)
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val rounds = args.headOption.map(_.toInt).getOrElse(2)
    val subset = args.drop(1).toSet

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobCount = new java.util.concurrent.atomic.AtomicLong(0)
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val slowJobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet()
        val call = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobStarts.put(js.jobId, (System.nanoTime(), call))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val v = jobStarts.remove(je.jobId)
        if (v != null) {
          val ms = (System.nanoTime() - v._1) / 1000000L
          if (ms >= 100) slowJobs.add((je.jobId, ms, v._2))
        }
      }
    })
    val verboseJobs = sys.env.contains("GRAFT_SLOW_JOBS")

    try spark.read.parquet(s"$sfDir/lineitem.parquet").count() catch { case _: Throwable => }

    val explainDir = sys.env.get("GRAFT_EXPLAIN_DIR")
    val qnames = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => subset.isEmpty || subset.contains(n) }
    val best = scala.collection.mutable.LinkedHashMap[String, (Double, Long, Double)]()
    (1 to rounds).foreach { round =>
      qnames.foreach { case (name, fn) =>
        spark.sparkContext.setJobDescription(name)
        val g0 = graft.SparkEntry.gateNanos.get()
        val j0 = jobCount.get()
        val t0 = System.nanoTime()
        val ok = try {
          val df = fn(spark, sfDir)
          df.count()
          explainDir.filter(_ => round == 1).foreach { d =>
            java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
            java.nio.file.Files.write(java.nio.file.Paths.get(d, s"$name.txt"),
              df.queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode)
                .getBytes("UTF-8"))
          }
          true
        } catch { case e: Throwable => println(s"!! $name FAILED: ${e.getMessage}"); false }
        val gate = (graft.SparkEntry.gateNanos.get() - g0) / 1e9
        val sec = (System.nanoTime() - t0) / 1e9 - gate
        val jobs = jobCount.get() - j0
        if (ok && sec < best.get(name).map(_._1).getOrElse(Double.MaxValue))
          best(name) = (sec, jobs, gate)
        println(f"round $round%d $name%-22s ${sec}%7.3f s  $jobs%4d jobs  gate ${gate}%6.3f s")
        if (verboseJobs) {
          val slow = scala.jdk.CollectionConverters.IteratorHasAsScala(
            slowJobs.iterator()).asScala.toSeq
          if (slow.nonEmpty)
            println("    slow jobs (>=100ms): " +
              slow.map { case (id, ms, call) => s"#$id=${ms}ms[$call]" }.mkString(" "))
        }
        slowJobs.clear()
      }
    }
    println("==== best per query (engine sec, jobs, gate sec) ====")
    var total = 0.0
    best.toSeq.sortBy(-_._2._1).foreach { case (n, (s, j, g)) =>
      total += s
      println(f"$n%-22s ${s}%7.3f s  $j%4d jobs  gate ${g}%6.3f s")
    }
    println(f"TOTAL (best, engine) ${total}%.3f s over ${best.size}%d queries")
    spark.stop()
  }
}
