package graft.tools

import graft.spark.{EncodeJob, WebGen}
import org.apache.spark.sql.SparkSession

/** Isolates the decode 8→32 scaling question: is the inversion caused by
  * task-packing (few big files → one straggler-bound wave at 32 threads)
  * or by the machine (bandwidth/steal)? Encodes the same input at two
  * output-file counts (1× and 3× cpus) and measures the colocated decode
  * at [cpus, cpus/4] interleaved min-of-N for each layout.
  */
object DecodeScale {
  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"decode-scale-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(200000L)
    val cpus = args.lift(1).map(_.toInt).getOrElse(32)
    val rounds = args.lift(2).map(_.toInt).getOrElse(3)

    val layouts = Seq(1, 3).map { mult =>
      val tmp = java.nio.file.Files.createTempDirectory(s"decode-scale-x$mult").toString
      locally {
        val s = session(cpus)
        try {
          val pages = WebGen.pages(s, rows, 42, cpus * 3).toDF()
          EncodeJob.run(pages, EncodeJob.Config(tmp, cpus * mult, Some("lang")))
        } finally s.stop()
      }
      mult -> tmp
    }

    val levels = Seq(cpus, math.max(1, cpus / 4))
    val best = scala.collection.mutable.Map[(Int, Int), Double]() // (mult, lvl) -> sec
    (1 to rounds).foreach { round =>
      levels.foreach { lvl =>
        layouts.foreach { case (mult, tmp) =>
          val s = session(lvl)
          try {
            val specs = EncodeJob.specsFromManifest(s, tmp,
              WebGen.pages(s, 1, 42, 1).toDF().schema)
            // warm EVERY round's fresh session (scheduler, footers, plan)
            // so later rounds are real candidates for the min, not cold
            // startup samples
            EncodeJob.readBackColocated(s, tmp, specs).count()
            val t0 = System.nanoTime()
            val n = EncodeJob.readBackColocated(s, tmp, specs).count()
            val sec = (System.nanoTime() - t0) / 1e9
            require(n == rows)
            best((mult, lvl)) = math.min(best.getOrElse((mult, lvl), Double.MaxValue), sec)
          } finally s.stop()
        }
      }
    }
    layouts.foreach { case (mult, _) =>
      val hi = best((mult, cpus))
      val lo = best((mult, math.max(1, cpus / 4)))
      println(f"files=x$mult  t$cpus=${hi}%.2f s  t${cpus / 4}=${lo}%.2f s  eff_${cpus / 4}_to_$cpus=${(lo / hi) / 4.0}%.3f")
    }
  }
}
