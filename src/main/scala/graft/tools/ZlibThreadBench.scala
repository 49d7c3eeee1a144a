package graft.tools

import graft.core.ByteBuf
import java.util.zip.Deflater

/** 32-thread zlib microbench: array-path deflate (JNI critical, GCLocker)
  * vs direct-ByteBuffer-path deflate, plus an allocation-storm variant to
  * expose interaction with GC. No Spark — isolates the native layer.
  */
object ZlibThreadBench {

  private def arrayCompress(data: Array[Byte], deflater: Deflater, scratch: Array[Byte]): Int = {
    var total = 0
    var off = 0
    val blockSize = 256 * 1024
    while (off < data.length) {
      val n = math.min(blockSize, data.length - off)
      deflater.reset(); deflater.setInput(data, off, n); deflater.finish()
      var produced = 0
      while (!deflater.finished())
        produced += deflater.deflate(scratch, produced, scratch.length - produced)
      total += produced
      off += n
    }
    total
  }

  def main(args: Array[String]): Unit = {
    val threads = args.lift(0).map(_.toInt).getOrElse(32)
    val mbPerThread = args.lift(1).map(_.toInt).getOrElse(64)
    val garbage = args.lift(2).contains("garbage") // also allocate heap churn

    val rnd = new java.util.Random(42)
    val word = "the quick brown fox jumps over lazy dogs and encodes web pages "
    val sb = new StringBuilder
    while (sb.length < 4 * 1024 * 1024) sb.append(word).append(rnd.nextInt())
    val data = sb.toString.getBytes("UTF-8")

    def run(name: String, body: () => Unit): Unit = {
      val t0 = System.nanoTime()
      val ts = (1 to threads).map { _ =>
        val t = new Thread(() => body())
        t.start(); t
      }
      ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      val mb = threads.toLong * mbPerThread
      println(f"$name%-22s threads=$threads%2d  ${mb / sec}%8.1f MB/s aggregate  (${mb / sec / threads}%6.1f MB/s/thread)")
    }

    val reps = mbPerThread / 4
    run("warmup", () => {
      (1 to 2).foreach(_ => graft.core.ZlibBlock.compress(data))
    })
    (1 to 2).foreach { _ =>
      run("bytebuffer-path", () => {
        (1 to reps).foreach { _ =>
          graft.core.ZlibBlock.compress(data)
          if (garbage) { val a = new Array[Byte](4 << 20); a(0) = 1 }
        }
      })
      run("array-path", () => {
        val d = new Deflater(Deflater.BEST_SPEED, true)
        val scratch = new Array[Byte](512 * 1024)
        (1 to reps).foreach { _ =>
          arrayCompress(data, d, scratch)
          if (garbage) { val a = new Array[Byte](4 << 20); a(0) = 1 }
        }
        d.end()
      })
    }
  }
}
