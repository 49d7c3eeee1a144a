package graft.spark

import org.apache.spark.rdd.RDD
import scala.reflect.ClassTag

/** Seeded one-pass bounded sampling shared by codec pinning and IVF
  * centroid training (previously duplicated verbatim at both sites).
  *
  * Per-partition Algorithm-R reservoirs of equal share, one narrow pass,
  * no count job, driver memory bounded: each partition keeps at most
  * ceil(sampleRows / numPartitions) rows (≥1), and when partitions
  * outnumber sampleRows the collected union is down-sampled with a
  * seeded shuffle so the bound actually holds. Equal per-partition
  * shares slightly over-weight small partitions — fine for the model
  * uses here (codec shapes, centroids), which need representative
  * values, not unbiased frequencies.
  */
object Sampling {

  def reservoirSample[T: ClassTag](rdd: RDD[T], sampleRows: Int, seed: Long): Array[T] = {
    require(sampleRows > 0, "sampleRows must be positive")
    val parts = math.max(1, rdd.getNumPartitions)
    val perPart = math.max(1, (sampleRows + parts - 1) / parts)
    val collected = rdd.mapPartitionsWithIndex { (pid, it) =>
      val rng = new java.util.Random(seed * 1000003 + pid)
      val res = new Array[T](perPart)
      var n = 0L
      while (it.hasNext) {
        val v = it.next()
        if (n < perPart) res(n.toInt) = v
        else {
          val j = (rng.nextDouble() * (n + 1)).toLong
          if (j < perPart) res(j.toInt) = v
        }
        n += 1
      }
      res.iterator.take(math.min(n, perPart.toLong).toInt)
    }.collect()
    if (collected.length <= sampleRows) collected
    else {
      // more partitions than sampleRows: seeded shuffle, then cut — keeps
      // the bound without biasing toward low partition ids
      val rng = new scala.util.Random(seed)
      rng.shuffle(collected.toSeq).take(sampleRows).toArray
    }
  }
}
