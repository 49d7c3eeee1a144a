package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video travel as opaque
  * `binary` columns with typed metadata. The Spark side — schema,
  * partitioning, batch shape, UDF signatures — is real and tested; the
  * actual media decode is STUBBED behind `FakeDecoder` (media libraries
  * are not in this container) with a deterministic fake so tests have
  * stable expectations. Swap `FakeDecoder` for a real codec (e.g. a
  * JNI/ffmpeg bridge or mapInPandas + PIL on clusters that have them)
  * without touching the pipeline.
  */
object Multimodal {

  /** Typed metadata extracted from a media blob. */
  final case class MediaMeta(format: String, width: Int, height: Int,
                             frames: Int, bytes: Long)

  /** Fixed-size feature vector from a media blob. */
  final case class MediaFeature(id: Long, feature: Array[Float])

  /** STUB — deterministic fake decode. A real implementation would parse
    * the container header (PNG/JPEG/WAV/MP4) and hand pixel/sample buffers
    * to the feature extractor. The fake derives plausible metadata and a
    * feature vector from a hash of the bytes so everything downstream is
    * deterministic and testable.
    */
  object FakeDecoder {
    def sniffFormat(bytes: Array[Byte]): String =
      if (bytes.length >= 8 &&
        (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') "png"
      else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
      else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F') "wav"
      else if (bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8') "gif"
      else if (bytes.length >= 12 && bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p') "mp4"
      else "unknown"

    private def le16(bytes: Array[Byte], o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    private def le32(bytes: Array[Byte], o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)

    /** GIF logical screen descriptor: width/height as little-endian u16
      * right after the 6-byte signature.
      */
    def gifDims(bytes: Array[Byte]): Option[(Int, Int)] =
      if (bytes.length < 10) None else Some((le16(bytes, 6), le16(bytes, 8)))

    /** WAV RIFF chunk walk — pure header arithmetic, no codec: the fmt
      * chunk gives channels/sample-rate/bits-per-sample, the data chunk
      * size gives the sample count. Mapping into MediaMeta: width =
      * sample rate (Hz), height = channels, frames = samples per channel.
      */
    def wavMeta(bytes: Array[Byte]): Option[MediaMeta] = {
      if (bytes.length < 44) return None
      if (!(bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')) return None
      var channels = 0
      var sampleRate = 0L
      var bits = 0
      var dataSize = -1L
      var o = 12
      while (o + 8 <= bytes.length) {
        val size = le32(bytes, o + 4) // unsigned u32 — keep in Long space
        if (bytes(o) == 'f' && bytes(o + 1) == 'm' && bytes(o + 2) == 't' && bytes(o + 3) == ' ') {
          if (o + 8 + 16 > bytes.length) return None
          channels = le16(bytes, o + 10)
          sampleRate = le32(bytes, o + 12)
          bits = le16(bytes, o + 22)
        } else if (bytes(o) == 'd' && bytes(o + 1) == 'a' && bytes(o + 2) == 't' && bytes(o + 3) == 'a') {
          dataSize = size
        }
        // next offset computed in Long space: a u32 size ≥ 2^31 must not
        // truncate negative (zero-size chunks are legal and word-aligned)
        val next = o.toLong + 8 + size + (size & 1)
        if (next <= o || next > Int.MaxValue) return None // corrupt/overflowing header
        o = next.toInt
      }
      if (channels <= 0 || bits <= 0 || dataSize < 0) None
      else {
        val samples = dataSize / math.max(1, channels * bits / 8)
        Some(MediaMeta("wav", width = sampleRate.toInt, height = channels,
          frames = math.min(samples, Int.MaxValue.toLong).toInt, bytes = bytes.length.toLong))
      }
    }

    /** PNG IHDR: 8-byte signature, 4-byte chunk length, "IHDR", then
      * width and height as big-endian u32 — a plain header read, no
      * codec needed.
      */
    def pngDims(bytes: Array[Byte]): Option[(Int, Int)] =
      if (bytes.length < 24) None
      else {
        def be32(o: Int) = ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
          ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
        if (bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R')
          Some((be32(16), be32(20)))
        else None
      }

    /** JPEG SOFn: walk the marker chain to the first start-of-frame
      * (0xFFC0..0xFFCF minus the non-frame C4/C8/CC); height then width
      * as big-endian u16 at offset +5/+7 into the segment.
      */
    def jpegDims(bytes: Array[Byte]): Option[(Int, Int)] = {
      var i = 2
      while (i + 9 < bytes.length) {
        if ((bytes(i) & 0xff) != 0xff) return None // lost marker sync
        val marker = bytes(i + 1) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          val h = ((bytes(i + 5) & 0xff) << 8) | (bytes(i + 6) & 0xff)
          val w = ((bytes(i + 7) & 0xff) << 8) | (bytes(i + 8) & 0xff)
          return Some((w, h))
        }
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) i += 2 // standalone marker
        else i += 2 + (((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff))
      }
      None
    }

    /** MP4/ISO-BMFF box walk — pure header arithmetic like the WAV path,
      * no codec: boxes are (u32 size | 1 → u64 largesize)(4cc type).
      * tkhd carries the video track's width/height as 16.16 fixed point;
      * stsz's sample_count is the track's frame count. The video track is
      * the trak whose tkhd width is nonzero (audio tracks encode 0×0).
      */
    def mp4Meta(bytes: Array[Byte]): Option[MediaMeta] = {
      def be16(o: Int): Int = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
      def be32(o: Int): Long = ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
      def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
      def boxType(o: Int): String = new String(bytes, o + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      // walk children of [start, end), calling f(type, payloadStart, payloadEnd)
      def walk(start: Long, end: Long)(f: (String, Long, Long) => Unit): Boolean = {
        var o = start
        while (o + 8 <= end) {
          val size32 = be32(o.toInt)
          val (size, hdr) =
            if (size32 == 1L) { if (o + 16 > end) return false; (be64(o.toInt + 8), 16L) }
            else if (size32 == 0L) (end - o, 8L) // box extends to end of enclosure
            else (size32, 8L)
          if (size < hdr || o + size > end) return false
          f(boxType(o.toInt), o + hdr, o + size)
          o += size
        }
        true
      }
      var w = 0; var h = 0; var frames = 0; var anyFrames = 0
      var sawMoov = false
      val ok = walk(0L, bytes.length.toLong) { (t, s, e) =>
        if (t == "moov") {
          sawMoov = true
          walk(s, e) { (t2, s2, e2) =>
            if (t2 == "trak") {
              var tw = 0; var th = 0; var tFrames = 0
              walk(s2, e2) { (t3, s3, e3) =>
                if (t3 == "tkhd" && e3 - s3 >= 84) {
                  val v = bytes(s3.toInt) & 0xff
                  val wOff = if (v == 1) 88 else 76 // fixed tkhd layouts per version
                  if (e3 - s3 >= wOff + 8) {
                    tw = be16((s3 + wOff).toInt) // 16.16 fixed → integer part
                    th = be16((s3 + wOff + 4).toInt)
                  }
                } else if (t3 == "mdia") {
                  walk(s3, e3) { (t4, s4, e4) =>
                    if (t4 == "minf") walk(s4, e4) { (t5, s5, e5) =>
                      if (t5 == "stbl") walk(s5, e5) { (t6, s6, e6) =>
                        if (t6 == "stsz" && e6 - s6 >= 12)
                          tFrames = math.min(be32(s6.toInt + 8), Int.MaxValue.toLong).toInt
                      }
                    }
                  }
                }
              }
              anyFrames = math.max(anyFrames, tFrames)
              if (tw > 0) { w = tw; h = th; frames = tFrames } // the video track
            }
          }
        }
      }
      if (!ok || !sawMoov) None
      else Some(MediaMeta("mp4", w, h,
        math.max(if (frames > 0) frames else anyFrames, 1), bytes.length.toLong))
    }

    def meta(bytes: Array[Byte]): MediaMeta = {
      val format = sniffFormat(bytes)
      // real header parse where the format allows it without a codec:
      // PNG, JPEG, GIF dimensions; WAV channels/rate/sample-count;
      // MP4 moov/trak/tkhd/stsz box walk
      val parsed = format match {
        case "png"  => pngDims(bytes).map { case (w, h) => MediaMeta(format, w, h, 1, bytes.length.toLong) }
        case "jpeg" => jpegDims(bytes).map { case (w, h) => MediaMeta(format, w, h, 1, bytes.length.toLong) }
        case "gif"  => gifDims(bytes).map { case (w, h) => MediaMeta(format, w, h, 1, bytes.length.toLong) }
        case "wav"  => wavMeta(bytes)
        case "mp4"  => mp4Meta(bytes)
        case _      => None
      }
      parsed.getOrElse {
        // STUB path (unknown formats or corrupt headers): deterministic
        // fake so downstream stays testable without media libraries
        var hash = 1469598103934665603L
        var i = 0
        val n = math.min(bytes.length, 256)
        while (i < n) { hash ^= bytes(i); hash *= 1099511628211L; i += 1 }
        MediaMeta(format,
          width = 64 + (math.abs(hash) % 1024).toInt,
          height = 64 + (math.abs(hash >> 10) % 1024).toInt,
          frames = 1 + (math.abs(hash >> 20) % 64).toInt,
          bytes = bytes.length.toLong)
      }
    }

    def feature(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h ^= bytes(i); h *= 1099511628211L; i += 1 }
      i = 0
      while (i < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(i) = ((h >>> 33).toInt % 1000) / 1000.0f
        i += 1
      }
      out
    }
  }

  /** Metadata extraction as a column: blob → struct(format,width,height,
    * frames,bytes). UDF over binary — one pass, no shuffle.
    */
  val extractMetaUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) => if (bytes == null) null else FakeDecoder.meta(bytes) }

  /** Feature extraction over partitions, batch-shaped like a Pandas-UDF:
    * the closure receives an iterator and can batch blobs for a vectorized
    * decoder (a GPU feature extractor wants 64–256 blobs per call). On
    * clusters with Python + PIL this becomes mapInPandas with the same
    * batch shape.
    */
  def extractFeatures(df: DataFrame, idCol: String, blobCol: String,
                      dim: Int = 64, batchSize: Int = 64): Dataset[MediaFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // batch boundary: a real decoder gets the whole Array at once
          batch.map { case (id, blob) => MediaFeature(id, FakeDecoder.feature(blob, dim)) }
        }
      }
  }

  /** Frame sampling plumbing for video blobs: emit (id, frameIdx) rows for
    * every n-th frame according to the (stubbed) frame count — the shape
    * a real frame extractor would fan out to.
    */
  def sampleFrames(df: DataFrame, idCol: String, blobCol: String, everyNth: Int = 10): DataFrame = {
    val frameCount = udf { (bytes: Array[Byte]) => if (bytes == null) 0 else FakeDecoder.meta(bytes).frames }
    df.select(col(idCol), frameCount(col(blobCol)).as("__frames"))
      .withColumn("frame_idx", explode(sequence(lit(0), greatest(col("__frames") - 1, lit(0)), lit(everyNth))))
      .drop("__frames")
  }

  /** Resize request plumbing: passes target dims through the stub decode
    * so the output schema matches a real thumbnailer (id, width, height,
    * thumbnail-bytes).
    */
  def resizeStub(df: DataFrame, idCol: String, blobCol: String,
                 targetW: Int, targetH: Int): DataFrame = {
    val thumb = udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else FakeDecoder.feature(bytes, 16).map(f => (f * 255).toByte) // deterministic fake thumbnail
    }
    df.select(col(idCol), lit(targetW).as("width"), lit(targetH).as("height"),
      thumb(col(blobCol)).as("thumbnail"))
  }
}
