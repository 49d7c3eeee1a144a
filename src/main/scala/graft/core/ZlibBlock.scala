package graft.core

import java.util.zip.{Deflater, Inflater}

/** ORC-style block compression framing: the stream is a sequence of blocks,
  * each prefixed with a 3-byte little-endian header `(len << 1) | isOriginal`
  * where isOriginal=1 means the block is stored uncompressed (chosen when
  * deflate would grow it). Raw deflate (nowrap), matching the reference's
  * zlib kind (/root/reference/src/ApacheOrcDotNet/Compression/
  * OrcCompressedStream.cs:49-107, ZLib.cs:10-71).
  *
  * Block size defaults to 256 KiB like the reference
  * (WriterConfiguration.cs:24); compression level defaults to BEST_SPEED —
  * the reference's CompressionStrategy.Speed maps to zlib Fastest
  * (CompressionFactory.cs:21-47). Deflater/Inflater instances are
  * ThreadLocal-reused: constructing one per stream causes native alloc +
  * Cleaner churn that throttles 32-thread encode.
  *
  * Byte-identity of deflate output across implementations is not
  * guaranteed, so invariants bind on decompressed bytes and total size,
  * never compressed bytes.
  */
object ZlibBlock {
  final val DefaultBlockSize: Int = 256 * 1024
  private final val MaxBlockLen = 0x7fffff

  private val localDeflater = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(Deflater.BEST_SPEED, true)
  }
  private val localInflater = new ThreadLocal[Inflater] {
    override def initialValue(): Inflater = new Inflater(true)
  }
  private val localScratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](DefaultBlockSize + 1024)
  }

  def compress(data: Array[Byte], blockSize: Int = DefaultBlockSize): Array[Byte] = {
    if (data.isEmpty) return Array.emptyByteArray
    val out = new ByteBuf(data.length / 2 + 64)
    val deflater = localDeflater.get()
    var scratch = localScratch.get()
    if (scratch.length < blockSize + 1024) {
      scratch = new Array[Byte](blockSize + 1024)
      localScratch.set(scratch)
    }
    var off = 0
    while (off < data.length) {
      val n = math.min(blockSize, data.length - off)
      deflater.reset()
      deflater.setInput(data, off, n)
      deflater.finish()
      var produced = 0
      var overflow = false
      while (!deflater.finished() && !overflow) {
        if (produced == scratch.length) overflow = true
        else produced += deflater.deflate(scratch, produced, scratch.length - produced)
      }
      // skip-compression-if-bigger: store the original block
      if (overflow || produced >= n) writeBlock(out, data, off, n, isOriginal = true)
      else writeBlock(out, scratch, 0, produced, isOriginal = false)
      off += n
    }
    out.toArray
  }

  private def writeBlock(out: ByteBuf, data: Array[Byte], off: Int, len: Int, isOriginal: Boolean): Unit = {
    require(len <= MaxBlockLen, s"block of $len bytes exceeds 3-byte header limit")
    val header = (len << 1) | (if (isOriginal) 1 else 0)
    out.writeByte(header & 0xff)
    out.writeByte((header >> 8) & 0xff)
    out.writeByte((header >> 16) & 0xff)
    out.writeBytes(data, off, len)
  }

  def decompress(data: Array[Byte]): Array[Byte] = {
    val out = new ByteBuf(data.length * 2 + 64)
    val inflater = localInflater.get()
    val scratch = localScratch.get()
    var pos = 0
    while (pos < data.length) {
      if (pos + 3 > data.length) throw new IllegalStateException("truncated block header")
      val raw = (data(pos) & 0xff) | ((data(pos + 1) & 0xff) << 8) | ((data(pos + 2) & 0xff) << 16)
      pos += 3
      val len = raw >>> 1
      val isOriginal = (raw & 1) == 1
      if (pos + len > data.length) throw new IllegalStateException("truncated block body")
      if (isOriginal) out.writeBytes(data, pos, len)
      else {
        inflater.reset()
        inflater.setInput(data, pos, len)
        while (!inflater.finished()) {
          val n = inflater.inflate(scratch)
          if (n == 0 && !inflater.finished())
            throw new IllegalStateException("inflater stalled (corrupt block?)")
          out.writeBytes(scratch, 0, n)
        }
      }
      pos += len
    }
    out.toArray
  }
}
