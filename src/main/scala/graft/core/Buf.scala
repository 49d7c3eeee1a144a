package graft.core

/** Growable byte output buffer (replaces java.io streams in the encode hot
  * path — no synchronization, no boxing).
  */
final class ByteBuf(initialCapacity: Int = 256) {
  private var arr = new Array[Byte](math.max(initialCapacity, 16))
  private var _len = 0

  def length: Int = _len

  private def ensure(extra: Int): Unit = {
    val need = _len + extra
    if (need > arr.length) {
      var cap = arr.length * 2
      while (cap < need) cap *= 2
      arr = java.util.Arrays.copyOf(arr, cap)
    }
  }

  def writeByte(b: Int): Unit = {
    ensure(1)
    arr(_len) = b.toByte
    _len += 1
  }

  def writeBytes(bs: Array[Byte]): Unit = writeBytes(bs, 0, bs.length)

  def writeBytes(bs: Array[Byte], off: Int, n: Int): Unit = {
    ensure(n)
    System.arraycopy(bs, off, arr, _len, n)
    _len += n
  }

  def toArray: Array[Byte] = java.util.Arrays.copyOf(arr, _len)

  def reset(): Unit = _len = 0

  /** Pre-size for `extra` more bytes so a hot loop can write straight
    * into unsafeArray and commit with unsafeSetLength — no per-byte
    * bounds management.
    */
  def reserve(extra: Int): Unit = ensure(extra)

  def unsafeSetLength(n: Int): Unit = {
    require(n >= 0 && n <= arr.length)
    _len = n
  }

  /** Unsafe view for zero-copy reads; valid bytes are [0, length). */
  def unsafeArray: Array[Byte] = arr
}

/** Positional reader over a byte array. readByte returns -1 at end (like
  * InputStream), checkedByte throws.
  */
final class BytesIn(val arr: Array[Byte], var pos: Int, val end: Int) {
  def this(arr: Array[Byte]) = this(arr, 0, arr.length)

  def hasMore: Boolean = pos < end

  def readByte(): Int =
    if (pos >= end) -1
    else { val b = arr(pos) & 0xff; pos += 1; b }

  def checkedByte(): Int = {
    if (pos >= end) throw new IllegalStateException("Read past end of stream")
    val b = arr(pos) & 0xff
    pos += 1
    b
  }

  def readFully(n: Int): Array[Byte] = {
    if (pos + n > end) throw new IllegalStateException("Read past end of stream")
    val out = java.util.Arrays.copyOfRange(arr, pos, pos + n)
    pos += n
    out
  }
}
