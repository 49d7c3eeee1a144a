package graft.core

/** ORC byte-level run-length encoding.
  *
  * Wire format: header byte 0x00..0x7f ⇒ a run of (header+3) copies of the
  * next byte (max run 130); header 0x80..0xff ⇒ (0x100-header) literal
  * bytes follow (max literal group 128).
  *
  * Run/literal segmentation matches the reference writer
  * (/root/reference/src/ApacheOrcDotNet/Encodings/
  * ByteRunLengthEncodingWriter.cs:19-91): greedy run of ≥3 first, else a
  * literal group terminated by the next triple-repeat.
  */
object ByteRle {

  def write(out: ByteBuf, values: Array[Byte]): Unit = write(out, values, 0, values.length)

  def write(out: ByteBuf, values: Array[Byte], from: Int, until: Int): Unit = {
    var position = from
    while (position < until) {
      // Greedy repeated run at the window head (capped at 130).
      val repeatingValue = values(position)
      var runLen = 0
      while (position + runLen < until && runLen < 130 && values(position + runLen) == repeatingValue)
        runLen += 1
      if (runLen >= 3) {
        out.writeByte(runLen - 3)
        out.writeByte(repeatingValue & 0xff)
        position += runLen
      } else {
        // Literal group: scan forward to the next triple-repeat (or cap).
        val windowLen = until - position
        val literalLen =
          if (windowLen < 3) windowLen
          else {
            var r = 0
            var found = -1
            while (found < 0 && r < windowLen - 2 && r < 126) {
              if (values(position + r) == values(position + r + 1) &&
                  values(position + r) == values(position + r + 2)) found = r
              else r += 1
            }
            if (found >= 0) found else r + 2
          }
        out.writeByte((256 - literalLen) & 0xff)
        var i = 0
        while (i < literalLen) {
          out.writeByte(values(position + i) & 0xff)
          i += 1
        }
        position += literalLen
      }
    }
  }

  /** Decode everything remaining in `in`. */
  def readAll(in: BytesIn): Array[Byte] = {
    val out = new ByteBuf(64)
    var firstByte = in.readByte()
    while (firstByte >= 0) {
      if (firstByte < 0x80) {
        val numBytes = firstByte + 3
        val repeated = in.checkedByte()
        var i = 0
        while (i < numBytes) { out.writeByte(repeated); i += 1 }
      } else {
        val numBytes = 0x100 - firstByte
        var i = 0
        while (i < numBytes) { out.writeByte(in.checkedByte()); i += 1 }
      }
      firstByte = in.readByte()
    }
    out.toArray
  }
}

/** Boolean bitmap codec: MSB-first bit-packing into bytes, then ByteRLE.
  * Matches /root/reference/src/ApacheOrcDotNet/Encodings/BitWriter.cs:18-41
  * and BitReader.cs:18-55. Note decode yields bits in whole-byte multiples;
  * callers track the logical count.
  */
object BitCodec {

  def write(out: ByteBuf, values: Array[Boolean]): Unit = write(out, values, 0, values.length)

  def write(out: ByteBuf, values: Array[Boolean], from: Int, until: Int): Unit = {
    val count = until - from
    val numBytes = (count + 7) / 8
    val bytes = new Array[Byte](numBytes)
    var i = 0
    while (i < count) {
      if (values(from + i)) bytes(i >> 3) = (bytes(i >> 3) | (1 << (7 - (i & 7)))).toByte
      i += 1
    }
    ByteRle.write(out, bytes)
  }

  /** Decode at least `count` bits; returns exactly `count` booleans. */
  def read(in: BytesIn, count: Int): Array[Boolean] = {
    val bytes = ByteRle.readAll(in)
    if (bytes.length * 8 < count)
      throw new IllegalStateException(s"bit stream too short: have ${bytes.length * 8} bits, need $count")
    val out = new Array[Boolean](count)
    var i = 0
    while (i < count) {
      out(i) = (bytes(i >> 3) & (1 << (7 - (i & 7)))) != 0
      i += 1
    }
    out
  }
}
