package graft.core

/** Bit-level kernels for the ORC-style lightweight encodings: zigzag,
  * LEB128 varints, n-bit bit-packing, the RLEv2 direct-width code table,
  * bit-width histograms and percentile width selection, and big-endian
  * fixed-width longs.
  *
  * Semantics follow the ORC v1 spec as exercised by the reference
  * implementation (see /root/reference/src/ApacheOrcDotNet/Encodings/
  * BitManipulation.cs:20-311 for the behaviors these must match
  * bit-for-bit).
  */
object BitOps {

  @inline def zigzagEncode(v: Long): Long = (v << 1) ^ (v >> 63)

  @inline def zigzagDecode(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  /** Number of significant bits in value (0 for 0). */
  @inline def numBits(value: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(value)

  /** Valid RLEv2 DIRECT widths: 1..24, 26, 28, 30, 32, 40, 48, 56, 64. */
  def findNearestDirectWidth(approxBits: Int): Int =
    if (approxBits == 0) 1
    else if (approxBits <= 24) approxBits
    else if (approxBits <= 26) 26
    else if (approxBits <= 28) 28
    else if (approxBits <= 30) 30
    else if (approxBits <= 32) 32
    else if (approxBits <= 40) 40
    else if (approxBits <= 48) 48
    else if (approxBits <= 56) 56
    else 64

  /** Byte/nibble-aligned widths (EncodingStrategy.Speed). */
  def findNearestAlignedDirectWidth(approxBits: Int): Int =
    if (approxBits <= 1) 1
    else if (approxBits <= 2) 2
    else if (approxBits <= 4) 4
    else if (approxBits <= 8) 8
    else if (approxBits <= 16) 16
    else if (approxBits <= 24) 24
    else if (approxBits <= 32) 32
    else if (approxBits <= 40) 40
    else if (approxBits <= 48) 48
    else if (approxBits <= 56) 56
    else 64

  def encodeDirectWidth(width: Int): Int =
    if (width <= 24) width - 1
    else width match {
      case 26 => 24
      case 28 => 25
      case 30 => 26
      case 32 => 27
      case 40 => 28
      case 48 => 29
      case 56 => 30
      case 64 => 31
      case w  => throw new IllegalArgumentException(s"invalid direct width $w")
    }

  def decodeDirectWidth(encoded: Int): Int =
    if (encoded >= 0 && encoded <= 23) encoded + 1
    else encoded match {
      case 24 => 26
      case 25 => 28
      case 26 => 30
      case 27 => 32
      case 28 => 40
      case 29 => 48
      case 30 => 56
      case 31 => 64
      case e  => throw new IllegalArgumentException(s"invalid encoded width $e")
    }

  /** Histogram of encoded direct-widths over a value slice.
    * Returns (totalCount, histogram[32] indexed by encoded width).
    */
  def histogramOfBitWidths(values: Array[Long], from: Int, until: Int): (Int, Array[Int]) = {
    val hist = new Array[Int](32)
    var i = from
    while (i < until) {
      hist(encodeDirectWidth(findNearestDirectWidth(numBits(values(i))))) += 1
      i += 1
    }
    (until - from, hist)
  }

  /** Smallest width covering `percentile` of the values in the histogram. */
  def bitsRequiredForPercentile(total: Int, hist: Array[Int], percentile: Double): Int = {
    var toDrop = (total * (1.0 - percentile)).toInt
    var i = hist.length - 1
    while (i >= 0) {
      toDrop -= hist(i)
      if (toDrop < 0) return decodeDirectWidth(i)
      i -= 1
    }
    0
  }

  /** Big-endian fixed-width long. */
  def writeLongBE(out: ByteBuf, numBytes: Int, value: Long): Unit = {
    var i = numBytes - 1
    while (i >= 0) {
      out.writeByte(((value >>> (i * 8)) & 0xff).toInt)
      i -= 1
    }
  }

  def readLongBE(in: BytesIn, numBytes: Int): Long = {
    var result = 0L
    var i = numBytes - 1
    while (i >= 0) {
      result |= in.checkedByte().toLong << (i * 8)
      i -= 1
    }
    result
  }

  /** Bit-pack `width`-bit big-endian values, MSB-first within bytes. */
  def writeBitpacked(out: ByteBuf, values: Array[Long], from: Int, until: Int, width: Int): Unit = {
    var currentByte = 0
    var bitsAvailable = 8
    var i = from
    while (i < until) {
      val value = values(i)
      var bitsToWrite = width
      while (bitsToWrite > bitsAvailable) {
        currentByte |= ((value >>> (bitsToWrite - bitsAvailable)) & 0xff).toInt
        bitsToWrite -= bitsAvailable
        out.writeByte(currentByte)
        currentByte = 0
        bitsAvailable = 8
      }
      bitsAvailable -= bitsToWrite
      currentByte |= ((value << bitsAvailable) & 0xff).toInt
      if (bitsAvailable == 0) {
        out.writeByte(currentByte)
        currentByte = 0
        bitsAvailable = 8
      }
      i += 1
    }
    if (bitsAvailable != 8) out.writeByte(currentByte)
  }

  /** Unpack `count` `width`-bit values into `dst` starting at dstOff. */
  def readBitpacked(in: BytesIn, width: Int, count: Int, dst: Array[Long], dstOff: Int): Unit = {
    var currentByte = 0
    var bitsAvailable = 0
    var i = 0
    while (i < count) {
      var result = 0L
      var neededBits = width
      while (neededBits > bitsAvailable) {
        result <<= bitsAvailable
        result |= (currentByte & ((1 << bitsAvailable) - 1)).toLong
        neededBits -= bitsAvailable
        currentByte = in.checkedByte()
        bitsAvailable = 8
      }
      if (neededBits > 0) {
        result <<= neededBits
        bitsAvailable -= neededBits
        result |= (currentByte >>> bitsAvailable).toLong & ((1L << neededBits) - 1)
      }
      dst(dstOff + i) = result
      i += 1
    }
  }

  /** LEB128 unsigned varint (low 7 bits first, high bit = continuation). */
  def writeVarIntUnsigned(out: ByteBuf, value0: Long): Unit = {
    var value = value0
    var done = false
    while (!done) {
      if ((value & ~0x7fL) == 0) {
        out.writeByte(value.toInt)
        done = true
      } else {
        out.writeByte(((value & 0x7f) | 0x80).toInt)
        value >>>= 7
      }
    }
  }

  def readVarIntUnsigned(in: BytesIn): Long = {
    var result = 0L
    var bitCount = 0
    var currentByte = 0
    do {
      currentByte = in.checkedByte()
      result |= (currentByte & 0x7f).toLong << bitCount
      bitCount += 7
    } while (currentByte >= 0x80)
    result
  }

  def writeVarIntSigned(out: ByteBuf, value: Long): Unit =
    writeVarIntUnsigned(out, zigzagEncode(value))

  def readVarIntSigned(in: BytesIn): Long =
    zigzagDecode(readVarIntUnsigned(in))

  /** Arbitrary-precision signed varint — the reference's 128-bit decimal
    * mantissa path (BitManipulation.cs:313-425): zigzag the BigInteger to
    * a non-negative magnitude, then LEB128 groups. Values that fit a long
    * take the long fast path; the wire format is identical either way
    * (zigzag(n) for BigInteger == zigzag(n.longValue) when n fits).
    */
  def writeBigVarIntSigned(out: ByteBuf, value: java.math.BigInteger): Unit = {
    if (value.bitLength <= 62) { writeVarIntSigned(out, value.longValueExact); return }
    // zigzag: n>=0 -> 2n; n<0 -> -2n-1 == not(n<<1)
    var u = if (value.signum < 0) value.shiftLeft(1).not else value.shiftLeft(1)
    while (u.bitLength > 7) {
      out.writeByte((u.intValue & 0x7f) | 0x80)
      u = u.shiftRight(7)
    }
    out.writeByte(u.intValue & 0x7f)
  }

  def readBigVarIntSigned(in: BytesIn): java.math.BigInteger = {
    var u = java.math.BigInteger.ZERO
    var shift = 0
    var b = 0
    do {
      b = in.checkedByte()
      // ≤ ~20 groups for decimal(38): the or-shift loop stays cheap
      u = u.or(java.math.BigInteger.valueOf((b & 0x7f).toLong).shiftLeft(shift))
      shift += 7
    } while (b >= 0x80)
    if (u.testBit(0)) u.shiftRight(1).not else u.shiftRight(1)
  }

  /** True when `left - right` would overflow a signed 64-bit long. */
  @inline def subtractionWouldOverflow(left: Long, right: Long): Boolean =
    !((left ^ right) >= 0 || (left ^ (left - right)) >= 0)
}
