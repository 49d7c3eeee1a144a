package graft.core

import BitOps._

/** ORC Integer Run-Length Encoding v2 writer: windows of ≤512 values, each
  * encoded with one of four sub-encodings selected in order
  * SHORT_REPEAT → DELTA → PATCHED_BASE → DIRECT.
  *
  * Mode-selection heuristics replicate the reference exactly — bit-identity
  * of the output requires identical selection, not merely a valid encoding
  * (/root/reference/src/ApacheOrcDotNet/Encodings/
  * IntegerRunLengthEncodingV2Writer.cs:30-415): the first delta is excluded
  * from the delta-width max (:116-117), patch candidacy uses the 90th
  * percentile of zigzag widths then the 95th of base-reduced widths
  * (:193-224), patch gaps >255 split with zero-patch markers, and gap widths
  * >8 collapse to 8 with the 511/256 length reservation (:386-398).
  */
object RleV2Writer {

  def write(out: ByteBuf, values: Array[Long], signed: Boolean, aligned: Boolean): Unit =
    write(out, values, 0, values.length, signed, aligned)

  def write(out: ByteBuf, values: Array[Long], from: Int, until: Int, signed: Boolean, aligned: Boolean): Unit = {
    var position = from
    while (position < until) {
      val windowEnd = math.min(position + 512, until)
      position += encodeWindow(out, values, position, windowEnd, signed, aligned)
    }
  }

  /** Encode one window; returns the number of values consumed. */
  private def encodeWindow(out: ByteBuf, values: Array[Long], from: Int, until: Int,
                           signed: Boolean, aligned: Boolean): Int = {
    val count = until - from

    if (count <= 3) { // too short for anything but DIRECT
      directEncode(out, zigzagIfSigned(values, from, until, signed), count, aligned, -1)
      return count
    }

    // SHORT_REPEAT: leading run of 3..10 equal values
    var runLen = 1
    val head = values(from)
    while (from + runLen < until && values(from + runLen) == head) runLen += 1
    if (runLen >= 3 && runLen <= 10) {
      shortRepeatEncode(out, if (signed) zigzagEncode(head) else head, runLen)
      return runLen
    }

    // DELTA attempt
    val delta = tryDeltaEncoding(out, values, from, until, signed, aligned)
    if (delta == DeltaSuccess) return count
    if (delta == DeltaOverflow) {
      directEncode(out, zigzagIfSigned(values, from, until, signed), count, aligned, -1)
      return count
    }
    // NonMonotonic: minValue was computed during the delta attempt
    val minValue = sliceMin(values, from, until)

    val zz = zigzagIfSigned(values, from, until, signed)
    val fixedBitWidth = tryPatchEncoding(out, zz, values, from, until, minValue)
    if (fixedBitWidth < 0) return count // patched

    directEncode(out, zz, count, aligned, fixedBitWidth)
    count
  }

  private def zigzagIfSigned(values: Array[Long], from: Int, until: Int, signed: Boolean): Array[Long] = {
    val out = new Array[Long](until - from)
    var i = 0
    if (signed) while (i < out.length) { out(i) = zigzagEncode(values(from + i)); i += 1 }
    else while (i < out.length) { out(i) = values(from + i); i += 1 }
    out
  }

  private def sliceMin(values: Array[Long], from: Int, until: Int): Long = {
    var m = values(from)
    var i = from + 1
    while (i < until) { if (values(i) < m) m = values(i); i += 1 }
    m
  }

  private final val DeltaSuccess = 0
  private final val DeltaOverflow = 1
  private final val DeltaNonMonotonic = 2

  private def tryDeltaEncoding(out: ByteBuf, values: Array[Long], from: Int, until: Int,
                               signed: Boolean, aligned: Boolean): Int = {
    val count = until - from
    val deltas = new Array[Long](count - 1)
    val initialValue = values(from)
    var minValue = initialValue
    var maxValue = initialValue
    val initialDelta = values(from + 1) - initialValue
    var curDelta = initialDelta
    var deltaMax = 0L // first delta deliberately excluded from the max
    var isIncreasing = initialDelta > 0
    var isDecreasing = initialDelta < 0
    var isConstantDelta = true

    var previousValue = values(from + 1)
    if (previousValue < minValue) minValue = previousValue
    if (previousValue > maxValue) maxValue = previousValue
    deltas(0) = initialDelta

    var i = from + 2
    while (i < until) {
      val value = values(i)
      curDelta = value - previousValue
      if (value < minValue) minValue = value
      if (value > maxValue) maxValue = value
      if (value < previousValue) isIncreasing = false
      if (value > previousValue) isDecreasing = false
      if (curDelta != initialDelta) isConstantDelta = false
      val absCurDelta = math.abs(curDelta)
      deltas(i - from - 1) = absCurDelta
      if (absCurDelta > deltaMax) deltaMax = absCurDelta
      previousValue = value
      i += 1
    }

    if (subtractionWouldOverflow(maxValue, minValue)) return DeltaOverflow

    if (maxValue == minValue) { // all values identical
      deltaEncode(out, minValue, signed, count, Array(0L), 0)
      return DeltaSuccess
    }

    if (isConstantDelta) {
      deltaEncode(out, initialValue, signed, count, Array(curDelta), 0)
      return DeltaSuccess
    }

    if (isIncreasing || isDecreasing) {
      var deltaBits = numBits(deltaMax)
      deltaBits = if (aligned) findNearestAlignedDirectWidth(deltaBits) else findNearestDirectWidth(deltaBits)
      deltaEncode(out, initialValue, signed, count, deltas, deltaBits)
      return DeltaSuccess
    }

    DeltaNonMonotonic
  }

  /** Returns -1 if patch-encoded, else the precomputed 100th-percentile
    * fixed bit width for the DIRECT fallback.
    */
  private def tryPatchEncoding(out: ByteBuf, zz: Array[Long], values: Array[Long],
                               from: Int, until: Int, minValue: Long): Int = {
    val (zzTotal, zzHist) = histogramOfBitWidths(zz, 0, zz.length)
    val zzHundredth = bitsRequiredForPercentile(zzTotal, zzHist, 1.0)
    val zzNinetieth = bitsRequiredForPercentile(zzTotal, zzHist, 0.9)
    if (zzHundredth - zzNinetieth == 0) return zzHundredth

    val count = until - from
    val baseReduced = new Array[Long](count)
    var i = 0
    while (i < count) { baseReduced(i) = values(from + i) - minValue; i += 1 }

    val (brTotal, brHist) = histogramOfBitWidths(baseReduced, 0, count)
    val brHundredth = bitsRequiredForPercentile(brTotal, brHist, 1.0)
    val brNinetyfifth = bitsRequiredForPercentile(brTotal, brHist, 0.95)
    if (brHundredth - brNinetyfifth == 0) return zzHundredth

    patchEncode(out, minValue, baseReduced, brHundredth, brNinetyfifth)
    -1
  }

  private def directEncode(out: ByteBuf, zz: Array[Long], numValues: Int,
                           aligned: Boolean, precalcFixedBitWidth: Int): Unit = {
    var fixedBitWidth =
      if (precalcFixedBitWidth >= 0) precalcFixedBitWidth
      else {
        val (t, h) = histogramOfBitWidths(zz, 0, zz.length)
        bitsRequiredForPercentile(t, h, 1.0)
      }
    fixedBitWidth = if (aligned) findNearestAlignedDirectWidth(fixedBitWidth) else findNearestDirectWidth(fixedBitWidth)
    val encodedWidth = encodeDirectWidth(fixedBitWidth)

    out.writeByte((0x1 << 6) | ((encodedWidth & 0x1f) << 1) | ((numValues - 1) >> 8))
    out.writeByte((numValues - 1) & 0xff)
    writeBitpacked(out, zz, 0, zz.length, fixedBitWidth)
  }

  private def shortRepeatEncode(out: ByteBuf, value: Long, repeatCount: Int): Unit = {
    val bits = findNearestDirectWidth(numBits(value))
    var width = bits / 8
    if (bits % 8 != 0) width += 1
    out.writeByte(((width - 1) << 3) | (repeatCount - 3))
    writeLongBE(out, width, value)
  }

  private def deltaEncode(out: ByteBuf, initialValue: Long, signed: Boolean, numValues: Int,
                          deltas: Array[Long], deltaBitWidth0: Int): Unit = {
    // encoded width 0 is reserved for fixed-delta runs; bump 1 → 2
    val deltaBitWidth = if (deltaBitWidth0 == 1) 2 else deltaBitWidth0
    val encodedBitWidth = if (deltaBitWidth > 1) encodeDirectWidth(deltaBitWidth) else 0

    out.writeByte((0x3 << 6) | ((encodedBitWidth & 0x1f) << 1) | ((numValues - 1) >> 8))
    out.writeByte((numValues - 1) & 0xff)
    if (signed) writeVarIntSigned(out, initialValue) else writeVarIntUnsigned(out, initialValue)
    writeVarIntSigned(out, deltas(0))
    if (deltas.length > 1) writeBitpacked(out, deltas, 1, deltas.length, deltaBitWidth)
  }

  private def patchEncode(out: ByteBuf, baseValue0: Long, baseReduced: Array[Long],
                          originalBitWidth: Int, reducedBitWidth0: Int): Unit = {
    var baseValue = baseValue0
    var reducedBitWidth = reducedBitWidth0
    val baseIsNegative = baseValue < 0
    if (baseIsNegative) baseValue = -baseValue
    val numBitsBaseValue = numBits(baseValue) + 1 // one extra bit for the sign
    var numBytesBaseValue = numBitsBaseValue / 8
    if (numBitsBaseValue % 8 != 0) numBytesBaseValue += 1
    if (baseIsNegative) baseValue |= 1L << ((numBytesBaseValue * 8) - 1)

    var patchBitWidth = findNearestDirectWidth(originalBitWidth - reducedBitWidth)
    if (patchBitWidth == 64) {
      patchBitWidth = 56
      reducedBitWidth = 8
    }
    val encodedPatchBitWidth = encodeDirectWidth(patchBitWidth)
    val valueBitWidth = findNearestDirectWidth(reducedBitWidth)
    val encodedValueBitWidth = encodeDirectWidth(valueBitWidth)

    val (patchGapList, gapBitWidth) = generatePatchList(baseReduced, patchBitWidth, reducedBitWidth)
    val patchListBitWidth = findNearestDirectWidth(gapBitWidth + patchBitWidth)

    out.writeByte((0x2 << 6) | ((encodedValueBitWidth & 0x1f) << 1) | ((baseReduced.length - 1) >> 8))
    out.writeByte((baseReduced.length - 1) & 0xff)
    out.writeByte(((numBytesBaseValue - 1) << 5) | (encodedPatchBitWidth & 0x1f))
    out.writeByte(((gapBitWidth - 1) << 5) | (patchGapList.length & 0x1f))
    writeLongBE(out, numBytesBaseValue, baseValue)
    writeBitpacked(out, baseReduced, 0, baseReduced.length, valueBitWidth)
    writeBitpacked(out, patchGapList, 0, patchGapList.length, patchListBitWidth)
  }

  private def generatePatchList(baseReduced: Array[Long], patchBitWidth: Int,
                                reducedBitWidth: Int): (Array[Long], Int) = {
    var prevIndex = 0
    var maxGap = 0
    val mask = (1L << reducedBitWidth) - 1
    val gaps = new scala.collection.mutable.ArrayBuffer[Int]()
    val patches = new scala.collection.mutable.ArrayBuffer[Long]()

    var i = 0
    while (i < baseReduced.length) {
      if (baseReduced(i) > mask) {
        val gap = i - prevIndex
        if (gap > maxGap) maxGap = gap
        gaps += gap
        patches += (baseReduced(i) >>> reducedBitWidth)
        baseReduced(i) &= mask
        prevIndex = i
      }
      i += 1
    }

    var actualLength = gaps.length
    var gapBitWidth =
      if (maxGap == 0 && gaps.nonEmpty) 1
      else findNearestDirectWidth(numBits(maxGap.toLong))
    if (gapBitWidth > 8) {
      // gaps >255 are expressed as chained 255-gap/zero-patch entries
      gapBitWidth = 8
      actualLength += (if (maxGap == 511) 2 else 1)
    }

    val result = new Array[Long](actualLength)
    var r = 0
    var j = 0
    while (j < gaps.length) {
      var gap = gaps(j).toLong
      val patch = patches(j)
      while (gap > 255) {
        result(r) = 255L << patchBitWidth
        r += 1
        gap -= 255
      }
      result(r) = (gap << patchBitWidth) | patch
      r += 1
      j += 1
    }
    (result, gapBitWidth)
  }
}

/** RLEv2 decoder — the dual of [[RleV2Writer]], mirroring the reference
  * reader's handling of all four sub-encodings including chained 255-gap
  * zero-patch entries and sign-from-delta-base semantics
  * (/root/reference/src/ApacheOrcDotNet/Encodings/
  * IntegerRunLengthEncodingV2Reader.cs:22-199).
  */
object RleV2Reader {

  /** Decode every run remaining in `in`. */
  def readAll(in: BytesIn, signed: Boolean): Array[Long] = {
    val out = new LongBuf(64)
    var firstByte = in.readByte()
    while (firstByte >= 0) {
      readRun(in, firstByte, signed, out)
      firstByte = in.readByte()
    }
    out.toArray
  }

  /** Decode exactly `count` values (possibly spanning multiple runs). */
  def read(in: BytesIn, signed: Boolean, count: Int): Array[Long] = {
    val out = new LongBuf(count)
    while (out.length < count) {
      val firstByte = in.readByte()
      if (firstByte < 0) throw new IllegalStateException(s"RLEv2 stream exhausted at ${out.length}/$count values")
      readRun(in, firstByte, signed, out)
    }
    if (out.length != count)
      throw new IllegalStateException(s"RLEv2 run overshot: ${out.length} != $count")
    out.toArray
  }

  private def readRun(in: BytesIn, firstByte: Int, signed: Boolean, out: LongBuf): Unit =
    ((firstByte >> 6) & 0x3) match {
      case 0 => readShortRepeat(in, firstByte, signed, out)
      case 1 => readDirect(in, firstByte, signed, out)
      case 2 => readPatchedBase(in, firstByte, out)
      case 3 => readDelta(in, firstByte, signed, out)
    }

  private def readShortRepeat(in: BytesIn, firstByte: Int, signed: Boolean, out: LongBuf): Unit = {
    val width = ((firstByte >> 3) & 0x7) + 1
    val repeatCount = (firstByte & 0x7) + 3
    var value = BitOps.readLongBE(in, width)
    if (signed) value = BitOps.zigzagDecode(value)
    var i = 0
    while (i < repeatCount) { out.add(value); i += 1 }
  }

  private def readDirect(in: BytesIn, firstByte: Int, signed: Boolean, out: LongBuf): Unit = {
    val width = BitOps.decodeDirectWidth((firstByte >> 1) & 0x1f)
    val length = (((firstByte & 0x1) << 8) | in.checkedByte()) + 1
    val values = new Array[Long](length)
    BitOps.readBitpacked(in, width, length, values, 0)
    var i = 0
    if (signed) while (i < length) { out.add(BitOps.zigzagDecode(values(i))); i += 1 }
    else while (i < length) { out.add(values(i)); i += 1 }
  }

  private def readPatchedBase(in: BytesIn, firstByte: Int, out: LongBuf): Unit = {
    val width = BitOps.decodeDirectWidth((firstByte >> 1) & 0x1f)
    val length = (((firstByte & 0x1) << 8) | in.checkedByte()) + 1

    val thirdByte = in.checkedByte()
    val baseValueWidth = ((thirdByte >> 5) & 0x7) + 1
    val patchWidth = BitOps.decodeDirectWidth(thirdByte & 0x1f)

    val fourthByte = in.checkedByte()
    val patchGapWidth = ((fourthByte >> 5) & 0x7) + 1
    val patchListLength = fourthByte & 0x1f

    var baseValue = BitOps.readLongBE(in, baseValueWidth)
    val msbMask = 1L << ((baseValueWidth * 8) - 1)
    if ((baseValue & msbMask) != 0) baseValue = -(baseValue & ~msbMask)

    val dataValues = new Array[Long](length)
    BitOps.readBitpacked(in, width, length, dataValues, 0)

    if (patchGapWidth + patchWidth > 64)
      throw new IllegalStateException(s"patchGapWidth ($patchGapWidth) + patchWidth ($patchWidth) > 64")

    val patchListWidth = BitOps.findNearestDirectWidth(patchWidth + patchGapWidth)
    val patchList = new Array[Long](patchListLength)
    BitOps.readBitpacked(in, patchListWidth, patchListLength, patchList, 0)

    val patchMask = (1L << patchWidth) - 1
    var patchIndex = 0
    var gap = 0L
    var patch = 0L

    def nextPatch(): Unit = {
      var raw = patchList(patchIndex); patchIndex += 1
      var curGap = raw >>> patchWidth
      patch = raw & patchMask
      while (curGap == 255 && patch == 0) {
        gap += 255
        raw = patchList(patchIndex); patchIndex += 1
        curGap = raw >>> patchWidth
        patch = raw & patchMask
      }
      gap += curGap
    }

    if (patchListLength > 0) nextPatch()
    var i = 0
    while (i < length) {
      if (patchListLength > 0 && i == gap) {
        out.add(baseValue + (dataValues(i) | (patch << width)))
        if (patchIndex < patchListLength) nextPatch()
      } else out.add(baseValue + dataValues(i))
      i += 1
    }
  }

  private def readDelta(in: BytesIn, firstByte: Int, signed: Boolean, out: LongBuf): Unit = {
    val encodedWidth = (firstByte >> 1) & 0x1f
    val width = if (encodedWidth != 0) BitOps.decodeDirectWidth(encodedWidth) else 0
    val length = ((firstByte & 0x1) << 8) | in.checkedByte() // delta lengths start at 0

    var currentValue = if (signed) BitOps.readVarIntSigned(in) else BitOps.readVarIntUnsigned(in)
    out.add(currentValue)

    val deltaBase = BitOps.readVarIntSigned(in)
    if (width == 0) {
      var i = 0
      while (i < length) { currentValue += deltaBase; out.add(currentValue); i += 1 }
    } else {
      currentValue += deltaBase
      out.add(currentValue)
      val deltaValues = new Array[Long](length - 1)
      BitOps.readBitpacked(in, width, length - 1, deltaValues, 0)
      var i = 0
      if (deltaBase > 0) while (i < length - 1) { currentValue += deltaValues(i); out.add(currentValue); i += 1 }
      else while (i < length - 1) { currentValue -= deltaValues(i); out.add(currentValue); i += 1 }
    }
  }
}

/** Growable primitive long buffer (no boxing). */
final class LongBuf(initialCapacity: Int = 64) {
  private var arr = new Array[Long](math.max(initialCapacity, 16))
  private var _len = 0
  def length: Int = _len
  def add(v: Long): Unit = {
    if (_len == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    arr(_len) = v
    _len += 1
  }
  def apply(i: Int): Long = arr(i)
  def toArray: Array[Long] = java.util.Arrays.copyOf(arr, _len)
  def clear(): Unit = _len = 0
}

/** Growable primitive boolean buffer (no boxing). */
final class BoolBuf(initialCapacity: Int = 64) {
  private var arr = new Array[Boolean](math.max(initialCapacity, 16))
  private var _len = 0
  def length: Int = _len
  def add(v: Boolean): Unit = {
    if (_len == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    arr(_len) = v
    _len += 1
  }
  def toArray: Array[Boolean] = java.util.Arrays.copyOf(arr, _len)
  def clear(): Unit = _len = 0
}

/** Growable primitive double buffer (no boxing). */
final class DoubleBuf(initialCapacity: Int = 64) {
  private var arr = new Array[Double](math.max(initialCapacity, 16))
  private var _len = 0
  def length: Int = _len
  def add(v: Double): Unit = {
    if (_len == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    arr(_len) = v
    _len += 1
  }
  def toArray: Array[Double] = java.util.Arrays.copyOf(arr, _len)
  def clear(): Unit = _len = 0
}

/** Growable primitive float buffer (no boxing). */
final class FloatBuf(initialCapacity: Int = 64) {
  private var arr = new Array[Float](math.max(initialCapacity, 16))
  private var _len = 0
  def length: Int = _len
  def add(v: Float): Unit = {
    if (_len == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    arr(_len) = v
    _len += 1
  }
  def toArray: Array[Float] = java.util.Arrays.copyOf(arr, _len)
  def clear(): Unit = _len = 0
}
