package graft.core

/** Chunk-level Bloom filter for equality pruning on unsorted columns.
  *
  * The reference defines the protocol message but never writes it
  * (/root/reference/src/ApacheOrcDotNet/Protocol/BloomFilter.cs:9-16);
  * this engine implements the feature the stub was for: min/max range
  * stats prune nothing on a high-cardinality UNSORTED column (every
  * chunk's range spans the domain), while a bloom filter answers
  * "definitely not in this chunk" for point lookups — the
  * content-addressed-read shape (url/text equality) a 100 TB corpus
  * serves constantly.
  *
  * Engineering shape follows the ORC spec's bloom filter (k hash
  * functions simulated from two base hashes via double hashing,
  * h_i = h1 + i·h2 — Kirsch-Mitzenmacher), but the hash is our own
  * seeded xxh64 over the value bytes; chunks are self-consistent
  * (written and read by this engine only), so cross-engine hash
  * compatibility is a non-goal.
  *
  * Serialized form: varint numHashes, varint numWords, then words LE.
  */
final class Bloom(val words: Array[Long], val numHashes: Int) {
  private val numBits: Long = words.length.toLong * 64

  def mightContain(h1: Long, h2: Long): Boolean = {
    var i = 0
    var h = h1
    while (i < numHashes) {
      val bit = (h & Long.MaxValue) % numBits
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0) return false
      h += h2
      i += 1
    }
    true
  }

  def serialize(out: ByteBuf): Unit = {
    BitOps.writeVarIntUnsigned(out, numHashes.toLong)
    BitOps.writeVarIntUnsigned(out, words.length.toLong)
    var i = 0
    while (i < words.length) {
      var w = words(i)
      var b = 0
      while (b < 8) { out.writeByte((w & 0xff).toInt); w >>>= 8; b += 1 }
      i += 1
    }
  }
}

object Bloom {
  /** Default false-positive target, the ORC writer's default. */
  final val DefaultFpp = 0.05

  /** Accumulates (h1, h2) pairs; the filter is sized from the actual
    * value count at build time (chunk sizes aren't known up front).
    */
  final class Builder {
    private val hashes = new LongBuf(256)
    def addBytes(v: Array[Byte], off: Int, len: Int): Unit = {
      hashes.add(xxh64(v, off, len, 0x9747b28cL))
      hashes.add(xxh64(v, off, len, 0x5bd1e995L))
    }
    def addBytes(v: Array[Byte]): Unit = addBytes(v, 0, v.length)
    def addLong(v: Long): Unit = {
      val b = new Array[Byte](8)
      var i = 0
      var x = v
      while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
      addBytes(b)
    }
    def count: Int = hashes.length / 2
    /** Pre-sizing hash pairs, for partial-aggregate merge/serialization. */
    def hashPairs: Array[Long] = hashes.toArray
    def addPair(h1: Long, h2: Long): Unit = { hashes.add(h1); hashes.add(h2) }
    def mergeFrom(other: Builder): Unit = {
      val hs = other.hashPairs
      var i = 0
      while (i < hs.length) { hashes.add(hs(i)); i += 1 }
    }
    def build(fpp: Double = DefaultFpp): Bloom = {
      val n = math.max(1, count)
      // m = -n·ln(p)/ln(2)^2 bits, k = m/n·ln(2)
      val m = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
      val numWords = math.max(1, ((m + 63) / 64)).toInt
      val k = math.max(1, math.round(numWords * 64.0 / n * math.log(2)).toInt)
      val words = new Array[Long](numWords)
      val numBits = numWords.toLong * 64
      val hs = hashes.toArray
      var i = 0
      while (i < hs.length) {
        val h1 = hs(i)
        val h2 = hs(i + 1)
        var j = 0
        var h = h1
        while (j < k) {
          val bit = (h & Long.MaxValue) % numBits
          words((bit >>> 6).toInt) |= 1L << (bit & 63)
          h += h2
          j += 1
        }
        i += 2
      }
      new Bloom(words, k)
    }
    def clear(): Unit = hashes.clear()
  }

  /** Fixed-size builder for unbounded-group aggregation (the SQL
    * bloom_agg surface): bits are set directly into a bitset sized from
    * `expected` distinct values up front, so the aggregation buffer is
    * CONSTANT-size and two partial buffers merge with a bitwise OR —
    * unlike [[Builder]], whose pair list grows with the input (right for
    * chunk encoding, where chunk size bounds it; an OOM hazard for a
    * 100M-row SQL group). If the true cardinality far exceeds
    * `expected`, the fpp degrades gracefully — the standard sized-sketch
    * trade, never false negatives.
    */
  final class FixedBuilder(expected: Int, fpp: Double = DefaultFpp) {
    private val m = math.ceil(-math.max(1, expected) * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong
    private val numWords = math.max(1, ((m + 63) / 64)).toInt
    val k: Int = math.max(1, math.round(
      numWords * 64.0 / math.max(1, expected) * math.log(2)).toInt)
    val words = new Array[Long](numWords)
    private val numBits = numWords.toLong * 64
    private def insert(h1: Long, h2: Long): Unit = {
      var i = 0
      var h = h1
      while (i < k) {
        val bit = (h & Long.MaxValue) % numBits
        words((bit >>> 6).toInt) |= 1L << (bit & 63)
        h += h2
        i += 1
      }
    }
    def addBytes(v: Array[Byte]): Unit =
      insert(xxh64(v, 0, v.length, 0x9747b28cL), xxh64(v, 0, v.length, 0x5bd1e995L))
    def addLong(v: Long): Unit = {
      val (h1, h2) = hashPairLong(v)
      insert(h1, h2)
    }
    def or(other: FixedBuilder): Unit = {
      require(other.words.length == words.length && other.k == k,
        "cannot OR bloom builders of different sizes")
      var i = 0
      while (i < words.length) { words(i) |= other.words(i); i += 1 }
    }
    def build(): Bloom = new Bloom(words, k)
  }

  def serialize(b: Bloom): Array[Byte] = {
    val out = new ByteBuf(b.words.length * 8 + 8)
    b.serialize(out)
    out.toArray
  }

  // ---- tagged envelope: ONE wire format for both bloom surfaces ----
  // Chunk-level blooms (TableEncoder) and SQL bloom_agg values share this
  // envelope: magic 'G', a one-byte hash-representation tag ('B' = hashed
  // over value bytes, 'L' = hashed over the LE-serialized long), then the
  // raw body. The magic makes a chunk bloom probed through SQL
  // bloom_contains (or vice versa) parse correctly instead of reading the
  // body's varint numHashes as a type tag; legacy untagged bodies are
  // still accepted (tag 0 = unknown) since no varint-k filter starts with
  // 'G' = 71 hashes.
  final val Magic: Byte = 'G'
  final val TagBytes: Byte = 'B'
  final val TagLong: Byte = 'L'

  def serializeTagged(b: Bloom, tag: Byte): Array[Byte] = {
    val out = new ByteBuf(b.words.length * 8 + 10)
    out.writeByte(Magic.toInt)
    out.writeByte(tag.toInt)
    b.serialize(out)
    out.toArray
  }

  /** (tag, filter); tag 0 for legacy untagged bodies. */
  def deserializeTagged(bytes: Array[Byte]): (Byte, Bloom) = {
    require(bytes.length >= 2, "not a bloom value: too short")
    if (bytes(0) == Magic)
      (bytes(1), deserialize(java.util.Arrays.copyOfRange(bytes, 2, bytes.length)))
    else (0, deserialize(bytes))
  }

  def deserialize(bytes: Array[Byte]): Bloom = {
    val in = new BytesIn(bytes)
    val k = BitOps.readVarIntUnsigned(in).toInt
    val numWords = BitOps.readVarIntUnsigned(in).toInt
    val words = new Array[Long](numWords)
    var i = 0
    while (i < numWords) {
      var w = 0L
      var b = 0
      while (b < 8) { w |= (in.checkedByte() & 0xffL) << (b * 8); b += 1 }
      words(i) = w
      i += 1
    }
    new Bloom(words, k)
  }

  /** Query-side hash pair for a value's bytes — must mirror Builder. */
  def hashPair(v: Array[Byte]): (Long, Long) =
    (xxh64(v, 0, v.length, 0x9747b28cL), xxh64(v, 0, v.length, 0x5bd1e995L))

  def hashPairLong(v: Long): (Long, Long) = {
    val b = new Array[Byte](8)
    var i = 0
    var x = v
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    hashPair(b)
  }

  // ---- xxHash64 (public domain algorithm, Yann Collet) ----
  private final val P1 = -7046029288634856825L // 0x9E3779B185EBCA87
  private final val P2 = -4417276706812531889L // 0xC2B2AE3D27D4EB4F
  private final val P3 = 1609587929392839161L  // 0x165667B19E3779F9
  private final val P4 = -8796714831421723037L // 0x85EBCA77C2B2AE63
  private final val P5 = 2870177450012600261L  // 0x27D4EB2F165667C5

  def xxh64(data: Array[Byte], off: Int, len: Int, seed: Long): Long = {
    val end = off + len
    var h: Long = 0
    var i = off
    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      while (i <= end - 32) {
        v1 = java.lang.Long.rotateLeft(v1 + le64(data, i) * P2, 31) * P1
        v2 = java.lang.Long.rotateLeft(v2 + le64(data, i + 8) * P2, 31) * P1
        v3 = java.lang.Long.rotateLeft(v3 + le64(data, i + 16) * P2, 31) * P1
        v4 = java.lang.Long.rotateLeft(v4 + le64(data, i + 24) * P2, 31) * P1
        i += 32
      }
      h = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
        java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
      h = (h ^ java.lang.Long.rotateLeft(v1 * P2, 31) * P1) * P1 + P4
      h = (h ^ java.lang.Long.rotateLeft(v2 * P2, 31) * P1) * P1 + P4
      h = (h ^ java.lang.Long.rotateLeft(v3 * P2, 31) * P1) * P1 + P4
      h = (h ^ java.lang.Long.rotateLeft(v4 * P2, 31) * P1) * P1 + P4
    } else h = seed + P5
    h += len
    while (i <= end - 8) {
      h = java.lang.Long.rotateLeft(h ^ (java.lang.Long.rotateLeft(le64(data, i) * P2, 31) * P1), 27) * P1 + P4
      i += 8
    }
    if (i <= end - 4) {
      h = java.lang.Long.rotateLeft(h ^ ((le32(data, i) & 0xffffffffL) * P1), 23) * P2 + P3
      i += 4
    }
    while (i < end) {
      h = java.lang.Long.rotateLeft(h ^ ((data(i) & 0xffL) * P5), 11) * P1
      i += 1
    }
    h ^= h >>> 33
    h *= P2
    h ^= h >>> 29
    h *= P3
    h ^= h >>> 32
    h
  }

  @inline private def le64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) | ((b(i + 7) & 0xffL) << 56)

  @inline private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
}
