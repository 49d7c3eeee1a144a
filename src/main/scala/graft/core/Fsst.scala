package graft.core

/** FSST — Fast Static Symbol Table string compression (Boncz, Neumann,
  * Leis; VLDB 2020). A north-rule addition on top of the reference's
  * dictionary/direct string encodings: random-access string compression
  * with a 255-entry table of symbols of 1..8 bytes each, one output byte
  * per symbol, and a dedicated escape code for bytes not covered by the
  * table.
  *
  * This is an independent from-scratch implementation of the published
  * algorithm (the reference repo has no FSST); training is the paper's
  * iterative bottom-up scheme: start from frequent single bytes, then
  * repeatedly extend symbols by merging adjacent matches that maximize
  * gain = frequency × length, over a bounded number of generations.
  *
  * Wire format:
  *   [numSymbols: u8] then numSymbols × [len: u8][bytes...]
  *   payload: codes 0..numSymbols-1 index the table; 0xFF escapes the
  *   next literal byte.
  */
object Fsst {
  final val EscapeCode = 0xff
  final val MaxSymbols = 255
  final val MaxSymbolLen = 8

  final class SymbolTable(val symbols: Array[Array[Byte]]) {
    require(symbols.length <= MaxSymbols, s"${symbols.length} symbols > $MaxSymbols")

    /** Symbols packed little-endian into longs for one-compare matching. */
    private[Fsst] val symLong: Array[Long] = symbols.map(packLE)
    private[Fsst] val symLen: Array[Int] = symbols.map(_.length)

    /** first-byte → symbol indexes, longest first (greedy longest match). */
    private[Fsst] val byFirstByte: Array[Array[Int]] = {
      val buckets = Array.fill(256)(List.empty[Int])
      var i = 0
      while (i < symbols.length) {
        val fb = symbols(i)(0) & 0xff
        buckets(fb) = i :: buckets(fb)
        i += 1
      }
      buckets.map(_.sortBy(idx => -symbols(idx).length).toArray)
    }

    def serialize(out: ByteBuf): Unit = {
      out.writeByte(symbols.length)
      symbols.foreach { s =>
        out.writeByte(s.length)
        out.writeBytes(s)
      }
    }
  }

  @inline private def packLE(bytes: Array[Byte]): Long = {
    var w = 0L
    var i = bytes.length - 1
    while (i >= 0) { w = (w << 8) | (bytes(i) & 0xffL); i -= 1 }
    w
  }

  /** mask(len) keeps the low len bytes. */
  private val lenMask: Array[Long] =
    Array.tabulate(9)(len => if (len == 8) -1L else (1L << (len * 8)) - 1)

  object SymbolTable {
    def deserialize(in: BytesIn): SymbolTable = {
      val n = in.checkedByte()
      val symbols = new Array[Array[Byte]](n)
      var i = 0
      while (i < n) {
        val len = in.checkedByte()
        symbols(i) = in.readFully(len)
        i += 1
      }
      new SymbolTable(symbols)
    }
  }

  /** Train a symbol table on a sample corpus. Deterministic for a given
    * input. `generations` trades training time for compression.
    */
  def train(sample: Array[Byte], generations: Int = 5): SymbolTable = {
    if (sample.isEmpty) return new SymbolTable(Array.empty)
    // cap training input for bounded cost
    val corpus = if (sample.length > (1 << 16)) java.util.Arrays.copyOf(sample, 1 << 16) else sample

    // generation 0: frequent single bytes
    var table = {
      val counts = new Array[Long](256)
      corpus.foreach(b => counts(b & 0xff) += 1)
      val top = (0 until 256).filter(counts(_) > 0).sortBy(b => -counts(b)).take(MaxSymbols)
      new SymbolTable(top.map(b => Array(b.toByte)).toArray)
    }

    var gen = 0
    while (gen < generations) {
      // parse the corpus with the current table; count symbol and
      // adjacent-pair frequencies
      val symCount = new Array[Long](table.symbols.length + 256)
      val pairCount = new java.util.HashMap[Long, Long]() // (sym1 << 32 | sym2) -> freq
      var pos = 0
      var prev = -1
      while (pos < corpus.length) {
        val m = matchAt(table, corpus, pos)
        val (code, len) = if (m >= 0) (m, table.symbols(m).length) else (table.symbols.length + (corpus(pos) & 0xff), 1)
        symCount(code) += 1
        if (prev >= 0) {
          val key = (prev.toLong << 32) | code.toLong
          pairCount.merge(key, 1L, (a, b) => a + b)
        }
        prev = code
        pos += len
      }

      // candidates: existing symbols, escaped literals, and merged pairs
      def symbolBytes(code: Int): Array[Byte] =
        if (code < table.symbols.length) table.symbols(code)
        else Array((code - table.symbols.length).toByte)

      val candidates = new java.util.HashMap[String, (Array[Byte], Long)]()
      def addCandidate(bytes: Array[Byte], gain: Long): Unit = {
        if (bytes.length <= MaxSymbolLen && gain > 0) {
          val key = new String(bytes.map(b => (b & 0xff).toChar))
          val cur = candidates.get(key)
          if (cur == null || cur._2 < gain) candidates.put(key, (bytes, gain))
        }
      }
      var c = 0
      while (c < symCount.length) {
        if (symCount(c) > 0) {
          val bytes = symbolBytes(c)
          addCandidate(bytes, symCount(c) * bytes.length)
        }
        c += 1
      }
      pairCount.forEach { (key, freq) =>
        val s1 = symbolBytes((key >>> 32).toInt)
        val s2 = symbolBytes((key & 0xffffffffL).toInt)
        if (s1.length + s2.length <= MaxSymbolLen)
          addCandidate(s1 ++ s2, freq * (s1.length + s2.length))
      }

      val picked = candidates.values().toArray(Array.empty[(Array[Byte], Long)])
        .sortBy { case (bytes, gain) => (-gain, new String(bytes.map(b => (b & 0xff).toChar))) }
        .take(MaxSymbols)
        .map(_._1)
      table = new SymbolTable(picked)
      gen += 1
    }
    table
  }

  /** Longest symbol matching at `pos`, or -1. One long-compare per
    * candidate: the next ≤8 input bytes are packed once per position and
    * masked against the packed symbol.
    */
  private def matchAt(table: SymbolTable, data: Array[Byte], pos: Int): Int = {
    val bucket = table.byFirstByte(data(pos) & 0xff)
    if (bucket.length == 0) return -1
    val avail = math.min(MaxSymbolLen, data.length - pos)
    // pack window little-endian
    var w = 0L
    var j = avail - 1
    while (j >= 0) { w = (w << 8) | (data(pos + j) & 0xffL); j -= 1 }
    var i = 0
    while (i < bucket.length) {
      val idx = bucket(i)
      val len = table.symLen(idx)
      if (len <= avail && (w & lenMask(len)) == table.symLong(idx)) return idx
      i += 1
    }
    -1
  }

  def compress(table: SymbolTable, data: Array[Byte], out: ByteBuf): Unit = {
    var pos = 0
    while (pos < data.length) {
      val m = matchAt(table, data, pos)
      if (m >= 0) {
        out.writeByte(m)
        pos += table.symLen(m)
      } else {
        out.writeByte(EscapeCode)
        out.writeByte(data(pos) & 0xff)
        pos += 1
      }
    }
  }

  def decompress(table: SymbolTable, data: Array[Byte], from: Int, until: Int, out: ByteBuf): Unit = {
    var pos = from
    while (pos < until) {
      val code = data(pos) & 0xff
      pos += 1
      if (code == EscapeCode) {
        out.writeByte(data(pos) & 0xff)
        pos += 1
      } else {
        out.writeBytes(table.symbols(code))
      }
    }
  }
}
