package graft.spark

import graft.core.{ByteBuf, BytesIn, ZlibBlock}
import graft.columns._
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.mutable.ArrayBuffer

/** Schema-driven encode/decode between a DataFrame and its per-column
  * encoded chunks.
  *
  * Spark-first layout: the whole reference write path
  * (StripeWriter.AddRows → CompleteStride → CompleteStripe,
  * /root/reference/src/ApacheOrcDotNet/Stripes/StripeWriter.cs:52-191)
  * happens INSIDE one `mapPartitions` closure — rows are pivoted into
  * per-column buffers, flushed as a chunk every `strideRows` rows or
  * `chunkTargetBytes` buffered bytes, whichever first. The only process
  * boundaries are the explicit partitioning shuffle before encode and the
  * manifest commit after — both north-rule additions the single-process
  * reference lacks.
  */
object TableEncoder {

  /** A chunk plays the reference's STRIPE role (64 MiB,
    * WriterConfiguration.cs:19), not its 10k-row stride: zlib framing,
    * dictionaries, and FSST tables amortize across the whole chunk, so
    * small chunks pay their fixed costs many times over. The byte cap is
    * what bounds executor memory; the row cap is a backstop for tables
    * with very narrow rows.
    */
  final val DefaultStrideRows = 1 << 20
  final val DefaultChunkTargetBytes = 32L * 1024 * 1024 // bounded executor memory per buffer

  /** Row-index granularity WITHIN a chunk (the reference's 10k-row
    * stride, WriterConfiguration.cs:29): per-stride min/max let
    * decodePruned skip most of a partially-overlapping chunk without
    * shrinking chunks (small chunks multiply zlib/dict/FSST fixed costs).
    */
  final val DefaultIndexStrideRows = 10000

  // ---------- shredding: Spark types → codec-ready physical columns ----------

  /** Columns are pre-converted with codegen'd expressions (unix_micros,
    * datediff, casts) so the encode closure sees only long / bool /
    * double / float / binary / string — no per-row type dispatch cost.
    */
  def columnSpecs(schema: StructType, stringCodecs: Map[String, String]): Array[ColumnSpec] =
    schema.fields.map { f =>
      val logical = f.dataType match {
        case LongType | IntegerType | ShortType | ByteType => "long"
        case BooleanType                                   => "bool"
        case DoubleType                                    => "double"
        case FloatType                                     => "float"
        case BinaryType                                    => "binary"
        case StringType                                    => "string"
        case TimestampType                                 => "timestamp"
        case TimestampNTZType                              => "timestamp_ntz"
        case DateType                                      => "date"
        case d: DecimalType if d.precision <= 18           => "decimal"
        case d: DecimalType if d.precision <= 38           => "decimal128"
        case dt => throw new IllegalArgumentException(s"unsupported column type for ${f.name}: $dt")
      }
      val narrow = f.dataType match {
        case IntegerType    => "int"
        case ShortType      => "short"
        case ByteType       => "byte"
        case d: DecimalType => s"${d.precision},${d.scale}"
        case _              => ""
      }
      ColumnSpec(f.name, logical, stringCodecs.getOrElse(f.name, Codecs.StringDirect), narrow)
    }

  def shred(df: DataFrame, specs: Array[ColumnSpec]): DataFrame = {
    val cols = specs.map { s =>
      s.logical match {
        case "long"          => col(s.name).cast(LongType).as(s.name)
        case "timestamp"     => unix_micros(col(s.name)).as(s.name)
        case "timestamp_ntz" => unix_micros(col(s.name).cast(TimestampType)).as(s.name)
        case "date"      => datediff(col(s.name), lit(java.sql.Date.valueOf("1970-01-01"))).cast(LongType).as(s.name)
        case "decimal" =>
          // decimal(p≤18,s) → unscaled mantissa long; ×10^s in exact
          // decimal arithmetic (the reference's mantissa+scale model,
          // DecimalWriter.cs:30-31)
          val sc = s.narrow.split(',')(1).toInt
          (col(s.name) * lit(java.math.BigDecimal.TEN.pow(sc))).cast(LongType).as(s.name)
        case "string" =>
          // UTF-8 bytes produced inside the codegen'd projection: the
          // encode closure never materializes a UTF-16 String (the
          // dominant allocation of the old hot path)
          col(s.name).cast(BinaryType).as(s.name)
        case _           => col(s.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Inverse of shred: physical decode output → original Spark types. */
  def unshred(df: DataFrame, specs: Array[ColumnSpec]): DataFrame = {
    val cols = specs.map { s =>
      s.logical match {
        case "timestamp"     => timestamp_micros(col(s.name)).as(s.name)
        case "timestamp_ntz" => timestamp_micros(col(s.name)).cast(TimestampNTZType).as(s.name)
        case "date"      => date_add(lit(java.sql.Date.valueOf("1970-01-01")), col(s.name).cast(IntegerType)).as(s.name)
        case "long" if s.narrow.nonEmpty =>
          val dt = s.narrow match { case "int" => IntegerType; case "short" => ShortType; case _ => ByteType }
          col(s.name).cast(dt).as(s.name)
        case "decimal" =>
          val Array(p0, sc) = s.narrow.split(',').map(_.toInt)
          (col(s.name).cast(DecimalType(38, 0)) / lit(java.math.BigDecimal.TEN.pow(sc)))
            .cast(DecimalType(p0, sc)).as(s.name)
        case "string"    => col(s.name).cast(StringType).as(s.name)
        case _           => col(s.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  // ---------- per-column accumulation buffers ----------

  private sealed trait ColBuf {
    var rows = 0
    var rawBytes = 0L
    val present = new graft.core.BoolBuf(1024) // primitive: no boxing in the hot path
    def add(row: Row, i: Int): Unit
    def encode(aligned: Boolean): ColumnStreams
    def minMax: (Option[String], Option[String])
    def sumVal: Option[Long] = None
    /** Per-stride (min, max) arrays — long-family columns only. */
    def strideStats: (Option[Seq[Long]], Option[Seq[Long]]) = (None, None)
    def clear(): Unit = { rows = 0; rawBytes = 0L; present.clear() }
  }

  private final class LongColBuf(codecTag: String, indexStride: Int) extends ColBuf {
    private val values = new graft.core.LongBuf(1024)
    private var mn = Long.MaxValue
    private var mx = Long.MinValue
    private var sum = 0L
    private var sumOverflowed = false
    // per-stride row index: closed strides + the currently-open one
    private val sMins = new ArrayBuffer[Long]()
    private val sMaxs = new ArrayBuffer[Long]()
    private var strideMn = Long.MaxValue
    private var strideMx = Long.MinValue
    private var rowsInStride = 0
    private def closeStride(): Unit = {
      // empty stride (all nulls) → always-keep sentinel range
      if (strideMn == Long.MaxValue && strideMx == Long.MinValue) {
        sMins += Long.MinValue; sMaxs += Long.MaxValue
      } else { sMins += strideMn; sMaxs += strideMx }
      strideMn = Long.MaxValue; strideMx = Long.MinValue; rowsInStride = 0
    }
    def add(row: Row, i: Int): Unit = {
      rows += 1
      rowsInStride += 1
      if (row.isNullAt(i)) present.add(false)
      else {
        present.add(true)
        val v = row.getLong(i)
        values.add(v)
        if (v < mn) mn = v
        if (v > mx) mx = v
        if (v < strideMn) strideMn = v
        if (v > strideMx) strideMx = v
        val prev = sum
        sum += v
        // overflow-checked sum like LongWriterStatistics.cs:9-76
        if (((prev ^ sum) & (v ^ sum)) < 0) sumOverflowed = true
        rawBytes += 8
      }
      if (rowsInStride == indexStride) closeStride()
    }
    override def strideStats: (Option[Seq[Long]], Option[Seq[Long]]) = {
      if (rows == 0) return (None, None)
      // snapshot without mutating (flush reads this, then clear() resets)
      val mins = sMins.toVector ++ (if (rowsInStride > 0)
        Vector(if (strideMn == Long.MaxValue) Long.MinValue else strideMn) else Vector.empty)
      val maxs = sMaxs.toVector ++ (if (rowsInStride > 0)
        Vector(if (strideMx == Long.MinValue) Long.MaxValue else strideMx) else Vector.empty)
      (Some(mins), Some(maxs))
    }
    def encode(aligned: Boolean): ColumnStreams = codecTag match {
      case "timestamp" => ColumnCodec.encodeTimestamp(values.toArray, present.toArray, aligned)
      case "date"      => ColumnCodec.encodeDate(values.toArray, present.toArray, aligned)
      case "byte"      =>
        // reference routes byte columns to ByteRLE (ByteWriter.cs:87-88)
        val longs = values.toArray
        val bytes = new Array[Byte](longs.length)
        var bi = 0
        while (bi < longs.length) { bytes(bi) = longs(bi).toByte; bi += 1 }
        ColumnCodec.encodeByte(bytes, present.toArray)
      case t if t.startsWith("decimal:") =>
        val sc = t.substring(8).toLong
        ColumnCodec.encodeDecimal18(values.toArray, Array.fill(values.length)(sc), present.toArray, aligned)
      case _           => ColumnCodec.encodeLong(values.toArray, present.toArray, aligned)
    }
    def minMax: (Option[String], Option[String]) =
      if (values.length == 0) (None, None) else (Some(mn.toString), Some(mx.toString))
    override def sumVal: Option[Long] =
      if (values.length == 0 || sumOverflowed) None else Some(sum)
    override def clear(): Unit = {
      super.clear(); values.clear(); mn = Long.MaxValue; mx = Long.MinValue
      sum = 0L; sumOverflowed = false
      sMins.clear(); sMaxs.clear()
      strideMn = Long.MaxValue; strideMx = Long.MinValue; rowsInStride = 0
    }
  }

  /** True/false counts like the reference's BooleanWriterStatistics;
    * min/max rendered 0/1 so boolean predicates can prune, sum = count
    * of trues.
    */
  private final class BoolColBuf extends ColBuf {
    private val values = new graft.core.BoolBuf(1024)
    private var trues = 0L
    def add(row: Row, i: Int): Unit = {
      rows += 1
      if (row.isNullAt(i)) present.add(false)
      else {
        present.add(true)
        val v = row.getBoolean(i)
        if (v) trues += 1
        values.add(v)
        rawBytes += 1
      }
    }
    def encode(aligned: Boolean): ColumnStreams = ColumnCodec.encodeBool(values.toArray, present.toArray)
    def minMax: (Option[String], Option[String]) =
      if (values.length == 0) (None, None)
      else (Some(if (trues < values.length) "0" else "1"), Some(if (trues > 0) "1" else "0"))
    override def sumVal: Option[Long] = if (values.length == 0) None else Some(trues)
    override def clear(): Unit = { super.clear(); values.clear(); trues = 0L }
  }

  /** Order-preserving map double → long (Lucene's sortableLong): stride
    * min/max for double columns ride the same long-typed row-index fields
    * as integer columns, with predicate bounds mapped the same way.
    * NaN excluded by callers.
    */
  def doubleSortableBits(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }

  /** Min/max like DoubleWriterStatistics.cs — NaN values are excluded
    * from the range (a NaN min/max would poison every pruning compare).
    * Per-stride min/max recorded in sortable-bits space for the sub-chunk
    * row index.
    */
  private final class DoubleColBuf(indexStride: Int) extends ColBuf {
    private val values = new graft.core.DoubleBuf(1024)
    private var mn = Double.PositiveInfinity
    private var mx = Double.NegativeInfinity
    private var sawFinite = false
    private val sMins = new ArrayBuffer[Long]()
    private val sMaxs = new ArrayBuffer[Long]()
    private var strideMn = Long.MaxValue
    private var strideMx = Long.MinValue
    private var rowsInStride = 0
    private def closeStride(): Unit = {
      // empty or all-NaN stride → always-keep sentinel range
      if (strideMn == Long.MaxValue && strideMx == Long.MinValue) {
        sMins += Long.MinValue; sMaxs += Long.MaxValue
      } else { sMins += strideMn; sMaxs += strideMx }
      strideMn = Long.MaxValue; strideMx = Long.MinValue; rowsInStride = 0
    }
    def add(row: Row, i: Int): Unit = {
      rows += 1
      rowsInStride += 1
      if (row.isNullAt(i)) present.add(false)
      else {
        present.add(true)
        val v = row.getDouble(i)
        if (!v.isNaN) {
          sawFinite = true
          if (v < mn) mn = v
          if (v > mx) mx = v
          val s = doubleSortableBits(v)
          if (s < strideMn) strideMn = s
          if (s > strideMx) strideMx = s
        }
        values.add(v)
        rawBytes += 8
      }
      if (rowsInStride == indexStride) closeStride()
    }
    override def strideStats: (Option[Seq[Long]], Option[Seq[Long]]) = {
      if (rows == 0) return (None, None)
      val mins = sMins.toVector ++ (if (rowsInStride > 0)
        Vector(if (strideMn == Long.MaxValue) Long.MinValue else strideMn) else Vector.empty)
      val maxs = sMaxs.toVector ++ (if (rowsInStride > 0)
        Vector(if (strideMx == Long.MinValue) Long.MaxValue else strideMx) else Vector.empty)
      (Some(mins), Some(maxs))
    }
    def encode(aligned: Boolean): ColumnStreams = ColumnCodec.encodeDouble(values.toArray, present.toArray)
    def minMax: (Option[String], Option[String]) =
      if (!sawFinite) (None, None) else (Some(mn.toString), Some(mx.toString))
    override def clear(): Unit = {
      super.clear(); values.clear()
      mn = Double.PositiveInfinity; mx = Double.NegativeInfinity; sawFinite = false
      sMins.clear(); sMaxs.clear()
      strideMn = Long.MaxValue; strideMx = Long.MinValue; rowsInStride = 0
    }
  }

  private final class FloatColBuf extends ColBuf {
    private val values = new graft.core.FloatBuf(1024)
    private var mn = Float.PositiveInfinity
    private var mx = Float.NegativeInfinity
    private var sawFinite = false
    def add(row: Row, i: Int): Unit = {
      rows += 1
      if (row.isNullAt(i)) present.add(false)
      else {
        present.add(true)
        val v = row.getFloat(i)
        if (!v.isNaN) {
          sawFinite = true
          if (v < mn) mn = v
          if (v > mx) mx = v
        }
        values.add(v)
        rawBytes += 4
      }
    }
    def encode(aligned: Boolean): ColumnStreams = ColumnCodec.encodeFloat(values.toArray, present.toArray)
    def minMax: (Option[String], Option[String]) =
      if (!sawFinite) (None, None) else (Some(mn.toString), Some(mx.toString))
    override def clear(): Unit = {
      super.clear(); values.clear()
      mn = Float.PositiveInfinity; mx = Float.NegativeInfinity; sawFinite = false
    }
  }

  /** Length-sum statistic (BinaryWriterStatistics' SumValues) via
    * sum_val; no value range for opaque bytes.
    */
  private final class BinaryColBuf extends ColBuf {
    private val values = new ArrayBuffer[Array[Byte]]()
    def add(row: Row, i: Int): Unit = {
      rows += 1
      if (row.isNullAt(i)) present.add(false)
      else {
        present.add(true)
        val v = row.getAs[Array[Byte]](i)
        values += v
        rawBytes += v.length
      }
    }
    def encode(aligned: Boolean): ColumnStreams = ColumnCodec.encodeBinary(values.toArray, present.toArray, aligned)
    def minMax: (Option[String], Option[String]) = (None, None)
    override def sumVal: Option[Long] = if (values.isEmpty) None else Some(rawBytes)
    override def clear(): Unit = { super.clear(); values.clear() }
  }

  /** Decimal precision 19–38: unscaled BigInteger mantissa, schema-fixed
    * scale (the reference's DecimalWriter >64-bit route). The shredded
    * row still carries the real DecimalType — no long funnel exists for
    * these widths. Min/max stats render as plain decimal strings so
    * pruning can try_cast them to decimal/double.
    */
  private final class Decimal128ColBuf(scale: Int) extends ColBuf {
    private val values = new ArrayBuffer[java.math.BigInteger]()
    private var mn: java.math.BigInteger = null
    private var mx: java.math.BigInteger = null
    def add(row: Row, i: Int): Unit = {
      rows += 1
      if (row.isNullAt(i)) present.add(false)
      else {
        present.add(true)
        val u = row.getDecimal(i).setScale(scale).unscaledValue
        values += u
        if (mn == null || u.compareTo(mn) < 0) mn = u
        if (mx == null || u.compareTo(mx) > 0) mx = u
        rawBytes += 16
      }
    }
    def encode(aligned: Boolean): ColumnStreams =
      ColumnCodec.encodeDecimal128(values.toArray, Array.fill(values.length)(scale.toLong),
        present.toArray, aligned)
    def minMax: (Option[String], Option[String]) =
      (Option(mn).map(u => new java.math.BigDecimal(u, scale).toPlainString),
        Option(mx).map(u => new java.math.BigDecimal(u, scale).toPlainString))
    override def clear(): Unit = { super.clear(); values.clear(); mn = null; mx = null }
  }

  private final class StringColBuf(codec: String) extends ColBuf {
    private val values = new ArrayBuffer[Array[Byte]]() // UTF-8 (shredded via cast to binary)
    private var mn: Array[Byte] = null
    private var mx: Array[Byte] = null
    // FSST symbol table trained on the partition's first chunk, reused for
    // every later chunk of this partition (amortizes training; the table is
    // still serialized per chunk so decode stays self-contained)
    private var fsstTable: graft.core.Fsst.SymbolTable = null
    def add(row: Row, i: Int): Unit = {
      rows += 1
      if (row.isNullAt(i)) present.add(false)
      else {
        present.add(true)
        val v = row.getAs[Array[Byte]](i)
        values += v
        // unsigned byte order == code-point order (UTF-16 ordinal differs
        // only beyond the BMP); stats are advisory min/max, fine either way
        if (mn == null || java.util.Arrays.compareUnsigned(v, mn) < 0) mn = v
        if (mx == null || java.util.Arrays.compareUnsigned(v, mx) > 0) mx = v
        rawBytes += v.length
      }
    }
    def encode(aligned: Boolean): ColumnStreams = {
      if (codec == Codecs.StringFsst && fsstTable == null) {
        val corpus = new graft.core.ByteBuf(1 << 14)
        var i = 0
        while (i < values.length && corpus.length < (1 << 16)) {
          corpus.writeBytes(values(i))
          i += 1
        }
        fsstTable = graft.core.Fsst.train(corpus.toArray)
      }
      CodecSelector.encodeStrBytes(codec, values.toArray, present.toArray, fsstTable, aligned)
    }
    def minMax: (Option[String], Option[String]) =
      (Option(mn).map(new String(_, java.nio.charset.StandardCharsets.UTF_8)),
        Option(mx).map(new String(_, java.nio.charset.StandardCharsets.UTF_8)))
    // StringWriterStatistics.cs:9-60 sums value lengths; rawBytes is
    // exactly the summed UTF-8 length of the non-null values
    override def sumVal: Option[Long] = if (values.isEmpty) None else Some(rawBytes)
    override def clear(): Unit = { super.clear(); values.clear(); mn = null; mx = null }
  }

  private def newBuf(spec: ColumnSpec, indexStride: Int): ColBuf = spec.logical match {
    case "long" if spec.narrow == "byte" => new LongColBuf("byte", indexStride)
    case "long"             => new LongColBuf("long", indexStride)
    case "timestamp" | "timestamp_ntz" => new LongColBuf("timestamp", indexStride)
    case "decimal"          => new LongColBuf("decimal:" + spec.narrow.split(',')(1), indexStride)
    case "decimal128"       => new Decimal128ColBuf(spec.narrow.split(',')(1).toInt)
    case "date"             => new LongColBuf("date", indexStride)
    case "bool"             => new BoolColBuf
    case "double"           => new DoubleColBuf(indexStride)
    case "float"            => new FloatColBuf
    case "binary"           => new BinaryColBuf
    case "string"           => new StringColBuf(spec.stringCodec)
    case other              => throw new IllegalArgumentException(other)
  }

  private def codecName(spec: ColumnSpec): String = spec.logical match {
    case "long"      => Codecs.LongRleV2
    case "timestamp" | "timestamp_ntz" => Codecs.TimestampFor
    case "decimal"   => Codecs.Decimal18
    case "decimal128" => Codecs.Decimal128
    case "date"      => Codecs.Date
    case "bool"      => Codecs.Bool
    case "double"    => Codecs.DoubleRaw
    case "float"     => Codecs.FloatRaw
    case "binary"    => Codecs.Binary
    case "string"    => spec.stringCodec
  }

  // ---------- encode ----------

  /** Shredded DataFrame → Dataset[EncodedChunk]. Pure narrow map (no
    * shuffle): callers choose the partitioning beforehand (EncodeJob does
    * range+salt). Stays in the Dataset API — the partition id travels as
    * a codegen'd `spark_partition_id()` column rather than via RDD
    * mapPartitionsWithIndex.
    */
  def encode(shredded: DataFrame, specs: Array[ColumnSpec],
             strideRows: Int = DefaultStrideRows,
             chunkTargetBytes: Long = DefaultChunkTargetBytes,
             partIdOffset: Int = 0,
             indexStrideRows: Int = DefaultIndexStrideRows,
             aligned: Boolean = false,
             compression: String = graft.core.BlockCompression.Zlib): Dataset[EncodedChunk] = {
    val spark = shredded.sparkSession
    import spark.implicits._
    val specsB = spark.sparkContext.broadcast(specs)
    val withPid = shredded.withColumn("__pid", spark_partition_id())
    val pidIdx = specs.length

    withPid.mapPartitions { rows =>
      val sp = specsB.value
      val bufs = sp.map(newBuf(_, indexStrideRows))
      var pid = -1
      var chunkId = 0
      var firstRow = 0L
      var rowsInChunk = 0
      var bufferedBytes = 0L

      def flush(): Iterator[EncodedChunk] = {
        if (rowsInChunk == 0) Iterator.empty
        else {
          val out = sp.indices.iterator.map { i =>
            val cs = bufs(i).encode(aligned)
            val zstreams = cs.streams.map { case (k, v) =>
              k -> graft.core.BlockCompression.compress(compression, v)
            }
            val (mn, mx) = bufs(i).minMax
            val (sMins, sMaxs) = bufs(i).strideStats
            EncodedChunk(pid, chunkId, firstRow, sp(i).name, cs.codec,
              cs.rowCount, cs.nullCount, zstreams,
              bufs(i).rawBytes, zstreams.valuesIterator.map(_.length.toLong).sum, mn, mx,
              bufs(i).sumVal,
              if (sMins.isDefined) indexStrideRows else 0, sMins, sMaxs,
              compression = Some(compression))
          }.toArray
          firstRow += rowsInChunk
          chunkId += 1
          rowsInChunk = 0
          bufferedBytes = 0L
          bufs.foreach(_.clear())
          out.iterator
        }
      }

      new Iterator[EncodedChunk] {
        private var pending: Iterator[EncodedChunk] = Iterator.empty
        private def fill(): Unit = {
          while (!pending.hasNext && rows.hasNext) {
            val row = rows.next()
            if (pid < 0) pid = row.getInt(pidIdx) + partIdOffset
            var i = 0
            bufferedBytes = 0L
            while (i < sp.length) {
              bufs(i).add(row, i)
              bufferedBytes += bufs(i).rawBytes
              i += 1
            }
            rowsInChunk += 1
            if (rowsInChunk >= strideRows || bufferedBytes >= chunkTargetBytes)
              pending = flush()
          }
          if (!pending.hasNext && rowsInChunk > 0) pending = flush()
        }
        def hasNext: Boolean = { fill(); pending.hasNext }
        def next(): EncodedChunk = { fill(); pending.next() }
      }
    }
  }

  // ---------- decode ----------

  /** Dataset[EncodedChunk] (or its DataFrame read back from parquet) →
    * the original table. Chunks of the same (part_id, chunk_id) are
    * co-located with a hash repartition + in-partition sort (stays in
    * Tungsten shuffle format — no object serialization of the blobs)
    * and decoded by the same adjacency grouper as the zero-shuffle path.
    */
  def decode(chunks: Dataset[EncodedChunk], specs: Array[ColumnSpec],
             stridePrune: Option[(String, Long, Long)] = None): DataFrame =
    decodeAdjacent(
      chunks.repartition(col("part_id"), col("chunk_id"))
        .sortWithinPartitions("part_id", "chunk_id"),
      specs, stridePrune)

  /** Column-subset decode — the point of a columnar layout: only the
    * requested columns' streams are decompressed and value-decoded; the
    * rest of each chunk group is filtered out before any blob is touched
    * (the filter is an untyped metadata predicate, same trick as
    * decodePruned). Output schema follows `columns` order. Note the
    * chunk parquet itself still stores all columns in one file — at
    * 100 TB a reader wanting scan-level IO savings too would partition
    * the chunk table by `column`; this API removes the decode CPU and
    * (on the shuffle path) the network bytes for unrequested columns.
    */
  def decodeColumns(chunks: Dataset[EncodedChunk], specs: Array[ColumnSpec],
                    columns: Seq[String]): DataFrame = {
    val subset = subsetSpecs(specs, columns)
    import chunks.sparkSession.implicits._
    // filter by the RESOLVED names (subsetSpecs rebinds case-insensitively)
    val filtered = chunks.filter(col("column").isInCollection(subset.map(_.name))).as[EncodedChunk]
    decode(filtered, subset)
  }

  /** Case-insensitive name rebinding, like the reference reader's
    * property match (OrcReader.cs:49-64); the spec's canonical name wins
    * in the output schema.
    */
  def subsetSpecs(specs: Array[ColumnSpec], columns: Seq[String]): Array[ColumnSpec] =
    columns.map(n => specs.find(_.name.equalsIgnoreCase(n)).getOrElse(
      throw new IllegalArgumentException(
        s"unknown column $n; have ${specs.map(_.name).mkString(",")}"))).toArray

  /** Zero-shuffle decode for chunks whose layout preserves the writer's
    * row order: the encode task emits all of a chunk's column rows
    * consecutively, so when each read partition covers whole files (see
    * EncodeJob.readBackColocated, which pins maxPartitionBytes for the
    * read), a streaming single-pass group-by-adjacency suffices — no
    * Exchange in the plan. At 100 TB the shuffle in `decode` re-moves
    * every stream blob over the network once; this path avoids it.
    * Throws if a group is split across partitions (layout violated) —
    * fall back to `decode` in that case.
    */
  def decodeSequential(chunks: Dataset[EncodedChunk], specs: Array[ColumnSpec]): DataFrame =
    decodeAdjacent(chunks, specs)

  /** Shared decode core: adjacent rows of the same (part_id, chunk_id)
    * form one chunk group; each group decodes column-at-a-time into
    * primitive arrays and is emitted as UnsafeRows via UnsafeRowWriter —
    * no per-value boxing and no Row→InternalRow encoder pass (the old
    * Row.fromSeq path was 4.5× slower than encode at 32 cores).
    */
  private def decodeAdjacent(chunks: Dataset[EncodedChunk], specs: Array[ColumnSpec],
                             stridePrune: Option[(String, Long, Long)] = None): DataFrame = {
    val spark = chunks.sparkSession
    val specsB = spark.sparkContext.broadcast(specs)
    val schema = physicalSchema(specs)
    val rdd = chunks.rdd.mapPartitions { it =>
      val sp = specsB.value
      val writer = new org.apache.spark.sql.catalyst.expressions.codegen.UnsafeRowWriter(sp.length)
      new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
        private var pending: Iterator[org.apache.spark.sql.catalyst.InternalRow] = Iterator.empty
        private def fill(): Unit = {
          while (!pending.hasNext && it.hasNext) {
            val group = scala.collection.mutable.Map[String, EncodedChunk]()
            val first = it.next()
            group(first.column) = first
            while (group.size < sp.length) {
              require(it.hasNext,
                s"chunk (${first.part_id},${first.chunk_id}) split across partitions — " +
                  "read with readBackColocated or use decode()")
              val c = it.next()
              require(c.part_id == first.part_id && c.chunk_id == first.chunk_id,
                s"interleaved chunk groups: (${first.part_id},${first.chunk_id}) vs (${c.part_id},${c.chunk_id})")
              group(c.column) = c
            }
            pending = decodeChunkInternalRows(group.toMap, sp, writer, stridePrune)
          }
        }
        def hasNext: Boolean = { fill(); pending.hasNext }
        def next(): org.apache.spark.sql.catalyst.InternalRow = { fill(); pending.next() }
      }
    }
    org.apache.spark.sql.graftbridge.Bridge.internalCreateDataFrame(spark, rdd, schema)
  }

  /** Stats-pruned decode: skip whole chunks whose [min,max] on `column`
    * cannot overlap [lo,hi] — the point of the reference's per-stride
    * statistics (SURVEY §2.5) which its own reader never exploits. At
    * 100 TB this is the difference between scanning everything and
    * touching only matching chunks; callers still apply the exact filter
    * afterwards.
    */
  def decodePruned(chunks: Dataset[EncodedChunk], specs: Array[ColumnSpec],
                   column: String, lo: Long, hi: Long): DataFrame =
    decodePrunedTyped(chunks, specs, column, lit(lo), lit(hi), LongType,
      stridePrune = Some((column, lo, hi)))

  /** Range-prune on a double/float column's stats. Double columns also
    * carry a per-stride row index in sortable-bits space, so sub-chunk
    * skipping applies just like integer columns.
    */
  def decodePrunedDouble(chunks: Dataset[EncodedChunk], specs: Array[ColumnSpec],
                         column: String, lo: Double, hi: Double): DataFrame = {
    val stridePrune = specs.find(s => s.name == column && s.logical == "double")
      .map(_ => (column, doubleSortableBits(lo), doubleSortableBits(hi)))
    decodePrunedTyped(chunks, specs, column, lit(lo), lit(hi), DoubleType, stridePrune)
  }

  /** Range-prune on a string column's stats (lexicographic bounds). */
  def decodePrunedString(chunks: Dataset[EncodedChunk], specs: Array[ColumnSpec],
                         column: String, lo: String, hi: String): DataFrame =
    decodePrunedTyped(chunks, specs, column, lit(lo), lit(hi), StringType)

  /** Range-prune on a wide-decimal (precision 19-38) column's stats,
    * whose min/max are recorded as plain decimal strings. Narrow
    * decimals (≤18) store mantissa-space long stats — scale the bounds
    * and use `decodePruned` for those.
    */
  def decodePrunedDecimal(chunks: Dataset[EncodedChunk], specs: Array[ColumnSpec],
                          column: String,
                          lo: java.math.BigDecimal, hi: java.math.BigDecimal): DataFrame = {
    val spec = subsetSpecs(specs, Seq(column)).head
    require(spec.logical == "decimal128",
      s"$column is ${spec.logical}; decimal-string stats exist only for decimal128 columns")
    val Array(p, s) = spec.narrow.split(',').map(_.toInt)
    decodePrunedTyped(chunks, specs, spec.name, lit(lo), lit(hi), DecimalType(p, s))
  }

  private def decodePrunedTyped(chunks: Dataset[EncodedChunk], specs: Array[ColumnSpec],
                                column: String, lo: Column, hi: Column,
                                statType: DataType,
                                stridePrune: Option[(String, Long, Long)] = None): DataFrame = {
    import chunks.sparkSession.implicits._
    // column-based (untyped) predicate: a typed lambda filter would
    // deserialize whole EncodedChunk objects — including the stream
    // blobs — just to read four metadata fields; this way pruning +
    // pushdown reach the scan and the keep-set pass never touches blobs.
    // coalesce(..., true): null stats — absent, or uncastable to the
    // stat type (e.g. pruning a string column's stats as long, where
    // try_cast yields null instead of an ANSI cast error) — must KEEP
    // the chunk (conservative full scan), never silently drop it.
    val overlap = coalesce(
      !(col("max_val").try_cast(statType.sql) < lo.cast(statType) ||
        col("min_val").try_cast(statType.sql) > hi.cast(statType)),
      lit(true))
    val keep = chunks.toDF()
      .filter(col("column") === column && overlap)
      .select("part_id", "chunk_id")
    val pruned = chunks
      .join(org.apache.spark.sql.functions.broadcast(keep), Seq("part_id", "chunk_id"), "left_semi")
      .as[EncodedChunk]
    decode(pruned, specs, stridePrune)
  }

  /** Physical (shredded) schema for decode output. */
  def physicalSchema(specs: Array[ColumnSpec]): StructType =
    StructType(specs.map { s =>
      val dt = s.logical match {
        case "long" | "timestamp" | "timestamp_ntz" | "date" | "decimal" => LongType
        case "decimal128" =>
          val Array(p, sc) = s.narrow.split(',').map(_.toInt)
          DecimalType(p, sc)
        case "bool"                        => BooleanType
        case "double"                      => DoubleType
        case "float"                       => FloatType
        case "binary" | "string"           => BinaryType
      }
      StructField(s.name, dt, nullable = true)
    })

  /** One decoded column in primitive form: values packed (non-null only,
    * writer order) + the row-level present bitmap. No boxing anywhere.
    */
  private sealed trait Decoded { def present: Array[Boolean] }
  private final case class LongsD(values: Array[Long], present: Array[Boolean]) extends Decoded
  private final case class BoolsD(values: Array[Boolean], present: Array[Boolean]) extends Decoded
  private final case class DoublesD(values: Array[Double], present: Array[Boolean]) extends Decoded
  private final case class FloatsD(values: Array[Float], present: Array[Boolean]) extends Decoded
  private final case class BinsD(values: Array[Array[Byte]], present: Array[Boolean]) extends Decoded
  private final case class SlicesD(slices: ColumnCodec.ByteSlices, present: Array[Boolean]) extends Decoded
  private final case class DecsD(values: Array[org.apache.spark.sql.types.Decimal],
                                 precision: Int, scale: Int,
                                 present: Array[Boolean]) extends Decoded

  private def decodeColumnPrim(cs: ColumnStreams, spec: ColumnSpec): Decoded = spec.logical match {
    case "long" if cs.codec == Codecs.ByteRleC =>
      val (v, p) = ColumnCodec.decodeByte(cs)
      val longs = new Array[Long](v.length)
      var i = 0
      while (i < v.length) { longs(i) = v(i).toLong; i += 1 }
      LongsD(longs, p)
    case "long"      => val (v, p) = ColumnCodec.decodeLong(cs); LongsD(v, p)
    case "decimal"   => val (v, _, p) = ColumnCodec.decodeDecimal18(cs); LongsD(v, p)
    case "decimal128" =>
      val (unscaled, scales, p) = ColumnCodec.decodeDecimal128(cs)
      val Array(prec, sc) = spec.narrow.split(',').map(_.toInt)
      val decs = new Array[org.apache.spark.sql.types.Decimal](unscaled.length)
      var i = 0
      while (i < unscaled.length) {
        decs(i) = org.apache.spark.sql.types.Decimal(
          new java.math.BigDecimal(unscaled(i), scales(i).toInt))
        i += 1
      }
      DecsD(decs, prec, sc, p)
    case "timestamp" | "timestamp_ntz" => val (v, p) = ColumnCodec.decodeTimestamp(cs); LongsD(v, p)
    case "date"      => val (v, p) = ColumnCodec.decodeDate(cs); LongsD(v, p)
    case "bool"      => val (v, p) = ColumnCodec.decodeBool(cs); BoolsD(v, p)
    case "double"    => val (v, p) = ColumnCodec.decodeDouble(cs); DoublesD(v, p)
    case "float"     => val (v, p) = ColumnCodec.decodeFloat(cs); FloatsD(v, p)
    case "binary"    => val (v, p) = ColumnCodec.decodeBinarySlices(cs); SlicesD(v, p)
    case "string"    => val (v, p) = ColumnCodec.decodeStrSlices(cs); SlicesD(v, p)
  }

  /** Decode one chunk's columns and emit UnsafeRows through a reused
    * writer. The returned rows alias the writer's buffer — consume each
    * before calling next() (the contract of every columnar scan in Spark;
    * buffering operators copy).
    */
  private def decodeChunkInternalRows(
      byCol: Map[String, EncodedChunk], specs: Array[ColumnSpec],
      writer: org.apache.spark.sql.catalyst.expressions.codegen.UnsafeRowWriter,
      stridePrune: Option[(String, Long, Long)] = None)
      : Iterator[org.apache.spark.sql.catalyst.InternalRow] = {
    val nCols = specs.length
    val cols = new Array[Decoded](nCols)
    var rowCount = -1
    var i = 0
    while (i < nCols) {
      val chunk = byCol(specs(i).name)
      if (rowCount < 0) rowCount = chunk.row_count
      require(chunk.row_count == rowCount, s"chunk row_count mismatch on ${specs(i).name}")
      val kind = chunk.compression.getOrElse(graft.core.BlockCompression.Zlib)
      val streams = chunk.streams.map { case (k, v) =>
        k -> graft.core.BlockCompression.decompress(kind, v)
      }
      cols(i) = decodeColumnPrim(
        ColumnStreams(chunk.codec, chunk.row_count, chunk.null_count, streams), specs(i))
      i += 1
    }
    // sub-chunk skipping: strides of the pruning column whose [min,max]
    // cannot overlap [lo,hi] are skipped at materialization (rows never
    // built, nothing emitted downstream) — the reference's RowIndex
    // purpose, which its own reader never exploits
    var strideN = 0
    var strideKeep: Array[Boolean] = null
    stridePrune.foreach { case (colName, lo, hi) =>
      byCol.get(colName).foreach { c =>
        if (c.stride_rows > 0 && c.stride_mins.isDefined && c.stride_maxs.isDefined) {
          val mins = c.stride_mins.get.toArray
          val maxs = c.stride_maxs.get.toArray
          strideN = c.stride_rows
          strideKeep = Array.tabulate(mins.length)(s => !(maxs(s) < lo || mins(s) > hi))
        }
      }
    }
    val cursors = new Array[Int](nCols) // next value index per column (non-null stream)
    val total = rowCount
    new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
      private var r = 0
      // advance past rows of pruned strides, keeping value cursors exact
      private def align(): Unit = if (strideKeep != null) {
        while (r < total && !strideKeep(r / strideN)) {
          var c = 0
          while (c < nCols) { if (cols(c).present(r)) cursors(c) += 1; c += 1 }
          r += 1
        }
      }
      def hasNext: Boolean = { align(); r < total }
      def next(): org.apache.spark.sql.catalyst.InternalRow = {
        align()
        writer.reset()
        writer.zeroOutNullBytes()
        var c = 0
        while (c < nCols) {
          cols(c) match {
            case d: LongsD =>
              if (d.present(r)) { writer.write(c, d.values(cursors(c))); cursors(c) += 1 }
              else writer.setNullAt(c)
            case d: BinsD =>
              if (d.present(r)) { writer.write(c, d.values(cursors(c))); cursors(c) += 1 }
              else writer.setNullAt(c)
            case d: SlicesD =>
              // slice straight from the decoded backing buffer — no
              // per-value Array[Byte] between decode and the UnsafeRow
              if (d.present(r)) {
                val i = cursors(c)
                writer.write(c, d.slices.buf, d.slices.starts(i), d.slices.lens(i))
                cursors(c) += 1
              } else writer.setNullAt(c)
            case d: DoublesD =>
              if (d.present(r)) { writer.write(c, d.values(cursors(c))); cursors(c) += 1 }
              else writer.setNullAt(c)
            case d: FloatsD =>
              if (d.present(r)) { writer.write(c, d.values(cursors(c))); cursors(c) += 1 }
              else writer.setNullAt(c)
            case d: BoolsD =>
              if (d.present(r)) { writer.write(c, d.values(cursors(c))); cursors(c) += 1 }
              else writer.setNullAt(c)
            case d: DecsD =>
              // p>18 decimals are variable-length in UnsafeRow: the writer
              // must see the null too (it reserves the 16-byte slot and
              // zeroes the offset), so never plain setNullAt here
              if (d.present(r)) { writer.write(c, d.values(cursors(c)), d.precision, d.scale); cursors(c) += 1 }
              else writer.write(c, null.asInstanceOf[org.apache.spark.sql.types.Decimal], d.precision, d.scale)
          }
          c += 1
        }
        r += 1
        writer.getRow
      }
    }
  }
}
