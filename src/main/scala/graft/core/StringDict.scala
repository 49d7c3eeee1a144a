package graft.core

import java.nio.charset.StandardCharsets

/** Sorted-ordinal string dictionary with id remap, mirroring the
  * reference's dictionary encoding semantics (/root/reference/src/
  * ApacheOrcDotNet/ColumnTypes/StringWriter.cs:177-249): entries are
  * accumulated in first-seen order, then sorted ordinally (by UTF-16 code
  * unit, which for these codecs equals byte-wise UTF-8 order on the BMP)
  * at flush, and lookup ids are rewritten to sorted positions.
  */
final class StringDict {
  private val entries = new java.util.HashMap[String, Integer]()
  private val insertionOrder = new scala.collection.mutable.ArrayBuffer[String]()

  /** Provisional (insertion-order) id for the value. */
  def add(value: String): Int = {
    val existing = entries.get(value)
    if (existing != null) existing.intValue()
    else {
      val id = insertionOrder.length
      entries.put(value, id)
      insertionOrder += value
      id
    }
  }

  def size: Int = insertionOrder.length

  /** Sort entries ordinally; returns (sortedValues, remap) where
    * remap(provisionalId) = sortedId.
    */
  def freeze(): (Array[String], Array[Int]) = {
    val sorted = insertionOrder.toArray
    val idx = sorted.indices.toArray
    // sort indexes by value, ordinal comparison
    val sortedIdx = idx.sortBy(i => sorted(i))(Ordering.String)
    val values = sortedIdx.map(sorted(_))
    val remap = new Array[Int](sorted.length)
    var newId = 0
    while (newId < sortedIdx.length) {
      remap(sortedIdx(newId)) = newId
      newId += 1
    }
    (values, remap)
  }
}

object StringDict {
  /** Serialize sorted dictionary values: DICTIONARY_DATA = concatenated
    * UTF-8 bytes, LENGTH = per-entry byte lengths (caller RLE-encodes).
    */
  def serialize(values: Array[String]): (Array[Byte], Array[Long]) = {
    val data = new ByteBuf(values.length * 8)
    val lengths = new Array[Long](values.length)
    var i = 0
    while (i < values.length) {
      val bytes = values(i).getBytes(StandardCharsets.UTF_8)
      lengths(i) = bytes.length
      data.writeBytes(bytes)
      i += 1
    }
    (data.toArray, lengths)
  }

  def deserialize(data: Array[Byte], lengths: Array[Long]): Array[String] = {
    val out = new Array[String](lengths.length)
    var off = 0
    var i = 0
    while (i < lengths.length) {
      val len = lengths(i).toInt
      out(i) = new String(data, off, len, StandardCharsets.UTF_8)
      off += len
      i += 1
    }
    out
  }
}
