package graft.scbf

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream, OutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

/** In-memory column payloads handed to the writer. Strings are kept as
 * UTF-8 byte arrays so Spark's `UTF8String` bytes pass through unconverted. */
sealed trait ColumnData { def length: Int }
final case class IntColumnData(values: Array[Int]) extends ColumnData {
  def length: Int = values.length
}
final case class DoubleColumnData(values: Array[Double]) extends ColumnData {
  def length: Int = values.length
}
final case class Utf8ColumnData(values: Array[Array[Byte]]) extends ColumnData {
  def length: Int = values.length
}

/**
 * SCBF file writer. Produces the reference layout (reference:
 * SPEC.md:18-97; writer.py:150-225): header, metadata table, data blocks.
 *
 * Unlike the reference — which writes placeholder offsets then seeks back
 * to patch them (reference: writer.py:189-223) — all block positions are
 * computed up-front (every compressed block is in memory anyway, exactly
 * as in the reference, writer.py:79-136) and the file is written in one
 * sequential pass. Byte-identical output, no seeks, so any OutputStream
 * (HDFS, S3A, ...) works as a sink.
 *
 * Deviation from the reference writer, by design: the utf8
 * `str_uncomp_size` metadata field is written CORRECTLY here, whereas the
 * reference clobbers it with a file offset (reference: writer.py:208-209).
 * The reference reader never reads `*_uncomp` fields (reference:
 * reader.py:75-109), so our output remains fully readable by it.
 */
object ScbfWriter {

  private val HeaderFixed = 8 + 4 + 4 + 8 + 8 // magic + schemaLen + numCols + rows + metaOff

  def write(path: String, schema: ScbfSchema, columns: Seq[ColumnData]): Unit = {
    val out = new BufferedOutputStream(new FileOutputStream(path), 1 << 16)
    try write(out, schema, columns, None) finally out.close()
  }

  def write(out: OutputStream, schema: ScbfSchema, columns: Seq[ColumnData],
      explicitRows: Option[Long] = None): Unit = {
    require(schema.columns.length == columns.length,
      s"schema has ${schema.columns.length} columns, data has ${columns.length}")
    val rowCounts = columns.map(_.length).distinct
    require(rowCounts.length <= 1, s"ragged columns: row counts $rowCounts")
    // explicitRows keeps the header's total_rows correct for a
    // zero-column table (N rows, no columns to count them from)
    val totalRows = rowCounts.headOption.map(_.toLong)
      .orElse(explicitRows).getOrElse(0L)
    explicitRows.foreach(n => require(rowCounts.forall(_ == n),
      s"explicit row count $n != column row count ${rowCounts.headOption}"))

    // Encode + compress every column (column-major, like writer.py:79-136).
    val encoded: Seq[EncodedColumn] = schema.columns.zip(columns).map {
      case (ScbfColumn(name, ScbfType.Int32), IntColumnData(vs)) =>
        val buf = ByteBuffer.allocate(vs.length * 4).order(ByteOrder.LITTLE_ENDIAN)
        vs.foreach(buf.putInt)
        EncodedColumn(name, ScbfType.Int32, vs.length,
          Block(buf.array().length, deflate(buf.array())), None)
      case (ScbfColumn(name, ScbfType.Float64), DoubleColumnData(vs)) =>
        val buf = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
        vs.foreach(buf.putDouble)
        EncodedColumn(name, ScbfType.Float64, vs.length,
          Block(buf.array().length, deflate(buf.array())), None)
      case (ScbfColumn(name, ScbfType.Utf8), Utf8ColumnData(vs)) =>
        // Arrow-style layout: (count+1) u32 offsets + concatenated UTF-8
        // blob, compressed as two separate blocks (reference:
        // writer.py:111-136, SPEC.md:72-91).
        val offs = ByteBuffer.allocate((vs.length + 1) * 4).order(ByteOrder.LITTLE_ENDIAN)
        var pos = 0
        offs.putInt(0)
        vs.foreach { b => pos += b.length; offs.putInt(pos) }
        val blob = new Array[Byte](pos)
        var cur = 0
        vs.foreach { b => System.arraycopy(b, 0, blob, cur, b.length); cur += b.length }
        EncodedColumn(name, ScbfType.Utf8, vs.length,
          Block(offs.array().length, deflate(offs.array())),
          Some(Block(blob.length, deflate(blob))))
      case (ScbfColumn(name, t), d) =>
        throw new ScbfFormatException(
          s"column '$name': schema type $t does not match data ${d.getClass.getSimpleName}")
    }

    val schemaJson = schema.toJson.getBytes(StandardCharsets.UTF_8)
    val metaTableOffset = HeaderFixed + schemaJson.length
    val metaSize = encoded.map(_.metaSize).sum
    // Assign block offsets sequentially in column order (offsets block
    // before strings block for utf8, as the reference lays them out —
    // writer.py:193-217).
    var cursor: Long = metaTableOffset + metaSize
    val placed = encoded.map { ec =>
      val dataOff = cursor
      cursor += ec.data.comp.length
      val strOff = ec.strings.map { s => val o = cursor; cursor += s.comp.length; o }
      (ec, dataOff, strOff)
    }

    val o = new DataOutputStream(out)
    // Header (reference: SPEC.md:28-38)
    o.write(Scbf.Magic)
    writeU32(o, schemaJson.length)
    o.write(schemaJson)
    writeU32(o, encoded.length)
    writeU64(o, totalRows)
    writeU64(o, metaTableOffset.toLong)
    // Metadata table (reference: SPEC.md:53-80)
    placed.foreach { case (ec, dataOff, strOff) =>
      val nameBytes = ec.name.getBytes(StandardCharsets.UTF_8)
      if (nameBytes.length > 0xffff) throw new ScbfFormatException(
        s"column name exceeds the u16 length field: ${nameBytes.length} bytes")
      writeU16(o, nameBytes.length)
      o.write(nameBytes)
      o.writeByte(ec.tpe.code)
      writeU64(o, ec.count.toLong)
      writeU64(o, ec.data.uncompSize.toLong)
      writeU64(o, ec.data.comp.length.toLong)
      writeU64(o, dataOff)
      strOff.foreach { so =>
        val s = ec.strings.get
        writeU64(o, s.uncompSize.toLong)
        writeU64(o, s.comp.length.toLong)
        writeU64(o, so)
      }
    }
    // Data blocks
    placed.foreach { case (ec, _, _) =>
      o.write(ec.data.comp)
      ec.strings.foreach(s => o.write(s.comp))
    }
    o.flush()
  }

  private final case class Block(uncompSize: Int, comp: Array[Byte])
  private final case class EncodedColumn(
      name: String, tpe: ScbfType, count: Int, data: Block, strings: Option[Block]) {
    def metaSize: Int =
      2 + name.getBytes(StandardCharsets.UTF_8).length + 1 + 8 +
        (if (strings.isDefined) 6 * 8 else 3 * 8)
  }

  /** zlib-wrapped DEFLATE at default level, matching Python
   * `zlib.compress` (reference: SPEC.md:95-97, writer.py:86). */
  private[scbf] def deflate(bytes: Array[Byte]): Array[Byte] = {
    val d = new Deflater() // default level 6 + zlib header, same as CPython
    try {
      d.setInput(bytes)
      d.finish()
      val out = new java.io.ByteArrayOutputStream(math.max(64, bytes.length / 4))
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  private def writeU16(o: DataOutputStream, v: Int): Unit = {
    o.writeByte(v & 0xff); o.writeByte((v >>> 8) & 0xff)
  }
  private def writeU32(o: DataOutputStream, v: Int): Unit = {
    val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v)
    o.write(b.array())
  }
  private def writeU64(o: DataOutputStream, v: Long): Unit = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v)
    o.write(b.array())
  }
}
