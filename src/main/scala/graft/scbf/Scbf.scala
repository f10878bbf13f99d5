package graft.scbf

/**
 * Data model for SCBF ("Simple Columnar Binary Format"), the single-file
 * columnar format defined by the reference spec (reference: SPEC.md:18-97).
 *
 * A file = Header, then a column-metadata table, then per-column
 * zlib-compressed data blocks. All multi-byte integers little-endian
 * (reference: SPEC.md:14). Three types only (reference: SPEC.md:61):
 * int32 (code 1), float64 (code 2), utf8 (code 3). No nulls.
 */
sealed abstract class ScbfType(val code: Int, val typeName: String)

object ScbfType {
  case object Int32 extends ScbfType(1, "int32")
  case object Float64 extends ScbfType(2, "float64")
  case object Utf8 extends ScbfType(3, "utf8")

  val all: Seq[ScbfType] = Seq(Int32, Float64, Utf8)

  def fromCode(code: Int): ScbfType =
    all.find(_.code == code).getOrElse(
      throw new ScbfFormatException(s"Unknown column type code: $code"))

  def fromName(name: String): ScbfType =
    all.find(_.typeName == name).getOrElse(
      throw new ScbfFormatException(s"Unknown column type name: $name"))
}

final case class ScbfColumn(name: String, tpe: ScbfType)

/** Logical schema, serialized as JSON into the file header
 * (reference: SPEC.md:43-49). */
final case class ScbfSchema(columns: Seq[ScbfColumn]) {

  def fieldNames: Seq[String] = columns.map(_.name)

  /**
   * Serialize exactly as Python's `json.dumps` with default separators
   * would (`{"columns": [{"name": "id", "type": "int32"}, ...]}`), so our
   * writer's header bytes match the reference writer's byte-for-byte
   * (reference: writer.py:57-66). Non-ASCII and control characters are
   * \\uXXXX-escaped (json.dumps default ensure_ascii=True).
   */
  def toJson: String = {
    def esc(s: String): String = {
      val sb = new StringBuilder
      s.foreach {
        case '"'           => sb.append("\\\"")
        case '\\'          => sb.append("\\\\")
        case '\n'          => sb.append("\\n")
        case '\r'          => sb.append("\\r")
        case '\t'          => sb.append("\\t")
        case '\b'          => sb.append("\\b")
        case '\f'          => sb.append("\\f")
        case c if c < ' ' || c > '~' => sb.append(f"\\u${c.toInt}%04x")
        case c             => sb.append(c)
      }
      sb.toString
    }
    columns
      .map(c => s"""{"name": "${esc(c.name)}", "type": "${c.tpe.typeName}"}""")
      .mkString("""{"columns": [""", ", ", "]}")
  }
}

object ScbfSchema {
  import com.fasterxml.jackson.databind.ObjectMapper

  /** Parse the header schema JSON. Tolerant of any valid JSON formatting,
   * not just the canonical python layout. */
  def fromJson(json: String): ScbfSchema = {
    // unparseable JSON in the header is a format error, not a raw
    // jackson exception escaping to the caller
    val root =
      try new ObjectMapper().readTree(json)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new ScbfFormatException(s"Corrupt schema JSON: ${e.getOriginalMessage}")
      }
    val cols = root.get("columns")
    if (cols == null || !cols.isArray)
      throw new ScbfFormatException("Schema JSON missing 'columns' array")
    val buf = Seq.newBuilder[ScbfColumn]
    cols.forEach { c =>
      val name = c.get("name")
      val tpe = c.get("type")
      if (name == null || tpe == null)
        throw new ScbfFormatException(s"Schema column entry missing name/type: $c")
      buf += ScbfColumn(name.asText(), ScbfType.fromName(tpe.asText()))
    }
    ScbfSchema(buf.result())
  }
}

/** One compressed block's bookkeeping (reference: SPEC.md:63-80).
 *
 * `uncompSize` is ADVISORY ONLY and must never be trusted when reading:
 * the reference writer clobbers the utf8 `str_uncomp_size` field with a
 * file offset (reference: writer.py:208-209 seeks to the wrong field), so
 * files it wrote carry garbage there. Decoding derives true sizes from
 * `count` / the offsets array instead (reference: reader.py:75-109 does
 * the same). */
final case class BlockMeta(uncompSize: Long, compSize: Long, offset: Long)

/**
 * Per-column metadata table entry (reference: SPEC.md:53-80).
 * For numeric columns only `data` is set; for utf8 `data` is the offsets
 * block ((count+1) little-endian u32s) and `strings` the UTF-8 blob.
 */
final case class ColumnMeta(
    name: String,
    tpe: ScbfType,
    count: Long,
    data: BlockMeta,
    strings: Option[BlockMeta])

final case class ScbfHeader(
    schema: ScbfSchema,
    numColumns: Int,
    totalRows: Long,
    metaTableOffset: Long)

class ScbfFormatException(msg: String) extends RuntimeException(msg)

object Scbf {
  /** 8-byte magic: ASCII "SCBFv1\0\0" (reference: SPEC.md:32, writer.py:6). */
  val Magic: Array[Byte] = Array('S', 'C', 'B', 'F', 'v', '1', 0, 0).map(_.toByte)
  val FileExtension = ".scbf"
}
