package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{AlwaysTrue, Filter}
import org.apache.spark.sql.types._

import graft.scbf._

/**
 * Write side of the SCBF connector: each task buffers its partition
 * column-major and emits one `.scbf` file on commit — the reference
 * writer also materializes every compressed block before writing
 * (reference: writer.py:79-136), so per-task buffering IS the spec'd
 * behavior; scale comes from many tasks writing many files.
 *
 * Null semantics follow SURVEY §7.4: a null in a numeric column aborts
 * the write (the reference has no numeric null representation and
 * crashes, reference: writer.py:84); a null string is written as the
 * empty string (indistinguishable in the reference's CSV world).
 */
class ScbfWriteBuilder(dir: String, schema: StructType, conf: Configuration)
  extends WriteBuilder with SupportsOverwrite {

  private var doTruncate = false

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    require(filters.forall(_.isInstanceOf[AlwaysTrue]),
      s"SCBF supports only full-table overwrite, got: ${filters.mkString(", ")}")
    doTruncate = true
    this
  }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new ScbfBatchWrite(dir, schema, doTruncate, new ScbfUtil.SerializableConf(conf))
  }
}

class ScbfBatchWrite(
    dir: String, schema: StructType, truncate: Boolean, conf: ScbfUtil.SerializableConf)
  extends BatchWrite {

  // Old files are captured at job start but deleted only in commit() —
  // deleting them up-front would destroy the previous table contents if
  // any task then failed (abort() removes only the new part files, so a
  // failed overwrite leaves the old data intact).
  private var toReplace: Seq[Path] = Seq.empty

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val path = new Path(dir)
    val fs = path.getFileSystem(conf.value)
    if (truncate && fs.exists(path)) {
      toReplace = fs.listStatus(path).toSeq
        .filter(f => f.getPath.getName.endsWith(Scbf.FileExtension))
        .map(_.getPath)
    }
    fs.mkdirs(path)
    new ScbfDataWriterFactory(dir, schema, conf)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(dir).getFileSystem(conf.value)
    // compare by file NAME: listStatus paths are fully qualified
    // (file:/...), task-side message paths are not — path-string
    // comparison would never match. Names are unique (uuid suffix).
    val newNames = messages.collect { case ScbfCommitMessage(f) => new Path(f).getName }.toSet
    toReplace.filterNot(p => newNames.contains(p.getName))
      .foreach(p => fs.delete(p, false))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(dir).getFileSystem(conf.value)
    messages.collect { case ScbfCommitMessage(file) => fs.delete(new Path(file), false) }
  }
}

case class ScbfCommitMessage(file: String) extends WriterCommitMessage

class ScbfDataWriterFactory(dir: String, schema: StructType, conf: ScbfUtil.SerializableConf)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ScbfDataWriter(dir, schema, partitionId, taskId, conf.value)
}

class ScbfDataWriter(
    dir: String, schema: StructType, partitionId: Int, taskId: Long, conf: Configuration)
  extends DataWriter[InternalRow] {

  private val scbfSchema = ScbfDataSource.sparkToScbf(schema)

  private sealed trait Builder { def append(row: InternalRow, ordinal: Int): Unit }
  private final class IntBuilder extends Builder {
    val values = new ArrayBuffer[Int]()
    def append(row: InternalRow, i: Int): Unit = {
      if (row.isNullAt(i)) throw new ScbfFormatException(
        s"NULL in int32 column '${schema.fields(i).name}': SCBF has no numeric nulls")
      values += row.getInt(i)
    }
  }
  private final class DoubleBuilder extends Builder {
    val values = new ArrayBuffer[Double]()
    def append(row: InternalRow, i: Int): Unit = {
      if (row.isNullAt(i)) throw new ScbfFormatException(
        s"NULL in float64 column '${schema.fields(i).name}': SCBF has no numeric nulls")
      values += row.getDouble(i)
    }
  }
  private final class Utf8Builder extends Builder {
    val values = new ArrayBuffer[Array[Byte]]()
    def append(row: InternalRow, i: Int): Unit =
      values += (if (row.isNullAt(i)) Array.emptyByteArray else row.getUTF8String(i).getBytes)
  }

  private val builders: Array[Builder] = scbfSchema.columns.map {
    case ScbfColumn(_, ScbfType.Int32)   => new IntBuilder
    case ScbfColumn(_, ScbfType.Float64) => new DoubleBuilder
    case ScbfColumn(_, ScbfType.Utf8)    => new Utf8Builder
  }.toArray

  private val file = new Path(dir,
    f"part-$partitionId%05d-$taskId-${java.util.UUID.randomUUID().toString.take(8)}${Scbf.FileExtension}")

  private var rowCount = 0L

  override def write(row: InternalRow): Unit = {
    var i = 0
    while (i < builders.length) { builders(i).append(row, i); i += 1 }
    rowCount += 1
  }

  override def commit(): WriterCommitMessage = {
    val data: Seq[ColumnData] = builders.toSeq.map {
      case b: IntBuilder    => IntColumnData(b.values.toArray)
      case b: DoubleBuilder => DoubleColumnData(b.values.toArray)
      case b: Utf8Builder   => Utf8ColumnData(b.values.toArray)
    }
    val out = file.getFileSystem(conf).create(file, true)
    // explicit row count: a zero-column projection (count(*) write) has
    // no columns to derive it from
    try ScbfWriter.write(out, scbfSchema, data, Some(rowCount)) finally out.close()
    ScbfCommitMessage(file.toString)
  }

  override def abort(): Unit = {
    val fs = file.getFileSystem(conf)
    if (fs.exists(file)) fs.delete(file, false)
  }

  override def close(): Unit = ()
}
