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
 * Write side of the SCBF connector. Each task buffers rows column-major
 * and rolls to a new `.scbf` file whenever the buffered estimate passes
 * `maxBufferedBytes` (write option, default 128 MiB) — the reference
 * writer also materializes every compressed block before writing
 * (reference: writer.py:79-136), so per-FILE buffering is the spec'd
 * behavior, but the roll bounds per-TASK memory: a skewed 100× input
 * partition becomes many files, not one OOM.
 *
 * Crash safety: every file is written under a dot-prefixed temp name
 * (the scan's isHidden filter skips those) and renamed to its final
 * name only in DataWriter.commit(). A hard executor crash mid-write —
 * where abort() never runs — leaves only invisible temps, never a
 * truncated readable `.scbf`; a lost task attempt's fully-written temps
 * never surface as duplicate rows. Job-level commit/abort sweep any
 * orphaned temps.
 *
 * Null semantics follow SURVEY §7.4: a null in a numeric column aborts
 * the write (the reference has no numeric null representation and
 * crashes, reference: writer.py:84); a null string is written as the
 * empty string (indistinguishable in the reference's CSV world).
 */
class ScbfWriteBuilder(
    dir: String, schema: StructType, conf: Configuration, maxBufferedBytes: Long)
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
      new ScbfBatchWrite(dir, schema, doTruncate,
        new ScbfUtil.SerializableConf(conf), maxBufferedBytes)
  }
}

object ScbfWrite {
  /** Default per-task buffer cap before rolling to a new file. */
  val DefaultMaxBufferedBytes: Long = 128L << 20

  private[sources] def isTemp(name: String): Boolean =
    name.startsWith(".") && name.endsWith(Scbf.FileExtension + ".tmp")
}

class ScbfBatchWrite(
    dir: String, schema: StructType, truncate: Boolean,
    conf: ScbfUtil.SerializableConf, maxBufferedBytes: Long)
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
    new ScbfDataWriterFactory(dir, schema, conf, maxBufferedBytes)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(dir).getFileSystem(conf.value)
    // compare by file NAME: listStatus paths are fully qualified
    // (file:/...), task-side message paths are not — path-string
    // comparison would never match. Names are unique (uuid suffix).
    val newNames =
      messages.collect { case ScbfCommitMessage(fl) => fl.map(new Path(_).getName) }
        .flatten.toSet
    toReplace.filterNot(p => newNames.contains(p.getName))
      .foreach(p => fs.delete(p, false))
    if (truncate) sweepTemps()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(dir).getFileSystem(conf.value)
    messages.collect { case ScbfCommitMessage(files) =>
      files.foreach(f => fs.delete(new Path(f), false))
    }
    // no sweep here: an ABORTED overwrite leaves the old table contents
    // in place, so the "contents are being replaced anyway" argument
    // below does not hold and a concurrent append's temps must survive
  }

  /** Remove temps left by dead task attempts — but only on COMMITTED
   * overwrite jobs: a successful overwrite replaces the directory's
   * contents, so no concurrent writer can be harmed, while sweeping on
   * APPEND (or on abort) could delete a concurrently-running append
   * job's staged temps out from under it (its rename would then fail
   * the job). Orphans from hard crashes are invisible to readers
   * (dot-prefix) and get cleared by the next successful overwrite. */
  private def sweepTemps(): Unit = {
    val path = new Path(dir)
    val fs = path.getFileSystem(conf.value)
    if (fs.exists(path)) {
      fs.listStatus(path).toSeq
        .filter(f => f.isFile && ScbfWrite.isTemp(f.getPath.getName))
        .foreach(f => fs.delete(f.getPath, false))
    }
  }
}

case class ScbfCommitMessage(files: Seq[String]) extends WriterCommitMessage

class ScbfDataWriterFactory(
    dir: String, schema: StructType, conf: ScbfUtil.SerializableConf, maxBufferedBytes: Long)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ScbfDataWriter(dir, schema, partitionId, taskId, conf.value, maxBufferedBytes)
}

class ScbfDataWriter(
    dir: String, schema: StructType, partitionId: Int, taskId: Long,
    conf: Configuration, maxBufferedBytes: Long)
  extends DataWriter[InternalRow] {

  private val scbfSchema = ScbfDataSource.sparkToScbf(schema)

  /** append returns the buffered-byte estimate added by the row's cell. */
  private sealed trait Builder {
    def append(row: InternalRow, ordinal: Int): Int
    def clear(): Unit
  }
  private final class IntBuilder extends Builder {
    val values = new ArrayBuffer[Int]()
    def append(row: InternalRow, i: Int): Int = {
      if (row.isNullAt(i)) throw new ScbfFormatException(
        s"NULL in int32 column '${schema.fields(i).name}': SCBF has no numeric nulls")
      values += row.getInt(i)
      4
    }
    def clear(): Unit = values.clear()
  }
  private final class DoubleBuilder extends Builder {
    val values = new ArrayBuffer[Double]()
    def append(row: InternalRow, i: Int): Int = {
      if (row.isNullAt(i)) throw new ScbfFormatException(
        s"NULL in float64 column '${schema.fields(i).name}': SCBF has no numeric nulls")
      values += row.getDouble(i)
      8
    }
    def clear(): Unit = values.clear()
  }
  private final class Utf8Builder extends Builder {
    val values = new ArrayBuffer[Array[Byte]]()
    def append(row: InternalRow, i: Int): Int = {
      val b = if (row.isNullAt(i)) Array.emptyByteArray else row.getUTF8String(i).getBytes
      values += b
      b.length + 4 // blob bytes + u32 offset entry
    }
    def clear(): Unit = values.clear()
  }

  private val builders: Array[Builder] = scbfSchema.columns.map {
    case ScbfColumn(_, ScbfType.Int32)   => new IntBuilder
    case ScbfColumn(_, ScbfType.Float64) => new DoubleBuilder
    case ScbfColumn(_, ScbfType.Utf8)    => new Utf8Builder
  }.toArray

  private val taskUuid = java.util.UUID.randomUUID().toString.take(8)
  // (temp, final) pairs for every file this attempt has rolled so far
  private val staged = new ArrayBuffer[(Path, Path)]()
  private var fileSeq = 0
  private var bufferedRows = 0L
  private var bufferedBytes = 0L

  override def write(row: InternalRow): Unit = {
    var i = 0
    var added = 0
    while (i < builders.length) { added += builders(i).append(row, i); i += 1 }
    bufferedRows += 1
    bufferedBytes += added
    if (bufferedBytes >= maxBufferedBytes) flush()
  }

  /** Write the buffered columns to the next dot-temp file and reset. */
  private def flush(): Unit = {
    val finalName =
      f"part-$partitionId%05d-$taskId-$taskUuid-$fileSeq%03d${Scbf.FileExtension}"
    val tmp = new Path(dir, s".$finalName.tmp")
    val dst = new Path(dir, finalName)
    val data: Seq[ColumnData] = builders.toSeq.map {
      case b: IntBuilder    => IntColumnData(b.values.toArray)
      case b: DoubleBuilder => DoubleColumnData(b.values.toArray)
      case b: Utf8Builder   => Utf8ColumnData(b.values.toArray)
    }
    val out = tmp.getFileSystem(conf).create(tmp, true)
    // explicit row count: a zero-column projection (count(*) write) has
    // no columns to derive it from
    try ScbfWriter.write(out, scbfSchema, data, Some(bufferedRows)) finally out.close()
    staged += ((tmp, dst))
    builders.foreach(_.clear())
    fileSeq += 1
    bufferedRows = 0L
    bufferedBytes = 0L
  }

  override def commit(): WriterCommitMessage = {
    // flush the tail; an empty partition still emits one (0-row) file so
    // an empty table stays readable (schema lives in the file header)
    if (bufferedRows > 0 || staged.isEmpty) flush()
    val fs = new Path(dir).getFileSystem(conf)
    staged.foreach { case (tmp, dst) =>
      if (!fs.rename(tmp, dst)) throw new ScbfFormatException(
        s"failed to publish $tmp as $dst")
    }
    ScbfCommitMessage(staged.toSeq.map(_._2.toString))
  }

  override def abort(): Unit = {
    val fs = new Path(dir).getFileSystem(conf)
    staged.foreach { case (tmp, dst) =>
      if (fs.exists(tmp)) fs.delete(tmp, false)
      if (fs.exists(dst)) fs.delete(dst, false)
    }
  }

  override def close(): Unit = ()
}
