package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.types.StructType

import graft.scbf.ScbfFormatException

/** Stream offset: the number of file batches committed so far. */
case class ScbfOffset(batch: Long) extends Offset {
  override def json(): String = batch.toString
}

/**
 * Micro-batch streaming source over a growing SCBF directory — the read
 * half of the connector's streaming story (the write half is
 * `EventStreams.scbfSink`). `spark.readStream.format("scbf").schema(s)
 * .load(dir)` then behaves like Spark's file sources: each trigger
 * picks up files that appeared since the last one.
 *
 * Correctness at the file level rides on two properties: (1) the SCBF
 * writer stages under dot-prefixed temp names and renames at task
 * commit, and the listing skips hidden files — so a file is either
 * invisible or complete, never half-written; (2) each discovered batch
 * is persisted as a JSON-lines log under the query's checkpoint
 * location BEFORE its offset is returned, so a restarted query replays
 * exactly the same file→batch assignment instead of depending on
 * driver memory (the same recovery contract as Spark's own
 * FileStreamSource metadata log).
 *
 * Scale: per trigger the driver lists the directory once and reads no
 * data; files go one-per-partition to executors exactly like the batch
 * scan, with the same column pruning.
 */
class ScbfMicroBatchStream(
    required: StructType,
    tablePaths: Seq[String],
    conf: Configuration,
    checkpointLocation: String,
    maxFilesPerTrigger: Option[Int] = None)
  extends MicroBatchStream with SupportsAdmissionControl {

  require(tablePaths.nonEmpty, "SCBF streaming read requires a directory path")
  maxFilesPerTrigger.foreach(n =>
    require(n > 0, s"maxFilesPerTrigger must be positive, got $n"))

  private val logDir = new Path(checkpointLocation, "scbf-file-batches")
  private def fs = logDir.getFileSystem(conf)

  /** Driver-side (maxBatch, seen paths) state: replayed from the
   * checkpoint logs ONCE (recovery), then maintained in memory — per
   * trigger the driver does one source-directory listing and O(new
   * files) work, not O(all batches ever) log re-reads (the same split
   * Spark's FileStreamSource makes between its in-memory map and its
   * metadata log). */
  private var cachedState: Option[(Long, Set[String])] = None

  private def state(): (Long, Set[String]) = cachedState.getOrElse {
    val loaded = if (!fs.exists(logDir)) (0L, Set.empty[String])
    else {
      val batches = fs.listStatus(logDir).toSeq
        .flatMap(f => f.getPath.getName.toLongOption)
        .sorted
      (batches.lastOption.getOrElse(0L),
        batches.flatMap(readLog(_).map(_._1)).toSet)
    }
    cachedState = Some(loaded)
    loaded
  }

  /** One log entry per admitted batch: `path\tlength` lines. Lengths
   * are captured at admission so planning never re-stats source files —
   * and a file deleted by retention after admission still replays. */
  private def readLog(batch: Long): Seq[(String, Long)] = {
    val p = new Path(logDir, batch.toString)
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, buf)
    finally in.close()
    new String(buf, StandardCharsets.UTF_8).split("\n").toSeq.filter(_.nonEmpty)
      .map { line =>
        line.split('\t') match {
          case Array(path, l) => (path, l.toLong)
          case _ => throw new ScbfFormatException(
            s"corrupt stream log entry in batch $batch: '$line'")
        }
      }
  }

  private def writeLog(batch: Long, files: Seq[(String, Long)]): Unit = {
    fs.mkdirs(logDir)
    val tmp = new Path(logDir, s".${batch.toString}.tmp")
    val out = fs.create(tmp, true)
    try out.write(files.map { case (p, l) => s"$p\t$l" }
      .mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, new Path(logDir, batch.toString)))
      throw new ScbfFormatException(s"could not commit stream log for batch $batch")
  }

  override def initialOffset(): Offset = ScbfOffset(0L)

  /** Backfill throttling: with `maxFilesPerTrigger` set, a directory
   * with a deep backlog drains over several right-sized micro-batches
   * instead of one giant one — Spark keeps triggering until caught up. */
  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n): ReadLimit)
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    // Spark routes SupportsAdmissionControl sources through the
    // (start, limit) overload; reaching this one is a harness bug
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used for admission-control sources")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val (maxBatch, seen) = state()
    // a batch logged before a crash but never planned (offset WAL not
    // yet written) replays FIRST — admitting more files here would fold
    // two batches into one plan and break the admission bound
    if (maxBatch > start.asInstanceOf[ScbfOffset].batch) return ScbfOffset(maxBatch)
    val current = ScbfDataSource.resolveFiles(tablePaths, conf)
      .map(f => (f.getPath.toString, f.getLen))
    val fresh = limit match {
      case mf: ReadMaxFiles => current.filterNot(f => seen(f._1)).take(mf.maxFiles())
      case _ => current.filterNot(f => seen(f._1))
    }
    if (fresh.isEmpty) ScbfOffset(maxBatch)
    else {
      writeLog(maxBatch + 1, fresh) // log BEFORE exposing the offset
      cachedState = Some((maxBatch + 1, seen ++ fresh.map(_._1)))
      ScbfOffset(maxBatch + 1)
    }
  }

  override def deserializeOffset(json: String): Offset =
    ScbfOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ScbfOffset].batch
    val e = end.asInstanceOf[ScbfOffset].batch
    ((s + 1) to e).flatMap(readLog)
      .map { case (p, len) => ScbfFilePartition(p, len): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ScbfPartitionReaderFactory(required, new ScbfUtil.SerializableConf(conf))

  override def commit(end: Offset): Unit = () // logs are the source of truth

  override def stop(): Unit = ()
}
