package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.execution.vectorized.ConstantColumnVector
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType, TimestampType}
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String

import graft.scbf.ScbfFormatException

/** CDC stream offset: every change with entry timestamp ≤ `ts` has
 * been delivered. Commit-aligned by construction — offsets are always
 * delta-name millis (or the resolved start point), and the commit
 * clock stamps each commit's entries strictly after every earlier
 * commit's name millis, so a window `(start, end]` contains whole
 * commits only. */
case class ScbfCdcOffset(ts: Long) extends Offset {
  override def json(): String = ts.toString
}

/**
 * STREAMING Change-Data-Feed read — Delta's `readChangeFeed` stream,
 * the consumer shape that turns the batch CDC enumeration
 * ([[ScbfCdc.changes]]) into a live mirror pipeline:
 *
 * {{{
 * spark.readStream.format("scbf")
 *   .option("readChangeFeed", "true")
 *   .option("startingVersion", 3)        // or startingTimestamp; default: latest
 *   .load(dir)                           // table cols + _change_type
 * }}}                                    //   + _commit_version + _commit_timestamp
 *
 * DIVERGENCE from Delta, stated loudly: `startingVersion` /
 * `startingTimestamp` are EXCLUSIVE start points — the
 * `changesSince[Version]` semantics every feed surface of this
 * connector uses (and the same spelling the non-CDC stream took in
 * round 13). Delta's `startingVersion` is INCLUSIVE: a consumer
 * migrating from Delta who wants version N's own rows starts at
 * `N - 1` here.
 *
 * Each trigger delivers exactly the rows the batch enumeration would
 * return for the trigger's commit window — `delete` / `update_pre` /
 * `update_post` / `insert` rows stamped with their commit's instant
 * and ordinal — so a downstream `foreachBatch` MERGE keeps an exact
 * replica through DELETE/UPDATE/MERGE, not just through appends.
 *
 * Scale shape, per trigger:
 *  - `latestOffset` pays ONE listing of the compaction-bounded log dir
 *    (never the table) plus, only when a `maxFilesPerTrigger` cap must
 *    find its commit boundary, reads of the backlog's own deltas;
 *  - `planInputPartitions` replays only deltas named after the start
 *    offset (the feed's bounded strict replay — sorted folds bisect),
 *    so driver work is O(trigger's changes), independent of table age;
 *  - change files go one-per-partition to executors through the same
 *    vectorized reader as the batch scan, with the three CDC columns
 *    served as per-split CONSTANT vectors (zero decode cost) and
 *    column pruning intact.
 *
 * Exactly-once: offsets are commit-aligned timestamps and
 * `planInputPartitions(start, end)` re-derives the identical row set
 * from the log on restart (enumeration is deterministic; a captured
 * rewrite between plan and replay moves bytes into retention but
 * serves the same rows). Failure semantics are the batch read's,
 * fail-CLOSED: an uncaptured mutation, swept retention, overwrite
 * boundary or bypassed producer in a trigger's window fails the
 * STREAM loudly, naming the cure — never silently skips rows.
 *
 * The capture side is [[ScbfCdc]]; this class is only the per-trigger
 * glue (window resolution + admission) over
 * [[ScbfCdc.enumerateBetween]].
 */
class ScbfCdcMicroBatchStream(
    required: StructType,
    rootDir: String,
    conf: Configuration,
    checkpointLocation: String,
    // Left = exclusive epoch millis, Right = exclusive commit ordinal
    // (startingTimestamp / startingVersion). None = latest: the stream
    // begins at the log's newest commit and delivers only what commits
    // after it — resolved ONCE and persisted under the checkpoint, so
    // a restart before the first batch cannot silently move the point.
    streamStart: Option[Either[Long, Int]],
    maxFilesPerTrigger: Option[Int] = None,
    // the batch read's bypassed-producer trust check, per trigger
    // (costs one table listing per trigger — default off; run the
    // batch TABLE CHANGES read periodically for the audit instead)
    reconcile: Boolean = false,
    pushedFilters: Seq[org.apache.spark.sql.sources.Filter] = Seq.empty,
    // every-Nth-trigger reconcile cadence (r15): a long-lived mirror
    // gets the bypassed-producer audit without paying a table listing
    // per trigger — an injected foreign file fails the stream within
    // N triggers with the batch refusal text
    reconcileEvery: Option[Int] = None)
  extends MicroBatchStream with SupportsAdmissionControl
  with org.apache.spark.internal.Logging {

  maxFilesPerTrigger.foreach(n =>
    require(n > 0, s"maxFilesPerTrigger must be positive, got $n"))

  private val root = new Path(rootDir)
  private def fs = root.getFileSystem(conf)
  private def qroot = fs.makeQualified(root)

  private val startFile = new Path(checkpointLocation, "scbf-cdc-start")

  /** Resolve (once) and persist the stream's exclusive start instant.
   * The persisted value wins on restart — a `startingVersion` whose
   * ordinal has since been folded must not refuse a previously
   * healthy stream, and a default-latest start must not drift to a
   * later "latest" if the driver dies before batch 0 commits. */
  private def resolveStart(): Long = {
    // the checkpoint may live on a DIFFERENT filesystem than the table
    // (s3a table, hdfs/file checkpoint) — resolve its own FS
    val cfs = startFile.getFileSystem(conf)
    if (cfs.exists(startFile)) {
      val len = cfs.getFileStatus(startFile).getLen.toInt
      val buf = new Array[Byte](len)
      val in = cfs.open(startFile)
      try in.readFully(0, buf) finally in.close()
      return new String(buf, StandardCharsets.UTF_8).trim.toLong
    }
    val isClone = ScbfClone.isClone(qroot, conf)
    if (!ScbfDiscovery.exists(qroot, conf) && !isClone)
      throw new ScbfFormatException(
        s"CDC stream on $qroot: the table has no discovery log — CDC " +
          "replays the log's version chain. Tables written by this " +
          "connector keep one automatically; foreign/reference-tool " +
          "directories have no recorded history.")
    val lo = streamStart match {
      case Some(Right(v)) => ScbfDiscovery.versionTs(qroot, conf, v)
      case Some(Left(ms)) =>
        if (ms > System.currentTimeMillis())
          throw new ScbfFormatException(
            s"startingTimestamp ($ms) is in the future — nothing can have " +
              "been committed after it yet; pick a recorded instant " +
              "(DESCRIBE HISTORY <tbl>).")
        ms
      case None =>
        // latest: the newest commit's publication instant bounds every
        // entry stamped so far from above, and every future commit
        // stamps strictly past it (the cross-process commit clock +
        // ordinal CAS). A FRESH SHALLOW CLONE has no log yet (its
        // history begins with its first append) — "latest" is the
        // branch point, so the mirror-setup order clone→stream→append
        // just works: the first post-start commit is the first
        // delivery, and the instant is ≥ the branch point by
        // construction (no branch-guard refusal).
        ScbfDiscovery.newestCommitInstant(qroot, conf)
          .getOrElse(None)
          .getOrElse(if (isClone) {
            // TABLE-SIDE instant, not the stream driver's wall clock:
            // the ref list's mtime is stamped by the clone's WRITER
            // filesystem, so a stream driver whose clock runs ahead of
            // the writer's commit clock can never persist a start above
            // the clone's first post-start commits and silently skip
            // them. (The ref is readable here — isClone just was true;
            // a racing ref removal falls back to the driver clock.)
            try fs.getFileStatus(ScbfClone.refPath(qroot)).getModificationTime
            catch { case scala.util.control.NonFatal(_) => System.currentTimeMillis() }
          } else 0L)
    }
    cfs.mkdirs(startFile.getParent)
    val tmp = new Path(startFile.getParent, s".${startFile.getName}.tmp")
    val out = cfs.create(tmp, true)
    try out.write(lo.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!cfs.rename(tmp, startFile) && !cfs.exists(startFile))
      throw new ScbfFormatException(
        s"could not persist CDC stream start point at $startFile")
    lo
  }

  override def initialOffset(): Offset = ScbfCdcOffset(resolveStart())

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n): ReadLimit)
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used for admission-control sources")

  /** The next end offset: the newest committed delta's name millis —
   * or, under a file cap, the name millis of the last whole commit
   * that fits (always at least one: a commit is the atomic admission
   * unit; splitting one across triggers would tear its change set
   * across two offsets). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val lo = start.asInstanceOf[ScbfCdcOffset].ts
    val listing = ScbfDiscovery.listLog(qroot, conf)
    val candidates = listing.deltas
      .flatMap(n => listing.instants.get(n)
        // markerless crashed delta: one small read bounds it
        .orElse(ScbfDiscovery.readDelta(qroot, conf, n)
          .iterator.map(_.ts).maxOption)
        .map(m => (n, m)))
      .filter(_._2 > lo).sortBy(_._2)
    if (candidates.isEmpty) return start
    val end = limit match {
      case mf: ReadMaxFiles =>
        // count each candidate commit's post-lo entries (≈ its change
        // files) by reading its own delta — bounded by the backlog,
        // the same deltas planning replays anyway; a SORTED fold
        // bisects to its post-lo tail instead of streaming the whole
        // re-announced history (the same O(changes) byte discipline
        // as the feed replay)
        def postLoCount(n: String): Int =
          try {
            var c = 0
            if (ScbfDiscovery.isSortedFold(n))
              ScbfDiscovery.readSortedFoldFrom(qroot, conf, n, lo)(e =>
                if (e.ts > lo) c += 1)
            else c = ScbfDiscovery.readDelta(qroot, conf, n).count(_.ts > lo)
            c
          } catch { case scala.util.control.NonFatal(_) => 1 }
        var budget = mf.maxFiles().toLong
        var last = -1L
        candidates.foreach { case (n, m) =>
          if (last < 0 || budget > 0) {
            val entries = postLoCount(n).toLong
            if (last < 0 || entries <= budget) { last = m; budget -= entries }
            else budget = -1
          }
        }
        last
      case _ => candidates.last._2
    }
    ScbfCdcOffset(math.max(end, lo))
  }

  override def deserializeOffset(json: String): Offset =
    ScbfCdcOffset(json.trim.toLong)

  private val triggerTick = new java.util.concurrent.atomic.AtomicLong(0L)
  // floor of the NEXT periodic audit: everything written since the
  // last audit gets examined, so a bypassed file can never age out of
  // the sliding trigger windows between two audits. Seeded from the
  // PERSISTED stream start (not the restart window's lo): a restart
  // must not let a pre-restart bypassed file escape the audit — the
  // first post-restart audit re-covers the stream's whole span once.
  @volatile private var lastAuditLo: Long = Long.MinValue
  // one-window plan MEMO: Spark re-invokes planInputPartitions for the
  // SAME offsets several times per trigger (batch construction + each
  // foreachBatch action re-plans the v2 scan) — the enumeration is
  // deterministic for a window, so re-deriving it only re-pays the
  // bounded log replay 3-4x per trigger for nothing
  @volatile private var lastPlan: (Long, Long, Array[InputPartition]) = null

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[ScbfCdcOffset].ts
    val hi = end.asInstanceOf[ScbfCdcOffset].ts
    if (hi <= lo) return Array.empty
    val memo = lastPlan
    if (memo != null && memo._1 == lo && memo._2 == hi) return memo._3
    if (lastAuditLo == Long.MinValue)
      lastAuditLo =
        if (reconcileEvery.isEmpty) lo
        else try math.min(resolveStart(), lo)
        catch { case scala.util.control.NonFatal(_) => lo }
    val periodic =
      reconcileEvery.exists(n => triggerTick.incrementAndGet() % n == 0)
    val audit = reconcile || periodic
    val auditSince = if (periodic) Some(math.min(lastAuditLo, lo)) else None
    val files = ScbfCdc.enumerateBetween(conf, rootDir, lo, hi, audit, auditSince)
    if (periodic) lastAuditLo = hi
    // stats-based file skipping, same Pruner and same soundness
    // argument as the main stream: every pushed filter stays residual
    // in the plan, so a skipped file only drops rows the filter would
    // drop (retained victims keep their sidecars through retention)
    val pruner = new ScbfStats.Pruner(conf, pushedFilters)
    val planned = pruner.keepAll(files)(f => new Path(f.path), _.len)
      .map(f => ScbfCdcPartition(f.path, f.len, f.changeType,
        f.version.map(Integer.valueOf).orNull, f.ts): InputPartition)
      .toArray
    lastPlan = (lo, hi, planned)
    planned
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ScbfCdcReaderFactory(required, new ScbfUtil.SerializableConf(conf))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One enumerated change file: every row is one `changeType` row of
 * the commit at `tsMillis` (ordinal `version`; null = folded by a
 * pre-version-recording build). */
case class ScbfCdcPartition(path: String, length: Long, changeType: String,
    version: Integer, tsMillis: Long) extends InputPartition

/** Wraps the connector's own vectorized reader, appending the three
 * CDC metadata columns as per-split CONSTANT vectors (zero decode
 * cost — the same shape the `_file_path` metadata column rides). */
class ScbfCdcReaderFactory(required: StructType,
    conf: ScbfUtil.SerializableConf) extends PartitionReaderFactory {

  /** The table columns this scan must decode (CDC columns excluded). */
  private def innerRequired: StructType =
    StructType(required.fields.filterNot(f => ScbfCdcStreamSupport.MetaNames(f.name)))

  override def supportColumnarReads(partition: InputPartition): Boolean = true

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] = {
    val part = p.asInstanceOf[ScbfCdcPartition]
    val inner = new ScbfColumnarReader(
      ScbfFilePartition(part.path, part.length), innerRequired, conf.value)
    new PartitionReader[ColumnarBatch] {
      override def next(): Boolean = inner.next()
      override def get(): ColumnarBatch = {
        val b = inner.get()
        val n = b.numRows()
        var j = 0
        val vectors: Array[ColumnVector] = required.fields.map { f =>
          ScbfCdcStreamSupport.constantFor(f.name, part, math.max(n, 1)) match {
            case Some(v) => v
            case None => val v = b.column(j); j += 1; v
          }
        }
        new ColumnarBatch(vectors, n)
      }
      override def close(): Unit = inner.close()
    }
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[ScbfCdcPartition]
    val innerSchema = innerRequired
    val inner = new ScbfRowReader(
      ScbfFilePartition(part.path, part.length), innerSchema, conf.value)
    new PartitionReader[InternalRow] {
      override def next(): Boolean = inner.next()
      override def get(): InternalRow = {
        val r = inner.get()
        val out = new GenericInternalRow(required.length)
        var j = 0
        required.fields.zipWithIndex.foreach { case (f, i) =>
          f.name match {
            case ScbfCdc.ChangeTypeCol =>
              out.update(i, UTF8String.fromString(part.changeType))
            case ScbfCdc.CommitVersionCol =>
              out.update(i, if (part.version == null) null else Int.box(part.version))
            case ScbfCdc.CommitTsCol =>
              out.update(i, Long.box(part.tsMillis * 1000L))
            case _ =>
              out.update(i, r.get(j, f.dataType)); j += 1
          }
        }
        out
      }
      override def close(): Unit = inner.close()
    }
  }
}

private[sources] object ScbfCdcStreamSupport {
  val MetaNames: Set[String] =
    Set(ScbfCdc.ChangeTypeCol, ScbfCdc.CommitVersionCol, ScbfCdc.CommitTsCol)

  /** The per-split constant vector for a CDC metadata column, None for
   * a table column. */
  def constantFor(name: String, p: ScbfCdcPartition, rows: Int): Option[ColumnVector] =
    name match {
      case ScbfCdc.ChangeTypeCol =>
        val v = new ConstantColumnVector(rows, StringType)
        v.setUtf8String(UTF8String.fromString(p.changeType))
        Some(v)
      case ScbfCdc.CommitVersionCol =>
        val v = new ConstantColumnVector(rows, IntegerType)
        if (p.version == null) v.setNull() else v.setInt(p.version)
        Some(v)
      case ScbfCdc.CommitTsCol =>
        val v = new ConstantColumnVector(rows, TimestampType)
        v.setLong(p.tsMillis * 1000L)
        Some(v)
      case _ => None
    }
}

/** ScanBuilder/Scan for `readChangeFeed=true` — STREAM-only: the batch
 * spelling of CDC is `TABLE CHANGES` / [[ScbfCdc.changes]] (already a
 * DataFrame), so `toBatch` refuses with the cure. Column pruning is
 * honored (a consumer projecting two columns decodes two columns). */
class ScbfCdcScanBuilder(
    schema: StructType, // table schema + the three CDC columns
    rootDir: String,
    conf: Configuration,
    streamStart: Option[Either[Long, Int]],
    maxFilesPerTrigger: Option[Int],
    reconcile: Boolean,
    reconcileEvery: Option[Int] = None)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with org.apache.spark.sql.connector.read.SupportsPushDownFilters {

  private var required: StructType = schema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Stats-sidecar file skipping only — every filter stays residual
   * (the same contract as the batch scan), so skipping is always
   * sound. Filters on the CDC metadata columns are not usable by the
   * sidecars and simply stay residual. */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters.filter(ScbfStats.usable)
    filters
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed

  override def build(): Scan = new Scan {
    override def readSchema(): StructType = required

    override def description(): String =
      s"SCBF change feed, columns [${required.fieldNames.mkString(", ")}]"

    override def toBatch: Batch =
      throw new ScbfFormatException(
        "readChangeFeed is the STREAM spelling of CDC (readStream). For a " +
          "batch window, use SQL `CREATE TEMP VIEW v AS TABLE CHANGES tbl " +
          "SINCE <point>` or ScbfCdc.changes(spark, dir, since/sinceVersion).")

    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      new ScbfCdcMicroBatchStream(required, rootDir, conf,
        checkpointLocation, streamStart, maxFilesPerTrigger, reconcile,
        pushed.toSeq, reconcileEvery)
  }
}
