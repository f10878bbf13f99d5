package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/**
 * Directory maintenance for SCBF tables — the OPTIMIZE/compaction step
 * a 100 TB deployment runs between ingest and query.
 *
 * `cluster` rewrites a directory range-partitioned on the given
 * columns: a streaming ingest's many small epoch files (or an
 * unclustered batch write) become `numFiles` files with DISJOINT value
 * ranges on the cluster columns — the layout under which every
 * stats-driven optimization in this connector actually bites:
 * predicate file-skipping (q35/q36), runtime join pruning (q38), limit
 * prefixes, and top-k pruning (q39) all degrade to full scans when
 * every file spans the whole value range, and all prune to O(1) files
 * when ranges are disjoint.
 *
 * Safety is inherited from the connector's own write path, not
 * reimplemented: the overwrite captures the old files at job start and
 * deletes them only at job COMMIT (a failed rewrite leaves the old
 * table intact — ScbfBatchWrite's scaladoc), new files stage as
 * invisible dot-temps, and the job-commit manifest merge starts fresh
 * so no stale stats survive the rewrite. The read and the write are
 * separated by the range shuffle, so the input is fully consumed
 * before any publication happens. Concurrent READERS are safe at every
 * point (they see old files, or old+new during the commit window —
 * never partial files).
 *
 * Concurrent WRITERS: the rewrite reads an explicit SNAPSHOT listing
 * and passes the same names as the overwrite's `replaceFileNames`
 * scope, so the commit deletes exactly the files whose rows the
 * rewrite consumed. A file a concurrent append publishes after the
 * snapshot is neither read nor deleted — it survives untouched (the
 * next maintenance pass folds it in), where a listing-at-commit shape
 * would have DESTROYED it (deleted without its rows being in the
 * rewrite's input). Temps are likewise left alone on the snapshot
 * path; only a full (snapshot-free) overwrite sweeps them.
 */
object ScbfMaintenance extends org.apache.spark.internal.Logging {

  /** Test seam: invoked between the snapshot listing and the rewrite —
   * the window a concurrent append lands in. */
  private[sources] var raceHook: () => Unit = () => ()

  /** OCC snapshot for a maintenance rewrite, taken BEFORE the file
   * listing it plans from ([[ScbfOcc.snapshot]]); passed to the
   * overwrite as the `occSnapTs` write option so the conflict check
   * runs at the COMMIT INSTANT — a concurrent DELETE landing anywhere
   * in the rewrite job (read, shuffle, write) aborts the rewrite
   * rather than having its removed rows resurrected by it. None
   * (genuinely no chain) skips the check: a log-less table has nothing
   * announced to conflict with; a FAILED listing refuses — fail
   * closed (ADVICE r14). */
  private def occSnap(dir: String,
      conf: org.apache.hadoop.conf.Configuration): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    ScbfOcc.snapshot(p.getFileSystem(conf).makeQualified(p), conf,
      why => throw new graft.scbf.ScbfFormatException(
        s"maintenance rewrite on $dir: cannot verify concurrent-commit " +
          s"safety — $why"))
  }

  /** The maintenance rewrite's snapshot listing, rewrite-transparent
   * (the coexistence fix — [[ScbfOcc.recordedVictims]]): a listed
   * file the log records as another commit's victim, whose
   * replacement is itself listed (or whose takedown is recorded), is
   * a dead original pending physical removal — folding it into the
   * rewrite would RESURRECT the rows its mutation removed even when
   * that mutation fully committed before this rewrite's snapshot (the
   * crashed-removal shape OCC alone cannot see). */
  private def liveSnapshot(dir: String,
      conf: org.apache.hadoop.conf.Configuration)
      : Seq[org.apache.hadoop.fs.FileStatus] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    val q = fs.makeQualified(p)
    val snapshot = ScbfDataSource.resolveFiles(Seq(dir), conf)
    def refuse(why: String): Nothing =
      throw new graft.scbf.ScbfFormatException(
        s"maintenance rewrite on $dir: cannot verify the listing's " +
          s"rewrite-transparency — $why")
    val victims = ScbfOcc.recordedVictims(q, conf, refuse)
    if (victims.isEmpty) snapshot
    else {
      def rel(f: org.apache.hadoop.fs.FileStatus): String =
        ScbfCdc.relName(fs, q, f.getPath)
      val names = snapshot.iterator.flatMap(f =>
        Seq(f.getPath.getName, rel(f))).toSet
      val dead = ScbfOcc.deadAmong(names, victims, names.contains)
      def in(set: Set[String])(f: org.apache.hadoop.fs.FileStatus): Boolean =
        set.contains(f.getPath.getName) || set.contains(rel(f))
      // OPTIMIZE is the natural healer: complete a crashed takedown's
      // pending removal and a crashed arbitration loser's pending
      // rollback instead of leaving the dead bytes to double every
      // listing-based read until a DELETE re-run. Rollbacks FIRST —
      // see the ScbfDelete heal comment (tag-preference ambiguity
      // while the loser's replacement still exists).
      ScbfOcc.completePendingRollbacks(fs, q, conf,
        snapshot.filter(in(dead.loserOutputs)), victims)
      ScbfOcc.completePendingRemovals(fs, q, conf,
        snapshot.filter(in(dead.originals)), victims)
      snapshot.filterNot(in(dead.all))
    }
  }

  /** Per-partition maintenance rewrites thread the table-level CDC
   * coordinates ([[ScbfCdc]]) so the sweep's ROOT re-announcement can
   * carry the same tag the partition commit retained under — a flat
   * rewrite needs neither (the commit self-tags at its own root). */
  def cluster(
      spark: SparkSession,
      dir: String,
      clusterCols: Seq[String],
      numFiles: Int,
      maxBufferedBytes: Option[Long] = None,
      filePrefix: Option[String] = None,
      cdcTag: Option[String] = None,
      cdcRoot: Option[String] = None): Seq[String] = {
    require(clusterCols.nonEmpty, "cluster requires at least one column")
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val conf = spark.sessionState.newHadoopConf()
    ScbfClone.refuseIfClone(new org.apache.hadoop.fs.Path(dir), conf,
      "OPTIMIZE (cluster)")
    val occTs = occSnap(dir, conf)
    val snapshot = liveSnapshot(dir, conf)
    // a freshly-created (or fully-truncated) directory has nothing to
    // rewrite — loading zero paths would crash with an unrelated error
    if (snapshot.isEmpty) return Seq.empty
    raceHook()
    val df = spark.read.format("scbf")
      .load(snapshot.map(_.getPath.toString): _*)
    val writer = df
      .repartitionByRange(numFiles, clusterCols.map(col): _*)
      .write.format("scbf").mode("overwrite")
      .option("replaceFileNames", snapshot.map(_.getPath.getName).mkString(","))
    maxBufferedBytes.foreach(b => writer.option("maxBufferedBytes", b))
    filePrefix.foreach(p => writer.option("filePrefix", p))
    cdcTag.foreach(t => writer.option("cdcTag", t))
    cdcRoot.foreach(r => writer.option("cdcRoot", r))
    occTs.foreach(t => writer.option("occSnapTs", t))
    writer.save(dir)
    // the names ACTUALLY folded into the rewrite — callers announcing
    // the rewrite elsewhere (sweepPartitions' root log) must mark
    // exactly this set, not their own (re-)listing: a file appended
    // between two listings would be folded in but not marked, and a
    // caught-up stream would skip the rewrite as covered while the
    // file's own announcement points at deleted data
    snapshot.map(_.getPath.getName)
  }

  /**
   * Z-order clustering rewrite — the multi-dimensional OPTIMIZE
   * (Delta's `ZORDER BY`): [[cluster]] range-partitions
   * HIERARCHICALLY, so only predicates on the FIRST cluster column
   * prune (a file holds one narrow slab of col1 but every value of
   * col2); interleaving the bits of equi-depth bucket ranks instead
   * gives every listed dimension locality — a point/range predicate
   * on ANY one of them prunes to ~N^((d-1)/d) of the files rather
   * than all of them.
   *
   * Mechanics (all Catalyst built-ins, no UDF in the rewrite plan):
   * one `approxQuantile` pass computes 2^bits equi-depth cutpoints per
   * column (equi-depth, not equi-width: skew cannot collapse the
   * buckets); each row's bucket is "count of cutpoints ≤ v" via the
   * `aggregate` HOF over the broadcast cutpoint literal (codegen'd,
   * O(2^bits) per row); buckets bit-interleave into the z-value; the
   * rewrite range-partitions on z and drops it before writing. Safety
   * is the same inherited overwrite path as [[cluster]].
   *
   * Numeric columns only (quantiles are numeric); `bits` per column
   * defaults to 8 (256 buckets — plenty against file counts, which are
   * ~10⁴ per directory even at 100 TB).
   */
  /** Plain bin-packing compaction — `OPTIMIZE tbl [FILES n]` without a
   * BY clause: fold the directory's current files into `numFiles`
   * without imposing an order (Delta's un-ZORDERed OPTIMIZE). The
   * 100 TB small-file remedy when no clustering column is worth a
   * sort: same snapshot scoping, replace-only announcement (pure
   * compaction, no C:1 — streams stay silent) and commit discipline
   * as [[cluster]]. SHUFFLE-FREE in the normal (fold-down) direction:
   * the scan plans one partition per file, so `coalesce` packs several
   * files per task without moving a row — at 100 TB that is the whole
   * point of bin-packing over clustering. Only the rare grow-the-
   * file-count direction pays a repartition shuffle (coalesce cannot
   * split partitions). */
  def compact(
      spark: SparkSession,
      dir: String,
      numFiles: Int,
      maxBufferedBytes: Option[Long] = None,
      filePrefix: Option[String] = None,
      cdcTag: Option[String] = None,
      cdcRoot: Option[String] = None): Seq[String] = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val conf = spark.sessionState.newHadoopConf()
    ScbfClone.refuseIfClone(new org.apache.hadoop.fs.Path(dir), conf,
      "OPTIMIZE (compact)")
    val occTs = occSnap(dir, conf)
    val snapshot = liveSnapshot(dir, conf)
    // idempotence: nothing to pack (empty directory), or already AT the
    // target file count with a plausibly-packed layout — re-running
    // `OPTIMIZE tbl` must not pay a full rewrite and churn the
    // discovery log for a layout it cannot improve. Count equality
    // alone is NOT enough: one huge file plus tiny ones has the target
    // count but none of the balance a pack exists to give, so the skip
    // additionally requires max ≤ 2× mean size (the one-huge-of-n case
    // maxes out at n× mean, so the band must sit well below small n;
    // a rewrite's own row-round-robin output lands within a few % of
    // mean, so the skip-after-pack contract holds and re-runs converge
    // instead of churning). An equal-count rebalance must REPARTITION:
    // coalesce(n) over n per-file input partitions is the identity and
    // would rewrite the skew verbatim.
    // Growing the count (numFiles > current) stays an explicit
    // rewrite: the caller asked for more parallelism.
    if (snapshot.isEmpty) return Seq.empty
    if (numFiles == snapshot.size) {
      val lens = snapshot.map(_.getLen)
      val balanced = lens.size == 1 || lens.max <= 2L * (lens.sum / lens.size)
      if (balanced) return Seq.empty
    }
    raceHook()
    val df = spark.read.format("scbf")
      .load(snapshot.map(_.getPath.toString): _*)
    val packed =
      if (numFiles < snapshot.size) df.coalesce(numFiles)
      else df.repartition(numFiles)
    val writer = packed
      .write.format("scbf").mode("overwrite")
      .option("replaceFileNames", snapshot.map(_.getPath.getName).mkString(","))
    maxBufferedBytes.foreach(b => writer.option("maxBufferedBytes", b))
    filePrefix.foreach(p => writer.option("filePrefix", p))
    cdcTag.foreach(t => writer.option("cdcTag", t))
    cdcRoot.foreach(r => writer.option("cdcRoot", r))
    occTs.foreach(t => writer.option("occSnapTs", t))
    writer.save(dir)
    snapshot.map(_.getPath.getName)
  }

  /** Table-level [[compact]] — every partition swept, root-log
   * re-announced; same contract as [[clusterTable]]. */
  def compactTable(
      spark: SparkSession,
      dir: String,
      numFilesPerPartition: Int,
      maxBufferedBytes: Option[Long] = None,
      parallelism: Int = 1): Seq[String] =
    sweepPartitions(spark, dir, parallelism) { (part, prefix, tag) =>
      compact(spark, part, numFilesPerPartition, maxBufferedBytes,
        Some(prefix), cdcTag = tag, cdcRoot = Some(dir))
    }

  def zorder(
      spark: SparkSession,
      dir: String,
      zCols: Seq[String],
      numFiles: Int,
      bits: Int = 8,
      maxBufferedBytes: Option[Long] = None,
      filePrefix: Option[String] = None,
      cdcTag: Option[String] = None,
      cdcRoot: Option[String] = None): Seq[String] = {
    require(zCols.size >= 2, "zorder needs >= 2 columns (use cluster for 1)")
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    require(bits >= 1 && bits <= 16, s"bits per column must be in [1,16], got $bits")
    import org.apache.spark.sql.functions._
    val hconf = spark.sessionState.newHadoopConf()
    ScbfClone.refuseIfClone(new org.apache.hadoop.fs.Path(dir), hconf,
      "OPTIMIZE (zorder)")
    val occTs = occSnap(dir, hconf)
    val snapshot = liveSnapshot(dir, hconf)
    if (snapshot.isEmpty) return Seq.empty // nothing to rewrite
    raceHook()
    val df = spark.read.format("scbf")
      .load(snapshot.map(_.getPath.toString): _*)
    zCols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt == org.apache.spark.sql.types.IntegerType ||
        dt == org.apache.spark.sql.types.DoubleType,
        s"zorder column '$c' must be numeric (int32/float64), got $dt")
    }
    require(!df.columns.exists(c => c == "__z" || c.startsWith("__zb_")),
      "zorder uses helper columns __z/__zb_N; rename conflicting table columns first")
    val nBuckets = 1 << bits
    // pass 1: equi-depth cutpoints (bounded driver data: 2^bits doubles
    // per column). relativeError trades one extra scan's precision for
    // speed; bucket skew only costs pruning sharpness, never rows.
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    // ONE multi-column quantile job — d columns share a single table
    // scan (the single-column overload would cost d full scans)
    val cutArrays =
      df.stat.approxQuantile(zCols.toArray, probs, 0.001)
    val cuts: Map[String, Array[Double]] =
      zCols.zip(cutArrays).toMap
    // bucket rank: count of cutpoints <= v, via the aggregate HOF over
    // the cutpoint array literal — codegen'd, no UDF
    def bucket(c: String): org.apache.spark.sql.Column =
      aggregate(
        lit(cuts(c)),
        lit(0),
        (acc, cut) => acc + when(col(c).cast("double") >= cut, 1).otherwise(0))
    val withBuckets = zCols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      d.withColumn(s"__zb_$i", bucket(c))
    }
    // interleave: bit b of column i lands at position b*d + i
    val zCol = (for {
      i <- zCols.indices
      b <- 0 until bits
    } yield shiftleft(
      shiftright(col(s"__zb_$i"), b).bitwiseAND(lit(1)).cast("long"),
      b * zCols.size + i))
      .reduce(_.bitwiseOR(_))
    val writer = withBuckets
      .withColumn("__z", zCol)
      .repartitionByRange(numFiles, col("__z"))
      .drop((zCols.indices.map(i => s"__zb_$i") :+ "__z"): _*)
      .write.format("scbf").mode("overwrite")
      .option("replaceFileNames", snapshot.map(_.getPath.getName).mkString(","))
    maxBufferedBytes.foreach(b => writer.option("maxBufferedBytes", b))
    filePrefix.foreach(p => writer.option("filePrefix", p))
    cdcTag.foreach(t => writer.option("cdcTag", t))
    cdcRoot.foreach(r => writer.option("cdcRoot", r))
    occTs.foreach(t => writer.option("occSnapTs", t))
    writer.save(dir)
    snapshot.map(_.getPath.getName) // see [[cluster]]: the folded-in set
  }

  /** The partition directories of a table: the distinct parents of its
   * data files (recursive listing). An unpartitioned table yields its
   * own root; a hive-layout table yields one leaf per partition value
   * combination. */
  private[sources] def partitionDirs(
      dir: String,
      conf: org.apache.hadoop.conf.Configuration): Seq[org.apache.hadoop.fs.Path] =
    ScbfDataSource.resolveFiles(Seq(dir), conf).map(_.getPath.getParent).distinct

  /**
   * Table-level OPTIMIZE: run [[cluster]] in EVERY partition directory
   * of a (possibly hive-partitioned) table with one call — the shape
   * an operator maintains a 100 TB table with. Each per-partition
   * rewrite keeps the properties the single-directory form already
   * has (snapshot-scoped against concurrent appends, old files deleted
   * only at commit, fresh per-directory manifest), and partitions fail
   * independently: serially, a partition that throws stops the sweep
   * with everything before it fully maintained and everything after it
   * untouched; in parallel, every started partition attempt runs to
   * completion before the first failure surfaces (nothing is left
   * running in the background). Either way re-running is always safe
   * (a clustered partition just re-clusters).
   *
   * Stream transparency at the ROOT: the per-partition commit
   * announces to the PARTITION's own discovery log (it is a complete
   * standalone SCBF directory), which a stream reading the table root
   * never consumes — so after each partition's rewrite this method
   * re-announces the new files to the ROOT log with subdir-qualified
   * names, marked as rewrites of the subdir-qualified snapshot. A
   * caught-up root stream admits them seen-without-delivery exactly
   * like a root-level OPTIMIZE; rewrite outputs are identified by a
   * per-partition unique file prefix, so a concurrent append's files
   * can never be mis-marked as rewrite output (they announce
   * themselves through their own commit).
   *
   * `parallelism` runs that many partition rewrites as CONCURRENT
   * Spark jobs from driver threads — partitions are disjoint
   * directories (independent snapshots, manifests, logs; the root-log
   * append is atomic-rename per unique delta), so the only shared
   * resource is cluster capacity. A per-partition rewrite of a small
   * partition is dominated by fixed job overhead; a sweep of 10³
   * partitions serializing that overhead would make table maintenance
   * O(partitions) wall-clock for no reason. Returns the partition
   * directories maintained.
   */
  def clusterTable(
      spark: SparkSession,
      dir: String,
      clusterCols: Seq[String],
      numFilesPerPartition: Int,
      maxBufferedBytes: Option[Long] = None,
      parallelism: Int = 1): Seq[String] =
    sweepPartitions(spark, dir, parallelism) { (part, prefix, tag) =>
      cluster(spark, part, clusterCols, numFilesPerPartition,
        maxBufferedBytes, Some(prefix), cdcTag = tag, cdcRoot = Some(dir))
    }

  /** Table-level [[zorder]] — the multi-dimensional [[clusterTable]];
   * same per-partition sweep, same root-log re-announcement. */
  def zorderTable(
      spark: SparkSession,
      dir: String,
      zCols: Seq[String],
      numFilesPerPartition: Int,
      bits: Int = 8,
      maxBufferedBytes: Option[Long] = None,
      parallelism: Int = 1): Seq[String] =
    sweepPartitions(spark, dir, parallelism) { (part, prefix, tag) =>
      zorder(spark, part, zCols, numFilesPerPartition, bits,
        maxBufferedBytes, Some(prefix), cdcTag = tag, cdcRoot = Some(dir))
    }

  private def sweepPartitions(spark: SparkSession, dir: String, parallelism: Int)(
      rewrite: (String, String, Option[String]) => Seq[String]): Seq[String] = {
    require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    val qroot = root.getFileSystem(conf).makeQualified(root)
    // one CDC probe per sweep: each per-partition rewrite is its own
    // commit, so each gets its own tag — generated HERE so the root
    // re-announcement below can carry the same tag the partition
    // commit retained its victims under (ScbfCdc)
    val cdcOn = ScbfCdc.enabled(qroot, conf)
    val parts = partitionDirs(dir, conf)
    def sweepOne(part: org.apache.hadoop.fs.Path): Unit = {
      val sub = qroot.toUri.relativize(part.toUri).getPath.stripSuffix("/")
      val prefix = s"opt-${java.util.UUID.randomUUID().toString.take(8)}-"
      val tag = if (cdcOn) Some(ScbfCdc.newTag("compact")) else None
      // the root-log mark must carry the names the rewrite ACTUALLY
      // folded in (its return value) — a separate listing here could
      // miss a file appended before the rewrite's own snapshot, and a
      // caught-up root stream would then skip the rewrite as covered
      // while that file's rows reach it only through the (deleted)
      // original
      val snapshot = rewrite(part.toString, prefix, tag)
      // root-log re-announcement (see scaladoc) — skipped when the
      // partition IS the root: the inner commit already announced there
      if (sub.nonEmpty) {
        val produced = ScbfDataSource.resolveFiles(Seq(part.toString), conf)
          .filter(_.getPath.getName.startsWith(prefix))
        val now = System.currentTimeMillis()
        ScbfDiscovery.append(qroot, conf, produced.map(f =>
          ScbfDiscovery.Entry(s"$sub/${f.getPath.getName}", f.getLen, now,
            rewriteOf = snapshot.map(n => s"$sub/$n").sorted,
            cdcTag = if (snapshot.nonEmpty) tag else None)))
      }
    }
    forEachDir(parts, parallelism)(sweepOne)
    parts.map(_.toString)
  }

  /** Run `f` over independent directories with up to `parallelism`
   * concurrent driver threads (each typically launching Spark jobs).
   * EVERY started attempt runs to completion BEFORE the first failure
   * surfaces (unwrapped): propagating early would return control to
   * the caller while queued and in-flight work keeps running in the
   * background — an immediate retry (the documented recovery for
   * sweeps and table-level DELETE/UPDATE) would then race it, exactly
   * the single-rewriter hazard. Each per-directory op is atomic
   * (commit-or-leave-intact), so once this HAS returned, re-running
   * is always safe. */
  private[sources] def forEachDir(
      dirs: Seq[org.apache.hadoop.fs.Path],
      parallelism: Int)(f: org.apache.hadoop.fs.Path => Unit): Unit = {
    require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
    if (parallelism == 1 || dirs.size <= 1) dirs.foreach(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(parallelism, dirs.size))
      try {
        val futures = dirs.map(d => pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = f(d)
        }))
        val results = futures.map(fu => scala.util.Try(fu.get()))
        val failures = results.collect { case scala.util.Failure(e) =>
          e match {
            case ee: java.util.concurrent.ExecutionException
              if ee.getCause != null => ee.getCause
            case other => other
          }
        }
        // surface EVERY partition's failure, not just the first: a
        // parallel sweep failing in several partitions must not hide
        // all but one cause — the rest attach as suppressed
        failures.headOption.foreach { first =>
          failures.drop(1).foreach(first.addSuppressed)
          throw first
        }
      } finally pool.shutdown()
    }
  }

  /**
   * Janitorial sweep of a table directory — the VACUUM step for a
   * long-running ingest: crashed task attempts leave invisible
   * dot-temps (a hard executor kill never runs abort()), and
   * out-of-band data-file deletion leaves orphan stats/bloom sidecars.
   * Neither affects correctness (temps are invisible to scans, orphan
   * sidecars are keyed by missing data names and length-guarded), but
   * at ingest rates they accumulate listing weight forever.
   *
   * On a CDC-ENABLED table ([[ScbfCdc]]) the sweep additionally
   * reclaims retention areas older than `cdcRetainMs` — and THAT is a
   * correctness trade, not litter: CDC windows and `TIMESTAMP AS OF`
   * points needing a swept tag refuse loudly afterwards (never wrong
   * rows), exactly Delta's VACUUM-vs-time-travel contract. Retention
   * gets its OWN horizon (default 7 days, Delta's
   * `delta.deletedFileRetentionDuration` shape) because the litter
   * horizon is sized for crashed-attempt temps (hours), while the CDC
   * horizon is the operator's audit promise — a routine default-args
   * vacuum must not destroy week-wide CDC windows. An explicit
   * `RETAIN n HOURS` in SQL overrides BOTH (one stated horizon is one
   * promise); size it beyond the widest CDC window any consumer
   * replays (`sweepCdc=false` opts a run out). Swept tags are logged.
   *
   * Only files older than `olderThanMs` are touched — the horizon
   * protects in-flight work: a LIVE task's staged temps are younger
   * than any sane horizon, and a streaming epoch that crashed between
   * staging and commit stages FRESH temps on replay (temp names embed a
   * per-attempt random attemptUuid — ScbfWrite), converging via the
   * epoch committer's content-identity check; the dead attempt's aged
   * temps are pure litter and always safe to sweep. Same single-writer
   * contract and
   * retention trade as Delta's VACUUM; default horizon 24 h.
   *
   * Returns (temps deleted, orphan sidecars deleted).
   */
  def vacuum(
      spark: SparkSession,
      dir: String,
      olderThanMs: Long = 24L * 3600 * 1000,
      sweepCdc: Boolean = true,
      cdcRetainMs: Long = 7L * 24 * 3600 * 1000): (Int, Int) = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return (0, 0)
    val all = fs.listStatus(p).filter(_.isFile)
    val live = all.map(_.getPath.getName)
      .filter(n => n.endsWith(graft.scbf.Scbf.FileExtension) && !n.startsWith("."))
      .toSet
    val cutoff = System.currentTimeMillis() - olderThanMs
    var temps = 0
    var orphans = 0
    all.foreach { st =>
      val n = st.getPath.getName
      if (st.getModificationTime < cutoff) {
        // a bloom/stats TEMP (.f.scbf.bloom.<uuid>.tmp) matches isTemp
        // too and sweeps as a temp
        if (ScbfWrite.isTemp(n)) { fs.delete(st.getPath, false); temps += 1 }
        else {
          val dataName =
            if (n.startsWith(".") && n.endsWith(".stats")) Some(n.drop(1).dropRight(6))
            else if (n.startsWith(".") && n.endsWith(".bloom")) Some(n.drop(1).dropRight(6))
            else None
          dataName.filterNot(live.contains).foreach { _ =>
            fs.delete(st.getPath, false); orphans += 1
          }
        }
      }
    }
    // CDC retention reclaim (ScbfCdc): tag areas older than the same
    // horizon sweep with the janitor — `VACUUM tbl RETAIN n HOURS` is
    // the SQL spelling of the retention trade, exactly as in Delta
    // (CDC windows and AS OF points needing swept tags refuse loudly
    // afterwards; the horizon is the operator's audit promise — see
    // scaladoc). Logged so a sweep that will make windows refuse is
    // visible in the run that did it.
    if (sweepCdc) {
      val swept = ScbfCdc.vacuum(p, conf, cdcRetainMs)
      if (swept > 0) logWarning(s"vacuum($dir): reclaimed $swept CDC " +
        s"retention area(s) older than ${cdcRetainMs} ms — CDC windows " +
        "and AS OF points needing them will refuse from now on")
    }
    (temps, orphans)
  }

  /** Table-level [[vacuum]]: the janitorial sweep over EVERY table
   * directory (the partitioned root's own litter and a crashed
   * write's temp-only partition directory both need sweeping, so
   * this walks [[ScbfPartitions.allDirs]], not just data-holding
   * dirs). Directories sweep CONCURRENTLY up to `parallelism` driver
   * threads — per-directory vacuums are pure independent filesystem
   * metadata work (list + targeted deletes; no Spark jobs), so on an
   * object store the sweep's wall-clock is latency-bound and
   * serializing it is O(dirs) round-trips for no reason. An explicit
   * `olderThanMs` (SQL `RETAIN n HOURS`) overrides both the litter
   * and the CDC-retention defaults, exactly as the per-directory
   * call does. Returns (temps removed, orphan sidecars removed). */
  def vacuumTable(
      spark: SparkSession,
      rootDir: String,
      olderThanMs: Option[Long] = None,
      parallelism: Int = 1): (Int, Int) = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(rootDir)
    val dirs = ScbfPartitions.allDirs(root, conf)
    val temps = new java.util.concurrent.atomic.AtomicInteger(0)
    val orphans = new java.util.concurrent.atomic.AtomicInteger(0)
    forEachDir(dirs, parallelism) { d =>
      val (t, o) = olderThanMs match {
        case Some(ms) => vacuum(spark, d.toString, ms, cdcRetainMs = ms)
        case None     => vacuum(spark, d.toString)
      }
      temps.addAndGet(t); orphans.addAndGet(o); ()
    }
    (temps.get, orphans.get)
  }

  /** CLI: `cluster <dir> <numFiles> <col> [col ...]` or
   * `vacuum <dir> [horizonHours]` — the maintenance entry points
   * alongside the reference-shaped CSV CLI (CsvScbfApps). */
  def main(args: Array[String]): Unit = args.toSeq match {
    case Seq("cluster", dir, n, cols @ _*) if cols.nonEmpty =>
      val spark = SparkSession.builder().getOrCreate()
      cluster(spark, dir, cols, n.toInt)
    case Seq("zorder", dir, n, cols @ _*) if cols.size >= 2 =>
      val spark = SparkSession.builder().getOrCreate()
      zorder(spark, dir, cols, n.toInt)
    case Seq("vacuum", dir) =>
      val spark = SparkSession.builder().getOrCreate()
      val (t, o) = vacuum(spark, dir)
      println(s"vacuum: removed $t temps, $o orphan sidecars")
    case Seq("vacuum", dir, hours) =>
      val spark = SparkSession.builder().getOrCreate()
      val (t, o) = vacuum(spark, dir, hours.toLong * 3600 * 1000)
      println(s"vacuum: removed $t temps, $o orphan sidecars")
    case _ =>
      System.err.println(
        "usage: ScbfMaintenance cluster <dir> <numFiles> <col> [col ...] | " +
          "zorder <dir> <numFiles> <col> <col> [col ...] | " +
          "vacuum <dir> [horizonHours]")
      sys.exit(2)
  }
}
