package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{col, lit, not, when}
import org.apache.spark.sql.sources._

/**
 * `DELETE FROM <scbf table> WHERE <cond>` — the takedown path a
 * training-data store actually needs (PII removal, right-to-be-
 * forgotten, licence retractions), wired through DSv2
 * [[org.apache.spark.sql.connector.catalog.SupportsDelete]] on
 * [[ScbfTable]].
 *
 * Execution is a STATS-SCOPED rewrite: files whose stats/blooms PROVE
 * no row can match (the same conjunctive check the scan prunes with)
 * are left byte-identical on disk — at 100 TB a targeted delete
 * touches the files holding the victims, not the table. Affected
 * files are read back (distributed), their surviving rows re-written
 * through the connector's own append path (task-commit publish,
 * manifest merge, bloom/stats sidecars — all inherited), and the
 * originals (plus their sidecars) are deleted last.
 *
 * Failure semantics, same logless contract the OPTIMIZE rewrites
 * document: a crash BEFORE the append job commits aborts cleanly (new
 * files are swept, originals untouched — the delete simply didn't
 * happen); a crash in the window AFTER the append commits and before
 * the originals are removed leaves original+replacement coexisting
 * (duplicated survivors, deleted rows still gone from the
 * replacement but present in the original). Readers during a healthy
 * delete see the same transient old+new window `cluster` documents.
 * A deployment needing atomic multi-file visibility layers a
 * transaction log above the format — out of scope for the frozen
 * reference format, stated honestly here.
 *
 * The no-op fast path matters operationally: probing `DELETE WHERE
 * doc_id = k` over a clustered/bloom'd directory where nothing
 * matches rewrites NOTHING (pure metadata reads).
 *
 * Concurrency contract: concurrent APPENDS are handled (the fold-in
 * re-list rounds in [[rewriteRounds]], and snapshot scoping on the
 * OPTIMIZE side). Concurrent REWRITERS — two deletes/updates/
 * optimizes on one directory — remain a single-writer contract, as in
 * any logless table format: two rewrites can scope the same original
 * and both republish survivors from it (duplicates), or one can
 * remove a file the other is mid-read. Serialize maintenance per
 * directory; a deployment needing multi-writer rewrites layers a
 * transaction log above the frozen format.
 */
object ScbfDelete {

  /** Translate a pushed source Filter to a Column predicate; None when
   * any node is untranslatable (canDeleteWhere then declines and Spark
   * surfaces a clean error instead of a wrong delete). */
  def filterToColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v)            => Some(col(a) === lit(v))
    case EqualNullSafe(a, v)      => Some(col(a) <=> lit(v))
    case GreaterThan(a, v)        => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v)           => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
    case In(a, vs)                => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a)                => Some(col(a).isNull)
    case IsNotNull(a)             => Some(col(a).isNotNull)
    case StringStartsWith(a, p)   => Some(col(a).startsWith(p))
    case StringEndsWith(a, p)     => Some(col(a).endsWith(p))
    case StringContains(a, p)     => Some(col(a).contains(p))
    case AlwaysTrue()             => Some(lit(true))
    case AlwaysFalse()            => Some(lit(false))
    case And(l, r) => for (a <- filterToColumn(l); b <- filterToColumn(r)) yield a && b
    case Or(l, r)  => for (a <- filterToColumn(l); b <- filterToColumn(r)) yield a || b
    case Not(c)    => filterToColumn(c).map(not)
    case _         => None
  }

  def canDelete(filters: Array[Filter]): Boolean =
    filters.forall(f => filterToColumn(f).isDefined)

  /** One rewrite round's outputs: the unique file prefix its
   * replacements carry, the original names they replaced, and the CDC
   * tag it captured under (if the table has CDC enabled) — what a
   * TABLE-level caller needs to re-announce the rewrite to the root
   * discovery log with subdir-qualified names. */
  private[sources] case class RewriteRound(prefix: String, replaced: Seq[String],
      cdcTag: Option[String] = None)

  /**
   * `DELETE FROM <partitioned scbf table> WHERE <cond>` — the
   * takedown path at its REAL layout: a 100 TB corpus is
   * hive-partitioned, and this routes the same stats-scoped rewrite
   * [[deleteWhere]] runs on a flat directory through every directory
   * the predicate can touch.
   *
   * Correctness is carried by ONE mechanism: the FULL condition is
   * enforced by every per-directory rewrite — partition columns are
   * STORED IN THE DATA FILES (ScbfPartitions' design choice), so
   * partition predicates evaluate exactly there like any other
   * column, and their per-file point-range stats make non-matching
   * files a pure metadata no-op. Directory-level partition pruning is
   * then a pure OPTIMIZATION (a `source = 'x'` takedown lists only
   * that partition): its conservative keeps — stray root-level files,
   * foreign `k=v` directories, unparseable cells — can cost a listing
   * but can never over-delete. Each per-directory pass lists LEAF
   * files only, so a stray file at the table root scopes a root pass
   * to the root's own files instead of recursing into every
   * partition.
   *
   * After each directory's rewrite commits, its replacement files are
   * re-announced to the ROOT discovery log with subdir-qualified
   * names and the `C:1` row-changing tag — a root stream gets the
   * identical onChangeCommit semantics (skip with a warning / deliver
   * / fail) as a flat-directory DELETE, instead of the bare-name
   * partition-log announcements it cannot match. `parallelism` drives
   * that many per-directory rewrites as concurrent Spark jobs (same
   * contract as [[ScbfMaintenance.clusterTable]]: every started
   * attempt completes before the first failure surfaces).
   * `partitionCols` is not consulted for DELETE (the single-mechanism
   * design needs no predicate split) — it stays in the signature for
   * symmetry with [[updateWhereTable]], which must refuse
   * partition-column SETs.
   */
  def deleteWhereTable(
      spark: SparkSession,
      rootDir: String,
      conf: org.apache.hadoop.conf.Configuration,
      tableSchema: org.apache.spark.sql.types.StructType,
      partitionCols: Seq[String],
      filters: Array[Filter],
      parallelism: Int = 1): Unit = {
    val root = new Path(rootDir)
    val qroot = root.getFileSystem(conf).makeQualified(root)
    tableRewrite(spark, rootDir, conf, tableSchema, filters, parallelism)(
      (part, onRound) =>
        deleteWhere(spark, part, conf, filters, leafOnly = true,
          onRound = onRound, cdcRoot = Some(qroot)))
  }

  /** Table-level [[updateWhere]] — same routing as
   * [[deleteWhereTable]]. SET targets must be data columns: updating
   * a partition column would move rows across directories (a
   * different operation — delete+insert — refused loudly). */
  def updateWhereTable(
      spark: SparkSession,
      rootDir: String,
      conf: org.apache.hadoop.conf.Configuration,
      tableSchema: org.apache.spark.sql.types.StructType,
      partitionCols: Seq[String],
      filters: Array[Filter],
      set: Map[String, Column],
      parallelism: Int = 1): Unit = {
    val bad = set.keySet.intersect(partitionCols.toSet)
    require(bad.isEmpty,
      s"cannot UPDATE partition column(s) ${bad.mkString(", ")}: rows would " +
        "change directories — DELETE and re-INSERT instead")
    val root = new Path(rootDir)
    val qroot = root.getFileSystem(conf).makeQualified(root)
    tableRewrite(spark, rootDir, conf, tableSchema, filters, parallelism)(
      (part, onRound) =>
        updateWhere(spark, part, conf, filters, set, leafOnly = true,
          onRound = onRound, cdcRoot = Some(qroot)))
  }

  private def tableRewrite(
      spark: SparkSession,
      rootDir: String,
      conf: org.apache.hadoop.conf.Configuration,
      tableSchema: org.apache.spark.sql.types.StructType,
      filters: Array[Filter],
      parallelism: Int)(
      perPartition: (String, RewriteRound => Unit) => Seq[RewriteRound]): Unit = {
    require(canDelete(filters),
      s"untranslatable condition: ${filters.mkString(", ")}")
    val root = new Path(rootDir)
    val fs = root.getFileSystem(conf)
    val qroot = fs.makeQualified(root)
    // qualified roots: prune prefix-matches against the listing's
    // qualified paths, so an unqualified caller path would silently
    // no-op the optimization (correctness unaffected — conservative)
    val qroots = ScbfPartitions.qualifiedRoots(Seq(rootDir), conf)
    def sweepOne(part: Path): Unit = {
      val sub = qroot.toUri.relativize(fs.makeQualified(part).toUri)
        .getPath.stripSuffix("/")
      // root-dir rounds announce themselves in their own commit;
      // subdirectory rounds re-announce to the root log PER ROUND,
      // immediately after each round's commit (atomic-rename appends:
      // safe from concurrent pool threads, like the sweep) — a crash
      // between a round's partition-level commit and a deferred
      // whole-partition announcement would leave no C:1 mark and make
      // a caught-up root stream's next reconcile re-deliver the
      // replacement's rows even under onChangeCommit=skip; per-round
      // announcement narrows that window to the flat path's
      val announce: RewriteRound => Unit = r =>
        if (sub.nonEmpty) {
          val live = ScbfDataSource.resolveFiles(Seq(part.toString), conf)
          val now = System.currentTimeMillis()
          val produced = live.filter(_.getPath.getName.startsWith(r.prefix))
          val entries =
            if (produced.nonEmpty) produced.map(f =>
              ScbfDiscovery.Entry(s"$sub/${f.getPath.getName}", f.getLen, now,
                rewriteOf = r.replaced.map(n => s"$sub/$n").sorted,
                rowsChanged = true, cdcTag = r.cdcTag))
            // metadata-only round (DELETE whole-file fast path): no
            // replacement exists to carry the announcement, so the
            // root log gets the same REMOVAL entry the partition's own
            // log got — subdir-qualified, like every root announcement
            // (same existing-log gate as the flat path)
            else if (r.replaced.nonEmpty && ScbfDiscovery.exists(qroot, conf))
              Seq(ScbfDiscovery.Entry(
                s"$sub/${r.prefix.stripSuffix("-")}${ScbfDiscovery.RemovalSuffix}",
                ScbfDiscovery.RemovedLen, now,
                rewriteOf = r.replaced.map(n => s"$sub/$n").sorted,
                rowsChanged = true, cdcTag = r.cdcTag))
            else Seq.empty
          ScbfDiscovery.append(qroot, conf, entries)
        }
      perPartition(part.toString, announce)
      ()
    }
    // Bounded re-list rounds at the DIRECTORY level, mirroring
    // rewriteRounds' file-level guard: a concurrent INSERT can CREATE
    // a partition directory after the initial listing, and a one-shot
    // snapshot would silently exempt its rows from the condition.
    // Already-processed directories are NOT revisited — appends to
    // them after their pass land "after" this operation (the same
    // point-in-time semantics a flat-directory rewrite settles on
    // when its own re-list round comes up clean), and revisiting
    // would double-apply UPDATE's SET expressions.
    var done = Set.empty[Path]
    var round = 0
    while (true) {
      round += 1
      // directory-first discovery (ScbfPartitions.pruneDirs): prune
      // partition NAMES before listing their contents, so a scoped
      // takedown's listing bill is the in-scope subtree plus one root
      // listing — never a full-table leaf LIST per round. Pure
      // optimization (see scaladoc): over-keeping a directory only
      // costs its listing — the rewrite condition enforces exactness
      val parents = ScbfPartitions.pruneDirs(
        new Path(rootDir), conf, tableSchema, filters.toSeq, qroots)
        .filterNot(done)
      if (parents.isEmpty) return
      if (round > MaxRewriteRounds) throw new graft.scbf.ScbfFormatException(
        s"partitioned rewrite on $rootDir: concurrent ingest kept creating " +
          s"in-scope partition directories through $MaxRewriteRounds re-list " +
          "rounds; giving up loudly. Directories processed so far are fully " +
          "rewritten and consistent — re-run once the ingest settles.")
      done ++= parents
      ScbfMaintenance.forEachDir(parents, parallelism)(sweepOne)
    }
  }

  /**
   * UPDATE ... SET ... WHERE as the same stats-scoped rewrite as
   * [[deleteWhere]]: files that provably hold no matching row stay
   * byte-identical; affected files rewrite with `set` applied to the
   * rows matching `cond` and every other row passed through
   * unchanged. `set` values are arbitrary Column expressions over the
   * row (so `SET n = n + 1` works); assigned columns must keep their
   * SCBF type (the write fails fast otherwise). Same append-then-
   * remove failure contract as delete.
   *
   * SQL `UPDATE` exists too since round 9 — Spark's
   * SupportsRowLevelOperations path ([[ScbfRowLevelOp]], q50) runs the
   * same group-based copy-on-write with snapshot scoping. This API
   * twin differs in two deliberate ways: it re-lists in bounded rounds
   * (concurrent appends fold in instead of landing "after"), and it
   * refuses partition-column SETs where the SQL path moves rows.
   */
  def updateWhere(
      spark: SparkSession,
      dir: String,
      conf: org.apache.hadoop.conf.Configuration,
      filters: Array[Filter],
      set: Map[String, Column],
      leafOnly: Boolean = false,
      onRound: RewriteRound => Unit = _ => (),
      cdcRoot: Option[Path] = None): Seq[RewriteRound] = {
    require(set.nonEmpty, "updateWhere needs at least one SET assignment")
    rewriteRounds(spark, dir, conf, filters, "UPDATE", leafOnly, onRound, cdcRoot) { (src, cond) =>
      set.keys.foreach(c => require(src.columns.contains(c),
        s"SET column '$c' does not exist in the table"))
      // ONE projection, not a withColumn chain: SQL UPDATE evaluates every
      // SET right-hand side against the OLD row (SET a = b, b = a swaps),
      // and a sequential chain would leak earlier assignments into later
      // expressions. Each assigned column casts back to its exact SCBF
      // type so `SET n = n + 1` cannot silently widen the schema.
      src.select(src.columns.map { c =>
        set.get(c) match {
          case Some(v) =>
            when(cond, v.cast(src.schema(c).dataType)).otherwise(col(c)).as(c)
          case None => col(c)
        }
      }.toIndexedSeq: _*)
    }
  }

  /** Delete all rows matching the CONJUNCTION of `filters` from the
   * single-directory table at `dir`. See object scaladoc. */
  def deleteWhere(
      spark: SparkSession,
      dir: String,
      conf: org.apache.hadoop.conf.Configuration,
      filters: Array[Filter],
      leafOnly: Boolean = false,
      onRound: RewriteRound => Unit = _ => (),
      cdcRoot: Option[Path] = None): Seq[RewriteRound] =
    rewriteRounds(spark, dir, conf, filters, "DELETE", leafOnly, onRound, cdcRoot) { (src, cond) =>
      // survivors under SQL three-valued logic: a row is deleted only when
      // cond is TRUE; NULL-condition rows must SURVIVE, and a bare
      // `filter(!cond)` would drop them (NOT NULL = NULL filters out).
      // Moot while the SCBF schema is nullable=false, but correct for any
      // future nullable column support.
      src.filter(not(org.apache.spark.sql.functions.coalesce(cond, lit(false))))
    }

  /** Bounded re-list rounds before a rewrite gives up on a directory
   * under sustained concurrent appends. */
  private val MaxRewriteRounds = 4

  /** Test seam for the concurrent-append race: invoked after a round's
   * scope is computed and before its rewrite runs — exactly the window
   * a concurrent append lands in. Specs inject an append here. */
  private[sources] var raceHook: () => Unit = () => ()

  /** Test seam for the OCC post-publish window: invoked after a
   * round's replacement has published (entries announced) and before
   * the post-publish conflict recheck — the window a blind racer's
   * commit lands in. Specs inject a conflicting commit here. */
  private[sources] var postPublishHook: () => Unit = () => ()

  /** Test seam for the OCC pre-publish window: invoked after the
   * pre-commit conflict check passes and before the round's
   * replacement publishes — a racer committing HERE serializes at a
   * LOWER ordinal than this round's commit, making this round the
   * arbitration loser at its recheck. */
  private[sources] var prePublishHook: () => Unit = () => ()

  /**
   * The shared rewrite engine for DELETE/UPDATE with the
   * CONCURRENT-APPEND GUARD: each round (1) lists the directory,
   * (2) stats-scopes the not-yet-accounted files, (3) rewrites the
   * affected ones through the connector's own append path (marked with
   * a round-unique `filePrefix` so this job's output is
   * distinguishable), and (4) removes the originals — then RE-LISTS.
   * A file a concurrent append published while the round ran shows up
   * in the next round's listing and is folded in (its matching rows
   * rewritten too) instead of silently surviving, which is what the
   * single listing-at-start shape did. Rounds are bounded: a directory
   * under a sustained in-scope append storm fails LOUDLY after
   * [[MaxRewriteRounds]] (work already done is complete and
   * consistent — the error says to re-run), never spins. The no-op
   * fast path is preserved: a provably-unmatched predicate returns
   * after one metadata-only round.
   */
  private def rewriteRounds(
      spark: SparkSession,
      dir: String,
      conf: org.apache.hadoop.conf.Configuration,
      filters: Array[Filter],
      op: String,
      // restrict each round's scope to files DIRECTLY in `dir`: a
      // table-level rewrite visits the root and each partition as
      // separate passes, and the root pass must not recurse into the
      // subdirectories another pass owns (double-applied UPDATEs,
      // survivors folded out of their partitions)
      leafOnly: Boolean = false,
      // invoked after each round fully commits (replacements
      // published, originals removed) — the table-level path's
      // per-round root-log re-announcement hook
      onRound: RewriteRound => Unit = _ => (),
      // table root the CDC area lives under (ScbfCdc) — per-partition
      // table-level passes pass the ROOT; a flat call captures at its
      // own directory
      cdcRoot: Option[Path] = None)(
      rewrite: (org.apache.spark.sql.DataFrame, Column) => org.apache.spark.sql.DataFrame): Seq[RewriteRound] = {
    require(canDelete(filters),
      s"untranslatable ${op.toLowerCase} condition: ${filters.mkString(", ")}")
    val cond = filters.flatMap(filterToColumn).reduceOption(_ && _)
      .getOrElse(lit(true)) // empty WHERE = the whole table
    // names already processed or proven out of scope, plus this job's
    // own replacement prefixes (survivor files must never re-enter)
    var accounted = Set.empty[String]
    var ourPrefixes = Set.empty[String]
    val rounds = Seq.newBuilder[RewriteRound]
    val dfs = new Path(dir).getFileSystem(conf)
    val qdir = dfs.makeQualified(new Path(dir))
    // CDC capture (ScbfCdc): probe once per call; each round is its
    // own commit and gets its own tag. The API paths materialize EXACT
    // change rows — the condition (and for UPDATE, the rewrite
    // projection) is in hand, so no value-diffing is needed.
    val qcdc = dfs.makeQualified(cdcRoot.getOrElse(qdir))
    val cdcOn = ScbfCdc.enabled(qcdc, conf)
    def cdcRowSets(src: org.apache.spark.sql.DataFrame)
        : Seq[(String, org.apache.spark.sql.DataFrame)] = {
      val matched = src.filter(
        org.apache.spark.sql.functions.coalesce(cond, lit(false)))
      if (op == "DELETE") Seq("delete" -> matched)
      // update_post: the rewrite projection over the matched rows —
      // cond holds on every one of them, so the when(cond, …) arms
      // pick the assigned values
      else Seq("update_pre" -> matched, "update_post" -> rewrite(matched, cond))
    }
    // leafOnly lists the directory itself, never recursing into k=v
    // subtrees another table-level pass owns (a stray root file on a
    // 10⁵-file table must not cost full-table listings per round)
    def listCandidates(): Seq[org.apache.hadoop.fs.FileStatus] =
      if (leafOnly)
        dfs.listStatus(qdir).toSeq.filter(f => f.isFile && {
          val n = f.getPath.getName
          n.endsWith(graft.scbf.Scbf.FileExtension) && !n.startsWith(".")
        })
      else ScbfDataSource.resolveFiles(Seq(dir), conf)
    // ---- OCC: write-write conflict detection (Delta's
    // ConcurrentDeleteRead contract; the shared rule/rollback live in
    // [[ScbfOcc]]) -------------------------------------------------
    // Two concurrent mutations whose victim sets overlap must not both
    // publish: the loser would either resurrect rows the winner deleted
    // (its replacement re-publishes survivors of files the winner
    // rewrote) or silently lose the winner's update — the lost-update
    // shape. Each round snapshots the log's newest commit instant
    // BEFORE listing, then verifies nothing committed since has named
    // one of this round's victims in rewriteOf: once just before any
    // side effect (cheap abort) and once again after publishing but
    // before the originals are removed (the publish itself re-checks —
    // whichever racer appends second sees the other's entries, so two
    // overlapping mutations can never BOTH keep their replacements;
    // the later one rolls its replacement back through the same
    // aborted-rewrite scrub path managed schema rewrites use). An
    // UNVERIFIABLE recheck (replay failure) rolls back too — fail
    // closed, never leave announced entries Spark's abort then orphans.
    // Arbitration (round 15, on the ordinal-CAS protocol): of two
    // racers that both published, exactly the HIGHER ordinal rolls
    // back at its recheck — single-loser, no retry storm (see
    // ScbfOcc scaladoc).
    // Cost: one bounded replay of the post-snapshot deltas per check —
    // noise next to the rewrite IO.
    def postSnapEntries(snapTs: Long): Seq[(ScbfDiscovery.Entry, String)] =
      ScbfOcc.entriesAfter(qdir, conf, snapTs,
        why => throw new graft.scbf.ScbfFormatException(
          s"$op on $dir: cannot verify concurrent-commit safety — $why"))
    // ---- rewrite-transparent listing (the coexistence fix — see
    // ScbfOcc.recordedVictims): names the log records as another
    // commit's victims are dead originals pending removal; planning
    // them would double their rows with their replacements'. The full
    // chain replays ONCE per operation; each round extends the set
    // with commits that landed since (one bounded replay from the
    // op-start instant — the same bill the recheck pays).
    def refuseVictims(why: String): Nothing =
      throw new graft.scbf.ScbfFormatException(
        s"$op on $dir: cannot verify the listing's rewrite-transparency " +
          s"— $why")
    val opStartTs: Option[Long] = ScbfOcc.snapshot(qdir, conf, refuseVictims)
    val opVictims: Map[String, Seq[ScbfOcc.VictimRec]] =
      if (opStartTs.isEmpty) Map.empty
      else ScbfOcc.recordedVictims(qdir, conf, refuseVictims)
    def recordedVictimsNow(): Map[String, Seq[ScbfOcc.VictimRec]] =
      opStartTs match {
        case Some(t0) =>
          val late = postSnapEntries(t0)
            .flatMap { case (e, d) =>
              e.rewriteOf.map(_ -> ScbfOcc.recOf(e, d)) }
            .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
          (opVictims.keySet ++ late.keySet).iterator.map(v =>
            v -> (opVictims.getOrElse(v, Nil) ++ late.getOrElse(v, Nil))).toMap
        case None =>
          // no chain at op start: any chain that appears mid-op is
          // young and cheap to replay whole
          if (ScbfDiscovery.exists(qdir, conf))
            ScbfOcc.recordedVictims(qdir, conf, refuseVictims)
          else Map.empty
      }
    def refuseConflict(found: Seq[String], phase: String): Unit =
      if (found.nonEmpty) throw new graft.scbf.ScbfFormatException(
        ScbfOcc.refusalMessage(s"$op on $dir", found, phase))
    var round = 0
    while (true) {
      round += 1
      // newest published commit instant BEFORE this round's listing:
      // anything stamped after it committed concurrently with the
      // round; None (genuinely no chain) skips OCC, a FAILED listing
      // refuses — see ScbfOcc.snapshot
      val snapTs: Option[Long] = ScbfOcc.snapshot(qdir, conf,
        why => throw new graft.scbf.ScbfFormatException(
          s"$op on $dir: cannot verify concurrent-commit safety — $why"))
      // the rewrite-transparent VIEW: recorded victims whose
      // replacements are themselves listed (or whose takedown is
      // recorded) are dead bytes — excluded from the round's whole
      // universe, the empty-table guard's included
      val listedRaw = listCandidates()
      val listedNames = listedRaw.iterator.flatMap(f =>
        Seq(f.getPath.getName, ScbfCdc.relName(dfs, qdir, f.getPath))).toSet
      val victimRecords = recordedVictimsNow()
      val dead = ScbfOcc.deadAmong(listedNames, victimRecords,
        listedNames.contains) // listCandidates is unpruned — sound universe
      def in(set: Set[String])(f: org.apache.hadoop.fs.FileStatus): Boolean =
        set.contains(f.getPath.getName) ||
          set.contains(ScbfCdc.relName(dfs, qdir, f.getPath))
      // HEAL while we're here (both idempotent against a live owner
      // finishing concurrently, both staleness-gated). ROLLBACKS
      // FIRST: with a crashed loser's replacement still on disk, the
      // removal heal's tag preference could retain a victim's bytes
      // under the loser's tag — the very dir the rollback heal then
      // deletes; healing the loser away first removes the ambiguity.
      ScbfOcc.completePendingRollbacks(dfs, qdir, conf,
        listedRaw.filter(in(dead.loserOutputs)), victimRecords)
      ScbfOcc.completePendingRemovals(dfs, qdir, conf,
        listedRaw.filter(in(dead.originals)), victimRecords)
      val listed = listedRaw.filterNot(in(dead.all))
      val candidates = listed
        .filterNot(f => accounted.contains(f.getPath.getName) ||
          ourPrefixes.exists(f.getPath.getName.startsWith))
      accounted ++= candidates.map(_.getPath.getName)
      val pruner = new ScbfStats.Pruner(conf, filters.toSeq)
      val affected = pruner.keepAll(candidates)(_.getPath, _.getLen)
      raceHook()
      if (affected.isEmpty) return rounds.result() // nothing new in scope: done
      if (round > MaxRewriteRounds) throw new graft.scbf.ScbfFormatException(
        s"$op on $dir: concurrent appends kept publishing in-scope files " +
          s"through $MaxRewriteRounds re-list rounds; giving up loudly. " +
          "Files processed so far are fully rewritten and consistent — " +
          "re-run once the append traffic settles.")
      val prefix = s"rw-${java.util.UUID.randomUUID().toString.take(8)}-"
      ourPrefixes += prefix
      // DELETE whole-file fast path: a file whose TRUSTED stats prove
      // every row matches the condition (ScbfStats.mustMatchAll —
      // point-range partition cells under `source = 'x'`, fully-
      // contained ranges under a band, rows==0 litter) is deleted
      // outright, never read or rewritten. At 100 TB this turns a
      // partition takedown from a partition-sized read+write into
      // O(files) metadata deletes. Strictly evidence-gated: no stats
      // or no proof → the exact rewrite below, and only DELETE can
      // take it (an UPDATE must evaluate SET on every matching row).
      // Failure contract unchanged in kind: removals are per-file and
      // re-runnable (a crash mid-removal leaves the remaining victims
      // still provably-matching for the re-run).
      val rewriteSet0 =
        if (op == "DELETE")
          affected.filterNot(f =>
            filters.isEmpty || pruner.provablyAllMatch(f.getPath, f.getLen))
        else affected
      // empty-table contract: if the fast path would remove EVERY live
      // file of this directory and publish nothing, the directory
      // would stop being a readable SCBF table (schema lives in file
      // headers). Pull the smallest victim back through the exact
      // rewrite so a (possibly 0-row) replacement file survives.
      val rewriteSet =
        if (rewriteSet0.isEmpty && affected.nonEmpty &&
            affected.size == listed.size)
          Seq(affected.minBy(_.getLen))
        else rewriteSet0
      // CDC capture, BEFORE the replacement commits (a crash before
      // the commit aborts cleanly; the stray un-announced tag dir is
      // inert and vacuumable): materialize the round's change rows
      // from the originals, and list the whole-dropped victims (their
      // delete rows serve straight from the retained bytes). The ONE
      // source scan is shared: persisted across the change-row jobs
      // and the replacement rewrite, so CDC adds ~one pass over the
      // round's scope, not two or three.
      val affectedNames = affected.map(_.getPath.getName).toSet
      val removalName = s"${prefix.stripSuffix("-")}${ScbfDiscovery.RemovalSuffix}"
      def selfName(n: String): Boolean =
        n == removalName || ourPrefixes.exists(p =>
          n.startsWith(p) || n.startsWith(p.stripSuffix("-")))
      // OCC pre-commit check: abort BEFORE any side effect if another
      // commit already rewrote/removed one of this round's victims
      snapTs.foreach(st => refuseConflict(
        ScbfOcc.conflicts(postSnapEntries(st), affectedNames, selfName),
        "detected before publish"))
      prePublishHook()
      val tag = if (cdcOn) Some(ScbfCdc.newTag(op.toLowerCase(java.util.Locale.ROOT))) else None
      val srcOpt =
        if (rewriteSet.isEmpty) None
        else {
          val s = spark.read.format("scbf")
            .load(rewriteSet.map(_.getPath.toString): _*)
          Some(if (tag.isDefined) s.persist() else s)
        }
      // ONE try/finally spans the CDC change-row jobs AND the
      // replacement write: a throw anywhere after the persist (the
      // materialization included) must unpersist the cached source
      // scan, not leak it for the session
      try {
      tag.foreach { t =>
        srcOpt.foreach { src0 =>
          cdcRowSets(src0).foreach { case (ct, df) =>
            df.write.format("scbf").mode("append")
              .save(ScbfCdc.rowsDir(qcdc, t, ct).toString)
          }
        }
        val rewriteNames = rewriteSet.map(_.getPath.getName).toSet
        val whole = affected.filterNot(f => rewriteNames(f.getPath.getName))
        if (whole.nonEmpty) // DELETE-only by construction (fast path)
          ScbfCdc.recordWhole(dfs, qcdc, t,
            whole.map(f => ScbfCdc.relName(dfs, qcdc, f.getPath)))
      }
      if (srcOpt.isDefined) {
        val src = srcOpt.get
        // the connector's own append path: task-commit publish, sidecars,
        // manifest merge — a failure here aborts with originals untouched
        // announce the replacements as rewrites of ALL affected names
        // (dropped-whole files included — their disappearance is covered
        // by the same entries), tagged row-changing (C:1): by default a
        // caught-up log-path stream skips them with a logged warning
        // (their rows are a subset of what it already delivered — an
        // append-only stream cannot retract deletions anyway), but the
        // reader's onChangeCommit option can deliver them (surviving
        // rows re-deliver, changed values reach the stream) or fail the
        // stream loudly (Delta's default for change commits). A fresh
        // consumer delivers them normally under any policy. On a
        // partitioned table, tableRewrite re-announces each round to the
        // ROOT log with subdir-qualified names, so root streams get the
        // same policies; a direct per-partition call without that
        // re-announcement leaves bare names a root stream can't match —
        // skip then degrades to delivery, never loss.
        val w = rewrite(src, cond).write.format("scbf").mode("append")
          .option("filePrefix", prefix)
          .option("rewriteOfNames", affected.map(_.getPath.getName).mkString(","))
        tag.foreach(t => w.option("cdcTag", t).option("cdcRoot", qcdc.toString))
        w.save(dir)
      } else if (ScbfDiscovery.exists(new Path(dir), conf)) {
        // METADATA-ONLY round: every victim was dropped whole and no
        // replacement publishes, so nothing would announce the change
        // — yet rows this table's streams may have delivered are about
        // to disappear. Append a REMOVAL entry (synthetic name, len −1,
        // R:victims, C:1): log-path consumers get the identical
        // onChangeCommit semantics a replacement entry carries (skip
        // logs a warning, fail stops the stream, deliver has nothing
        // to deliver) while the takedown itself stays zero-data-IO.
        // Gated on the log existing — a log-less table has no log-path
        // consumers, and CREATING a log here would flip its streams
        // from listing mode to a log that omits every other file.
        // Same announce-then-remove order and best-effort contract as
        // the write path (a swallowed announce failure can mute the
        // policy, never break delivery correctness).
        ScbfDiscovery.append(new Path(dir), conf, Seq(ScbfDiscovery.Entry(
          s"${prefix.stripSuffix("-")}${ScbfDiscovery.RemovalSuffix}",
          ScbfDiscovery.RemovedLen, System.currentTimeMillis(),
          rewriteOf = affected.map(_.getPath.getName).sorted,
          rowsChanged = true,
          // tag only the log AT the CDC root (a partition's own log
          // would resolve it against a nonexistent local area; the
          // table-level root re-announcement carries it there)
          cdcTag = if (qcdc == qdir) tag else None)))
      }
      } finally if (tag.isDefined) srcOpt.foreach(_.unpersist())
      postPublishHook()
      // OCC post-publish recheck, BEFORE the originals are removed:
      // the publish happened-before this replay, so of two overlapping
      // racers at least one sees the other here. A foreign commit that
      // names this round's PUBLISHED replacements in its own rewriteOf
      // is NOT a conflict — it listed after our publish and serialized
      // behind us (its rewrite consumed our output). One that rewrote
      // our VICTIMS without seeing our replacements raced us blind:
      // the loser rolls its replacement back through the
      // aborted-rewrite scrub path (files + sidecars + log entries +
      // CDC area) and refuses — the originals stay with the winner's
      // commit, so the table renders exactly the winner's state; a
      // stream that raced the scrubbed entries fails loudly on the
      // vanished file (the documented abort contract), never silently
      // serves the loser's rows.
      // ONE bounded replay serves both the conflict test and this
      // round's own published names (the write announced them, so they
      // are post-snapshot entries matching our prefix) — no table
      // listing here, exactly the cost the OCC block comment promises.
      // An UNVERIFIABLE replay rolls back too (fail closed): published
      // files it cannot identify from the log are re-derived from the
      // round's prefix by one directory listing, the degraded path.
      val postOrFail = snapTs match {
        case None => Right(Seq.empty[(ScbfDiscovery.Entry, String)]) // no chain at snapshot: no OCC
        case Some(st) =>
          try Right(postSnapEntries(st))
          catch { case e: graft.scbf.ScbfFormatException => Left(e) }
      }
      val publishedNames = postOrFail match {
        case Right(post) => post.map(_._1.name).filter(_.startsWith(prefix)).toSet
        case Left(_) => ScbfDataSource.resolveFiles(Seq(dir), conf)
          .map(_.getPath.getName).filter(_.startsWith(prefix)).toSet
      }
      val lateConflicts = postOrFail match {
        case Right(post) => ScbfOcc.conflicts(post, affectedNames, selfName,
          ourOutputs = publishedNames,
          // single-loser arbitration: our commit's ordinal, read off
          // the same replay (the delta that announced our outputs —
          // or, on a metadata-only round, our removal sentinel)
          ourOrd = ScbfOcc.ourOrdinal(post, publishedNames + removalName))
        case Left(e) => Seq(s"UNVERIFIABLE (${e.getMessage})")
      }
      if (lateConflicts.nonEmpty) {
        // outputs a later commit already consumed are load-bearing
        // lineage and stay (see rollbackPublished's consumed contract).
        // An UNVERIFIABLE recheck treats EVERYTHING as consumed:
        // nothing destructive happens on a replay we could not read
        // (scrubbing a consumed entry would un-deaden its victims into
        // row duplication), the refusal stays loud, and the fork
        // machinery completes the rollback once the state is stale.
        val consumed = postOrFail match {
          case Right(post) =>
            ScbfOcc.consumedOf(post, selfName, publishedNames)
          case Left(_) => publishedNames
        }
        val scrubbed = ScbfOcc.rollbackPublished(dfs, qdir, conf,
          publishedNames, alsoScrub = Set(removalName),
          cdcTagDir = tag.map(t => new Path(ScbfCdc.dir(qcdc), t)),
          consumed = consumed)
        throw new graft.scbf.ScbfFormatException(
          ScbfOcc.refusalMessage(s"$op on $dir", lateConflicts,
            "detected after publish; replacement rolled back") +
            ScbfOcc.scrubCaveat(scrubbed))
      }
      removeOriginals(dir, conf, affected, retainAt = tag.map((qcdc, _)))
      val round_ = RewriteRound(prefix, affected.map(_.getPath.getName), tag)
      rounds += round_
      onRound(round_)
    }
    rounds.result() // unreachable; the while(true) exits via return
  }

  /** Post-commit removal of replaced originals (+ their sidecars) and
   * manifest compaction — shared by delete and update. Runs only AFTER
   * the replacement append committed; a crash before this point aborts
   * with originals untouched. */
  private def removeOriginals(
      dir: String,
      conf: org.apache.hadoop.conf.Configuration,
      affected: Seq[org.apache.hadoop.fs.FileStatus],
      // CDC retention (ScbfCdc): (table root, tag) — originals RENAME
      // into the tag's pre/ area instead of being deleted
      retainAt: Option[(Path, String)] = None): Unit = {
    val fs = new Path(dir).getFileSystem(conf)
    retainAt match {
      case Some((qroot, tag)) =>
        ScbfCdc.retain(fs, qroot, tag, affected.map(_.getPath))
      case None =>
        // parallel on the shared driver IO pool: a whole-partition takedown
        // can remove 10⁵ files, and on an object store the delete latencies
        // must overlap, not serialize (same schedule as RESTORE's removal)
        affected.map(f => ScbfStats.ioPool.submit(
          new java.util.concurrent.Callable[Unit] {
            override def call(): Unit = ScbfOcc.deleteWithSidecars(fs, f.getPath)
          })).foreach(_.get())
    }
    // manifest entries for the removed names are dead weight (planning
    // keys lookups by the LIVE listing, so they can never be trusted
    // for a live file) — drop exactly those names in one merge cycle,
    // so the manifest doesn't grow monotonically under repeated
    // deletes/updates and a concurrent append's just-merged entries
    // survive (a retain-the-live-listing prune would race its commit)
    ScbfStats.mergeManifest(new Path(dir), conf, Seq.empty, fresh = false,
      drop = affected.map(_.getPath.getName).toSet)
  }
}
