package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Shared write-write CONFLICT DETECTION (OCC — Delta's
 * ConcurrentDeleteRead contract) for every COW mutation surface: the
 * API rewrite engine ([[ScbfDelete]]), the SQL row-level path
 * ([[ScbfRowLevelBatchWrite]]), and the maintenance rewrites
 * (OPTIMIZE/cluster/zorder — [[ScbfMaintenance]] plans the snapshot,
 * [[ScbfBatchWrite]] checks it at the overwrite's commit instant).
 * One copy of the snapshot point, the replay, the conflict rule, the
 * refusal text and the rollback file-cleanup so the surfaces can
 * never silently diverge.
 *
 * The rule: a commit stamped after the mutation's snapshot that names
 * one of its VICTIMS in `rewriteOf` raced it. A commit that names the
 * mutation's PUBLISHED OUTPUTS — and none of its victims — listed
 * after the publish and serialized BEHIND it (it consumed the
 * replacement): not a race. A commit naming BOTH (it listed during the
 * publish-to-removal coexistence window and planned the original AND
 * its replacement as independent victims) IS a conflict — letting it
 * pass would persist every coexisting row twice.
 *
 * Residual, stated honestly: the coexistence window itself (announce →
 * originals removed) is visible to LISTING-based planners, so a racer
 * that fully commits inside it can bake original+replacement
 * duplicates into its own output before the loser's rollback lands;
 * the loser still refuses loudly (operator signal), and the structural
 * fix — rewrite-transparent mutation listings, costed like the
 * stream's reconcile — is future work.
 */
private[sources] object ScbfOcc {

  /** The OCC snapshot point: the newest persisted commit instant,
   * taken BEFORE the file listing a mutation plans from. None = no
   * usable chain (the table has no deltas, or the listing failed) —
   * callers SKIP the conflict checks for that attempt: a log-less
   * table has nothing announced to conflict with, and a transient
   * listing failure must not manufacture a Long.MinValue snapshot
   * whose full-history replay would flag the table's own durable
   * overwrite-boundary entry as a phantom concurrent commit. (The
   * REPLAY itself stays fail-closed — this fail-open is only "no OCC
   * this round", the pre-round-14 behavior.) */
  def snapshot(qroot: Path, conf: Configuration): Option[Long] = {
    val ds = ScbfDiscovery.listDeltas(qroot, conf)
    if (ds.isEmpty) None
    else ds.flatMap(ScbfDiscovery.deltaMillis).maxOption
  }

  /** Entries committed after `snapTs` on `qroot`'s log — the commits
   * that raced the mutation. Empty when the table has no log (log-less
   * directories announce nothing to conflict on). Replay failures
   * (torn deltas, concurrent-compaction churn exhausting retries,
   * a reset emptying the chain mid-check) REFUSE via `refuse` —
   * unverifiable is not safe. */
  def entriesAfter(qroot: Path, conf: Configuration, snapTs: Long,
      refuse: String => Nothing): Seq[ScbfDiscovery.Entry] =
    if (!ScbfDiscovery.exists(qroot, conf)) Seq.empty
    else ScbfDiscovery.replayEntriesAfter(qroot, conf, snapTs, refuse)
      .values.toSeq

  /** The conflicts among `post` (see object scaladoc for the rule),
   * rendered as operator-readable descriptions. */
  def conflicts(post: Seq[ScbfDiscovery.Entry], victims: Set[String],
      selfName: String => Boolean,
      ourOutputs: Set[String] = Set.empty): Seq[String] =
    post.filterNot(e => selfName(e.name) ||
      // serialized-behind-us exclusion — ONLY when it does not also
      // name a victim (naming both = it double-planned the
      // coexistence window; must conflict)
      (e.rewriteOf.exists(ourOutputs) && !e.rewriteOf.exists(victims)))
      .collect {
        case e if e.name.startsWith(ScbfDiscovery.OverwriteBoundaryPrefix) =>
          s"INSERT OVERWRITE at ${e.ts}"
        case e if e.rewriteOf.exists(victims) =>
          s"${e.name} (rewrites ${e.rewriteOf.filter(victims).take(3).mkString(", ")})"
      }

  /** One spelling of the refusal for every surface. */
  def refusalMessage(where: String, found: Seq[String], phase: String): String =
    s"$where: concurrent mutation conflict ($phase) — files this " +
      s"operation planned to rewrite were concurrently rewritten or " +
      s"removed by another commit: ${found.take(3).mkString("; ")}" +
      s"${if (found.size > 3) "; …" else ""}. The table is consistent " +
      "(this operation did not remove originals); re-run it."

  /** One file's data + stats + bloom removal — the rollback/takedown
   * triple, one copy to keep in sync when a new sidecar kind appears. */
  def deleteWithSidecars(fs: FileSystem, p: Path): Unit = {
    fs.delete(p, false)
    val sc = ScbfStats.sidecarPath(p)
    if (fs.exists(sc)) fs.delete(sc, false)
    val bl = ScbfBloom.bloomPath(p)
    if (fs.exists(bl)) fs.delete(bl, false)
  }

  /**
   * Roll a PUBLISHED replacement back: scrub the log entries FIRST
   * (a partial rollback must leave inert orphan files, never live log
   * entries naming deleted bytes — the poisoned-log order), then
   * delete the files + sidecars, then the CDC rows area. Returns
   * whether the log scrub took; the caller folds that into its
   * refusal text instead of claiming consistency unconditionally.
   */
  def rollbackPublished(fs: FileSystem, qroot: Path, conf: Configuration,
      publishedNames: Set[String], alsoScrub: Set[String],
      cdcTagDir: Option[Path]): Boolean = {
    val scrubbed = ScbfDiscovery.scrubEntries(qroot, conf,
      publishedNames ++ alsoScrub)
    publishedNames.foreach(n => deleteWithSidecars(fs, new Path(qroot, n)))
    publishedNames.map(n => new Path(qroot, n)).groupBy(_.getParent)
      .foreach { case (parent, ps) =>
        ScbfStats.mergeManifest(parent, conf, Seq.empty, fresh = false,
          drop = ps.map(_.getName))
      }
    cdcTagDir.foreach(t =>
      try fs.delete(t, true)
      catch { case scala.util.control.NonFatal(_) => () })
    scrubbed
  }

  /** The honesty suffix for a rollback whose log scrub failed. */
  def scrubCaveat(scrubbed: Boolean): String =
    if (scrubbed) ""
    else " CAUTION: the rolled-back replacement's log entries could " +
      "not be scrubbed (transient filesystem error) — log-trusting " +
      "reads (CDC, time travel) over this window may refuse with " +
      "'physically removed' until the log is repaired; the table's " +
      "LIVE contents are correct."
}
