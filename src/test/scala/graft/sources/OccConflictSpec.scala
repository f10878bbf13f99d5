package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{Filter, GreaterThanOrEqual, LessThan}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * Write-write CONFLICT DETECTION (OCC — Delta's ConcurrentDeleteRead
 * contract): two concurrent mutations whose victim sets overlap must
 * not both publish. Each rewrite round snapshots the log's newest
 * commit instant, then verifies nothing committed since named one of
 * its victims — once before any side effect, once after publishing
 * (before originals are removed; the loser rolls its replacement back
 * and refuses). Non-overlapping mutations still both commit.
 */
class OccConflictSpec extends AnyFunSuite with SparkTestBase {

  private def hconf = new Configuration()

  /** Two files: ids 0..999 and 1000..1999 (stats-disjoint). */
  private def writeTwoFiles(dir: String): Unit = {
    append(dir, 0, 1000)
    append(dir, 1000, 2000)
  }

  private def append(dir: String, from: Int, until: Int): Unit =
    spark.range(from, until)
      .select(col("id").cast("int").as("id"),
        concat(lit("src_"), (col("id") % 4).cast("int")).as("source"))
      .coalesce(1)
      .write.format("scbf").mode("append").save(dir)

  private def ids(dir: String): Set[Int] =
    spark.read.format("scbf").load(dir)
      .select("id").collect().map(_.getInt(0)).toSet

  test("overlapping UPDATE loses to a mid-flight DELETE: refuses loudly, then re-runs clean") {
    val dir = tmpDir("scbf-occ-updel")
    writeTwoFiles(dir)
    var fired = false
    ScbfDelete.raceHook = () => if (!fired) {
      fired = true
      // a concurrent DELETE commits between the UPDATE's listing and
      // its publish, rewriting the UPDATE's victim file
      ScbfDelete.deleteWhere(spark, dir, hconf, Array[Filter](LessThan("id", 200)))
    }
    val e = intercept[graft.scbf.ScbfFormatException] {
      try ScbfDelete.updateWhere(spark, dir, hconf,
        Array[Filter](LessThan("id", 500)),
        Map("source" -> lit("redacted")))
      finally ScbfDelete.raceHook = () => ()
    }
    assert(e.getMessage.contains("concurrent mutation conflict") &&
      e.getMessage.contains("re-run"), e.getMessage)
    // winner's state, exactly: the DELETE applied, the UPDATE did not
    assert(ids(dir) == (200 until 2000).toSet)
    assert(spark.read.format("scbf").load(dir)
      .filter(col("source") === "redacted").count() == 0L)
    // the refusal's cure works: a clean re-run commits
    ScbfDelete.updateWhere(spark, dir, hconf,
      Array[Filter](LessThan("id", 500)), Map("source" -> lit("redacted")))
    assert(spark.read.format("scbf").load(dir)
      .filter(col("source") === "redacted").count() == 300L) // 200..499
  }

  test("overlapping DELETE vs DELETE: the in-flight one refuses, the committed one stands") {
    val dir = tmpDir("scbf-occ-deldel")
    writeTwoFiles(dir)
    var fired = false
    ScbfDelete.raceHook = () => if (!fired) {
      fired = true
      ScbfDelete.deleteWhere(spark, dir, hconf,
        Array[Filter](GreaterThanOrEqual("id", 1800)))
    }
    val e = intercept[graft.scbf.ScbfFormatException] {
      try ScbfDelete.deleteWhere(spark, dir, hconf,
        Array[Filter](GreaterThanOrEqual("id", 1500)))
      finally ScbfDelete.raceHook = () => ()
    }
    assert(e.getMessage.contains("concurrent mutation conflict"), e.getMessage)
    assert(ids(dir) == (0 until 1800).toSet)
  }

  test("non-overlapping concurrent mutations both commit") {
    val dir = tmpDir("scbf-occ-disjoint")
    writeTwoFiles(dir)
    var fired = false
    ScbfDelete.raceHook = () => if (!fired) {
      fired = true
      // concurrent DELETE scoped (by stats) to the OTHER file only
      ScbfDelete.deleteWhere(spark, dir, hconf,
        Array[Filter](GreaterThanOrEqual("id", 1500)))
    }
    try ScbfDelete.deleteWhere(spark, dir, hconf,
      Array[Filter](LessThan("id", 500)))
    finally ScbfDelete.raceHook = () => ()
    assert(ids(dir) == (500 until 1500).toSet,
      "disjoint victim sets must not conflict")
  }

  test("OPTIMIZE refuses when a DELETE commits between its snapshot and its rewrite") {
    val dir = tmpDir("scbf-occ-opt")
    writeTwoFiles(dir)
    var fired = false
    ScbfMaintenance.raceHook = () => if (!fired) {
      fired = true
      // the delete's victims overlap the compaction's snapshot — a
      // compaction that proceeded would RESURRECT the deleted rows
      ScbfDelete.deleteWhere(spark, dir, hconf, Array[Filter](LessThan("id", 200)))
    }
    val e = intercept[graft.scbf.ScbfFormatException] {
      try ScbfMaintenance.compact(spark, dir, 1)
      finally ScbfMaintenance.raceHook = () => ()
    }
    assert(e.getMessage.contains("concurrent mutation conflict"), e.getMessage)
    // the delete won; nothing was resurrected and nothing compacted
    assert(ids(dir) == (200 until 2000).toSet)
    // the cure works: a clean re-run compacts to one file
    ScbfMaintenance.compact(spark, dir, 1)
    assert(ids(dir) == (200 until 2000).toSet)
    assert(ScbfDataSource.resolveFiles(Seq(dir), hconf).size == 1)
  }

  test("SQL COW UPDATE refuses when a racer's commit names its victims: then re-runs clean") {
    // the racer is simulated as its LOG COMMIT only (a physical racer
    // would also fold in this operation's task-committed staged files
    // — the listing-table visibility trade the ScbfDelete scaladoc
    // documents — making end-state assertions racy; the OCC signal is
    // the log entry either way)
    val dir = tmpDir("scbf-occ-sql")
    spark.sql("DROP TABLE IF EXISTS occ_sql")
    spark.sql(s"CREATE TABLE occ_sql (id INT, source STRING) USING scbf LOCATION '$dir'")
    writeTwoFiles(dir)
    val qdir = {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(hconf).makeQualified(p)
    }
    val originals = ScbfDataSource.resolveFiles(Seq(dir), hconf)
      .map(_.getPath.getName).toSet
    var fired = false
    ScbfRowLevelBatchWrite.occHook = phase => if (phase == "pre" && !fired) {
      fired = true
      ScbfDiscovery.append(qdir, hconf, Seq(ScbfDiscovery.Entry(
        "racer-pre.scbf", 99L, System.currentTimeMillis(),
        rewriteOf = Seq(originals.head), rowsChanged = true)))
    }
    val e = intercept[Exception] {
      try spark.sql("""UPDATE occ_sql SET source = 'redacted'
        WHERE id IN (SELECT id FROM occ_sql WHERE id < 500)""")
      finally ScbfRowLevelBatchWrite.occHook = _ => ()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("concurrent mutation conflict") &&
      msgs.contains("re-run"), msgs)
    // clean abort: originals untouched, no redacted row serves
    assert(ids(dir) == (0 until 2000).toSet)
    assert(spark.sql("SELECT COUNT(*) FROM occ_sql WHERE source = 'redacted'")
      .head().getLong(0) == 0L)
    // the cure works (the racer's entry predates the re-run's snapshot)
    spark.sql("""UPDATE occ_sql SET source = 'redacted'
      WHERE id IN (SELECT id FROM occ_sql WHERE id < 500)""")
    assert(spark.sql("SELECT COUNT(*) FROM occ_sql WHERE source = 'redacted'")
      .head().getLong(0) == 500L)
  }

  test("SQL COW blind racer after publish: replacement rolled back, originals intact") {
    val dir = tmpDir("scbf-occ-sql-late")
    spark.sql("DROP TABLE IF EXISTS occ_sql_late")
    spark.sql(s"CREATE TABLE occ_sql_late (id INT, source STRING) USING scbf LOCATION '$dir'")
    writeTwoFiles(dir)
    val qdir = {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(hconf).makeQualified(p)
    }
    val before = ids(dir)
    // the victim must be one of the ORIGINAL files (at hook time the
    // just-published replacements are listed too)
    val originals = ScbfDataSource.resolveFiles(Seq(dir), hconf)
      .map(_.getPath.getName).toSet
    var fired = false
    ScbfRowLevelBatchWrite.occHook = phase => if (phase == "post" && !fired) {
      fired = true
      ScbfDiscovery.append(qdir, hconf, Seq(ScbfDiscovery.Entry(
        "foreign-racer.scbf", 123L, System.currentTimeMillis(),
        rewriteOf = Seq(originals.head), rowsChanged = true)))
    }
    val e = intercept[Exception] {
      try spark.sql("""UPDATE occ_sql_late SET source = 'redacted'
        WHERE id IN (SELECT id FROM occ_sql_late WHERE id < 2000)""")
      finally ScbfRowLevelBatchWrite.occHook = _ => ()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("rolled back"), msgs)
    assert(ids(dir) == before, "originals must be untouched after rollback")
    assert(spark.sql("SELECT COUNT(*) FROM occ_sql_late WHERE source = 'redacted'")
      .head().getLong(0) == 0L, "rolled-back replacement rows must not serve")
  }

  test("a blind racer landing after publish triggers rollback: replacement scrubbed, originals intact") {
    val dir = tmpDir("scbf-occ-late")
    writeTwoFiles(dir)
    val qdir = {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(hconf).makeQualified(p)
    }
    var fired = false
    ScbfDelete.postPublishHook = () => if (!fired) {
      fired = true
      // simulate a racer that listed BEFORE our publish (its rewriteOf
      // names our victim but not our replacement) committing its log
      // entry in the post-publish window
      val victim = ScbfDataSource.resolveFiles(Seq(dir), hconf)
        .map(_.getPath.getName).find(!_.startsWith("rw-")).get
      ScbfDiscovery.append(qdir, hconf, Seq(ScbfDiscovery.Entry(
        "foreign-racer.scbf", 123L, System.currentTimeMillis(),
        rewriteOf = Seq(victim), rowsChanged = true)))
    }
    val e = intercept[graft.scbf.ScbfFormatException] {
      try ScbfDelete.deleteWhere(spark, dir, hconf,
        Array[Filter](LessThan("id", 1500)))
      finally ScbfDelete.postPublishHook = () => ()
    }
    assert(e.getMessage.contains("rolled back"), e.getMessage)
    // originals never removed; the published replacement was scrubbed
    // from disk AND from the log — the table renders its pre-op state
    assert(ids(dir) == (0 until 2000).toSet)
    val leftover = ScbfDataSource.resolveFiles(Seq(dir), hconf)
      .map(_.getPath.getName).filter(_.startsWith("rw-"))
    assert(leftover.isEmpty, s"rolled-back replacements must not survive: $leftover")
    val logged = ScbfDiscovery.listDeltas(qdir, hconf)
      .flatMap(n => ScbfDiscovery.readDelta(qdir, hconf, n))
      .map(_.name).filter(_.startsWith("rw-"))
    assert(logged.isEmpty, s"rolled-back entries must leave the log: $logged")
    // the scrub preserves the chain's ORDINAL SPAN (it rewrites through
    // the fold machinery): 2 waves + the racer's commit + the aborted
    // publish's slot = 4 versions — ordinals are append-only slots that
    // never shift, so VERSION AS OF / _commit_version axes survive an
    // OCC rollback intact (the aborted slot renders the racer's state)
    val chain = ScbfDiscovery.versionedChain(qdir, hconf)
    assert(chain.nonEmpty && chain.last._3 + 1 == 4,
      s"ordinal span must survive the scrub: $chain")
    // and the folded entries carry their recorded ordinals (V: tags)
    val stamped = ScbfDiscovery.listDeltas(qdir, hconf)
      .flatMap(n => ScbfDiscovery.readDelta(qdir, hconf, n))
      .filter(e => !e.name.startsWith("foreign-"))
      .flatMap(_.commitVersion)
    assert(stamped.toSet == Set(0, 1), s"folded ordinals: $stamped")
  }
}
