package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * Read-only time travel (`asOfTimestamp` batch read option): the
 * discovery log already records per-commit appends, removals and C:1
 * rewrites, so "files live at time T" is a pure log replay —
 * `live(T) = published(≤T) − replaced(≤T)` (names are never reused,
 * so no ordering is needed, and compaction preserves entries with
 * their original timestamps).
 *
 * The honesty contract (all refusals loud, each naming its cure):
 * no log / pre-log timestamps refuse; an unannounced data file
 * (producer bypassed the connector) refuses; a live-at-T file that a
 * later rewrite physically removed refuses — SCBF retains no
 * tombstoned bytes (frozen reference format, no retention layer), so
 * AS OF is exact precisely for history whose files still live: the
 * append-only ingest chain, which at 100 TB is almost all of it.
 */
class TimeTravelSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def hconf = spark.sessionState.newHadoopConf()

  private def writeWave(dir: String, from: Int, until: Int): Unit =
    (from until until).map(i => (i, i * 0.5)).toDF("id", "v")
      .coalesce(1).write.format("scbf").mode("append").save(dir)

  private def asOf(dir: String, ts: Long) =
    spark.read.format("scbf").option("asOfTimestamp", ts).load(dir)

  private def tick(): Long = { Thread.sleep(5); System.currentTimeMillis() }

  test("append-only history replays bit-exact at every captured timestamp") {
    val dir = tmpDir("scbf-asof-append")
    writeWave(dir, 0, 100)
    val t1 = tick()
    writeWave(dir, 100, 250)
    val t2 = tick()
    writeWave(dir, 250, 400)
    val t3 = tick()
    def sums(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), sum($"id"), sum($"v")).head()
    assert(sums(asOf(dir, t1)) ==
      org.apache.spark.sql.Row(100L, (0 until 100).map(_.toLong).sum,
        (0 until 100).map(_ * 0.5).sum))
    assert(sums(asOf(dir, t2)) ==
      org.apache.spark.sql.Row(250L, (0 until 250).map(_.toLong).sum,
        (0 until 250).map(_ * 0.5).sum))
    assert(sums(asOf(dir, t3)) == sums(spark.read.format("scbf").load(dir)))
    // column pruning + filters still work on the historical scan
    assert(asOf(dir, t2).filter($"id" < 50).select($"id").count() == 50L)
  }

  test("RESTORE TABLE rolls an append-only table back exactly, zero-read and idempotent") {
    val dir = tmpDir("scbf-restore")
    spark.sql("DROP TABLE IF EXISTS tt_restore")
    new org.apache.hadoop.fs.Path(dir).getFileSystem(hconf)
      .delete(new org.apache.hadoop.fs.Path(dir), true)
    try {
      spark.sql(s"CREATE TABLE tt_restore (id INT, v DOUBLE) USING scbf LOCATION '$dir'")
      spark.sql("INSERT INTO tt_restore SELECT CAST(id AS INT), id * 0.5 FROM range(0, 100)")
      val t1 = tick()
      spark.sql("INSERT INTO tt_restore SELECT CAST(id AS INT), id * 0.5 FROM range(100, 300)")
      spark.sql("INSERT INTO tt_restore SELECT CAST(id AS INT), id * 0.5 FROM range(300, 350)")
      assert(spark.table("tt_restore").count() == 350L)
      graft.sources.ScbfUtil.dataFileOpens.set(0)
      val r = spark.sql(s"RESTORE TABLE tt_restore TO TIMESTAMP AS OF $t1").head()
      assert(graft.sources.ScbfUtil.dataFileOpens.get == 0,
        "RESTORE must be zero-read: file deletes + manifest drops only")
      // waves publish one file per write task; exact counts are a
      // parallelism detail — the invariant is: something was removed,
      // something was kept, and the data below is exactly wave 1
      assert(r.getInt(0) > 0 && r.getInt(1) > 0, s"removed/kept: $r")
      // the LIVE table is the wave-1 rendering, exactly
      val s1 = spark.table("tt_restore").agg(count(lit(1)), sum($"id")).head()
      assert(s1 == org.apache.spark.sql.Row(100L, (0 until 100).map(_.toLong).sum))
      // idempotent: a second restore removes nothing
      assert(spark.sql(s"RESTORE TABLE tt_restore TO TIMESTAMP AS OF $t1")
        .head().getInt(0) == 0)
      // the restore is itself history: DESCRIBE HISTORY shows the removal
      val acts = spark.sql("DESCRIBE HISTORY tt_restore")
        .select("action").as[String].collect().toSeq
      assert(acts.contains("remove"), acts.toString)
      // appends continue normally on the restored table
      spark.sql("INSERT INTO tt_restore VALUES (1000, 9.0)")
      assert(spark.table("tt_restore").count() == 101L)
    } finally spark.sql("DROP TABLE IF EXISTS tt_restore")
  }

  test("RESTORE's timestamp literal resolves in the SESSION timezone, like TIMESTAMP AS OF") {
    val dir = tmpDir("scbf-restore-tz")
    spark.sql("DROP TABLE IF EXISTS tt_tz")
    new Path(dir).getFileSystem(hconf).delete(new Path(dir), true)
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      // a session zone far from the JVM default: if RESTORE parsed the
      // literal with java.sql.Timestamp.valueOf (JVM zone) the instant
      // would be hours off and the restore would delete relative to
      // the wrong point in time
      spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
      spark.sql(s"CREATE TABLE tt_tz (id INT) USING scbf LOCATION '$dir'")
      spark.sql("INSERT INTO tt_tz SELECT CAST(id AS INT) FROM range(0, 50)")
      Thread.sleep(1100) // second-resolution literal needs a real gap
      val cutMs = System.currentTimeMillis()
      Thread.sleep(1100)
      spark.sql("INSERT INTO tt_tz SELECT CAST(id AS INT) FROM range(50, 200)")
      // the cut instant rendered as a LOCAL datetime in the session zone
      val lit = java.time.Instant.ofEpochMilli(cutMs)
        .atZone(java.time.ZoneId.of("Asia/Kolkata")).toLocalDateTime
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      val r = spark.sql(s"RESTORE TABLE tt_tz TO TIMESTAMP AS OF '$lit'").head()
      assert(r.getInt(0) > 0, s"nothing removed for literal '$lit': $r")
      assert(spark.table("tt_tz").count() == 50L)
    } finally {
      spark.conf.set("spark.sql.session.timeZone", prevTz)
      spark.sql("DROP TABLE IF EXISTS tt_tz")
    }
  }

  test("a crashed RESTORE (removal logged, deletes unfinished) is resumable, not bricked") {
    val dir = tmpDir("scbf-restore-crash")
    writeWave(dir, 0, 100)
    val t1 = tick()
    writeWave(dir, 100, 300)
    val qroot = new Path(dir).getFileSystem(hconf)
      .makeQualified(new Path(dir))
    // simulate the crash window: RESTORE appends its removal entry to
    // the log FIRST, then dies before any physical delete — exactly
    // what its announce-then-remove commit order leaves behind
    val listing = ScbfDataSource.resolveFiles(Seq(dir), hconf)
    val keep = ScbfDiscovery.filesAsOf(qroot, hconf, t1, listing)
      .map(_.getPath.getName).toSet
    val victims = listing.map(_.getPath.getName).filterNot(keep).sorted
    assert(victims.nonEmpty)
    ScbfDiscovery.append(qroot, hconf, Seq(ScbfDiscovery.Entry(
      "restore-crashed" + ScbfDiscovery.RemovalSuffix,
      ScbfDiscovery.RemovedLen, System.currentTimeMillis(),
      rewriteOf = victims, rowsChanged = true)))
    // the half-finished state must NOT read as "producer bypassed the
    // connector": time travel before the cut still answers…
    assert(asOf(dir, t1).count() == 100L)
    // …and RE-RUNNING the restore completes the removal idempotently
    spark.sql("DROP TABLE IF EXISTS tt_crash")
    try {
      spark.sql(s"CREATE TABLE tt_crash (id INT, v DOUBLE) USING scbf LOCATION '$dir'")
      val r = spark.sql(s"RESTORE TABLE tt_crash TO TIMESTAMP AS OF $t1").head()
      assert(r.getInt(0) == victims.size, s"expected ${victims.size} removed: $r")
      assert(spark.table("tt_crash").count() == 100L)
      val names = ScbfDataSource.resolveFiles(Seq(dir), hconf)
        .map(_.getPath.getName).toSet
      assert(names == keep, s"on-disk set after resume: $names")
    } finally spark.sql("DROP TABLE IF EXISTS tt_crash")
  }

  test("RESTORE resolves graft-catalog tables through their own catalog") {
    val wh = tmpDir("graft-restore-wh")
    spark.conf.set("spark.sql.catalog.gres", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gres.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gres.db")
    spark.sql("DROP TABLE IF EXISTS gres.db.tt")
    spark.sql("CREATE TABLE gres.db.tt (id INT, v DOUBLE) USING scbf")
    spark.sql("INSERT INTO gres.db.tt SELECT CAST(id AS INT), CAST(id AS DOUBLE) FROM range(0, 100)")
    val t1 = tick()
    spark.sql("INSERT INTO gres.db.tt SELECT CAST(id AS INT), CAST(id AS DOUBLE) FROM range(100, 300)")
    assert(spark.sql("SELECT COUNT(*) FROM gres.db.tt").head().getLong(0) == 300L)
    val r = spark.sql(s"RESTORE TABLE gres.db.tt TO TIMESTAMP AS OF $t1").head()
    assert(r.getInt(0) > 0, r.toString)
    assert(spark.sql("SELECT COUNT(*) FROM gres.db.tt").head().getLong(0) == 100L)
    spark.sql("DROP TABLE IF EXISTS gres.db.tt")
  }

  test("RESTORE refusals: across a rewrite boundary, to-empty, pre-log; partitions vanish") {
    val dir = tmpDir("scbf-restore-g")
    spark.sql("DROP TABLE IF EXISTS tt_rg")
    new org.apache.hadoop.fs.Path(dir).getFileSystem(hconf)
      .delete(new org.apache.hadoop.fs.Path(dir), true)
    try {
      spark.sql("CREATE TABLE tt_rg (id INT, grp STRING) USING scbf " +
        s"PARTITIONED BY (grp) LOCATION '$dir'")
      val t0 = tick()
      spark.sql("INSERT INTO tt_rg SELECT CAST(id AS INT), 'a' FROM range(0, 50)")
      val t1 = tick()
      // wave 2 creates a NEW partition — the restore must remove the
      // whole directory, not leave an empty husk
      spark.sql("INSERT INTO tt_rg SELECT CAST(id AS INT), 'b' FROM range(50, 80)")
      // pre-log / to-empty refusals fire BEFORE anything changes
      val e0 = intercept[Exception] {
        spark.sql(s"RESTORE TABLE tt_rg TO TIMESTAMP AS OF ${t0 - 60000}") }
      assert(e0.getMessage.contains("history"), e0.getMessage)
      assert(spark.table("tt_rg").count() == 80L, "refusal must not mutate")
      spark.sql(s"RESTORE TABLE tt_rg TO TIMESTAMP AS OF $t1")
      assert(spark.table("tt_rg").count() == 50L)
      val subs = new java.io.File(dir).listFiles().filter(_.isDirectory)
        .map(_.getName).filterNot(_.startsWith(".")).sorted
      assert(subs.toSeq == Seq("grp=a"), s"emptied partition must vanish: ${subs.toSeq}")
      // a rewrite (DELETE) bounds restorability: pre-rewrite timestamps
      // refuse — the originals are physically gone
      val t2 = tick()
      spark.sql("DELETE FROM tt_rg WHERE id < 10")
      val e1 = intercept[Exception] {
        spark.sql(s"RESTORE TABLE tt_rg TO TIMESTAMP AS OF $t2") }
      assert(e1.getMessage.contains("physically removed"), e1.getMessage)
      // VERSION spelling: out-of-range ordinals refuse naming the valid
      // range; non-numeric refuses with guidance, not a bare parse error
      val e2 = intercept[Exception] {
        spark.sql("RESTORE TABLE tt_rg TO VERSION AS OF 999") }
      assert(e2.getMessage.contains("valid versions 0..") &&
        e2.getMessage.contains("TIMESTAMP AS OF"), e2.getMessage)
      val e3 = intercept[Exception] {
        spark.sql("RESTORE TABLE tt_rg TO VERSION AS OF latest") }
      assert(e3.getMessage.contains("integer version"), e3.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS tt_rg")
  }

  test("a checkpointed stream rides through RESTORE under the default skip policy") {
    val dir = tmpDir("scbf-restore-stream")
    spark.sql("DROP TABLE IF EXISTS tt_rs")
    new org.apache.hadoop.fs.Path(dir).getFileSystem(hconf)
      .delete(new org.apache.hadoop.fs.Path(dir), true)
    try {
      spark.sql(s"CREATE TABLE tt_rs (id INT) USING scbf LOCATION '$dir'")
      spark.sql("INSERT INTO tt_rs SELECT CAST(id AS INT) FROM range(0, 40)")
      val t1 = tick()
      spark.sql("INSERT INTO tt_rs SELECT CAST(id AS INT) FROM range(40, 70)")
      val seen = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
      val q = spark.readStream.format("scbf").schema("id INT").load(dir)
        .writeStream.foreachBatch {
          (df: org.apache.spark.sql.DataFrame, _: Long) =>
            val ids = df.select(col("id")).collect().map(_.getInt(0)).toSeq
            seen.synchronized { seen += ids }
            ()
        }.start()
      try {
        q.processAllAvailable()
        assert(seen.flatten.sorted == (0 until 70), s"baseline: $seen")
        // the restore announces a removal entry FIRST; an append-only
        // stream cannot retract deliveries, so the default policy skips
        // the change with a logged warning and the stream stays alive
        spark.sql(s"RESTORE TABLE tt_rs TO TIMESTAMP AS OF $t1")
        q.processAllAvailable()
        assert(seen.flatten.size == 70,
          s"RESTORE must not re-deliver or crash the stream: ${seen.flatten.size}")
        // post-restore appends still flow (log continuity)
        spark.sql("INSERT INTO tt_rs VALUES (1000)")
        q.processAllAvailable()
        assert(seen.flatten.sorted == ((0 until 70) :+ 1000), s"append: $seen")
      } finally q.stop()
      // and the LIVE batch view is the restored one
      assert(spark.table("tt_rs").count() == 41L)
    } finally spark.sql("DROP TABLE IF EXISTS tt_rs")
  }

  test("a rewrite bounds history: before it refuses loudly, after it is exact") {
    val dir = tmpDir("scbf-asof-rw")
    spark.sql("DROP TABLE IF EXISTS asof_rw")
    new Path(dir).getFileSystem(hconf).delete(new Path(dir), true)
    try {
      spark.sql(s"CREATE TABLE asof_rw (id INT, v DOUBLE) USING scbf LOCATION '$dir'")
      spark.sql("INSERT INTO asof_rw SELECT CAST(id AS INT), CAST(id AS DOUBLE) FROM range(0, 200)")
      val tPre = tick()
      assert(asOf(dir, tPre).count() == 200L)
      // a stats-scoped DELETE physically rewrites the affected file(s)
      spark.sql("DELETE FROM asof_rw WHERE id >= 50 AND id < 100")
      val tPost = tick()
      assert(asOf(dir, tPost).count() == 150L, "post-rewrite history is exact")
      // the pre-rewrite point needs the replaced originals — gone
      val e = intercept[Exception] { asOf(dir, tPre).count() }
      assert(e.getMessage.contains("physically removed"), e.getMessage)
      // OPTIMIZE moves the boundary again
      spark.sql("OPTIMIZE asof_rw FILES 1")
      val tOpt = tick()
      assert(asOf(dir, tOpt).count() == 150L)
      val e2 = intercept[Exception] { asOf(dir, tPost).count() }
      assert(e2.getMessage.contains("physically removed"), e2.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS asof_rw")
  }

  test("refusals: no log, pre-log history, unannounced files, streaming") {
    // a directory with data but NO discovery log (foreign producer)
    val bare = tmpDir("scbf-asof-bare")
    writeWave(bare, 0, 10)
    val fs = new Path(bare).getFileSystem(hconf)
    fs.delete(ScbfDiscovery.dir(new Path(bare)), true)
    val e1 = intercept[Exception] { asOf(bare, System.currentTimeMillis()).count() }
    assert(e1.getMessage.contains("no discovery log"), e1.getMessage)

    // pre-log timestamps refuse (a full overwrite RESETS the chain)
    val dir = tmpDir("scbf-asof-reset")
    writeWave(dir, 0, 50)
    val tOld = tick()
    (0 until 30).map(i => (i, 1.0)).toDF("id", "v")
      .coalesce(1).write.format("scbf").mode("overwrite").save(dir)
    val e2 = intercept[Exception] { asOf(dir, tOld).count() }
    assert(e2.getMessage.contains("history starts at"), e2.getMessage)
    assert(asOf(dir, tick()).count() == 30L, "post-overwrite history works")

    // an unannounced data file poisons the chain — refuse, don't guess
    val alien = tmpDir("scbf-asof-alien")
    writeWave(alien, 0, 20)
    val tGood = tick()
    val src = ScbfDataSource.resolveFiles(Seq(alien), hconf).head.getPath
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs,
      new Path(alien, "alien-copy.scbf"), false, hconf)
    val e3 = intercept[Exception] { asOf(alien, tGood).count() }
    assert(e3.getMessage.contains("never announced"), e3.getMessage)

    // streaming with asOfTimestamp is refused at read-start
    val ok = tmpDir("scbf-asof-stream")
    writeWave(ok, 0, 10)
    val e4 = intercept[Exception] {
      val q = spark.readStream.format("scbf").schema("id INT, v DOUBLE")
        .option("asOfTimestamp", System.currentTimeMillis())
        .load(ok).writeStream.format("memory").queryName("asof_stream_probe")
        .trigger(org.apache.spark.sql.streaming.Trigger.Once()).start()
      try q.awaitTermination(30000) finally q.stop()
    }
    val msgs = Iterator.iterate(e4: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("batch-only"), msgs)
  }

  test("SQL TIMESTAMP AS OF via the graft catalog; VERSION AS OF and mutations refuse") {
    val wh = tmpDir("graft-asof-wh")
    spark.conf.set("spark.sql.catalog.gasof", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gasof.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gasof.db")
    spark.sql("DROP TABLE IF EXISTS gasof.db.tt")
    spark.sql("CREATE TABLE gasof.db.tt (id INT, v DOUBLE) USING scbf")
    spark.sql("INSERT INTO gasof.db.tt SELECT CAST(id AS INT), CAST(id AS DOUBLE) FROM range(0, 100)")
    val t1 = tick()
    spark.sql("INSERT INTO gasof.db.tt SELECT CAST(id AS INT), CAST(id AS DOUBLE) FROM range(100, 300)")
    // the SQL spelling of the asOfTimestamp option: Spark resolves the
    // expression to MICROseconds and calls loadTable(ident, ts)
    assert(spark.sql(
      s"SELECT COUNT(*) FROM gasof.db.tt TIMESTAMP AS OF timestamp_millis(${t1}L)")
      .head().getLong(0) == 100L)
    assert(spark.sql("SELECT COUNT(*) FROM gasof.db.tt").head().getLong(0) == 300L)
    // filters/pruning flow through the travelled relation unchanged
    assert(spark.sql(s"SELECT COUNT(*) FROM gasof.db.tt " +
      s"TIMESTAMP AS OF timestamp_millis(${t1}L) WHERE id < 50").head().getLong(0) == 50L)
    // the refusal contract surfaces through SQL too (pre-log history)
    val ePre = intercept[Exception] {
      spark.sql("SELECT COUNT(*) FROM gasof.db.tt TIMESTAMP AS OF timestamp_millis(1000)")
        .collect()
    }
    assert(ePre.getMessage.contains("history starts at"), ePre.getMessage)
    // VERSION AS OF n indexes the commit chain (oldest = 0) and is
    // exactly TIMESTAMP AS OF that commit's max entry timestamp
    assert(spark.sql("SELECT COUNT(*) FROM gasof.db.tt VERSION AS OF 0")
      .head().getLong(0) == 100L)
    assert(spark.sql("SELECT COUNT(*) FROM gasof.db.tt VERSION AS OF 1")
      .head().getLong(0) == 300L)
    // out-of-range ordinals refuse naming the valid range + durable axis
    val eVer = intercept[Exception] {
      spark.sql("SELECT * FROM gasof.db.tt VERSION AS OF '3'").collect()
    }
    assert(eVer.getMessage.contains("valid versions 0..1") &&
      eVer.getMessage.contains("TIMESTAMP AS OF"), eVer.getMessage)
    // non-numeric versions refuse with the ordinal guidance
    val eBad = intercept[Exception] {
      spark.sql("SELECT * FROM gasof.db.tt VERSION AS OF 'latest'").collect()
    }
    assert(eBad.getMessage.contains("integer ordinals"), eBad.getMessage)
    // a travelled rendering is read-only: every mutation surface refuses
    val cat = spark.sessionState.catalogManager.catalog("gasof")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val travelled = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "tt"),
      t1 * 1000L)
    val eMut = intercept[graft.scbf.ScbfFormatException] {
      travelled.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsDelete]
        .deleteWhere(Array.empty[org.apache.spark.sql.sources.Filter])
    }
    assert(eMut.getMessage.contains("read-only"), eMut.getMessage)
    spark.sql("DROP TABLE IF EXISTS gasof.db.tt")
  }

  test("compaction folds the chain: ordinals stay DURABLE (span-recorded fold); " +
      "interior folded ordinals refuse with the timestamp cure") {
    val dir = tmpDir("scbf-asof-fold")
    writeWave(dir, 0, 30)
    val tA = tick()
    writeWave(dir, 30, 80)
    val qroot = new Path(dir).getFileSystem(hconf).makeQualified(new Path(dir))
    assert(ScbfDiscovery.commitChain(qroot, hconf).size == 2)
    // version n = state after commit n, via the commit's max entry ts
    assert(asOf(dir, ScbfDiscovery.versionTs(qroot, hconf, 0)).count() == 30L)
    val v1tsBefore = ScbfDiscovery.versionTs(qroot, hconf, 1)
    assert(asOf(dir, v1tsBefore).count() == 80L)
    // drive the appender over CompactThreshold with harmless removal
    // sentinels (len < 0: never planned, never listed) — the fold must
    // collapse the chain to ONE marked snapshot
    // 2 wave deltas + 63 noops = 65 > threshold on the last append,
    // whose own post-append check folds everything to one snapshot
    (0 until ScbfDiscovery.CompactThreshold - 1).foreach { i =>
      ScbfDiscovery.append(qroot, hconf, Seq(ScbfDiscovery.Entry(
        s"noop-$i${ScbfDiscovery.RemovalSuffix}", ScbfDiscovery.RemovedLen,
        System.currentTimeMillis())))
    }
    val chain = ScbfDiscovery.commitChain(qroot, hconf)
    assert(chain.size == 1 && ScbfDiscovery.isFold(chain.head), chain.toString)
    // the fold RECORDS its span (65 folded commits), so ordinals are
    // durable: the fold renders version 64 (the state after its newest
    // folded commit), and the total stays 65
    assert(ScbfDiscovery.foldedSpan(chain.head).contains(65), chain.head)
    assert(asOf(dir, ScbfDiscovery.versionTs(qroot, hconf, 64)).count() == 80L)
    assert(asOf(dir, tA).count() == 30L)
    // an INTERIOR folded ordinal refuses loudly with the timestamp cure
    // — a dashboard pinned to VERSION AS OF 1 can never silently mean a
    // different state after a fold
    val folded = intercept[graft.scbf.ScbfFormatException] {
      ScbfDiscovery.versionTs(qroot, hconf, 1)
    }
    assert(folded.getMessage.contains("folded into compaction snapshot") &&
      folded.getMessage.contains("TIMESTAMP AS OF"), folded.getMessage)
    // truly out-of-range stays out-of-range with the durable total
    val oor = intercept[graft.scbf.ScbfFormatException] {
      ScbfDiscovery.versionTs(qroot, hconf, 65)
    }
    assert(oor.getMessage.contains("valid versions 0..64"), oor.getMessage)
    // the SQL commit view says so too: one row, kind=fold, version 64
    spark.sql("DROP TABLE IF EXISTS tt_fold")
    try {
      spark.sql(s"CREATE TABLE tt_fold (id INT, v DOUBLE) USING scbf LOCATION '$dir'")
      val com = spark.sql("DESCRIBE HISTORY tt_fold COMMITS").collect()
      assert(com.length == 1 && com.head.getInt(0) == 64 &&
        com.head.getString(2) == "fold", com.mkString("; "))
      // DESCRIBE DETAIL's commits column reports the durable total
      val det = spark.sql("DESCRIBE DETAIL tt_fold").collect().head
      assert(det.getInt(8) == 65, det.toString)
    } finally spark.sql("DROP TABLE IF EXISTS tt_fold")
  }

  test("VERSION AS OF n renders the SAME state before and after a fold (durable pin)") {
    val dir = tmpDir("scbf-asof-durable")
    val qroot = new Path(dir).getFileSystem(hconf).makeQualified(new Path(dir))
    // 70 single-file waves → the appender folds mid-way (threshold 64);
    // capture version 67's rendering BEFORE the fold that covers it
    // can happen again, then verify it is IDENTICAL after more commits
    // (no fold between capture and check can change it — and the fold
    // that already happened did not renumber it)
    (0 until 66).foreach(i => writeWave(dir, i, i + 1))
    // the chain has folded at least once by now (66 appends > 64)
    val tsAt60Before = ScbfDiscovery.versionTs(qroot, hconf, 65)
    val cntBefore = asOf(dir, tsAt60Before).count()
    // more commits → another fold pass over the existing fold
    (66 until 70).foreach(i => writeWave(dir, i, i + 1))
    val chain = ScbfDiscovery.commitChain(qroot, hconf)
    assert(chain.exists(ScbfDiscovery.isFold), chain.mkString(", "))
    // same ordinal, same state — ordinals never renumber
    val tsAfter = ScbfDiscovery.versionTs(qroot, hconf, 65)
    assert(tsAfter == tsAt60Before,
      s"version 65 must resolve to the same instant: $tsAfter != $tsAt60Before")
    assert(asOf(dir, tsAfter).count() == cntBefore)
    // and the newest ordinal is the durable total minus one
    val total = ScbfDiscovery.versionedChain(qroot, hconf).last._3 + 1
    assert(total == 70, s"70 commits recorded, got $total")
    assert(asOf(dir, ScbfDiscovery.versionTs(qroot, hconf, 69)).count() == 70L)
  }

  test("rapid same-millisecond commits stay version-separable (monotonic commit clock)") {
    val dir = tmpDir("scbf-asof-clock")
    val qroot = new Path(dir).getFileSystem(hconf).makeQualified(new Path(dir))
    // 30 commits as fast as the appender can go — wall-clock guarantees
    // several land in one millisecond; the clock must keep every
    // version's rendering exactly its chain prefix
    (0 until 30).foreach { i =>
      ScbfDiscovery.append(qroot, hconf, Seq(ScbfDiscovery.Entry(
        s"f$i.scbf", 100L + i, System.currentTimeMillis())))
    }
    val stamps = (0 until 30).map(v => ScbfDiscovery.versionTs(qroot, hconf, v))
    assert(stamps == stamps.sorted && stamps.distinct.size == 30,
      s"strictly increasing commit stamps required, got: $stamps")
    // version v's rendering = exactly v+1 files, for every v — the
    // round-11 ambiguity (commit n+1 leaking into version n inside one
    // millisecond) is now impossible, not just documented
    (0 until 30).foreach { v =>
      // liveness replay at the version's instant: count announced
      // names with ts <= versionTs — the same selection filesAsOf
      // makes before its physical checks
      var n = 0
      ScbfDiscovery.commitChain(qroot, hconf).foreach { d =>
        ScbfDiscovery.readDeltaStream(qroot, hconf, d)(e =>
          if (e.ts <= stamps(v)) n += 1)
      }
      assert(n == v + 1, s"version $v must see ${v + 1} files, saw $n")
    }
  }

  test("the commit clock survives restarts: re-seeded from the chain, a backdated commit still stamps after") {
    val dir = tmpDir("scbf-asof-restart")
    val qroot = new Path(dir).getFileSystem(hconf).makeQualified(new Path(dir))
    ScbfDiscovery.append(qroot, hconf, Seq(ScbfDiscovery.Entry(
      "pre.scbf", 100L, System.currentTimeMillis())))
    val maxBefore = {
      var m = Long.MinValue
      ScbfDiscovery.commitChain(qroot, hconf).foreach(d =>
        ScbfDiscovery.readDeltaStream(qroot, hconf, d)(e => m = math.max(m, e.ts)))
      m
    }
    // driver restart + NTP stepping the wall clock BACKWARDS: the
    // in-memory clock is gone and the new commit arrives stamped
    // inside (before!) the previous commit's millisecond — the
    // re-seed from the persisted delta names must shift it past
    ScbfDiscovery.resetCommitClocks()
    ScbfDiscovery.append(qroot, hconf, Seq(ScbfDiscovery.Entry(
      "post-restart.scbf", 100L, maxBefore - 5000)))
    var postTs = Long.MinValue
    ScbfDiscovery.commitChain(qroot, hconf).foreach(d =>
      ScbfDiscovery.readDeltaStream(qroot, hconf, d)(e =>
        if (e.name == "post-restart.scbf") postTs = e.ts))
    assert(postTs > maxBefore,
      s"a post-restart commit must stamp strictly after the chain: " +
        s"$postTs !> $maxBefore")
    // and the version axis stays exact across the restart
    assert(ScbfDiscovery.versionTs(qroot, hconf, 1) == postTs)
    assert(ScbfDiscovery.versionTs(qroot, hconf, 0) == maxBefore)
  }

  test("partitioned tables time-travel too, with partition pruning intact") {
    val dir = tmpDir("scbf-asof-part")
    spark.sql("DROP TABLE IF EXISTS asof_pt")
    new Path(dir).getFileSystem(hconf).delete(new Path(dir), true)
    try {
      spark.sql("CREATE TABLE asof_pt (id INT, grp STRING) USING scbf " +
        s"PARTITIONED BY (grp) LOCATION '$dir'")
      spark.sql("INSERT INTO asof_pt SELECT CAST(id AS INT), " +
        "concat('g', CAST(id % 2 AS INT)) FROM range(0, 100)")
      val t1 = tick()
      spark.sql("INSERT INTO asof_pt SELECT CAST(id AS INT), " +
        "concat('g', CAST(id % 2 AS INT)) FROM range(100, 300)")
      assert(asOf(dir, t1).count() == 100L)
      // historical scan still prunes files by partition cells
      ScbfUtil.dataFileOpens.set(0)
      val g0 = asOf(dir, t1).filter($"grp" === "g0").count()
      assert(g0 == 50L)
      val allT1 = ScbfDiscovery.filesAsOf(new Path(dir), hconf, t1,
        ScbfDataSource.resolveFiles(Seq(dir), hconf))
      val g0Files = allT1.count(_.getPath.toString.contains("grp=g0"))
      assert(ScbfUtil.dataFileOpens.get == g0Files,
        s"historical partition scan must prune: opened ${ScbfUtil.dataFileOpens.get} of ${allT1.size}")
    } finally spark.sql("DROP TABLE IF EXISTS asof_pt")
  }
}
