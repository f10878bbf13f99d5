package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * Row-level change feed (`changesSince[Version]` / `changesUntil
 * [Version]` batch read options): the rows ADDED in an exclusive-
 * start/inclusive-end window, resolved from the discovery log
 * (ScbfDiscovery.changedFilesBetween) and served through the NORMAL
 * scan — the resync primitive incremental consumers lack under
 * `onChangeCommit=skip` streams.
 *
 * The contract under test:
 *  - append-only windows are EXACT, by timestamp or version ordinal;
 *  - in-window add+remove nets to zero; in-window rewrites whose
 *    victims are all in-window adds substitute exactly;
 *  - pure compactions substitute exactly when their victims are all
 *    selected, and gate on the `onChangeCommit` policy when they mix
 *    window rows with pre-window rows (feed DEFAULT: fail — a resync
 *    primitive must not silently drop);
 *  - post-window removal/rewrite of window rows gates (the bytes are
 *    gone; SCBF retains no tombstones);
 *  - deltas named at or before the start point are never read
 *    (bounded replay — the HistoryScale envelope);
 *  - misuse refuses loudly: reversed points, until-without-since,
 *    both spellings, clones (no chain of their own), streams.
 */
class ChangeFeedSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def hconf = spark.sessionState.newHadoopConf()

  private def tick(): Long = { Thread.sleep(5); System.currentTimeMillis() }

  private def writeWave(dir: String, from: Int, until: Int): Unit =
    (from until until).map(i => (i, i * 0.5)).toDF("id", "v")
      .coalesce(1).write.format("scbf").mode("append").save(dir)

  private def feed(dir: String, since: Long, until: Option[Long] = None,
      policy: Option[String] = None) = {
    val r = spark.read.format("scbf").option("changesSince", since)
    val r2 = until.fold(r)(u => r.option("changesUntil", u))
    policy.fold(r2)(p => r2.option("onChangeCommit", p)).load(dir)
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Int] =
    df.select($"id").as[Int].collect().toSeq.sorted

  test("append-only windows are exact, by timestamp and by version ordinal") {
    val dir = tmpDir("scbf-feed-append")
    writeWave(dir, 0, 100)
    val t1 = tick()
    writeWave(dir, 100, 250)
    val t2 = tick()
    writeWave(dir, 250, 400)
    // (t1, t2]: exactly wave 2
    assert(ids(feed(dir, t1, Some(t2))) == (100 until 250))
    // (t1, now]: waves 2+3
    assert(ids(feed(dir, t1)) == (100 until 400))
    // version spelling ≡ timestamp spelling: commits are ordinals 0,1,2
    val vDf = spark.read.format("scbf")
      .option("changesSinceVersion", 0).option("changesUntilVersion", 1)
      .load(dir)
    assert(ids(vDf) == (100 until 250))
    val vDf2 = spark.read.format("scbf").option("changesSinceVersion", 1).load(dir)
    assert(ids(vDf2) == (250 until 400))
    // column pruning + filters ride the normal scan
    assert(feed(dir, t1).filter($"id" < 120).select($"id").count() == 20L)
    // an empty window is an empty (not failed) feed
    assert(feed(dir, t2, Some(t2 + 1)).count() == 0L)
  }

  test("rows added then removed inside the window net to zero") {
    val dir = tmpDir("scbf-feed-netzero")
    spark.sql("DROP TABLE IF EXISTS feed_netzero")
    new Path(dir).getFileSystem(hconf).delete(new Path(dir), true)
    try {
      spark.sql(s"CREATE TABLE feed_netzero (id INT, v DOUBLE) USING scbf LOCATION '$dir'")
      spark.sql("INSERT INTO feed_netzero SELECT /*+ COALESCE(1) */ CAST(id AS INT), id * 0.5 FROM range(0, 100)")
      val t1 = tick()
      spark.sql("INSERT INTO feed_netzero SELECT /*+ COALESCE(1) */ CAST(id AS INT), id * 0.5 FROM range(100, 200)")
      // whole-file metadata DELETE of exactly the in-window wave
      spark.sql("DELETE FROM feed_netzero WHERE id >= 100")
      // default policy (fail) passes: the removal nets out in-window adds
      assert(feed(dir, t1).count() == 0L)
      // and the pre-window wave is untouched by the feed
      assert(spark.table("feed_netzero").count() == 100L)
    } finally spark.sql("DROP TABLE IF EXISTS feed_netzero")
  }

  test("in-window DELETE of pre-window rows gates: fail names the cure, skip serves adds, deliver admits replacements") {
    val dir = tmpDir("scbf-feed-rewrite")
    spark.sql("DROP TABLE IF EXISTS feed_rw")
    new Path(dir).getFileSystem(hconf).delete(new Path(dir), true)
    try {
      spark.sql(s"CREATE TABLE feed_rw (id INT, v DOUBLE) USING scbf LOCATION '$dir'")
      spark.sql("INSERT INTO feed_rw SELECT /*+ COALESCE(1) */ CAST(id AS INT), id * 0.5 FROM range(0, 100)")
      val t1 = tick()
      spark.sql("INSERT INTO feed_rw SELECT /*+ COALESCE(1) */ CAST(id AS INT), id * 0.5 FROM range(100, 200)")
      // copy-on-write partial delete touching ONLY the pre-window file
      spark.sql("DELETE FROM feed_rw WHERE id < 50")
      val e = intercept[Exception] { feed(dir, t1).count() }
      assert(e.getMessage.contains("onChangeCommit"), e.getMessage)
      assert(e.getMessage.contains("rewrote rows that predate"), e.getMessage)
      // skip: the unaffected in-window adds, exactly
      assert(ids(feed(dir, t1, policy = Some("skip"))) == (100 until 200))
      // deliver: adds + the replacement file's rows (wave-1 survivors)
      assert(ids(feed(dir, t1, policy = Some("deliver"))) == (50 until 200))
    } finally spark.sql("DROP TABLE IF EXISTS feed_rw")
  }

  test("a pure compaction of only-window files substitutes exactly; a mixing one gates") {
    // all files in-window: OPTIMIZE's fold substitutes exactly under fail
    val dir = tmpDir("scbf-feed-opt")
    spark.sql("DROP TABLE IF EXISTS feed_opt")
    new Path(dir).getFileSystem(hconf).delete(new Path(dir), true)
    try {
      spark.sql(s"CREATE TABLE feed_opt (id INT, v DOUBLE) USING scbf LOCATION '$dir'")
      val t0 = System.currentTimeMillis() - 1
      spark.sql("INSERT INTO feed_opt SELECT /*+ COALESCE(1) */ CAST(id AS INT), id * 0.5 FROM range(0, 100)")
      spark.sql("INSERT INTO feed_opt SELECT /*+ COALESCE(1) */ CAST(id AS INT), id * 0.5 FROM range(100, 200)")
      spark.sql("OPTIMIZE feed_opt")
      assert(ids(feed(dir, t0)) == (0 until 200))
      // now a window covering only the SECOND half: the fold mixed its
      // rows with pre-window rows → fail default, skip drops with a
      // warning, deliver over-delivers the whole compacted container
      val t1 = spark.sql("DESCRIBE HISTORY feed_opt COMMITS")
        .filter($"version" === 0).select($"ts").head().getTimestamp(0).getTime
      val e = intercept[Exception] { feed(dir, t1).count() }
      assert(e.getMessage.contains("compaction folded window rows"), e.getMessage)
      assert(ids(feed(dir, t1, policy = Some("skip"))) == Seq.empty)
      assert(ids(feed(dir, t1, policy = Some("deliver"))) == (0 until 200))
    } finally spark.sql("DROP TABLE IF EXISTS feed_opt")
  }

  test("post-window removal of window rows gates: the bytes are gone") {
    val dir = tmpDir("scbf-feed-postrm")
    spark.sql("DROP TABLE IF EXISTS feed_postrm")
    new Path(dir).getFileSystem(hconf).delete(new Path(dir), true)
    try {
      spark.sql(s"CREATE TABLE feed_postrm (id INT, v DOUBLE) USING scbf LOCATION '$dir'")
      spark.sql("INSERT INTO feed_postrm SELECT /*+ COALESCE(1) */ CAST(id AS INT), id * 0.5 FROM range(0, 100)")
      val t1 = tick()
      spark.sql("INSERT INTO feed_postrm SELECT /*+ COALESCE(1) */ CAST(id AS INT), id * 0.5 FROM range(100, 200)")
      val t2 = tick()
      spark.sql("DELETE FROM feed_postrm WHERE id >= 100") // whole-file, after t2
      val e = intercept[Exception] { feed(dir, t1, Some(t2)).count() }
      assert(e.getMessage.contains("removed AFTER the end point"), e.getMessage)
      assert(ids(feed(dir, t1, Some(t2), policy = Some("skip"))) == Seq.empty)
    } finally spark.sql("DROP TABLE IF EXISTS feed_postrm")
  }

  test("the replay is bounded: deltas named at or before the start are never read") {
    val dir = tmpDir("scbf-feed-bounded")
    (0 until 20).foreach(i => writeWave(dir, i * 10, i * 10 + 10))
    val t = tick()
    writeWave(dir, 200, 210)
    writeWave(dir, 210, 220)
    ScbfDiscovery.deltaReads.set(0)
    assert(ids(feed(dir, t)) == (200 until 220))
    val reads = ScbfDiscovery.deltaReads.get
    assert(reads == 2, s"a 2-commit window over a 22-commit log must read " +
      s"exactly the 2 bracketed deltas, read $reads")
  }

  test("a full INSERT OVERWRITE leaves a durable boundary: windows spanning it gate instead of serving the replacement as plain adds") {
    val dir = tmpDir("scbf-feed-ow")
    spark.sql("DROP TABLE IF EXISTS feed_ow")
    new Path(dir).getFileSystem(hconf).delete(new Path(dir), true)
    try {
      spark.sql(s"CREATE TABLE feed_ow (id INT, v DOUBLE) USING scbf LOCATION '$dir'")
      spark.sql("INSERT INTO feed_ow SELECT /*+ COALESCE(1) */ CAST(id AS INT), id * 0.5 FROM range(0, 100)")
      val t1 = tick()
      spark.sql("INSERT INTO feed_ow SELECT /*+ COALESCE(1) */ CAST(id AS INT), id * 0.5 FROM range(100, 200)")
      val t2 = tick()
      spark.sql("INSERT OVERWRITE feed_ow SELECT /*+ COALESCE(1) */ CAST(id AS INT), id * 0.5 FROM range(1000, 1100)")
      // in-window overwrite: the restarted log cannot enumerate what
      // was added between t1 and the overwrite — gate, don't guess
      val e = intercept[Exception] { feed(dir, t1).count() }
      assert(e.getMessage.contains("fully overwritten"), e.getMessage)
      assert(e.getMessage.contains("inside the window"), e.getMessage)
      // skip: the post-overwrite adds only, with the warning
      assert(ids(feed(dir, t1, policy = Some("skip"))) == (1000 until 1100))
      // post-window overwrite: the window's bytes were replaced wholesale
      val e2 = intercept[Exception] { feed(dir, t1, Some(t2)).count() }
      assert(e2.getMessage.contains("after the end point"), e2.getMessage)
      assert(ids(feed(dir, t1, Some(t2), policy = Some("skip"))) == Seq.empty)
      // deliver on a post-window overwrite admits the replacement bytes
      // (the overwrite commit's own files), as its warning promises
      assert(ids(feed(dir, t1, Some(t2), policy = Some("deliver"))) ==
        (1000 until 1100))
      // ...and the admission flows through the rewrite machinery: a
      // later OPTIMIZE of the (physically deleted) overwrite files
      // composes — substitution or a further deliver gate — instead of
      // leaving dangling names for the stat guard to trip on
      spark.sql("INSERT INTO feed_ow SELECT /*+ COALESCE(1) */ CAST(id AS INT), id * 0.5 FROM range(1100, 1150)")
      spark.sql("OPTIMIZE feed_ow")
      assert(ids(feed(dir, t1, Some(t2), policy = Some("deliver"))) ==
        (1000 until 1150))
      // a window starting AFTER the overwrite is clean — no gate
      val t3 = spark.sql("DESCRIBE HISTORY feed_ow")
        .agg(org.apache.spark.sql.functions.max($"ts")).head()
        .getTimestamp(0).getTime
      spark.sql("INSERT INTO feed_ow SELECT /*+ COALESCE(1) */ CAST(id AS INT), id * 0.5 FROM range(2000, 2050)")
      assert(ids(feed(dir, t3)) == (2000 until 2050))
      // the file-level feed shows the boundary as an explicit remove row
      val acts = spark.sql("DESCRIBE HISTORY feed_ow")
        .select($"action", $"file").collect()
      assert(acts.exists(r => r.getString(0) == "remove" &&
        r.getString(1).startsWith(ScbfDiscovery.OverwriteBoundaryPrefix)),
        acts.mkString("; "))
    } finally spark.sql("DROP TABLE IF EXISTS feed_ow")
  }

  test("the feed fails CLOSED on what it cannot verify: empty chains, torn deltas, bypassed producers") {
    // an existing-but-empty log (a crashed overwrite's window) refuses —
    // listDeltas degrades errors to empty, and for the feed an empty
    // replay would be silent row loss, not a freshness hiccup
    val dir = tmpDir("scbf-feed-emptylog")
    writeWave(dir, 0, 10)
    val fs = new Path(dir).getFileSystem(hconf)
    val logDir = ScbfDiscovery.dir(new Path(dir))
    fs.listStatus(logDir).foreach(f => fs.delete(f.getPath, false))
    val e1 = intercept[Exception] { feed(dir, 0).count() }
    assert(e1.getMessage.contains("empty or unlistable"), e1.getMessage)

    // a torn delta refuses under the feed's strict read (a stream just
    // degrades to reconcile; the feed's correctness depends on it)
    val dir2 = tmpDir("scbf-feed-torn")
    writeWave(dir2, 0, 10)
    val t = tick()
    writeWave(dir2, 10, 20)
    val log2 = ScbfDiscovery.dir(new Path(dir2))
    val delta = fs.listStatus(log2).map(_.getPath)
      .filter(_.getName.startsWith("delta-")).maxBy(_.getName)
    val out = fs.create(delta, true)
    try out.write("not a discovery header\n".getBytes("UTF-8")) finally out.close()
    val e2 = intercept[Exception] { feed(dir2, t).count() }
    assert(e2.getMessage.contains("unrecognized header"), e2.getMessage)

    // a data file newer than the start point that the log never
    // announced: a producer bypassed the connector — refuse, don't
    // silently under-deliver (same trust contract as asOfTimestamp)
    val dir3 = tmpDir("scbf-feed-bypass")
    writeWave(dir3, 0, 10)
    val t3 = tick()
    writeWave(dir3, 10, 20)
    val src = ScbfDataSource.resolveFiles(Seq(dir3), hconf).head.getPath
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs,
      new Path(dir3, "alien-copy.scbf"), false, hconf)
    val e3 = intercept[Exception] { feed(dir3, t3).count() }
    assert(e3.getMessage.contains("never announced"), e3.getMessage)
    // connector-only pipelines can opt out of the O(listing) trust
    // check and keep the feed's planning at O(changes)
    assert(ids(spark.read.format("scbf").option("changesSince", t3)
      .option("feedReconcile", false).load(dir3)) == (10 until 20))

    // a torn LINE (valid header, unparsable entry) refuses too — it
    // could be the only copy of an overwrite boundary
    val dir4 = tmpDir("scbf-feed-tornline")
    writeWave(dir4, 0, 10)
    val t4 = tick()
    writeWave(dir4, 10, 20)
    val log4 = ScbfDiscovery.dir(new Path(dir4))
    val delta4 = fs.listStatus(log4).map(_.getPath)
      .filter(_.getName.startsWith("delta-")).maxBy(_.getName)
    val body = {
      val len = fs.getFileStatus(delta4).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(delta4)
      try in.readFully(0, buf) finally in.close()
      new String(buf, "UTF-8")
    }
    val out4 = fs.create(delta4, true)
    try out4.write((body + "\ntorn").getBytes("UTF-8")) finally out4.close()
    val e4 = intercept[Exception] { feed(dir4, t4).count() }
    assert(e4.getMessage.contains("unparsable entry line"), e4.getMessage)
  }

  test("misuse refuses loudly: reversed points, until-without-since, both spellings, clones, streams") {
    val dir = tmpDir("scbf-feed-misuse")
    writeWave(dir, 0, 10)
    val now = System.currentTimeMillis()
    val e1 = intercept[Exception] { feed(dir, now + 1000, Some(now)).count() }
    assert(e1.getMessage.contains("exclusive-start/inclusive-end"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.read.format("scbf").option("changesUntil", now).load(dir).count()
    }
    assert(e2.getMessage.contains("needs a start point"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.read.format("scbf").option("changesSince", now)
        .option("changesSinceVersion", 0).load(dir).count()
    }
    assert(e3.getMessage.contains("not both"), e3.getMessage)
    val e4 = intercept[Exception] {
      spark.read.format("scbf").option("changesSince", now)
        .option("asOfTimestamp", now).load(dir).count()
    }
    assert(e4.getMessage.contains("different reads"), e4.getMessage)
    // a clone records no chain of its own
    val cdir = tmpDir("scbf-feed-clone")
    val fs = new Path(cdir).getFileSystem(hconf)
    fs.delete(new Path(cdir), true)
    val src = new Path(dir)
    val qsrc = src.getFileSystem(hconf).makeQualified(src)
    val files = ScbfDataSource.resolveFiles(Seq(dir), hconf)
    ScbfClone.write(new Path(cdir), hconf, qsrc, files)
    val e5 = intercept[Exception] { feed(cdir, 0).count() }
    assert(e5.getMessage.contains("SHALLOW CLONE"), e5.getMessage)
    // a stream wanting "changes since" is just… a stream (the refusal
    // fires when the micro-batch stream is built, inside the query
    // thread — surface it through processAllAvailable)
    val q = spark.readStream.format("scbf")
      .schema(spark.read.format("scbf").load(dir).schema)
      .option("changesSince", 0).load(dir)
      .writeStream.format("noop").start()
    val e6 = intercept[Exception] {
      try q.processAllAvailable() finally q.stop()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e6).exists(_.contains("batch-only")), messages(e6).toString)
  }
}
