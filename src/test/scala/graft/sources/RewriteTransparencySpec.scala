package graft.sources

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** OPTIMIZE-transparent streaming: a snapshot-scoped rewrite announces
 * its files with the replaced names attached (Entry.rewriteOf), and a
 * log-path streaming consumer that has delivered every replaced file
 * admits the rewritten files as seen-WITHOUT-delivery (sentinel length
 * in the batch log, so restarts replay the skip exactly). A consumer
 * without that history delivers normally — completeness beats dedup. */
class RewriteTransparencySpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("v", DoubleType, nullable = false)))

  private def writeBatch(dir: String, ids: Range): Unit =
    ids.toDF("id").select(col("id").cast("int").as("id"),
        (col("id") * 1.5).as("v"))
      .repartition(2)
      .write.format("scbf").mode("append").save(dir)

  private def startCollector(dir: String, ckpt: String,
      seen: mutable.ArrayBuffer[Seq[Int]], reconcileEvery: Int = 0) =
    spark.readStream.format("scbf").schema(schema)
      .option("reconcileEvery", reconcileEvery.toString)
      .load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen += df.select("id").as[Int].collect().toSeq }
        ()
      }.start()

  test("an OPTIMIZE between triggers delivers nothing; later appends still flow") {
    val dir = Files.createTempDirectory("scbf-rw-transp").toString
    val ckpt = Files.createTempDirectory("scbf-rw-transp-ckpt").toString
    writeBatch(dir, 0 until 10)
    val seen = mutable.ArrayBuffer.empty[Seq[Int]]
    val q = startCollector(dir, ckpt, seen)
    try {
      q.processAllAvailable()
      assert(seen.flatten.sorted == (0 until 10), s"baseline delivery: $seen")
      // compact 2 files into 1 — pure rewrite, zero new rows
      ScbfMaintenance.cluster(spark, dir, Seq("id"), 1)
      ScbfDataSource.listings.set(0)
      q.processAllAvailable()
      assert(seen.flatten.size == 10,
        s"a rewrite must deliver NOTHING to a caught-up consumer: $seen")
      assert(ScbfDataSource.listings.get == 0,
        "the skip must ride the discovery log, not a listing")
      // fresh data after the rewrite flows exactly once
      writeBatch(dir, 10 until 15)
      q.processAllAvailable()
      assert(seen.flatten.sorted == (0 until 15), s"post-rewrite append: $seen")
    } finally q.stop()
  }

  test("the skip survives a restart AND reconcile listings") {
    val dir = Files.createTempDirectory("scbf-rw-restart").toString
    val ckpt = Files.createTempDirectory("scbf-rw-restart-ckpt").toString
    writeBatch(dir, 0 until 8)
    val seen = mutable.ArrayBuffer.empty[Seq[Int]]
    val q1 = startCollector(dir, ckpt, seen)
    try {
      q1.processAllAvailable()
      ScbfMaintenance.cluster(spark, dir, Seq("id"), 1)
      q1.processAllAvailable() // skip batch logged with sentinel lengths
    } finally q1.stop()
    assert(seen.flatten.sorted == (0 until 8))
    // restart with reconcileEvery=1: EVERY trigger is a full listing,
    // which must re-derive the same skip from the live delta's
    // rewrite markers instead of re-admitting the rewritten file
    val q2 = startCollector(dir, ckpt, seen, reconcileEvery = 1)
    try {
      q2.processAllAvailable()
      assert(seen.flatten.size == 8, s"restart re-delivered rewritten rows: $seen")
      writeBatch(dir, 8 until 12)
      q2.processAllAvailable()
      assert(seen.flatten.sorted == (0 until 12), s"post-restart append: $seen")
    } finally q2.stop()
  }

  test("a FRESH consumer after the rewrite still gets the data, exactly once") {
    val dir = Files.createTempDirectory("scbf-rw-fresh").toString
    writeBatch(dir, 0 until 6)
    ScbfMaintenance.cluster(spark, dir, Seq("id"), 1)
    val seen = mutable.ArrayBuffer.empty[Seq[Int]]
    val ckpt = Files.createTempDirectory("scbf-rw-fresh-ckpt").toString
    val q = startCollector(dir, ckpt, seen)
    try {
      q.processAllAvailable()
      // empty seen set: rewriteOf ⊄ seen → the rewritten file is real
      // data to this consumer and must arrive exactly once
      assert(seen.flatten.sorted == (0 until 6), s"fresh consumer: $seen")
      q.processAllAvailable()
      assert(seen.flatten.size == 6, "no duplicates on later triggers")
    } finally q.stop()
  }

  test("a DELETE's replacement files are also invisible to a caught-up consumer") {
    val dir = Files.createTempDirectory("scbf-rw-del").toString
    val ckpt = Files.createTempDirectory("scbf-rw-del-ckpt").toString
    writeBatch(dir, 0 until 10)
    val seen = mutable.ArrayBuffer.empty[Seq[Int]]
    val q = startCollector(dir, ckpt, seen)
    try {
      q.processAllAvailable()
      assert(seen.flatten.sorted == (0 until 10))
      // DELETE rewrites the affected files through the append path with
      // rewriteOfNames — survivors are a SUBSET of delivered rows, and
      // an append-only stream cannot retract deletions anyway
      ScbfDelete.deleteWhere(spark, dir,
        spark.sessionState.newHadoopConf(),
        Array(org.apache.spark.sql.sources.LessThan("id", 3)))
      q.processAllAvailable()
      assert(seen.flatten.size == 10,
        s"the delete's replacement files re-delivered rows: $seen")
      // the table itself reflects the delete for batch readers
      val left = spark.read.format("scbf").load(dir)
        .select("id").as[Int].collect().sorted
      assert(left.toSeq == (3 until 10), s"table after delete: ${left.toSeq}")
      writeBatch(dir, 10 until 12)
      q.processAllAvailable()
      assert(seen.flatten.sorted == (0 until 12), s"post-delete append: $seen")
    } finally q.stop()
  }

  test("UPDATE is stream-invisible too: the no-CDC contract, pinned") {
    // an append-only stream can express neither retraction nor
    // modification; re-delivering an UPDATE's rewritten files (what a
    // plain file stream would do) duplicates every unmodified row and
    // interleaves old/new values — strictly worse than the skip. The
    // contract: maintenance/DELETE/UPDATE are invisible to caught-up
    // streams; updated values reach batch readers and FRESH streams.
    val dir = Files.createTempDirectory("scbf-rw-upd").toString
    val ckpt = Files.createTempDirectory("scbf-rw-upd-ckpt").toString
    writeBatch(dir, 0 until 10)
    val seen = mutable.ArrayBuffer.empty[Seq[Int]]
    val q = startCollector(dir, ckpt, seen)
    try {
      q.processAllAvailable()
      assert(seen.flatten.sorted == (0 until 10))
      ScbfDelete.updateWhere(spark, dir,
        spark.sessionState.newHadoopConf(),
        Array(org.apache.spark.sql.sources.LessThan("id", 3)),
        Map("v" -> lit(-1.0)))
      q.processAllAvailable()
      assert(seen.flatten.size == 10,
        s"the update's replacement files re-delivered rows: $seen")
      val updated = spark.read.format("scbf").load(dir)
        .filter(col("v") === -1.0).select("id").as[Int].collect().sorted
      assert(updated.toSeq == (0 until 3), s"batch view after update: ${updated.toSeq}")
    } finally q.stop()
  }

  test("onChangeCommit=deliver: an UPDATE's replacement files DO reach a caught-up consumer") {
    val dir = Files.createTempDirectory("scbf-rw-dlv").toString
    val ckpt = Files.createTempDirectory("scbf-rw-dlv-ckpt").toString
    writeBatch(dir, 0 until 10)
    val seen = mutable.ArrayBuffer.empty[Seq[(Int, Double)]]
    val q = spark.readStream.format("scbf").schema(schema)
      .option("reconcileEvery", "0")
      .option("onChangeCommit", "deliver")
      .load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen += df.select("id", "v").as[(Int, Double)].collect().toSeq }
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(seen.flatten.map(_._1).sorted == (0 until 10))
      ScbfDelete.updateWhere(spark, dir,
        spark.sessionState.newHadoopConf(),
        Array(org.apache.spark.sql.sources.LessThan("id", 3)),
        Map("v" -> lit(-1.0)))
      q.processAllAvailable()
      // the replacement files re-deliver: every surviving row of the
      // rewritten files arrives again, updated values included — the
      // duplicates are the documented price of seeing changes
      val post = seen.flatten
      assert(post.count { case (_, v) => v == -1.0 } == 3,
        s"updated values must reach the stream under deliver: $post")
      assert(post.map(_._1).size > 10, "replacement rows re-delivered")
    } finally q.stop()
  }

  test("onChangeCommit=fail: an UPDATE stops a caught-up consumer loudly; OPTIMIZE does not") {
    val dir = Files.createTempDirectory("scbf-rw-fail").toString
    val ckpt = Files.createTempDirectory("scbf-rw-fail-ckpt").toString
    writeBatch(dir, 0 until 10)
    val seen = mutable.ArrayBuffer.empty[Seq[Int]]
    val q = spark.readStream.format("scbf").schema(schema)
      .option("reconcileEvery", "0")
      .option("onChangeCommit", "fail")
      .load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen += df.select("id").as[Int].collect().toSeq }
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(seen.flatten.sorted == (0 until 10))
      // pure compaction carries no C:1 tag — always transparent, the
      // fail policy must not trip on it
      ScbfMaintenance.cluster(spark, dir, Seq("id"), 1)
      q.processAllAvailable()
      assert(seen.flatten.size == 10, s"OPTIMIZE must stay invisible under fail: $seen")
      // a row-changing rewrite fails the stream with guidance
      ScbfDelete.updateWhere(spark, dir,
        spark.sessionState.newHadoopConf(),
        Array(org.apache.spark.sql.sources.LessThan("id", 3)),
        Map("v" -> lit(-1.0)))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("onChangeCommit=fail")),
        s"failure must carry the policy guidance: ${messages(e)}")
    } finally q.stop()
  }

  // one file with an exactly-known id range — the whole-file fast
  // path's provable victim shape (ScbfStats.mustMatchAll)
  private def writeRangeFile(dir: String, ids: Range): Unit =
    ids.toDF("id").select(col("id").cast("int").as("id"),
        (col("id") * 1.5).as("v"))
      .coalesce(1).write.format("scbf").mode("append").save(dir)

  private def bandDelete(dir: String, lo: Int, hi: Int): Unit =
    ScbfDelete.deleteWhere(spark, dir, spark.sessionState.newHadoopConf(),
      Array(org.apache.spark.sql.sources.GreaterThanOrEqual("id", lo),
        org.apache.spark.sql.sources.LessThan("id", hi)))

  private def removalEntries(dir: String): Seq[ScbfDiscovery.Entry] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val conf = spark.sessionState.newHadoopConf()
    ScbfDiscovery.listDeltas(root, conf)
      .flatMap(n => ScbfDiscovery.readDelta(root, conf, n))
      .filter(_.name.endsWith(ScbfDiscovery.RemovalSuffix))
  }

  test("a METADATA-ONLY delete (whole-file fast path) still trips onChangeCommit=fail") {
    // the fast path publishes no replacement — the removal entry is the
    // ONLY record of the change, and the fail policy must fire from it
    val dir = Files.createTempDirectory("scbf-rm-fail").toString
    val ckpt = Files.createTempDirectory("scbf-rm-fail-ckpt").toString
    (0 until 4).foreach(k => writeRangeFile(dir, k * 250 until (k + 1) * 250))
    val seen = mutable.ArrayBuffer.empty[Seq[Int]]
    val q = spark.readStream.format("scbf").schema(schema)
      .option("reconcileEvery", "0")
      .option("onChangeCommit", "fail")
      .load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen += df.select("id").as[Int].collect().toSeq }
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(seen.flatten.size == 1000)
      ScbfUtil.dataFileOpens.set(0)
      bandDelete(dir, 250, 500) // wholly covers file 2: dropped, not rewritten
      assert(ScbfUtil.dataFileOpens.get == 0,
        "the announced takedown must stay metadata-only")
      val rem = removalEntries(dir)
      assert(rem.size == 1 && rem.head.len == ScbfDiscovery.RemovedLen &&
        rem.head.rowsChanged && rem.head.rewriteOf.size == 1,
        s"one sentinel removal entry carrying the victim: $rem")
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("onChangeCommit=fail")),
        s"failure must carry the policy guidance: ${messages(e)}")
    } finally q.stop()
  }

  test("a metadata-only delete under skip: silent, nothing re-delivered, once — reconciles and restarts included") {
    val dir = Files.createTempDirectory("scbf-rm-skip").toString
    val ckpt = Files.createTempDirectory("scbf-rm-skip-ckpt").toString
    (0 until 4).foreach(k => writeRangeFile(dir, k * 250 until (k + 1) * 250))
    val seen = mutable.ArrayBuffer.empty[Seq[Int]]
    // reconcileEvery=1: EVERY trigger takes the full-listing branch,
    // which must admit the removal entry from the log exactly once
    // (deferred policy) — the branch a plain reconcile would otherwise
    // use to silently swallow the only record of the change
    val q = startCollector(dir, ckpt, seen, reconcileEvery = 1)
    try {
      q.processAllAvailable()
      assert(seen.flatten.size == 1000)
      bandDelete(dir, 250, 500)
      q.processAllAvailable()
      q.processAllAvailable() // a second reconcile must not re-admit
      assert(seen.flatten.size == 1000,
        s"nothing to deliver after a pure takedown: ${seen.flatten.size}")
      writeRangeFile(dir, 1000 until 1100)
      q.processAllAvailable()
      assert(seen.flatten.size == 1100, "appends after the removal flow")
    } finally q.stop()
    // restart from the checkpoint: the admitted removal entry replays
    // as the skip it was — no duplicate delivery, no policy re-fire
    val seen2 = mutable.ArrayBuffer.empty[Seq[Int]]
    val q2 = startCollector(dir, ckpt, seen2, reconcileEvery = 1)
    try {
      q2.processAllAvailable()
      assert(seen2.flatten.isEmpty, s"restart re-delivered: ${seen2.flatten.size}")
    } finally q2.stop()
  }

  test("a FRESH consumer after a metadata-only delete just gets the surviving files") {
    val dir = Files.createTempDirectory("scbf-rm-fresh").toString
    (0 until 4).foreach(k => writeRangeFile(dir, k * 250 until (k + 1) * 250))
    bandDelete(dir, 250, 500)
    assert(removalEntries(dir).size == 1)
    val seen = mutable.ArrayBuffer.empty[Seq[Int]]
    val ckpt = Files.createTempDirectory("scbf-rm-fresh-ckpt").toString
    // fail policy on purpose: an UNCOVERED removal entry (this consumer
    // never delivered the victim) must not trip it
    val q = spark.readStream.format("scbf").schema(schema)
      .option("onChangeCommit", "fail")
      .load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen += df.select("id").as[Int].collect().toSeq }
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(seen.flatten.size == 750 && !seen.flatten.exists(i => i >= 250 && i < 500),
        s"fresh consumer sees exactly the survivors: ${seen.flatten.size}")
    } finally q.stop()
  }

  test("same-trigger announcement of originals AND their rewrite prefers the rewrite") {
    // a lagging consumer wakes up to find an append AND the DELETE that
    // already rewrote (and removed) the appended files, in one trigger:
    // the replaced names' data files are gone, so admitting them would
    // fail the read, and delivering them alongside the replacement
    // would duplicate rows — the rewrite alone is delivered. Driven at
    // the MicroBatchStream level (a query's own triggers would race
    // the append)
    val dir = Files.createTempDirectory("scbf-rw-lag").toString
    val ckpt = Files.createTempDirectory("scbf-rw-lag-ckpt").toString
    writeBatch(dir, 0 until 10)
    val conf = spark.sessionState.newHadoopConf()
    val stream = new ScbfMicroBatchStream(schema, Seq(dir), conf, ckpt,
      reconcileEvery = 0)
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    def trig(from: ScbfOffset): ScbfOffset =
      stream.latestOffset(from, ReadLimit.allAvailable()).asInstanceOf[ScbfOffset]
    val o1 = trig(ScbfOffset(0)) // baseline full listing
    assert(stream.planInputPartitions(ScbfOffset(0), o1).nonEmpty)
    val o2 = trig(o1) // incremental mode from here
    // lagging window: append 10..20, then DELETE 10..14 — the delete
    // prunes to the appended files, removes them, and announces
    // replacements carrying the survivors (15..19)
    writeBatch(dir, 10 until 20)
    val appended = ScbfDataSource.resolveFiles(Seq(dir), conf)
      .map(_.getPath.getName).filterNot(_.startsWith("rw-")).toSet
    ScbfDelete.deleteWhere(spark, dir, conf,
      Array(org.apache.spark.sql.sources.And(
        org.apache.spark.sql.sources.GreaterThanOrEqual("id", 10),
        org.apache.spark.sql.sources.LessThan("id", 15))))
    val o3 = trig(o2)
    assert(o3.batch == o2.batch + 1, s"trigger admitted nothing: $o2 -> $o3")
    val planned = stream.planInputPartitions(o2, o3)
      .map(_.asInstanceOf[ScbfFilePartition].path)
    assert(planned.nonEmpty, "the replacement files must be planned")
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    planned.foreach(p => assert(fs.exists(new org.apache.hadoop.fs.Path(p)),
      s"planned a deleted file: $p"))
    assert(planned.forall(p => new org.apache.hadoop.fs.Path(p).getName.startsWith("rw-")),
      s"originals must be dropped in favor of their rewrite: ${planned.toSeq}")
    // and the planned content is the survivors, exactly once
    val ids = spark.read.format("scbf").load(planned.toIndexedSeq: _*)
      .select("id").as[Int].collect().sorted
    assert(ids.toSeq == (15 until 20), s"planned rows: ${ids.toSeq}")
  }

  test("rewriteOf entries round-trip the delta format and compaction") {
    val dir = Files.createTempDirectory("scbf-rw-fmt").toString
    val conf = new org.apache.hadoop.conf.Configuration()
    val table = new org.apache.hadoop.fs.Path(dir)
    ScbfDiscovery.append(table, conf, Seq(
      ScbfDiscovery.Entry("plain.scbf", 10L, 1L),
      ScbfDiscovery.Entry("rw.scbf", 20L, 2L, Seq("a.scbf", "b.scbf")),
      ScbfDiscovery.Entry("upd.scbf", 30L, 3L, Seq("c.scbf"), rowsChanged = true)))
    val read = ScbfDiscovery.listDeltas(table, conf)
      .flatMap(n => ScbfDiscovery.readDelta(table, conf, n))
    assert(read.toSet == Set(
      ScbfDiscovery.Entry("plain.scbf", 10L, 1L),
      ScbfDiscovery.Entry("rw.scbf", 20L, 2L, Seq("a.scbf", "b.scbf")),
      ScbfDiscovery.Entry("upd.scbf", 30L, 3L, Seq("c.scbf"), rowsChanged = true)),
      s"got $read")
  }

  test("delta parse tolerates unknown trailing tags — the format evolution rule") {
    // a FUTURE writer appends a tagged field this reader doesn't know;
    // the file must still surface (with the R: tag honored wherever it
    // sits), or a mixed-version incremental consumer silently misses
    // newly published files until its next reconcile
    val dir = Files.createTempDirectory("scbf-rw-fwd").toString
    val conf = new org.apache.hadoop.conf.Configuration()
    val table = new org.apache.hadoop.fs.Path(dir)
    val logDir = ScbfDiscovery.dir(table)
    val fs = logDir.getFileSystem(conf)
    fs.mkdirs(logDir)
    val delta = new org.apache.hadoop.fs.Path(logDir, "delta-0-test")
    val out = fs.create(delta)
    out.write(("discovery\t1\n" +
      "future.scbf\t10\t1\tZ:something-new\n" +
      "both.scbf\t20\t2\tR:a.scbf\tZ:more\n" +
      "tagless.scbf\t30\t3\n" +
      "corrupt\tnot-a-number\t4\n").getBytes("UTF-8"))
    out.close()
    val read = ScbfDiscovery.readDelta(table, conf, "delta-0-test")
    assert(read.toSet == Set(
      ScbfDiscovery.Entry("future.scbf", 10L, 1L),
      ScbfDiscovery.Entry("both.scbf", 20L, 2L, Seq("a.scbf")),
      ScbfDiscovery.Entry("tagless.scbf", 30L, 3L)),
      s"got $read")
    // a future HEADER version is skipped whole (reconcile is the net)
    val v2 = new org.apache.hadoop.fs.Path(logDir, "delta-1-test")
    val o2 = fs.create(v2)
    o2.write("discovery\t2\nx.scbf\t1\t1\n".getBytes("UTF-8"))
    o2.close()
    assert(ScbfDiscovery.readDelta(table, conf, "delta-1-test").isEmpty)
  }
}
