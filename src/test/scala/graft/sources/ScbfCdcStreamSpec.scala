package graft.sources

import java.nio.file.Files

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * STREAMING CDC read (`readChangeFeed=true` — ScbfCdcMicroBatchStream):
 * each trigger must deliver exactly what the batch enumeration
 * ([[ScbfCdc.changes]]) returns for the trigger's commit window —
 * delete/update/insert rows with `_change_type`, `_commit_version`
 * and `_commit_timestamp` — with checkpoint-restart exactly-once,
 * loud fail-closed refusals (uncaptured mutations name the enable-CDC
 * cure), startingVersion/startingTimestamp entry points, and
 * commit-aligned maxFilesPerTrigger admission.
 */
class ScbfCdcStreamSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def hconf = spark.sessionState.newHadoopConf()

  private def tick(): Long = { Thread.sleep(5); System.currentTimeMillis() }

  private def writeWave(dir: String, from: Int, until: Int): Unit =
    (from until until).map(i => (i, i * 10)).toDF("id", "v")
      .coalesce(1).write.format("scbf").mode("append").save(dir)

  private def enable(dir: String): Unit = ScbfCdc.enable(new Path(dir), hconf)

  /** Full change row as a comparable tuple: (id, v, type, version, ts). */
  private def tuples(df: org.apache.spark.sql.DataFrame): Seq[(Int, Int, String, Int, Long)] =
    df.select($"id", $"v", col(ScbfCdc.ChangeTypeCol),
        col(ScbfCdc.CommitVersionCol),
        col(ScbfCdc.CommitTsCol).cast("long"))
      .as[(Int, Int, String, Int, Long)].collect().toSeq.sorted

  private def streamDF(dir: String, opts: (String, String)*) = {
    val r = spark.readStream.format("scbf").option("readChangeFeed", "true")
    opts.foreach { case (k, v) => r.option(k, v) }
    r.load(dir)
  }

  test("per-trigger delivery matches the batch enumeration across append and DELETE") {
    val dir = Files.createTempDirectory("scbf-cdcstream").toString
    val ckpt = Files.createTempDirectory("scbf-cdcstream-ckpt").toString
    enable(dir)
    spark.sql("DROP TABLE IF EXISTS cdcs_t")
    spark.sql(s"CREATE TABLE cdcs_t (id INT, v INT) USING scbf LOCATION '$dir'")
    writeWave(dir, 0, 100) // pre-stream history: must NOT be delivered (default = latest)
    val t0 = tick()
    val batches = mutable.ArrayBuffer.empty[Seq[(Int, Int, String, Int, Long)]]
    val q = streamDF(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += tuples(df) }
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(batches.flatten.isEmpty, s"default start is LATEST: $batches")
      writeWave(dir, 100, 200)
      q.processAllAvailable()
      val afterInsert = batches.synchronized(batches.flatten.toList)
      assert(afterInsert.map(t => (t._1, t._2, t._3)).sorted ==
        (100 until 200).map(i => (i, i * 10, "insert")).sorted)
      spark.sql("DELETE FROM cdcs_t WHERE id < 50") // whole-file victims retained
      q.processAllAvailable()
    } finally q.stop()
    // the stream's total delivery IS the batch enumeration of the span
    val streamed = batches.synchronized(batches.flatten.toList).sorted
    val batch = tuples(ScbfCdc.changes(spark, dir, since = Some(t0)))
    assert(streamed == batch,
      s"stream/batch divergence:\n stream=$streamed\n batch=$batch")
    // and the delete rows carry the delete commit's LATER version
    val byType = streamed.groupBy(_._3)
    assert(byType("delete").map(_._4).distinct.size == 1)
    assert(byType("delete").head._4 > byType("insert").head._4)
  }

  test("checkpoint restart resumes exactly-once; late commits stream after restart") {
    val dir = Files.createTempDirectory("scbf-cdcstream-r").toString
    val ckpt = Files.createTempDirectory("scbf-cdcstream-r-ckpt").toString
    enable(dir)
    spark.sql("DROP TABLE IF EXISTS cdcs_r")
    spark.sql(s"CREATE TABLE cdcs_r (id INT, v INT) USING scbf LOCATION '$dir'")
    writeWave(dir, 0, 10)
    val t0 = tick()
    val seen = mutable.ArrayBuffer.empty[(Int, Int, String, Int, Long)]
    def run(): Unit = {
      val q = streamDF(dir, "startingTimestamp" -> t0.toString)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen ++= tuples(df) }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    writeWave(dir, 10, 20)
    run()
    writeWave(dir, 20, 30)
    spark.sql("DELETE FROM cdcs_r WHERE id >= 25")
    run() // same checkpoint: must deliver ONLY the new commits
    val batch = tuples(ScbfCdc.changes(spark, dir, since = Some(t0)))
    assert(seen.sorted == batch,
      s"restart duplicated or dropped rows:\n stream=${seen.sorted}\n batch=$batch")
  }

  test("an uncaptured mutation fails the stream loudly, naming the enable-CDC cure") {
    val dir = Files.createTempDirectory("scbf-cdcstream-off").toString
    val ckpt = Files.createTempDirectory("scbf-cdcstream-off-ckpt").toString
    // CDC NOT enabled
    spark.sql("DROP TABLE IF EXISTS cdcs_off")
    spark.sql(s"CREATE TABLE cdcs_off (id INT, v INT) USING scbf LOCATION '$dir'")
    writeWave(dir, 0, 100)
    val q = streamDF(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }.start()
    try {
      q.processAllAvailable()
      spark.sql("DELETE FROM cdcs_off WHERE id < 10")
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains("without CDC capture") && msgs.contains("ScbfCdc.enable"),
        msgs)
    } finally q.stop()
  }

  test("startingVersion backfills the post-point history on the first trigger") {
    val dir = Files.createTempDirectory("scbf-cdcstream-sv").toString
    val ckpt = Files.createTempDirectory("scbf-cdcstream-sv-ckpt").toString
    enable(dir)
    writeWave(dir, 0, 10)   // version 0
    writeWave(dir, 10, 20)  // version 1
    writeWave(dir, 20, 30)  // version 2
    val got = mutable.ArrayBuffer.empty[(Int, Int, String, Int, Long)]
    val q = streamDF(dir, "startingVersion" -> "0")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= tuples(df) }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val batch = tuples(ScbfCdc.changes(spark, dir, sinceVersion = Some(0)))
    assert(got.sorted == batch)
    assert(got.map(_._1).sorted == (10 until 30), s"got $got")
    assert(got.map(t => (t._1 / 10, t._4)).distinct.sorted == Seq((1, 1), (2, 2)))
  }

  test("maxFilesPerTrigger drains commit-aligned: never tears a commit across batches") {
    val dir = Files.createTempDirectory("scbf-cdcstream-cap").toString
    val ckpt = Files.createTempDirectory("scbf-cdcstream-cap-ckpt").toString
    enable(dir)
    (0 until 5).foreach(i => writeWave(dir, i * 10, i * 10 + 10)) // 5 one-file commits
    val perBatch = mutable.ArrayBuffer.empty[Seq[Int]]
    val q = streamDF(dir, "startingVersion" -> "0", "maxFilesPerTrigger" -> "2")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        perBatch.synchronized {
          perBatch += df.select(col(ScbfCdc.CommitVersionCol)).distinct()
            .as[Int].collect().toSeq.sorted
        }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val nonEmpty = perBatch.filter(_.nonEmpty)
    // versions 1..4 (startingVersion=0 is exclusive), ≤2 commits each,
    // every commit whole in exactly one batch
    assert(nonEmpty.flatten.sorted == Seq(1, 2, 3, 4), s"got $perBatch")
    assert(nonEmpty.forall(_.size <= 2), s"cap exceeded: $perBatch")
  }

  test("mirror pipeline: the stream maintains an exact replica through append/DELETE/UPDATE") {
    // the Delta-CDF consumer shape end-to-end: a replica applies each
    // trigger's change rows IN COMMIT-ORDINAL ORDER (delete → drop,
    // insert/update_post → upsert) and must equal the source after
    // every catch-up — the live-mirror contract the netting feed
    // could not serve (it gates on mutations instead)
    val dir = Files.createTempDirectory("scbf-cdcstream-mirror").toString
    val ckpt = Files.createTempDirectory("scbf-cdcstream-mirror-ckpt").toString
    enable(dir)
    spark.sql("DROP TABLE IF EXISTS cdcs_mirror")
    spark.sql(s"CREATE TABLE cdcs_mirror (id INT, v INT) USING scbf LOCATION '$dir'")
    // two pre-stream files (both backfilled via startingTimestamp=1),
    // so the DELETE below drops file 1 WHOLE (retained-bytes delete
    // rows) and rewrites file 2 PARTIALLY (materialized delete rows)
    writeWave(dir, 0, 100)
    writeWave(dir, 100, 150)
    val replica = scala.collection.mutable.HashMap.empty[Int, Int]
    val q = streamDF(dir, "startingTimestamp" -> "1")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.select($"id", $"v", col(ScbfCdc.ChangeTypeCol),
            col(ScbfCdc.CommitVersionCol))
          .as[(Int, Int, String, Int)].collect()
        replica.synchronized {
          rows.groupBy(_._4).toSeq.sortBy(_._1).foreach { case (_, commit) =>
            commit.foreach {
              case (id, _, "delete", _)            => replica.remove(id)
              case (id, v, "insert", _)            => replica(id) = v
              case (id, v, "update_post", _)       => replica(id) = v
              case (_, _, "update_pre", _)         => () // pre-image: no-op
              case other => sys.error(s"unexpected change row $other")
            }
          }
        }
        ()
      }.start()
    def sourceNow(): Map[Int, Int] =
      spark.sql("SELECT id, v FROM cdcs_mirror").as[(Int, Int)].collect().toMap
    try {
      q.processAllAvailable()
      assert(replica.synchronized(replica.toMap) == sourceNow())
      // file 1 (0..99) is provably all-match → dropped WHOLE; file 2
      // (100..149) rewrites partially — both delete paths stream
      spark.sql("DELETE FROM cdcs_mirror WHERE id < 120")
      writeWave(dir, 150, 200)
      q.processAllAvailable()
      assert(replica.synchronized(replica.toMap) == sourceNow())
      // API UPDATE: EXACT update_pre/update_post pairs stream through
      ScbfDelete.updateWhere(spark, dir, hconf,
        Array[org.apache.spark.sql.sources.Filter](
          org.apache.spark.sql.sources.GreaterThanOrEqual("id", 160)),
        Map("v" -> (col("v") * 2)))
      q.processAllAvailable()
      assert(replica.synchronized(replica.toMap) == sourceNow(),
        "replica must track the UPDATE exactly")
      assert(replica.synchronized(replica(180)) == 3600) // 180*10*2
    } finally q.stop()
  }

  test("cdcReconcileEvery: an injected bypassed file fails the stream within N triggers") {
    val dir = Files.createTempDirectory("scbf-cdcstream-rec").toString
    val ckpt = Files.createTempDirectory("scbf-cdcstream-rec-ckpt").toString
    enable(dir)
    spark.sql("DROP TABLE IF EXISTS cdcs_rec")
    spark.sql(s"CREATE TABLE cdcs_rec (id INT, v INT) USING scbf LOCATION '$dir'")
    writeWave(dir, 0, 10)
    // a producer writes AROUND the connector: raw bytes, never announced
    val foreignSrc = new Path(dir).getFileSystem(hconf)
      .listStatus(new Path(dir)).find(_.getPath.getName.endsWith(".scbf")).get.getPath
    val q = streamDF(dir, "cdcReconcileEvery" -> "2")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }.start()
    try {
      q.processAllAvailable()
      val fs = foreignSrc.getFileSystem(hconf)
      org.apache.hadoop.fs.FileUtil.copy(fs, foreignSrc, fs,
        new Path(dir, "bypassed-producer.scbf"), false, hconf)
      // every subsequent commit triggers a batch; within 2 triggers the
      // audit lists the table and refuses with the batch text
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        var i = 0
        while (i < 4) { // 4 commits = at least 2 audited triggers
          writeWave(dir, 100 + i * 10, 110 + i * 10)
          q.processAllAvailable()
          i += 1
        }
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains("bypassed") && msgs.contains("bypassed-producer.scbf"),
        msgs)
    } finally q.stop()
  }

  test("batch read with readChangeFeed refuses, naming TABLE CHANGES") {
    val dir = Files.createTempDirectory("scbf-cdcstream-batch").toString
    enable(dir)
    writeWave(dir, 0, 10)
    val e = intercept[Exception] {
      spark.read.format("scbf").option("readChangeFeed", "true").load(dir).count()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("TABLE CHANGES"), msgs)
  }

  test("column pruning serves a metadata-only projection without the CDC join shape") {
    val dir = Files.createTempDirectory("scbf-cdcstream-prune").toString
    val ckpt = Files.createTempDirectory("scbf-cdcstream-prune-ckpt").toString
    enable(dir)
    writeWave(dir, 0, 50)
    val counts = mutable.ArrayBuffer.empty[(String, Long)]
    // startingTimestamp=1: exclusive epoch start — everything streams
    val q = streamDF(dir, "startingTimestamp" -> "1")
      .groupBy(col(ScbfCdc.ChangeTypeCol)).count()
      .writeStream.outputMode("complete").option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        counts.synchronized {
          counts.clear()
          counts ++= df.as[(String, Long)].collect().toSeq
        }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(counts.toSeq == Seq(("insert", 50L)), s"got $counts")
  }
}
