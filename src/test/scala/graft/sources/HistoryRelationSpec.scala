package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * The distributed history relation (`history=entries` batch read):
 * one row per discovery-log entry, parsed executor-side with one
 * input partition per delta — the scale-out complement to the
 * `DESCRIBE HISTORY` driver command.
 *
 * Pins: raw-entry parity with the command after the documented
 * first-per-name dedup (across appends, removals, rewrites AND a real
 * compaction fold's verbatim copies), one partition per delta,
 * ordinary Spark aggregation on top, and the refusal surface (bogus
 * option value, combination with asOf/changesSince, no-log
 * directories, streams).
 */
class HistoryRelationSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def hconf = spark.sessionState.newHadoopConf()

  private def writeWave(dir: String, from: Int, until: Int): Unit =
    (from until until).map(i => (i, i * 0.5)).toDF("id", "v")
      .coalesce(1).write.format("scbf").mode("append").save(dir)

  private def hist(dir: String) =
    spark.read.format("scbf").option("history", "entries").load(dir)

  test("first-per-name dedup over raw entries reproduces DESCRIBE HISTORY, across DELETE/OPTIMIZE/fold") {
    val dir = tmpDir("scbf-histrel")
    spark.sql("DROP TABLE IF EXISTS histrel_t")
    new Path(dir).getFileSystem(hconf).delete(new Path(dir), true)
    try {
      spark.sql(s"CREATE TABLE histrel_t (id INT, v DOUBLE) USING scbf LOCATION '$dir'")
      spark.sql("INSERT INTO histrel_t SELECT /*+ COALESCE(1) */ CAST(id AS INT), id * 0.5 FROM range(0, 100)")
      spark.sql("INSERT INTO histrel_t SELECT /*+ COALESCE(1) */ CAST(id AS INT), id * 0.5 FROM range(100, 200)")
      spark.sql("DELETE FROM histrel_t WHERE id >= 150") // copy-on-write rewrite
      spark.sql("OPTIMIZE histrel_t")                    // pure compaction
      // force a FOLD: synthetic commits past the compaction threshold,
      // through the production append (verbatim re-announcement is the
      // raw relation's one duplication source — the dedup must absorb it)
      val qroot = new Path(dir).getFileSystem(hconf).makeQualified(new Path(dir))
      (0 until ScbfDiscovery.CompactThreshold + 3).foreach { i =>
        ScbfDiscovery.append(qroot, hconf, Seq(ScbfDiscovery.Entry(
          f"synthetic-$i%03d.scbf", 100L, System.currentTimeMillis())))
      }
      val raw = hist(dir)
      assert(raw.where($"is_fold").count() > 0, "a fold must be present")
      // documented dedup: first announcement per name
      val viaRelation = raw.groupBy($"file")
        .agg(min($"ts").as("ts"), min_by($"action", $"ts").as("action"),
          min_by($"len", $"ts").as("len"),
          min_by($"rows_changed", $"ts").as("rows_changed"),
          min_by($"rewrite_of", $"ts").as("rewrite_of"))
        .select($"ts", $"action", $"file", $"len", $"rows_changed", $"rewrite_of")
        .collect().map(_.toString).sorted
      val viaCommand = spark.sql("DESCRIBE HISTORY histrel_t")
        .collect().map(_.toString).sorted
      assert(viaRelation.toSeq == viaCommand.toSeq,
        s"relation dedup must equal the command:\n${viaRelation.take(3).mkString("\n")}\nvs\n${viaCommand.take(3).mkString("\n")}")
      // one input partition per delta; ordinary aggregation on top
      assert(raw.rdd.getNumPartitions ==
        ScbfDiscovery.commitChain(qroot, hconf).size)
      val acts = raw.groupBy($"action").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(acts.keySet == Set("append", "rewrite", "remove") ||
        acts.keySet == Set("append", "rewrite"), acts.toString)
    } finally spark.sql("DROP TABLE IF EXISTS histrel_t")
  }

  test("a large fold plans byte-range splits that reproduce the unsplit rows exactly") {
    val dir = tmpDir("scbf-histsplit")
    val p = new Path(dir)
    val qroot = p.getFileSystem(hconf).makeQualified(p)
    // enough synthetic commits to fold, then a few live deltas on top
    (0 until ScbfDiscovery.CompactThreshold + 5).foreach { i =>
      ScbfDiscovery.append(qroot, hconf, Seq(ScbfDiscovery.Entry(
        f"split-$i%05d.scbf", 10L + i, System.currentTimeMillis())))
    }
    val chain = ScbfDiscovery.commitChain(qroot, hconf)
    assert(chain.exists(ScbfDiscovery.isFold), s"expected a fold in $chain")
    val unsplit = hist(dir).collect().map(_.toString).sorted.toSeq
    val before = ScbfHistoryRead.splitBytes
    try {
      ScbfHistoryRead.splitBytes = 256L // force many byte-range splits
      val df = hist(dir)
      assert(df.rdd.getNumPartitions > chain.size,
        s"the fold must plan >1 partition: ${df.rdd.getNumPartitions} vs ${chain.size}")
      // the TextInputFormat discipline: every line served exactly once
      assert(df.collect().map(_.toString).sorted.toSeq == unsplit)
      // aggregation parity over the split read
      assert(df.groupBy($"action").count().where($"action" === "append")
        .head().getLong(1) >= (ScbfDiscovery.CompactThreshold + 5).toLong)
    } finally ScbfHistoryRead.splitBytes = before
  }

  test("misuse refuses loudly: bogus value, combination with table reads, no log, streams") {
    val dir = tmpDir("scbf-histrel-misuse")
    writeWave(dir, 0, 10)
    val e1 = intercept[Exception] {
      spark.read.format("scbf").option("history", "bogus").load(dir)
    }
    assert(e1.getMessage.contains("only 'entries'"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.read.format("scbf").option("history", "entries")
        .option("asOfTimestamp", 1L).load(dir).count()
    }
    assert(e2.getMessage.contains("its own relation"), e2.getMessage)
    // ...the UNTIL spellings too (silently ignoring a bound the user
    // set would serve the full log as if it were bounded)
    val e2b = intercept[Exception] {
      spark.read.format("scbf").option("history", "entries")
        .option("changesUntilVersion", 5).load(dir).count()
    }
    assert(e2b.getMessage.contains("its own relation"), e2b.getMessage)
    // a fresh SHALLOW CLONE names the clone contract, not the generic
    // foreign-directory error
    val cl = tmpDir("scbf-histrel-clone")
    val cfs = new Path(cl).getFileSystem(hconf)
    cfs.delete(new Path(cl), true)
    val src = new Path(dir)
    ScbfClone.write(new Path(cl), hconf,
      src.getFileSystem(hconf).makeQualified(src),
      ScbfDataSource.resolveFiles(Seq(dir), hconf))
    val eCl = intercept[Exception] { hist(cl).count() }
    assert(eCl.getMessage.contains("SHALLOW CLONE"), eCl.getMessage)
    // a catalog-table read refuses (the relation's output is the DATA
    // schema — the path spelling is the supported one)
    val cdir = tmpDir("scbf-histrel-cat")
    spark.sql("DROP TABLE IF EXISTS histrel_cat")
    new Path(cdir).getFileSystem(hconf).delete(new Path(cdir), true)
    try {
      spark.sql(s"CREATE TABLE histrel_cat (id INT, v DOUBLE) USING scbf LOCATION '$cdir'")
      spark.sql("INSERT INTO histrel_cat VALUES (1, 1.0)")
      val eCat = intercept[Exception] {
        spark.read.option("history", "entries").table("histrel_cat").count()
      }
      assert(eCat.getMessage.contains("PATH read"), eCat.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS histrel_cat")
    val bare = tmpDir("scbf-histrel-bare")
    writeWave(bare, 0, 5)
    val fs = new Path(bare).getFileSystem(hconf)
    fs.delete(ScbfDiscovery.dir(new Path(bare)), true)
    val e3 = intercept[Exception] { hist(bare).count() }
    assert(e3.getMessage.contains("no discovery log"), e3.getMessage)
    val q = spark.readStream.format("scbf").schema(ScbfHistoryRead.schema)
      .option("history", "entries").load(dir)
      .writeStream.format("noop").start()
    val e4 = intercept[Exception] { try q.processAllAvailable() finally q.stop() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e4).exists(_.contains("batch-only")), messages(e4).toString)
  }
}
