package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{Filter, GreaterThanOrEqual}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The concurrent-append races against DELETE/UPDATE/OPTIMIZE, pinned
 * via the rewrite ops' test seams (the hooks fire exactly in the window
 * between a job's snapshot/scope listing and its rewrite):
 *
 *  - DELETE/UPDATE re-list after each round and FOLD IN files a
 *    concurrent append published mid-rewrite; a sustained storm fails
 *    loudly after bounded rounds instead of spinning.
 *  - OPTIMIZE (cluster/zorder) deletes exactly its snapshot at commit,
 *    so a mid-rewrite append SURVIVES — the listing-at-commit shape
 *    would have deleted a file whose rows were never read (data loss).
 */
class ConcurrentWriteSpec extends AnyFunSuite with SparkTestBase {

  private def writeRanged(dir: String): Unit =
    spark.range(0, 1000)
      .select(col("id").cast("int").as("id"),
        concat(lit("src_"), (col("id") % 4).cast("int")).as("source"))
      .repartitionByRange(4, col("id"))
      .write.format("scbf").mode("overwrite").save(dir)

  private def append(dir: String, from: Int, until: Int): Unit =
    spark.range(from, until)
      .select(col("id").cast("int").as("id"),
        concat(lit("src_"), (col("id") % 4).cast("int")).as("source"))
      .coalesce(1)
      .write.format("scbf").mode("append").save(dir)

  private def ids(dir: String): Set[Int] =
    spark.read.format("scbf").load(dir)
      .select("id").collect().map(_.getInt(0)).toSet

  test("DELETE folds in a file a concurrent append publishes mid-rewrite") {
    val dir = tmpDir("scbf-race-del")
    writeRanged(dir)
    var fired = false
    ScbfDelete.raceHook = () => if (!fired) { fired = true; append(dir, 2000, 2100) }
    try ScbfDelete.deleteWhere(spark, dir, new Configuration(),
      Array[Filter](GreaterThanOrEqual("id", 900)))
    finally ScbfDelete.raceHook = () => ()
    // rows >= 900 are gone from BOTH the original files and the
    // concurrently-appended one; surviving appended rows (none here:
    // 2000..2099 all match) and original survivors are intact
    assert(ids(dir) == (0 until 900).toSet,
      "concurrent append's in-scope rows must be folded into the delete")
  }

  test("UPDATE folds in a concurrent append; its non-matching rows pass through") {
    val dir = tmpDir("scbf-race-upd")
    writeRanged(dir)
    // the base table has in-scope rows (>= 950), so round 1 does real
    // work while the hook lands an append whose rows are ALSO in scope
    var fired = false
    ScbfDelete.raceHook = () => if (!fired) { fired = true; append(dir, 1500, 1600) }
    try ScbfDelete.updateWhere(spark, dir, new Configuration(),
      Array[Filter](GreaterThanOrEqual("id", 950)),
      Map("source" -> lit("redacted")))
    finally ScbfDelete.raceHook = () => ()
    val df = spark.read.format("scbf").load(dir)
    assert(df.count() == 1100, "update never changes row count")
    assert(df.filter(col("source") === "redacted").count() == 150,
      "base rows 950..999 AND all 100 appended rows are redacted")
    assert(df.filter(col("id") === 900 && col("source") === "redacted").count() == 0)
  }

  test("a no-op predicate serializes BEFORE a hook-time append (legal linearization)") {
    val dir = tmpDir("scbf-race-noop")
    writeRanged(dir)
    var fired = false
    ScbfDelete.raceHook = () => if (!fired) { fired = true; append(dir, 2000, 2010) }
    try ScbfDelete.deleteWhere(spark, dir, new Configuration(),
      Array[Filter](GreaterThanOrEqual("id", 2000)))
    finally ScbfDelete.raceHook = () => ()
    // round 1 saw nothing in scope and returned: the delete linearizes
    // before the append — the appended rows legitimately survive
    assert(ids(dir) == ((0 until 1000) ++ (2000 until 2010)).toSet)
  }

  test("a sustained in-scope append storm fails loudly after bounded rounds") {
    val dir = tmpDir("scbf-race-storm")
    writeRanged(dir)
    var n = 0
    ScbfDelete.raceHook = () => { n += 1; append(dir, 5000 + n * 100, 5000 + n * 100 + 10) }
    val ex = try intercept[graft.scbf.ScbfFormatException] {
      ScbfDelete.deleteWhere(spark, dir, new Configuration(),
        Array[Filter](GreaterThanOrEqual("id", 900)))
    } finally ScbfDelete.raceHook = () => ()
    assert(ex.getMessage.contains("concurrent appends"), ex.getMessage)
    // everything processed before giving up IS deleted — consistent state
    assert(!ids(dir).exists(id => id >= 900 && id < 1000),
      "rounds that ran must have completed their deletes")
  }

  test("OPTIMIZE cluster leaves a mid-rewrite append alive (snapshot-scoped commit)") {
    val dir = tmpDir("scbf-race-cluster")
    writeRanged(dir)
    var fired = false
    ScbfMaintenance.raceHook = () => if (!fired) { fired = true; append(dir, 3000, 3050) }
    try ScbfMaintenance.cluster(spark, dir, Seq("id"), 4)
    finally ScbfMaintenance.raceHook = () => ()
    assert(ids(dir) == ((0 until 1000) ++ (3000 until 3050)).toSet,
      "the concurrently-appended file must survive the rewrite commit")
    // and its stats entry survives in the manifest (merge path, not fresh)
    val man = ScbfStats.readManifest(new Path(dir), new Configuration())
    val live = ScbfDataSource.resolveFiles(Seq(dir), new Configuration())
      .map(_.getPath.getName).toSet
    assert(man.keySet.subsetOf(live), "manifest must hold only live files")
    assert(man.values.map(_.stats.rows).sum == 1050L,
      "manifest covers the clustered output AND the survivor append")
  }

  test("OPTIMIZE zorder is snapshot-scoped too") {
    val dir = tmpDir("scbf-race-zorder")
    spark.range(0, 2000)
      .select(col("id").cast("int").as("x"), (col("id") % 37).cast("int").as("y"))
      .repartition(4)
      .write.format("scbf").mode("overwrite").save(dir)
    var fired = false
    ScbfMaintenance.raceHook = () => if (!fired) {
      fired = true
      spark.range(9000, 9010)
        .select(col("id").cast("int").as("x"), lit(0).as("y"))
        .coalesce(1).write.format("scbf").mode("append").save(dir)
    }
    try ScbfMaintenance.zorder(spark, dir, Seq("x", "y"), 4)
    finally ScbfMaintenance.raceHook = () => ()
    val xs = spark.read.format("scbf").load(dir)
      .select("x").collect().map(_.getInt(0)).toSet
    assert(xs == ((0 until 2000) ++ (9000 until 9010)).toSet)
  }

  // ---- streaming sink vs maintenance ----

  /** One fully-committed streaming epoch appending `ids` into `dir`. */
  private def streamEpoch(dir: String, from: Int, until: Int): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Int]
    ms.addData(from until until: _*)
    val q = ms.toDF()
      .select(col("value").cast("int").as("id"),
        concat(lit("src_"), (col("value") % 4).cast("int")).as("source"))
      .writeStream.option("checkpointLocation", tmpDir("scbf-race-sckpt"))
      .format("scbf").start(dir)
    try q.processAllAvailable() finally q.stop()
  }

  test("a streaming epoch committing mid-rewrite survives OPTIMIZE (snapshot-scoped commit)") {
    val dir = tmpDir("scbf-race-epoch-mid")
    writeRanged(dir)
    // the hook fires between the rewrite's snapshot listing and its
    // commit — exactly where a live ingest's epoch would land
    var fired = false
    ScbfMaintenance.raceHook = () => if (!fired) { fired = true; streamEpoch(dir, 4000, 4050) }
    try ScbfMaintenance.cluster(spark, dir, Seq("id"), 4)
    finally ScbfMaintenance.raceHook = () => ()
    assert(ids(dir) == ((0 until 1000) ++ (4000 until 4050)).toSet,
      "the epoch's file must survive the rewrite commit")
    val man = ScbfStats.readManifest(new Path(dir), new Configuration())
    val live = ScbfDataSource.resolveFiles(Seq(dir), new Configuration())
      .map(_.getPath.getName).toSet
    assert(man.keySet.subsetOf(live), "manifest must hold only live files")
    assert(man.values.map(_.stats.rows).sum == 1050L,
      "manifest covers the clustered output AND the epoch's file")
  }

  test("OPTIMIZE completing mid-epoch (staged, unpublished) loses neither side") {
    val dir = tmpDir("scbf-race-mid-epoch")
    writeRanged(dir)
    // the hook fires at epoch-commit start: tasks have STAGED their
    // temps (invisible), nothing is published — the rewrite must not
    // sweep them (snapshot-scoped overwrites never sweep), and the
    // epoch's subsequent publication must land intact
    var fired = false
    ScbfWrite.epochCommitHook = () => if (!fired) {
      fired = true
      ScbfMaintenance.cluster(spark, dir, Seq("id"), 4)
    }
    try streamEpoch(dir, 6000, 6050)
    finally ScbfWrite.epochCommitHook = () => ()
    assert(fired, "hook never fired — the epoch committed nothing")
    assert(ids(dir) == ((0 until 1000) ++ (6000 until 6050)).toSet,
      "mid-epoch rewrite lost rows on one side")
    val man = ScbfStats.readManifest(new Path(dir), new Configuration())
    val live = ScbfDataSource.resolveFiles(Seq(dir), new Configuration())
      .map(_.getPath.getName).toSet
    assert(man.keySet.subsetOf(live), "manifest must hold only live files")
    assert(man.values.map(_.stats.rows).sum == 1050L,
      "the epoch's entries must fold into the rewrite's fresh manifest")
  }

  test("without a concurrent append, OPTIMIZE still rebuilds the manifest fresh") {
    val dir = tmpDir("scbf-race-none")
    writeRanged(dir)
    ScbfMaintenance.cluster(spark, dir, Seq("id"), 2)
    val man = ScbfStats.readManifest(new Path(dir), new Configuration())
    assert(man.size == 2 && man.values.map(_.stats.rows).sum == 1000L,
      s"fresh manifest for the 2 clustered files, got ${man.keySet}")
  }
}
