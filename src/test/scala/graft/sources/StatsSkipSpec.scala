package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThan, LessThan}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** File-skipping via stats sidecars: batch writes publish per-file
 * numeric min/max next to each .scbf file; a scan with pushed filters
 * plans only files whose stats admit matches. Filters always re-apply
 * row-level (pushFilters returns everything as residual), so results
 * are identical with sidecars present, absent, or corrupt. */
class StatsSkipSpec extends AnyFunSuite with SparkTestBase {

  private def writeRanged(dir: String): Unit = {
    // range-partition on id → files with disjoint id ranges, the layout
    // a time/id-ordered ingest produces naturally
    spark.range(0, 1000)
      .select(col("id").cast("int").as("id"),
        (col("id") * 2.5).as("score"),
        concat(lit("row"), col("id")).as("tag"))
      .repartitionByRange(4, col("id"))
      .write.format("scbf").mode("overwrite").save(dir)
  }

  private def scbfFiles(dir: String): Seq[Path] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    fs.listStatus(p).toSeq.map(_.getPath)
      .filter(x => x.getName.endsWith(".scbf") && !x.getName.startsWith("."))
  }

  test("sidecars record exact per-file min/max for numeric columns only") {
    val dir = java.nio.file.Files.createTempDirectory("scbf-stats").toString
    writeRanged(dir)
    val conf = new Configuration()
    val all = scbfFiles(dir)
    assert(all.size == 4)
    all.foreach { f =>
      val st = ScbfStats.read(f, conf)
        .getOrElse(fail(s"missing sidecar for $f"))
      val rows = spark.read.format("scbf").load(f.toString)
        .select(min("id"), max("id"), min("score"), max("score"), count(lit(1)))
        .head()
      assert(st.cols("id") == ScbfStats.ColRange(rows.getInt(0), rows.getInt(1)))
      assert(st.cols("score") == ScbfStats.ColRange(rows.getDouble(2), rows.getDouble(3)))
      assert(st.rows == rows.getLong(4))
      assert(!st.cols.contains("tag"), "utf8 columns carry no stats")
    }
  }

  test("a 0-row placeholder file is skippable under any filter") {
    assert(!ScbfStats.mayMatch(Seq(EqualTo("id", 5)), ScbfStats.FileStats(0, Map.empty)))
    assert(ScbfStats.mayMatch(Seq(EqualTo("id", 5)),
      ScbfStats.FileStats(1, Map.empty)), "no stats for the column → must keep")
  }

  test("a filtered scan plans only the files whose stats admit matches") {
    val dir = java.nio.file.Files.createTempDirectory("scbf-skip").toString
    writeRanged(dir)
    val conf = new Configuration()
    val files = ScbfDataSource.resolveFiles(Seq(dir), conf)
    def planned(filters: org.apache.spark.sql.sources.Filter*): Int = {
      val b = new ScbfScanBuilder(
        spark.read.format("scbf").load(dir).schema, files, conf)
      b.pushFilters(filters.toArray)
      b.build().asInstanceOf[ScbfScan].planInputPartitions().length
    }
    assert(planned() == 4)
    assert(planned(EqualTo("id", 10)) == 1, "point lookup → one range file")
    assert(planned(LessThan("id", 250)) == 1)
    assert(planned(GreaterThan("score", 1250.0)) == 2)
    assert(planned(EqualTo("id", 100000)) == 0, "out of range → nothing planned")
    assert(planned(EqualTo("tag", "row5")) == 4, "no stats column → no skipping")
  }

  test("query results are identical with sidecars present or deleted; explain shows pushed filters") {
    val dir = java.nio.file.Files.createTempDirectory("scbf-skip-e2e").toString
    writeRanged(dir)
    val q = spark.read.format("scbf").load(dir).filter(col("id") < 100)
    assert(q.queryExecution.executedPlan.toString.contains("PushedFilters"),
      "scan description must surface the pushed filters for .explain")
    val withStats = q.collect().map(_.getInt(0)).sorted
    assert(withStats.toSeq == (0 until 100).toSeq)
    // delete every sidecar: skipping disabled, same rows
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    fs.listStatus(p).filter(_.getPath.getName.endsWith(".stats"))
      .foreach(f => fs.delete(f.getPath, false))
    val without = spark.read.format("scbf").load(dir)
      .filter(col("id") < 100).collect().map(_.getInt(0)).sorted
    assert(without.toSeq == withStats.toSeq)
  }

  test("a corrupt sidecar disables skipping but never breaks the read") {
    val dir = java.nio.file.Files.createTempDirectory("scbf-skip-corrupt").toString
    writeRanged(dir)
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    fs.listStatus(p).filter(_.getPath.getName.endsWith(".stats")).foreach { f =>
      val out = fs.create(f.getPath, true)
      out.write("not a stats file".getBytes("UTF-8")); out.close()
    }
    val rows = spark.read.format("scbf").load(dir)
      .filter(col("id") === 500).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(500))
  }

  test("a streaming backfill read prunes files through the same pushed filters") {
    val dir = java.nio.file.Files.createTempDirectory("scbf-skip-stream").toString
    writeRanged(dir)
    val conf = new Configuration()
    val files = ScbfDataSource.resolveFiles(Seq(dir), conf)
    val schema = spark.read.format("scbf").load(dir).schema
    def planned(filters: org.apache.spark.sql.sources.Filter*): Int = {
      val ckpt = java.nio.file.Files.createTempDirectory("scbf-skip-ck").toString
      val b = new ScbfScanBuilder(schema, files, conf, tablePaths = Seq(dir))
      b.pushFilters(filters.toArray)
      val ms = b.build().asInstanceOf[ScbfScan].toMicroBatchStream(ckpt)
        .asInstanceOf[ScbfMicroBatchStream]
      val st = ms.initialOffset()
      val en = ms.latestOffset(st,
        org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
      ms.planInputPartitions(st, en).length
    }
    assert(planned() == 4)
    assert(planned(LessThan("id", 250)) == 1,
      "streaming backfill must prune like the batch scan")
    // e2e: the filtered streaming read returns exactly the batch answer
    val ckpt = java.nio.file.Files.createTempDirectory("scbf-skip-ck2").toString
    val got = scala.collection.mutable.ArrayBuffer.empty[Int]
    val q = spark.readStream.format("scbf").schema(schema).load(dir)
      .filter(col("id") < 250)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= df.select("id").collect().map(_.getInt(0)) }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(got.sorted.toSeq == (0 until 250).toSeq)
  }

  test("overwrite replaces stale sidecars with the new files' stats") {
    val dir = java.nio.file.Files.createTempDirectory("scbf-skip-ow").toString
    writeRanged(dir)
    // overwrite with a different id range: stale sidecars must not
    // survive to mis-skip the new data
    spark.range(5000, 5100)
      .select(col("id").cast("int").as("id"),
        (col("id") * 2.5).as("score"),
        concat(lit("row"), col("id")).as("tag"))
      .repartitionByRange(2, col("id"))
      .write.format("scbf").mode("overwrite").save(dir)
    val got = spark.read.format("scbf").load(dir)
      .filter(col("id") >= 5050).collect().map(_.getInt(0)).sorted
    assert(got.toSeq == (5050 until 5100).toSeq)
    val conf = new Configuration()
    scbfFiles(dir).foreach { f =>
      val st = ScbfStats.read(f, conf).getOrElse(fail(s"missing sidecar for $f"))
      assert(st.cols("id").min >= 5000.0, s"stale stats on $f")
    }
  }
}
