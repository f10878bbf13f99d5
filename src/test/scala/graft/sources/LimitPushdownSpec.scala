package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Partial LIMIT pushdown: planning keeps only a prefix of the file
 * list whose stats already guarantee the limit's rows. Spark retains
 * its own limit operator (isPartiallyPushed), so extra planned files or
 * rows are always safe — stats only ever REDUCE IO. */
class LimitPushdownSpec extends AnyFunSuite with SparkTestBase {

  private def writeRanged(dir: String): Unit = {
    spark.range(0, 1000)
      .select(col("id").cast("int").as("id"), (col("id") * 2.5).as("score"))
      .repartitionByRange(4, col("id"))
      .write.format("scbf").mode("overwrite").save(dir)
  }

  private def planned(dir: String, limit: Int): Int = {
    val conf = new Configuration()
    val files = ScbfDataSource.resolveFiles(Seq(dir), conf)
    val b = new ScbfScanBuilder(
      spark.read.format("scbf").load(dir).schema, files, conf)
    assert(b.pushLimit(limit) && b.isPartiallyPushed())
    b.build().asInstanceOf[ScbfScan].planInputPartitions().length
  }

  test("limit plans the shortest file prefix guaranteeing enough rows") {
    val dir = tmpDir("scbf-limit")
    writeRanged(dir) // 4 files × 250 rows
    assert(planned(dir, 10) == 1)
    assert(planned(dir, 250) == 1)
    assert(planned(dir, 251) == 2)
    assert(planned(dir, 600) == 3)
    assert(planned(dir, 5000) == 4, "limit above the table keeps everything")
  }

  test("df.limit over many files opens few and returns exact rows") {
    val dir = tmpDir("scbf-limit-e2e")
    writeRanged(dir)
    val q = spark.read.format("scbf").load(dir).limit(10)
    ScbfUtil.dataFileOpens.set(0)
    assert(q.count() == 10)
    assert(ScbfUtil.dataFileOpens.get == 1,
      s"limit(10) should open 1 of 4 files, opened ${ScbfUtil.dataFileOpens.get}")
    assert(q.queryExecution.executedPlan.toString.contains("PushedLimit"),
      "explain must surface the pushed limit")
  }

  test("files without trusted stats still plan: the limit can only over-deliver") {
    val dir = tmpDir("scbf-limit-nostats")
    writeRanged(dir)
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    fs.delete(ScbfStats.manifestPath(p), false)
    fs.listStatus(p).filter(_.getPath.getName.endsWith(".stats"))
      .foreach(f => fs.delete(f.getPath, false))
    // nothing guarantees rows any more → every file plans, rows exact
    assert(planned(dir, 10) == 4)
    assert(spark.read.format("scbf").load(dir).limit(10).count() == 10)
  }

  test("a filtered query never carries a pushed limit (filters are residual)") {
    val dir = tmpDir("scbf-limit-filter")
    writeRanged(dir)
    val q = spark.read.format("scbf").load(dir)
      .filter(col("id") >= 990).limit(5)
    assert(!q.queryExecution.executedPlan.toString.contains("PushedLimit"),
      "Catalyst must not push a limit past a residual filter")
    assert(q.count() == 5)
    // and if it ever did, the scan-side guard ignores the limit when
    // filters are pushed — asserted directly
    val conf = new Configuration()
    val files = ScbfDataSource.resolveFiles(Seq(dir), conf)
    val b = new ScbfScanBuilder(
      spark.read.format("scbf").load(dir).schema, files, conf)
    b.pushFilters(Array(org.apache.spark.sql.sources.GreaterThanOrEqual("id", 990)))
    b.pushLimit(1)
    // id >= 990 admits only the last file; the limit must NOT truncate
    // the prefix to the (mismatching) first file
    val parts = b.build().asInstanceOf[ScbfScan].planInputPartitions()
    assert(parts.length == 1)
  }
}
