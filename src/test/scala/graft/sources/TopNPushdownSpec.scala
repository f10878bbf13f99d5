package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Top-k file pruning (SupportsPushDownTopN, partial): ORDER BY col
 * LIMIT k plans only files that can hold one of the k extreme rows,
 * using the bound-B argument in ScbfTopN. Spark keeps its Sort+Limit,
 * so results are exact no matter how much (or little) prunes. */
class TopNPushdownSpec extends AnyFunSuite with SparkTestBase {

  private def writeRanged(dir: String): Unit = {
    spark.range(0, 1000)
      .select(col("id").cast("int").as("id"), (col("id") * 2.5).as("score"),
        concat(lit("row"), col("id")).as("tag"))
      .repartitionByRange(4, col("id"))
      .write.format("scbf").mode("overwrite").save(dir)
  }

  test("orderBy asc limit plans one range file; desc plans the other end") {
    val dir = tmpDir("scbf-topn")
    writeRanged(dir)
    val asc = spark.read.format("scbf").load(dir).orderBy(col("id")).limit(10)
    ScbfUtil.dataFileOpens.set(0)
    assert(asc.collect().map(_.getInt(0)).toSeq == (0 until 10))
    assert(ScbfUtil.dataFileOpens.get == 1,
      s"asc top-10 should open 1 of 4 files, opened ${ScbfUtil.dataFileOpens.get}")
    assert(asc.queryExecution.executedPlan.toString.contains("PushedTopN"))
    val desc = spark.read.format("scbf").load(dir)
      .orderBy(col("score").desc).limit(5)
    ScbfUtil.dataFileOpens.set(0)
    assert(desc.collect().map(_.getDouble(1)).toSeq ==
      (999 to 995 by -1).map(_ * 2.5))
    assert(ScbfUtil.dataFileOpens.get == 1,
      s"desc top-5 should open 1 of 4 files, opened ${ScbfUtil.dataFileOpens.get}")
  }

  test("string order prunes through truncated bounds (overlapping byte ranges)") {
    val dir = tmpDir("scbf-topn-str")
    writeRanged(dir)
    // byte order of "rowN" interleaves across the id-ranged files:
    // file0 spans [row0,row99], file1 [row250,row499] — "row99" > "row499",
    // so B lands on file1's max and files 2-3 (lo row500/row750 > B) prune
    val q = spark.read.format("scbf").load(dir).orderBy(col("tag")).limit(5)
    ScbfUtil.dataFileOpens.set(0)
    val got = q.collect().map(_.getString(2)).toSeq
    assert(got == Seq("row0", "row1", "row10", "row100", "row101"))
    assert(ScbfUtil.dataFileOpens.get == 2,
      s"byte-range overlap admits files 0+1 only, opened ${ScbfUtil.dataFileOpens.get}")
  }

  test("k spanning several files keeps exactly the provable candidates") {
    val dir = tmpDir("scbf-topn-span")
    writeRanged(dir)
    val q = spark.read.format("scbf").load(dir).orderBy(col("id")).limit(300)
    ScbfUtil.dataFileOpens.set(0)
    val got = q.collect().map(_.getInt(0)).toSeq
    assert(got == (0 until 300))
    assert(ScbfUtil.dataFileOpens.get == 2,
      s"top-300 needs files 0+1 (250+250 rows), opened ${ScbfUtil.dataFileOpens.get}")
  }

  test("missing stats keep every file and the answer stays exact") {
    val dir = tmpDir("scbf-topn-nostats")
    writeRanged(dir)
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    fs.delete(ScbfStats.manifestPath(p), false)
    fs.listStatus(p).filter(_.getPath.getName.endsWith(".stats"))
      .foreach(f => fs.delete(f.getPath, false))
    val q = spark.read.format("scbf").load(dir).orderBy(col("id").desc).limit(3)
    ScbfUtil.dataFileOpens.set(0)
    assert(q.collect().map(_.getInt(0)).toSeq == Seq(999, 998, 997))
    assert(ScbfUtil.dataFileOpens.get == 4, "no stats → nothing provable → all plan")
  }

  test("a second sort key rides along: first-key bound stays sound") {
    val dir = tmpDir("scbf-topn-2key")
    writeRanged(dir)
    val q = spark.read.format("scbf").load(dir)
      .orderBy(col("id"), col("score").desc).limit(7)
    ScbfUtil.dataFileOpens.set(0)
    assert(q.collect().map(_.getInt(0)).toSeq == (0 until 7))
    assert(ScbfUtil.dataFileOpens.get == 1)
  }
}
