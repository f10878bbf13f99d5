package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.tools.PlanningScale

/** The many-files planning invariants (VERDICT r5 item 1), pinned at a
 * CI-friendly 2000 files — graft.tools.PlanningScale runs the same
 * shapes at 10⁵ and records the wall-times in BENCH_NOTES.md. What
 * matters here is the IO SHAPE, which is what survives the scale-up:
 * planning reads ONE manifest, zero per-file sidecars, zero data
 * files; blooms are fetched only for stats-surviving files. */
class PlanningScaleSpec extends AnyFunSuite with SparkTestBase {

  private val N = 2000
  private val Rows = 10

  private lazy val dir: String = {
    val d = tmpDir("scbf-planscale")
    PlanningScale.generate(d, N, Rows)
    d
  }

  private def reset(): Unit = {
    ScbfStats.manifestReads.set(0)
    ScbfStats.sidecarReads.set(0)
    ScbfBloom.bloomReads.set(0)
    ScbfUtil.dataFileOpens.set(0)
  }

  private def plan(fs: Seq[Filter], runtime: Seq[Filter] = Nil): Int = {
    val conf = new Configuration()
    val files = ScbfDataSource.resolveFiles(Seq(dir), conf)
    val b = new ScbfScanBuilder(PlanningScale.schemaStruct, files, conf, Seq(dir))
    b.pushFilters(fs.toArray)
    val scan = b.build().asInstanceOf[ScbfScan]
    if (runtime.nonEmpty) scan.filter(runtime.toArray)
    reset()
    scan.planInputPartitions().length
  }

  test("filtered-scan planning: one manifest read, no sidecars, no data opens") {
    val kept = plan(Seq(GreaterThanOrEqual("id", 10000), LessThan("id", 10020)))
    assert(kept == 2, s"two 10-row files cover [10000,10020), planned $kept")
    assert(ScbfStats.manifestReads.get == 1, "exactly one manifest read")
    assert(ScbfStats.sidecarReads.get == 0, "manifest-covered files never fall back")
    assert(ScbfUtil.dataFileOpens.get == 0, "planning never opens data")
    assert(ScbfBloom.bloomReads.get == 0, "range filters never touch blooms")
  }

  test("runtime join pruning re-plans on the same metadata; blooms only for survivors") {
    val kept = plan(Nil, Seq(In("id", Array[Any](3, 9999, 19998))))
    assert(kept <= 3, s"at most one file per key, planned $kept")
    assert(ScbfStats.manifestReads.get == 1)
    assert(ScbfStats.sidecarReads.get == 0)
    assert(ScbfBloom.bloomReads.get <= 3, "one bloom per stats-surviving file")
    assert(ScbfUtil.dataFileOpens.get == 0)
  }

  test("top-k prunes to a file prefix; agg answers from the manifest") {
    val t = spark.read.format("scbf").load(dir)
    reset()
    val top = t.orderBy(col("id").desc).limit(7).collect()
    assert(top.map(_.getInt(0)).toSeq == (N * Rows - 7 until N * Rows).reverse)
    assert(ScbfUtil.dataFileOpens.get <= 2,
      s"top-7 over 10-row files needs 1 file (+1 guarantee slack), opened ${ScbfUtil.dataFileOpens.get}")
    reset()
    val agg = t.agg(count(lit(1)), min(col("id")), max(col("id")), sum(col("id"))).head()
    assert(agg.getLong(0) == N.toLong * Rows && agg.getInt(1) == 0 &&
      agg.getInt(2) == N * Rows - 1)
    assert(ScbfUtil.dataFileOpens.get == 0, "stats-answered aggregate opens no data")
    assert(ScbfStats.sidecarReads.get == 0)
  }

  test("estimateStatistics and planInputPartitions share ONE static prune per scan") {
    val conf = new Configuration()
    val files = ScbfDataSource.resolveFiles(Seq(dir), conf)
    val b = new ScbfScanBuilder(PlanningScale.schemaStruct, files, conf, Seq(dir))
    b.pushFilters(Array(EqualTo("id", 4242)))
    val scan = b.build().asInstanceOf[ScbfScan]
    reset()
    scan.estimateStatistics() // Catalyst may ask several times
    scan.estimateStatistics()
    val planned = scan.planInputPartitions().length
    assert(planned == 1)
    assert(ScbfStats.manifestReads.get == 1,
      s"one manifest read across stats+planning, got ${ScbfStats.manifestReads.get}")
    assert(ScbfBloom.bloomReads.get <= 1,
      s"the survivor's bloom fetches once, not per ask: ${ScbfBloom.bloomReads.get}")
  }

  test("partitioned layout: manifest reads == touched partitions, at fixture scale") {
    // the CI-sized twin of graft.tools.PlanningScalePartitioned (20 x
    // 5000 files, measured in BENCH_NOTES): partition pruning is path
    // arithmetic BEFORE any manifest load, so a partition-filtered
    // plan loads exactly the touched partitions' manifests — the
    // property that bounds per-query metadata IO on a 100 TB
    // partitioned table
    val parts = 8
    val fpp = 250
    val root = tmpDir("scbf-planscale-part")
    graft.tools.PlanningScalePartitioned.generate(root, parts, fpp, Rows)
    val conf = new Configuration()
    val files = ScbfDataSource.resolveFiles(Seq(root), conf)
    assert(files.size == parts * fpp)
    def planP(fs: Seq[Filter]): Int = {
      val b = new ScbfScanBuilder(
        graft.tools.PlanningScalePartitioned.schemaP, files, conf, Seq(root))
      b.pushFilters(fs.toArray)
      val scan = b.build().asInstanceOf[ScbfScan]
      reset()
      scan.planInputPartitions().length
    }
    // one partition touched → ONE manifest read
    assert(planP(Seq(EqualTo("pk", "p03"))) == fpp)
    assert(ScbfStats.manifestReads.get == 1,
      s"1-partition plan read ${ScbfStats.manifestReads.get} manifests")
    assert(ScbfStats.sidecarReads.get == 0 && ScbfUtil.dataFileOpens.get == 0)
    // two partitions touched → two
    assert(planP(Seq(In("pk", Array[Any]("p01", "p05")))) == 2 * fpp)
    assert(ScbfStats.manifestReads.get == 2,
      s"2-partition plan read ${ScbfStats.manifestReads.get} manifests")
    // partition + range: O(1) files, still one manifest
    val kept = planP(Seq(EqualTo("pk", "p03"),
      GreaterThanOrEqual("id", 100), LessThan("id", 100 + Rows)))
    assert(kept == 1, s"planned $kept")
    assert(ScbfStats.manifestReads.get == 1)
    // no partition filter: every partition's manifest loads, no more
    assert(planP(Seq(EqualTo("id", 777))) == parts)
    assert(ScbfStats.manifestReads.get == parts)
  }

  test("planning cost is in-memory after the manifest read (stays sub-second at 2k)") {
    // not a benchmark — a regression tripwire: if planning ever starts
    // doing per-file IO, 2000 files on local disk will blow way past this
    plan(Seq(EqualTo("id", 777))) // warm (manifest OS cache)
    val t0 = System.nanoTime()
    val kept = plan(Seq(EqualTo("id", 777)))
    val ms = (System.nanoTime() - t0) / 1e6
    assert(kept == 1)
    assert(ms < 1000.0, f"planning 2000 files took $ms%.0f ms — per-file IO crept in?")
  }
}
