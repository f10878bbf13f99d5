package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Runtime (join-driven) file pruning — Spark's dynamic partition
 * pruning flowing into the SCBF scan via SupportsRuntimeFiltering: a
 * broadcast join's build-side keys arrive at execution as an In filter
 * and prune fact files through the same stats machinery as static
 * filters. Best-effort by construction (the join re-verifies rows), so
 * results never depend on it. */
class RuntimeFilterSpec extends AnyFunSuite with SparkTestBase {

  private def writeFact(dir: String): Unit = {
    // 4 files with disjoint id ranges — the layout where join-key
    // pruning pays: each dim-key set intersects few files
    spark.range(0, 1000)
      .select(col("id").cast("int").as("id"), (col("id") * 2.5).as("amount"))
      .repartitionByRange(4, col("id"))
      .write.format("scbf").mode("overwrite").save(dir)
  }

  // Dim filtered on a NON-key column (grp) so Catalyst cannot statically
  // infer a fact-side key predicate (InferFiltersFromConstraints would
  // turn a `k < 10` dim filter into a static `id < 10` fact filter and
  // the test would measure ordinary pushdown, not runtime pruning).
  // grp = k/10, so grp = 0 keeps exactly keys 0..9 — all in file 0.
  private def dimGrp0 = spark.range(0, 1000)
    .select(col("id").cast("int").as("k"), (col("id") / 10).cast("int").as("grp"))
    .filter(col("grp") === 0).select("k")

  test("a broadcast join's keys prune fact files at execution") {
    val dir = tmpDir("scbf-dpp")
    writeFact(dir)
    val fact = spark.read.format("scbf").load(dir)
    val dim = dimGrp0
    val joined = fact.join(broadcast(dim), fact("id") === dim("k"))
      .agg(count(lit(1)).as("cnt"), sum(col("amount")).as("s"))
    ScbfUtil.dataFileOpens.set(0)
    val row = joined.head()
    assert(row.getLong(0) == 10L)
    assert(row.getDouble(1) == (0 until 10).map(_ * 2.5).sum)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic pruning subquery on the scbf scan:\n$plan")
    assert(ScbfUtil.dataFileOpens.get == 1,
      s"runtime filter should open 1 of 4 fact files, opened ${ScbfUtil.dataFileOpens.get}")
  }

  test("disabling DPP opens every file but returns the identical answer") {
    val dir = tmpDir("scbf-dpp-off")
    writeFact(dir)
    val dim = dimGrp0
    def run(): (Long, Long) = {
      val fact = spark.read.format("scbf").load(dir)
      val joined = fact.join(broadcast(dim), fact("id") === dim("k"))
        .agg(count(lit(1)).as("cnt"))
      ScbfUtil.dataFileOpens.set(0)
      val cnt = joined.head().getLong(0)
      (cnt, ScbfUtil.dataFileOpens.get)
    }
    val (prunedCnt, prunedOpens) = run()
    val key = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    spark.conf.set(key, "false")
    try {
      val (fullCnt, fullOpens) = run()
      assert(prunedCnt == fullCnt)
      assert(prunedOpens == 1 && fullOpens == 4,
        s"pruned=$prunedOpens full=$fullOpens")
    } finally spark.conf.set(key, "true")
  }

  test("runtime join keys prune an UNCLUSTERED fact via bloom sidecars") {
    // round-robin fact: every file spans the whole id range, so the
    // interval stats the other cases rely on can prune NOTHING here —
    // the runtime In filter must flow into the per-file blooms
    // (ScbfStats.Pruner's second stage) to skip anything at all. This
    // is the 100 TB point-lookup-join story for ingest-ordered data
    // that no OPTIMIZE pass has clustered yet.
    val dir = tmpDir("scbf-dpp-bloom")
    spark.range(0, 1000)
      .select(col("id").cast("int").as("id"), (col("id") * 2.5).as("amount"))
      .repartition(4)
      .write.format("scbf").mode("overwrite").save(dir)
    val fact = spark.read.format("scbf").load(dir)
    // non-key dim predicate (tag) keeping exactly k = 500, so Catalyst
    // cannot infer a static fact predicate
    val dim = spark.range(0, 1000)
      .select(col("id").cast("int").as("k"),
        concat(lit("t"), col("id")).as("tag"))
      .filter(col("tag") === "t500").select("k")
    val joined = fact.join(broadcast(dim), fact("id") === dim("k"))
    ScbfUtil.dataFileOpens.set(0)
    val rows = joined.select("id", "amount").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(500))
    assert(rows.head.getDouble(1) == 1250.0)
    // exactly the one file holding id=500 (a ~1%-probability bloom
    // false positive would open a second file — deterministic for this
    // fixed dataset, and this run has none)
    assert(ScbfUtil.dataFileOpens.get == 1,
      s"bloom should prune the unclustered fact to 1 of 4 files, " +
        s"opened ${ScbfUtil.dataFileOpens.get}")
  }

  test("runtime filters combine with static pushed filters conjunctively") {
    val dir = tmpDir("scbf-dpp-static")
    writeFact(dir)
    val fact = spark.read.format("scbf").load(dir)
      .filter(col("id") < 500) // static: files 0-1 of 4
    // non-key dim predicate keeping keys 253..263 → file 1 only at runtime
    val dim = spark.range(0, 1000)
      .select(col("id").cast("int").as("k"), (col("id") / 11).cast("int").as("grp"))
      .filter(col("grp") === 23).select("k")
    val joined = fact.join(broadcast(dim), fact("id") === dim("k"))
    ScbfUtil.dataFileOpens.set(0)
    assert(joined.count() == 11)
    assert(ScbfUtil.dataFileOpens.get == 1,
      "static (id<500) ∧ runtime (250..260 keys) should plan exactly one file")
  }
}
