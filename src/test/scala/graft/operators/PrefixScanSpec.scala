package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q32's distributed prefix scan must be bit-identical to the naive
 * single-partition global window it replaces — including the chunk
 * boundaries, where the lag crosses partitions and the running sum
 * switches from local to prefix+local. */
class PrefixScanSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("q32 chunked running window == naive global window, bit for bit") {
    val w = Window.orderBy(col("o_orderdate"), col("o_orderkey"))
    val naive = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"),
        coalesce(lag(col("o_totalprice"), 1).over(w), lit(-1.0)).as("lag_price"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double").as("run_sum"),
        row_number().over(w).cast("long").as("rn"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    val chunked = RelationalQueries.queries("q32_running_total")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    assert(chunked.length == naive.length)
    chunked.zip(naive).foreach { case (c, n) => assert(c == n) }
  }

  test("groupedPrefixSum: a single dominant group SPANS partitions and still sums exactly") {
    // the scale claim t14 rides on: one group holding (almost) every row
    // must spread over the range partitions, with the cross-partition
    // offset join stitching the running sum — not collapse into one task
    val df = spark.range(0, 20000)
      .select(
        org.apache.spark.sql.functions.when(col("id") < 19900, "big")
          .otherwise("small").as("grp"),
        col("id"), (col("id") % 7 + 1).as("v"))
    val got = Ops.groupedPrefixSum(df, "grp", Seq(col("id").asc), col("v"), "cum")
    // the dominant group really does span >1 chunk. Asserted on the
    // pre-checkpoint stage's __pid — the value the offset join actually
    // stitches on — because the checkpoint's LogicalRDD hides the
    // pipeline (and AQE may coalesce the tiny post-window shuffle, so
    // spark_partition_id() over the OUTPUT says nothing about spread)
    val stage = Ops.groupedPrefixSumStage(df, "grp", Seq(col("id").asc), col("v"))
    val spanned = stage.filter(col("grp") === "big")
      .select(col("__pid")).distinct().count()
    assert(spanned > 1, s"'big' sat in $spanned chunk(s) — the scan didn't spread")
    // and the stage is the claimed shape: range partition + per-chunk
    // window, never a window partitioned on the group alone
    val plan = stage.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      "expected a range-partition exchange feeding per-chunk windows")
    assert(plan.contains("windowspecdefinition(__pid"),
      s"expected the window keyed by (chunk, group), got:\n$plan")
    // exact per-group running sums vs an in-memory scan
    val rows = got.select("grp", "id", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      var cum = 0L
      rs.sortBy(_._2).foreach { case (_, id, c) =>
        cum += id % 7 + 1
        assert(c == cum, s"row $id")
      }
    }
  }

  test("q32's heavy stage range-partitions and windows per chunk (no full-table global window)") {
    // q32 localCheckpoints its per-row stage (the summary side must see
    // the same pid↔row mapping), which hides that stage behind a
    // LogicalRDD in the final executed plan — so assert the shape on
    // the stage-1 pipeline itself, built exactly as the query builds it
    val staged = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .repartitionByRange(32, col("o_orderdate"), col("o_orderkey"))
      .withColumn("pid", expr("spark_partition_id()"))
      .withColumn("lrn", row_number().over(
        Window.partitionBy(col("pid")).orderBy(col("o_orderdate"), col("o_orderkey"))))
    val plan = staged.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      "expected a range-partition exchange feeding per-chunk windows")
    assert(plan.contains("windowspecdefinition(pid"),
      s"expected the window partitioned by chunk id, got:\n$plan")
  }
}
