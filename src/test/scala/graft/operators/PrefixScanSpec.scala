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
