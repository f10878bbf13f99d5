package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q34 re-executes q24's frame surface (lag, dense_rank, moving sum,
 * ntile, all partitioned by the 5-value o_orderpriority) with chunked
 * windows and boundary-fix summaries. Same output contract: every row
 * must match q24's naive-window result bit for bit — including chunk
 * boundaries, where the lag/mov3 cross chunks, dense ranks span
 * equal-value chunk edges, and ntile comes from arithmetic instead of
 * the built-in. */
class ScalableFramesSpec extends AnyFunSuite with SparkTestBase {

  private def rows(name: String, sf: String) =
    AdvancedQueries.queries(name)(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getDouble(3), r.getInt(4)))
      .sortBy(_._1)

  test("q34 chunked frames == q24 naive frames, bit for bit (sf0.001)") {
    val naive = rows("q24_window_frames", "/root/testdata/sf0.001")
    val chunked = rows("q34_scalable_frames", "/root/testdata/sf0.001")
    assert(chunked.length == naive.length)
    chunked.zip(naive).foreach { case (c, n) => assert(c == n, s"chunked=$c naive=$n") }
  }

  test("q34's heavy stage range-partitions and windows per chunk, not per priority") {
    // q34 localCheckpoints its window stages (pid pinning + single
    // materialization), which hides them behind LogicalRDDs in the
    // final plan — so assert the shape on the stage-A pipeline built
    // exactly as the query builds it (PrefixScanSpec's approach)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val staged = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"), col("o_totalprice"))
      .repartitionByRange(32, col("o_orderpriority"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("pid", expr("spark_partition_id()"))
      .withColumn("lrn", row_number().over(
        Window.partitionBy(col("pid"), col("o_orderpriority"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))))
    val plan = staged.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(plan.contains("windowspecdefinition(pid"),
      s"window must partition on the chunk id, not bare priority:\n$plan")
    val df = AdvancedQueries.queries("q34_scalable_frames")(spark, "/root/testdata/sf0.001")
    assert(df.columns.toSeq == Seq("o_orderkey", "lag_price", "drank", "mov3", "nt"))
  }
}
