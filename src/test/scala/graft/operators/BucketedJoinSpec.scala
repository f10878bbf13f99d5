package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * The co-located join story for 100 TB: pre-bucketing both join sides on
 * the key removes the per-query shuffle entirely — the sort-merge join
 * reads bucket files pairwise. This spec proves the plan shape: same
 * join WITH bucketing has no hash-partitioning exchange; without it,
 * both sides shuffle.
 */
class BucketedJoinSpec extends AnyFunSuite with SparkTestBase {

  test("bucketed tables join without a shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      spark.read.parquet(s"$sf/orders.parquet")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_b")
      spark.read.parquet(s"$sf/customer.parquet")
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("customer_b")

      val bucketed = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("cnt"))
      bucketed.collect()
      val bucketedPlan = bucketed.queryExecution.executedPlan.toString
      assert(bucketedPlan.contains("SortMergeJoin"), bucketedPlan)
      assert(!bucketedPlan.contains("Exchange hashpartitioning(o_custkey"),
        s"bucketed join still shuffles the orders side:\n$bucketedPlan")
      assert(!bucketedPlan.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join still shuffles the customer side:\n$bucketedPlan")

      // control: the same join over raw parquet must shuffle both sides
      val unbucketed = spark.read.parquet(s"$sf/orders.parquet")
        .join(spark.read.parquet(s"$sf/customer.parquet"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("cnt"))
      unbucketed.collect()
      val rawPlan = unbucketed.queryExecution.executedPlan.toString
      assert(rawPlan.contains("Exchange hashpartitioning"), rawPlan)

      // and of course the answers agree
      assert(bucketed.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
        unbucketed.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
