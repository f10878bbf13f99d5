package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * The runtime half of the skew story (the compile-time half is manual
 * salting — q6/d5/t6's salted top-k): a hot join key that would funnel
 * one shuffle partition through one task is split by AQE's
 * OptimizeSkewedJoin into multiple tasks at runtime, no query rewrite
 * required. This pins that the engine's config actually triggers it.
 */
class SkewJoinSpec extends AnyFunSuite with SparkTestBase {

  test("AQE splits a skewed shuffle-join partition at runtime") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256k",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force a shuffle join
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // ~95% of left rows share key 0 and carry a high-entropy payload
      // (md5 chains — skew detection reads COMPRESSED map-output sizes,
      // so a repetitive payload would deflate below the threshold):
      // one shuffle partition holds several MB while the rest are tiny
      val left = spark.range(0, 100000).select(
        when($"id" < 95000, 0L).otherwise($"id").as("k"),
        concat(md5($"id".cast("string")), md5(($"id" + 1).cast("string")),
          md5(($"id" + 2).cast("string")), md5(($"id" + 3).cast("string"))).as("payload"))
      val right = spark.range(0, 1000).select($"id".as("k"), ($"id" * 2).as("v"))
      // the aggregate must consume the payload, or column pruning strips
      // it before the shuffle and the hot partition drops below threshold
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("cnt"), sum(length($"payload")).as("bytes"))
      val Array(row) = joined.collect()
      // only the hot-key rows match (tail keys exceed the right range)
      assert(row.getLong(0) == 95000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the join as skew-handled:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
