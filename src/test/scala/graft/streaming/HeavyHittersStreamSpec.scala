package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** EventStreams.heavyHitters — q47's streaming twin: exact running
 * counts in one-long-per-key state, exactly-once threshold-crossing
 * emission, horizon-bounded state, parity with batch q47's heavy-key
 * set on the real table. */
class HeavyHittersStreamSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("a key emits exactly once, at the batch its count crosses the bar") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.KeyedRow]
    val q = EventStreams.heavyHitters(input.toDS(), minCount = 3)
      .writeStream.format("memory").queryName("hh_basic").outputMode("append").start()
    try {
      input.addData(EventStreams.KeyedRow(ts(0), "a"), EventStreams.KeyedRow(ts(0), "a"),
        EventStreams.KeyedRow(ts(0), "b"))
      q.processAllAvailable()
      assert(spark.table("hh_basic").isEmpty, "nobody crossed 3 yet")
      input.addData(EventStreams.KeyedRow(ts(1), "a"), EventStreams.KeyedRow(ts(1), "a"))
      q.processAllAvailable()
      val out1 = spark.table("hh_basic").as[EventStreams.HeavyHit].collect().toSet
      assert(out1 == Set(EventStreams.HeavyHit("a", 4)), s"got $out1")
      // further sightings of an already-emitted key emit nothing
      input.addData(EventStreams.KeyedRow(ts(2), "a"))
      q.processAllAvailable()
      assert(spark.table("hh_basic").count() == 1, "a key must emit exactly once")
    } finally q.stop()
  }

  test("single-batch emitted keys match batch q47's heavy set on the real table") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.01"
    val keys = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_partkey").cast("string").as("k")).as[String].collect()
    val input = MemoryStream[EventStreams.KeyedRow]
    val q = EventStreams.heavyHitters(input.toDS(), minCount = 40)
      .writeStream.format("memory").queryName("hh_parity").outputMode("append").start()
    try {
      input.addData(keys.map(k => EventStreams.KeyedRow(ts(0), k)).toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("hh_parity").as[EventStreams.HeavyHit].collect()
        .map(h => (h.key, h.count)).toMap
      val batch = graft.SparkEntry.queries("q47_heavy_hitters")(spark, sf)
        .select(col("part_key"), col("exact_cnt")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(streamed == batch,
        s"stream-batch: ${(streamed.toSet -- batch.toSet).take(3)}; " +
          s"batch-stream: ${(batch.toSet -- streamed.toSet).take(3)}")
    } finally q.stop()
  }

  test("idle key state expires with the watermark and re-counts from zero") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.KeyedRow]
    val q = EventStreams.heavyHitters(input.toDS(), minCount = 2, watermark = "10 minutes")
      .writeStream.format("memory").queryName("hh_horizon").outputMode("append").start()
    try {
      input.addData(EventStreams.KeyedRow(ts(0), "x"))
      q.processAllAvailable()
      // advance the watermark far past x's horizon
      input.addData(EventStreams.KeyedRow(ts(120), "y"))
      q.processAllAvailable()
      // x returns after expiry: its old count is gone, one sighting
      // does not cross the bar of 2
      input.addData(EventStreams.KeyedRow(ts(125), "x"))
      q.processAllAvailable()
      assert(spark.table("hh_horizon").isEmpty,
        "expired state must not contribute to the count")
    } finally q.stop()
  }
}
