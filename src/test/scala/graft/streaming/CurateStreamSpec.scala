package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** EventStreams.curateDocs — the streaming twin of t13: per-row
 * language/quality/PII signals plus a horizon-bounded first-arrival
 * dup gate, verdicts in batch t13's rule order. */
class CurateStreamSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("single-batch verdicts match batch t13 value-for-value") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val docs = graft.operators.DedupQueries.corpus(spark, sf)
      .as[(Long, String)].collect()
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.curateDocs(input.toDS())
      .writeStream.format("memory").queryName("cu_parity").outputMode("append").start()
    try {
      input.addData(docs.map { case (id, t) => EventStreams.Doc(ts(0), id, t) }.toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("cu_parity").as[EventStreams.DocVerdict].collect()
        .map(v => v.docId -> ((v.predLang, v.quality, v.nPii, v.keeper, v.keep, v.reason)))
        .toMap
      val batch = graft.SparkEntry.queries("t13_curation")(spark, sf).collect()
        .map(r => r.getAs[Number]("doc_id").longValue ->
          ((r.getAs[String]("pred_lang"), r.getAs[Double]("quality"),
            r.getAs[Int]("n_pii"), r.getAs[Int]("keeper"),
            r.getAs[Int]("keep"), r.getAs[String]("reason")))).toMap
      assert(streamed.keySet == batch.keySet)
      val bad = streamed.collect { case (id, v) if batch(id) != v => id }.toSeq.sorted
      assert(bad.isEmpty, s"mismatched docs ${bad.take(5)}: " +
        s"stream=${bad.headOption.map(streamed)} batch=${bad.headOption.map(batch)}")
    } finally q.stop()
  }

  test("a cross-batch duplicate is a dup loser through state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.curateDocs(input.toDS())
      .writeStream.format("memory").queryName("cu_cross").outputMode("append").start()
    try {
      input.addData(EventStreams.Doc(ts(0), 1L, "the quick brown fox"))
      q.processAllAvailable()
      input.addData(EventStreams.Doc(ts(5), 2L, "the quick brown fox"))
      q.processAllAvailable()
      val out = spark.table("cu_cross").as[EventStreams.DocVerdict].collect()
        .map(v => v.docId -> v.reason).toMap
      assert(out(2L) == "dup", s"got $out")
      assert(out(1L) != "dup", s"got $out")
    } finally q.stop()
  }

  test("expired dup state re-admits the text as keeper") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.curateDocs(input.toDS(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("cu_horizon").outputMode("append").start()
    try {
      input.addData(EventStreams.Doc(ts(0), 1L, "alpha beta gamma"))
      q.processAllAvailable()
      input.addData(EventStreams.Doc(ts(120), 2L, "unrelated filler words"))
      q.processAllAvailable()
      input.addData(EventStreams.Doc(ts(125), 3L, "alpha beta gamma"))
      q.processAllAvailable()
      val out = spark.table("cu_horizon").as[EventStreams.DocVerdict].collect()
      assert(out.find(_.docId == 3L).exists(_.keeper == 1),
        s"doc 3 must be keeper after expiry: ${out.toSeq}")
    } finally q.stop()
  }
}
