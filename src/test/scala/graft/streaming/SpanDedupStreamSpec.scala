package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** EventStreams.spanDedup — the streaming twin of d16: duplicated
 * stride-1 window detection through hash-keyed state, with retroactive
 * first-occurrence emission and horizon-bounded memory. spanTokens=3
 * keeps the fixture texts short; the parity test runs the real corpus
 * at the batch operator's width. */
class SpanDedupStreamSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  /** Merge duplicated window starts into maximal spans — batch d16's
   * gaps-and-islands, replayed client-side over the decision stream. */
  private def islands(dups: Seq[EventStreams.SpanDup], L: Int): Set[(Long, Long, Long)] =
    dups.groupBy(_.docId).flatMap { case (doc, ds) =>
      val idxs = ds.map(_.idx).distinct.sorted
      val runs = idxs.foldLeft(List.empty[List[Int]]) {
        case (cur :: rest, i) if i == cur.head + 1 => (i :: cur) :: rest
        case (acc, i) => List(i) :: acc
      }
      runs.map(r => (doc, r.last.toLong, (r.head + L - 1).toLong))
    }.toSet

  test("a shared passage flags every occurrence, including the first") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.spanDedup(input.toDS(), spanTokens = 3)
      .writeStream.format("memory").queryName("sd_basic").outputMode("append").start()
    try {
      // "c d e" is the shared window (idx 2 in doc 1, idx 0 in doc 2)
      input.addData(EventStreams.Doc(ts(0), 1L, "a b c d e"),
        EventStreams.Doc(ts(0), 2L, "c d e x y"))
      q.processAllAvailable()
      val out = spark.table("sd_basic").as[EventStreams.SpanDup].collect().toSet
      assert(out == Set(EventStreams.SpanDup(1L, 2), EventStreams.SpanDup(2L, 0)), s"got $out")
    } finally q.stop()
  }

  test("a cross-batch duplicate retroactively emits the first occurrence") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.spanDedup(input.toDS(), spanTokens = 3)
      .writeStream.format("memory").queryName("sd_retro").outputMode("append").start()
    try {
      input.addData(EventStreams.Doc(ts(0), 1L, "p q r"))
      q.processAllAvailable()
      assert(spark.table("sd_retro").isEmpty, "nothing duplicated yet")
      // the duplicate arrives later: decisions for BOTH docs must come
      // from state, the first occurrence's emitted retroactively
      input.addData(EventStreams.Doc(ts(5), 2L, "p q r"))
      q.processAllAvailable()
      val out = spark.table("sd_retro").as[EventStreams.SpanDup].collect().toSet
      assert(out == Set(EventStreams.SpanDup(1L, 0), EventStreams.SpanDup(2L, 0)), s"got $out")
    } finally q.stop()
  }

  test("within-doc self-repetition is flagged, distinct windows are not") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.spanDedup(input.toDS(), spanTokens = 3)
      .writeStream.format("memory").queryName("sd_self").outputMode("append").start()
    try {
      // "m n o" occurs at idx 0 and idx 3 of the same doc
      input.addData(EventStreams.Doc(ts(0), 1L, "m n o m n o"),
        EventStreams.Doc(ts(0), 2L, "u v w x"))
      q.processAllAvailable()
      val out = spark.table("sd_self").as[EventStreams.SpanDup].collect().toSet
      assert(out == Set(EventStreams.SpanDup(1L, 0), EventStreams.SpanDup(1L, 3)), s"got $out")
    } finally q.stop()
  }

  test("single-batch spans match batch d16 exactly on the real corpus") {
    // with uniform ts everything resolves in one trigger, so the
    // streamed duplicated-window set IS batch d16's, and the islands
    // composition must reproduce its maximal spans span-for-span
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val L = graft.operators.DedupQueries.DupSpanTokens
    val docs = graft.operators.DedupQueries.corpus(spark, sf)
      .as[(Long, String)].collect()
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.spanDedup(input.toDS(), spanTokens = L)
      .writeStream.format("memory").queryName("sd_parity").outputMode("append").start()
    try {
      input.addData(docs.map { case (id, t) => EventStreams.Doc(ts(0), id, t) }.toSeq: _*)
      q.processAllAvailable()
      val streamed = islands(
        spark.table("sd_parity").as[EventStreams.SpanDup].collect().toSeq, L)
      val batch = graft.SparkEntry.queries("d16_dup_spans")(spark, sf)
        .collect().map(r => (r.getAs[Number]("doc_id").longValue,
          r.getAs[Long]("span_start"), r.getAs[Long]("span_end"))).toSet
      assert(streamed == batch,
        s"stream-batch: ${(streamed -- batch).take(3)}; batch-stream: ${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("idle window state expires with the watermark and re-admits") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.spanDedup(input.toDS(), spanTokens = 3, watermark = "10 minutes")
      .writeStream.format("memory").queryName("sd_horizon").outputMode("append").start()
    try {
      input.addData(EventStreams.Doc(ts(0), 1L, "m n o"))
      q.processAllAvailable()
      // push the watermark far past ts(0)+10min: the stored first
      // occurrence times out
      input.addData(EventStreams.Doc(ts(120), 2L, "z z z"))
      q.processAllAvailable()
      // beyond the horizon the passage is novel again — the bounded
      // state trade, as in chunkDedup
      input.addData(EventStreams.Doc(ts(125), 3L, "m n o"))
      q.processAllAvailable()
      val out = spark.table("sd_horizon").as[EventStreams.SpanDup].collect()
      assert(out.forall(_.docId != 1L), s"expired state resurfaced: ${out.toSeq}")
      assert(!out.exists(_.docId == 3L), s"doc 3 must be novel: ${out.toSeq}")
    } finally q.stop()
  }
}
