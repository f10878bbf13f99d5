package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** EventStreams.mixtureSample — t14's streaming twin: per-source token
 * budgets as one-long-per-source state, batch-t14 md5 ordering within
 * a micro-batch, first-arrival precedence across batches. */
class MixtureSampleStreamSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val ts0 = Timestamp.valueOf("2024-01-01 00:00:00")

  test("single-batch admissions match batch t14 value-for-value") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    val input = MemoryStream[EventStreams.SrcDoc]
    val q = EventStreams.mixtureSample(input.toDS())
      .writeStream.format("memory").queryName("mix_parity").outputMode("append").start()
    try {
      input.addData(docs.map { case (id, src, t) =>
        EventStreams.SrcDoc(ts0, id, src, t) }.toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("mix_parity").as[EventStreams.MixtureAdmit].collect()
        .map(a => a.docId -> ((a.source, a.tokens, a.cumTokens, a.budget))).toMap
      val batch = graft.SparkEntry.queries("t14_mixture_sample")(spark, sf).collect()
        .map(r => r.getAs[Number]("doc_id").longValue ->
          ((r.getAs[String]("source"), r.getAs[Number]("tokens").intValue,
            r.getAs[Number]("cum_tokens").longValue,
            r.getAs[Number]("budget").longValue))).toMap
      assert(streamed.keySet == batch.keySet,
        s"admitted sets differ: only-stream=${(streamed.keySet -- batch.keySet).take(5)} " +
          s"only-batch=${(batch.keySet -- streamed.keySet).take(5)}")
      val bad = streamed.collect { case (id, v) if batch(id) != v => id }.toSeq.sorted
      assert(bad.isEmpty, s"mismatches $bad: stream=${bad.headOption.map(streamed)} " +
        s"batch=${bad.headOption.map(batch)}")
    } finally q.stop()
  }

  test("budget state persists across batches; overflow tokens still consume") {
    implicit val sqlCtx = spark.sqlContext
    // budgetBase 10, source "src0" → budget 10 tokens
    val input = MemoryStream[EventStreams.SrcDoc]
    val q = EventStreams.mixtureSample(input.toDS(), budgetBase = 10)
      .writeStream.format("memory").queryName("mix_cross").outputMode("append").start()
    try {
      input.addData(EventStreams.SrcDoc(ts0, 1L, "src0", "a b c d e f")) // 6 tokens
      q.processAllAvailable()
      // 7 tokens: 6+7=13 > 10 → rejected, but consumption advances
      input.addData(EventStreams.SrcDoc(ts0, 2L, "src0", "a b c d e f g"))
      q.processAllAvailable()
      // 2 tokens: 13+2=15 > 10 → still rejected (prefix-sum semantics:
      // once overflowed, later docs cannot sneak in under the cap)
      input.addData(EventStreams.SrcDoc(ts0, 3L, "src0", "a b"))
      q.processAllAvailable()
      // an unrelated source has its own untouched budget
      input.addData(EventStreams.SrcDoc(ts0, 4L, "src1", "a b c"))
      q.processAllAvailable()
      val got = spark.table("mix_cross").as[EventStreams.MixtureAdmit].collect()
        .map(a => a.docId).toSet
      assert(got == Set(1L, 4L), s"got $got")
    } finally q.stop()
  }
}
