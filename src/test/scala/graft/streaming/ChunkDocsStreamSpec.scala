package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** EventStreams.chunkDocs — the streaming twin of t15: stateless
 * chunk-at-ingest with batch t15's exact window geometry. */
class ChunkDocsStreamSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("streamed chunks match batch t15 value-for-value on the real documents table") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text").as[(Long, String)].collect()
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.chunkDocs(input.toDS())
      .writeStream.format("memory").queryName("ch_parity").outputMode("append").start()
    try {
      input.addData(docs.map { case (id, t) => EventStreams.Doc(ts(0), id, t) }.toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("ch_parity").as[EventStreams.DocChunk].collect()
        .map(c => (c.docId, c.chunkId, c.chunkText, c.nTokens)).toSet
      val batch = graft.SparkEntry.queries("t15_chunking")(spark, sf).collect()
        .map(r => (r.getAs[Number]("doc_id").longValue, r.getAs[Int]("chunk_id"),
          r.getAs[String]("chunk_text"), r.getAs[Int]("n_tokens"))).toSet
      assert(streamed == batch,
        s"divergence: ${(streamed -- batch).take(3)} vs ${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("chunks emit per micro-batch with no state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.chunkDocs(input.toDS(), size = 4, stride = 3)
      .writeStream.format("memory").queryName("ch_inc").outputMode("append").start()
    try {
      input.addData(EventStreams.Doc(ts(0), 1L, "a b c d e"))
      q.processAllAvailable()
      input.addData(EventStreams.Doc(ts(1), 2L, "x"))
      q.processAllAvailable()
      val out = spark.table("ch_inc").as[EventStreams.DocChunk].collect()
        .map(c => (c.docId, c.chunkId, c.chunkText, c.nTokens)).toSet
      assert(out == Set(
        (1L, 0, "a b c d", 4), (1L, 1, "d e", 2), // stride 3: starts 0, 3
        (2L, 0, "x", 1)), out.toString)
    } finally q.stop()
  }
}
