package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** EventStreams.chunkDedup — the streaming twin of d14: first-arrival
 * chunk dedup through bucket state, horizon-bounded. chunkTokens=2
 * keeps the fixture texts short. */
class ChunkDedupSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("repeated chunks are dropped across micro-batches (through state)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.chunkDedup(input.toDS(), chunkTokens = 2)
      .writeStream.format("memory").queryName("cd_cross").outputMode("append").start()
    try {
      input.addData(EventStreams.Doc(ts(0), 1L, "a b c d"))
      q.processAllAvailable()
      // doc 2 repeats doc 1's first chunk in a LATER batch: the drop
      // decision must come from state, not within-batch comparison
      input.addData(EventStreams.Doc(ts(5), 2L, "a b x y"))
      q.processAllAvailable()
      val out = spark.table("cd_cross").as[EventStreams.ChunkDecision].collect()
      val byDoc = out.groupBy(_.docId)
      assert(byDoc(1L).forall(_.kept), s"first doc must keep all: $out")
      val d2 = byDoc(2L).sortBy(_.idx)
      assert(d2.map(c => (c.chunk, c.kept)).toSeq ==
        Seq(("a b", false), ("x y", true)), s"got $out")
    } finally q.stop()
  }

  test("within a batch the earliest (ts, docId) wins deterministically") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.chunkDedup(input.toDS(), chunkTokens = 2)
      .writeStream.format("memory").queryName("cd_order").outputMode("append").start()
    try {
      input.addData(EventStreams.Doc(ts(3), 9L, "p q"),
        EventStreams.Doc(ts(1), 7L, "p q"))
      q.processAllAvailable()
      val out = spark.table("cd_order").as[EventStreams.ChunkDecision].collect()
      assert(out.filter(_.kept).map(_.docId).toSeq == Seq(7L), s"got $out")
      assert(out.filter(!_.kept).map(_.docId).toSeq == Seq(9L), s"got $out")
    } finally q.stop()
  }

  test("hash-key grouping cannot merge different chunks (exact decisions)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.chunkDedup(input.toDS(), chunkTokens = 2)
      .writeStream.format("memory").queryName("cd_exact").outputMode("append").start()
    try {
      // distinct chunks must all be kept no matter how keys hash
      input.addData(EventStreams.Doc(ts(0), 1L, "a b c d e f"),
        EventStreams.Doc(ts(0), 2L, "g h i j"))
      q.processAllAvailable()
      val out = spark.table("cd_exact").as[EventStreams.ChunkDecision].collect()
      assert(out.length == 5 && out.forall(_.kept), s"got $out")
    } finally q.stop()
  }

  test("single-batch decisions match batch d14's global first-wins") {
    // with uniform ts, chunkDedup's (ts, docId, idx) order IS d14's
    // (doc_id, idx) total order, so per-doc kept counts must agree
    // exactly with the batch operator over the real corpus
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val docs = graft.operators.DedupQueries.corpus(spark, sf)
      .as[(Long, String)].collect()
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.chunkDedup(input.toDS(), chunkTokens = 16)
      .writeStream.format("memory").queryName("cd_parity").outputMode("append").start()
    try {
      input.addData(docs.map { case (id, t) => EventStreams.Doc(ts(0), id, t) }.toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("cd_parity").as[EventStreams.ChunkDecision]
        .groupByKey(_.docId)
        .mapValues(d => if (d.kept) 1L else 0L)
        .reduceGroups(_ + _)
        .toDF("doc_id", "s_kept")
      val batch = graft.SparkEntry.queries("d14_paragraph_dedup")(spark, sf)
        .select($"doc_id", $"n_kept")
      val diff = streamed.join(batch, "doc_id")
        .filter($"s_kept" =!= $"n_kept").count()
      assert(diff == 0)
      assert(streamed.count() == batch.count())
    } finally q.stop()
  }

  test("idle chunk state expires with the watermark and re-admits") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.chunkDedup(input.toDS(), chunkTokens = 2, watermark = "10 minutes")
      .writeStream.format("memory").queryName("cd_horizon").outputMode("append").start()
    try {
      input.addData(EventStreams.Doc(ts(0), 1L, "m n"))
      q.processAllAvailable()
      // push the watermark far past ts(0)+10min: the "m n" state times out
      input.addData(EventStreams.Doc(ts(120), 2L, "z z"))
      q.processAllAvailable()
      // beyond the horizon the same chunk is novel again — the bounded
      // state trade, as in dropDuplicates+watermark
      input.addData(EventStreams.Doc(ts(125), 3L, "m n"))
      q.processAllAvailable()
      val out = spark.table("cd_horizon").as[EventStreams.ChunkDecision].collect()
      assert(out.filter(_.docId == 3L).forall(_.kept), s"got $out")
    } finally q.stop()
  }
}
