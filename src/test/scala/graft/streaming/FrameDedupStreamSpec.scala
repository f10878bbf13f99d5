package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.{PpmCodec, TextQueries}

/** EventStreams.frameDedup — the streaming twin of m5: first-arrival
 * frame dedup through content-hash state. A uniform-ts single batch
 * over the real corpus must reproduce batch m5's keeper flags exactly
 * (arrival order (ts, docId, frameIdx) ≡ min(struct) first-wins). */
class FrameDedupStreamSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("uniform-ts single batch reproduces batch m5 keeper flags frame-for-frame") {
    implicit val sqlCtx = spark.sqlContext
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val input = MemoryStream[EventStreams.Clip]
    val q = EventStreams.frameDedup(input.toDS())
      .writeStream.format("memory").queryName("fd_parity").outputMode("append").start()
    try {
      input.addData(ids.map(id =>
        EventStreams.Clip(ts(0), id, PpmCodec.synthesizeClip(id))).toSeq)
      q.processAllAvailable()
      val got = spark.table("fd_parity").as[EventStreams.FrameDecision]
        .collect().map(d => ((d.docId, d.frameIdx), d.keeper)).toMap
      val batch = TextQueries.queries("m5_frame_dedup")(spark, sf)
        .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getInt(4) == 1)).toMap
      assert(got.keySet == batch.keySet)
      got.foreach { case (k, keeper) =>
        assert(keeper == batch(k), s"frame $k")
      }
      assert(got.values.count(!_) > 0, "no dropped frames — fixture lost its signal")
    } finally q.stop()
  }

  test("a frame reused in a LATER batch is dropped through state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Clip]
    val q = EventStreams.frameDedup(input.toDS())
      .writeStream.format("memory").queryName("fd_cross").outputMode("append").start()
    try {
      // doc 0: 1 frame, (w 4, phase 0); doc 16: frames (4, 0) and (4, 1)
      // — frame 0 repeats doc 0's frame, frame 1 is novel
      input.addData(EventStreams.Clip(ts(0), 0L, PpmCodec.synthesizeClip(0L)))
      q.processAllAvailable()
      input.addData(EventStreams.Clip(ts(5), 16L, PpmCodec.synthesizeClip(16L)))
      q.processAllAvailable()
      val out = spark.table("fd_cross").as[EventStreams.FrameDecision].collect()
      assert(out.filter(_.docId == 0L).forall(_.keeper))
      val d16 = out.filter(_.docId == 16L).sortBy(_.frameIdx)
      assert(d16.map(d => (d.frameIdx, d.keeper)).toSeq == Seq((0, false), (1, true)),
        s"got ${d16.toSeq}")
    } finally q.stop()
  }
}
