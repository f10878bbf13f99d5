package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.{PpmCodec, TextQueries}

/** EventStreams.imageDedup — the streaming twin of m6: first-arrival
 * PERCEPTUAL dedup through (w, h, aHash) address state. A uniform-ts
 * single batch over the real corpus must reproduce batch m6's keeper
 * flags exactly (arrival order (ts, docId) ≡ min(doc_id) first-wins). */
class ImageDedupStreamSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("uniform-ts single batch reproduces batch m6 keeper flags image-for-image") {
    implicit val sqlCtx = spark.sqlContext
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val input = MemoryStream[EventStreams.Clip]
    val q = EventStreams.imageDedup(input.toDS())
      .writeStream.format("memory").queryName("id_parity").outputMode("append").start()
    try {
      input.addData(ids.map(id =>
        EventStreams.Clip(ts(0), id, PpmCodec.synthesizeNoisy(id))).toSeq)
      q.processAllAvailable()
      val got = spark.table("id_parity").as[EventStreams.ImageDecision]
        .collect().map(d => (d.docId, (d.phash, d.keeper))).toMap
      val batch = TextQueries.queries("m6_image_phash")(spark, sf)
        .collect().map(r => (r.getLong(0),
          (r.getLong(3), r.getInt(4) == 1))).toMap
      assert(got.keySet == batch.keySet)
      got.foreach { case (id, (phash, keeper)) =>
        assert((phash, keeper) == batch(id), s"doc $id")
      }
      assert(got.values.count(!_._2) > 0, "no dropped images — fixture lost its signal")
    } finally q.stop()
  }

  test("a perceptual copy arriving in a LATER batch is dropped through state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Clip]
    val q = EventStreams.imageDedup(input.toDS())
      .writeStream.format("memory").queryName("id_cross").outputMode("append").start()
    try {
      // synthesizeNoisy plants same-pattern (NOT byte-identical) images
      // across ids in the same noise group; find a batch-m6 duplicate
      // pair so the fixture stays generator-derived, not hand-rolled
      val pair = TextQueries.queries("m6_image_phash")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(3), r.getInt(4)))
        .groupBy(_._2).values.find(_.length >= 2).get
        .sortBy(_._1).take(2).map(_._1)
      val Array(first, second) = pair
      assert(!java.util.Arrays.equals(
        PpmCodec.synthesizeNoisy(first), PpmCodec.synthesizeNoisy(second)),
        "fixture must not be byte-identical — perceptual identity is the point")
      input.addData(EventStreams.Clip(ts(0), first, PpmCodec.synthesizeNoisy(first)))
      q.processAllAvailable()
      input.addData(EventStreams.Clip(ts(5), second, PpmCodec.synthesizeNoisy(second)))
      q.processAllAvailable()
      val out = spark.table("id_cross").as[EventStreams.ImageDecision].collect()
      assert(out.find(_.docId == first).get.keeper)
      assert(!out.find(_.docId == second).get.keeper,
        s"perceptual copy $second of $first not dropped: ${out.toSeq}")
    } finally q.stop()
  }
}
