package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** EventStreams.datasetFingerprint — t17's streaming twin: the running
 * per-source digest equals the batch fold (same rowDigest kernel) over
 * everything ingested so far, at every epoch — XOR's associativity IS
 * the incremental-correctness argument, and this spec is its witness. */
class FingerprintStreamSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val ts0 = Timestamp.valueOf("2024-01-01 00:00:00")

  private def batchDigest(rows: Seq[(Long, String, String)]): Map[String, (Long, Long)] =
    graft.operators.TextQueries.rowDigest(
        rows.toDF("doc_id", "source", "text"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("d"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("running digest matches the batch fold over the ingested prefix at every epoch") {
    implicit val sqlCtx = spark.sqlContext
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long"), col("source"), col("text"))
      .as[(Long, String, String)].collect().toSeq
    val (ep0, ep1) = all.partition(_._1 % 2 == 0)
    val input = MemoryStream[EventStreams.SrcDoc]
    val q = EventStreams.datasetFingerprint(input.toDS())
      .writeStream.format("memory").queryName("fp_run").outputMode("complete").start()
    try {
      input.addData(ep0.map { case (id, s, t) => EventStreams.SrcDoc(ts0, id, s, t) }: _*)
      q.processAllAvailable()
      val afterEp0 = spark.table("fp_run")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(afterEp0 == batchDigest(ep0), "epoch-0 digest = batch fold over epoch 0")

      input.addData(ep1.map { case (id, s, t) => EventStreams.SrcDoc(ts0, id, s, t) }: _*)
      q.processAllAvailable()
      val afterEp1 = spark.table("fp_run")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(afterEp1 == batchDigest(ep0 ++ ep1),
        "running digest after epoch 1 = batch fold over BOTH epochs")
    } finally q.stop()
  }
}
