package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** EventStreams.lmScoreStream — t16's incremental streaming twin: the
 * LM model accretes as epoch-keyed delta relations, and each epoch's
 * docs score against the prefix model. Parity anchor: epoch-k scores
 * must equal batch t16 (TextQueries.lmScore) run over the same
 * document prefix, value-for-value. */
class LmScoreStreamSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val ts0 = Timestamp.valueOf("2024-01-01 00:00:00")

  private def loadDocs(): Array[(Long, String)] =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect()

  private def scores(dir: String, epoch: Long): Map[Long, (Long, Double)] =
    spark.read.parquet(dir).filter(col("epoch") === epoch)
      .select(col("doc_id").cast("long"), col("n_bigrams").cast("long"), col("avg_ll"))
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, ll) => id -> ((n, ll)) }.toMap

  private def batchScores(docs: Seq[(Long, String)],
      restrictTo: Set[Long]): Map[Long, (Long, Double)] =
    graft.operators.TextQueries.lmScore(docs.toDF("doc_id", "text"))
      .filter(col("doc_id").isin(restrictTo.toSeq: _*))
      .select(col("doc_id").cast("long"), col("n_bigrams").cast("long"), col("avg_ll"))
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, ll) => id -> ((n, ll)) }.toMap

  test("each epoch's scores match batch t16 over the same prefix") {
    implicit val sqlCtx = spark.sqlContext
    val all = loadDocs()
    val ep0 = all.filter(_._1 % 2 == 0).toSeq
    val ep1 = all.filter(_._1 % 2 == 1).toSeq
    val modelDir = tmpDir("lm-model")
    val scoresDir = tmpDir("lm-scores")
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.lmScoreStream(input.toDS(), modelDir, scoresDir,
      tmpDir("lm-ckpt"))
    try {
      input.addData(ep0.map { case (id, t) => EventStreams.Doc(ts0, id, t) }: _*)
      q.processAllAvailable()
      input.addData(ep1.map { case (id, t) => EventStreams.Doc(ts0, id, t) }: _*)
      q.processAllAvailable()
    } finally q.stop()

    // epoch 0: model = ep0 docs only — batch t16 over ep0
    val s0 = scores(scoresDir, 0L)
    val b0 = batchScores(ep0, ep0.map(_._1).toSet)
    assert(s0.keySet == b0.keySet, "epoch-0 doc coverage must match batch")
    val bad0 = s0.collect { case (id, v) if b0(id) != v => id }.toSeq.sorted
    assert(bad0.isEmpty, s"epoch-0 mismatches $bad0: " +
      s"stream=${bad0.headOption.map(s0)} batch=${bad0.headOption.map(b0)}")

    // epoch 1: model = ep0 ++ ep1 (the prefix) — batch t16 over the
    // union, restricted to epoch-1 docs
    val s1 = scores(scoresDir, 1L)
    val b1 = batchScores(ep0 ++ ep1, ep1.map(_._1).toSet)
    assert(s1.keySet == b1.keySet, "epoch-1 doc coverage must match batch")
    val bad1 = s1.collect { case (id, v) if b1(id) != v => id }.toSeq.sorted
    assert(bad1.isEmpty, s"epoch-1 mismatches $bad1: " +
      s"stream=${bad1.headOption.map(s1)} batch=${bad1.headOption.map(b1)}")
  }

  test("an epoch replay overwrites its deltas in place — never double-counts") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(1L -> "a b c a b", 2L -> "a b x y")
    val modelDir = tmpDir("lm-replay-model")
    val scoresDir = tmpDir("lm-replay-scores")
    val batch = docs.map { case (id, t) => EventStreams.Doc(ts0, id, t) }
      .toDF()
    // simulate the engine replaying epoch 0 after a crash: the same
    // batch content processed twice under the same epoch id
    EventStreams.lmScoreEpoch(batch, 0L, modelDir, scoresDir)
    val first = scores(scoresDir, 0L)
    EventStreams.lmScoreEpoch(batch, 0L, modelDir, scoresDir)
    assert(scores(scoresDir, 0L) == first, "replay must be idempotent")
    // and the model itself holds single-counted totals
    val c1 = spark.read.parquet(s"$modelDir/c1")
      .groupBy("w1").agg(sum("c1").as("c"))
      .as[(String, Long)].collect().toMap
    assert(c1("a") == 3L && c1("b") == 3L && c1("x") == 1L, s"got $c1")
  }

  test("a crashed run's future-epoch deltas don't leak into the prefix model") {
    implicit val sqlCtx = spark.sqlContext
    val modelDir = tmpDir("lm-future-model")
    val scoresDir = tmpDir("lm-future-scores")
    val e0 = Seq(EventStreams.Doc(ts0, 1L, "a b c")).toDF()
    val e1 = Seq(EventStreams.Doc(ts0, 2L, "a b d")).toDF()
    // pre-crash run got through epochs 0 and 1
    EventStreams.lmScoreEpoch(e0, 0L, modelDir, scoresDir)
    EventStreams.lmScoreEpoch(e1, 1L, modelDir, scoresDir)
    val pre = scores(scoresDir, 0L)
    // restart replays epoch 0: epoch-1 deltas exist on disk but must
    // not contribute to epoch 0's prefix model
    EventStreams.lmScoreEpoch(e0, 0L, modelDir, scoresDir)
    assert(scores(scoresDir, 0L) == pre,
      "epoch-0 scores must ignore later epochs' deltas")
  }
}
