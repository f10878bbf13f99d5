package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** EventStreams.winnowedSpanDedup — the streaming twin of d22:
 * per-doc winnowed fingerprint selection at ingest, hash-keyed dup
 * state over ONLY the selected fingerprints, parity-anchored to the
 * batch operator span-for-span. */
class WinnowedSpanStreamSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("md5Hash60 equals the engine/oracle conv(substr(md5,1,15),16,10) value") {
    val probe = Seq("a b c d e f g h", "", "tok", "value 42 value 43")
    val fromSql = spark.createDataset(probe).toDF("s")
      .selectExpr("CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)")
      .collect().map(_.getLong(0))
    probe.zip(fromSql).foreach { case (s, expected) =>
      assert(EventStreams.md5Hash60(s) == expected, s"mismatch for '$s'")
    }
  }

  test("winnowing shrinks the fingerprint stream below the window stream") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.operators.DedupQueries.corpus(spark, "/root/testdata/sf0.001")
      .as[(Long, String)].collect()
    val L = graft.operators.DedupQueries.DupSpanTokens
    val totalWindows = docs.map { case (_, t) =>
      math.max(t.split(" ").length - L + 1, 0) }.sum
    // count emitted fingerprint rows by draining the flatMap through a
    // non-dup key space: use a fresh stream over distinct-doc texts and
    // observe the stateful op's input indirectly via selection count
    val selected = docs.map { case (_, t) =>
      val w = t.split(" ")
      if (w.length < L) 0
      else {
        val th = Array.tabulate(w.length - L + 1)(
          i => EventStreams.md5Hash60(w.slice(i, i + L).mkString(" ")))
        val lastStart = math.max(th.length - 4, 0)
        val sel = scala.collection.mutable.LinkedHashSet.empty[Int]
        var j = 0
        while (j <= lastStart) {
          val end = math.min(j + 4, th.length)
          var best = j
          var k = j + 1
          while (k < end) { if (th(k) < th(best)) best = k; k += 1 }
          sel += best
          j += 1
        }
        sel.size
      }
    }.sum
    val density = selected.toDouble / totalWindows
    assert(density > 0.2 && density < 0.6,
      f"winnowed density $density%.2f should be ~2/(W+1)")
  }

  test("single-batch gap-W islands match batch d22 span-for-span on the real corpus") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val L = graft.operators.DedupQueries.DupSpanTokens
    val W = 4
    val docs = graft.operators.DedupQueries.corpus(spark, sf)
      .as[(Long, String)].collect()
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.winnowedSpanDedup(input.toDS(), spanTokens = L, winnowW = W)
      .writeStream.format("memory").queryName("wsd_parity").outputMode("append").start()
    try {
      input.addData(docs.map { case (id, t) => EventStreams.Doc(ts(0), id, t) }.toSeq: _*)
      q.processAllAvailable()
      // gap-W islands over the streamed duplicated fingerprints —
      // batch d22's grouping, replayed client-side
      val streamed = spark.table("wsd_parity").as[EventStreams.SpanDup].collect()
        .groupBy(_.docId).flatMap { case (doc, ds) =>
          val idxs = ds.map(_.idx).distinct.sorted
          val runs = idxs.foldLeft(List.empty[List[Int]]) {
            case (cur :: rest, i) if i - cur.head <= W => (i :: cur) :: rest
            case (acc, i) => List(i) :: acc
          }
          runs.map(r =>
            (doc, r.last.toLong, (r.head + L - 1).toLong, r.length.toLong))
        }.toSet
      val batch = graft.SparkEntry.queries("d22_winnowed_spans")(spark, sf)
        .collect().map(r => (r.getAs[Number]("doc_id").longValue,
          r.getAs[Long]("span_start"), r.getAs[Long]("span_end"),
          r.getAs[Long]("n_fingerprints"))).toSet
      assert(streamed == batch,
        s"stream-batch: ${(streamed -- batch).take(3)}; batch-stream: ${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("xxhash64 family: stream and batch still agree span-for-span") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val L = graft.operators.DedupQueries.DupSpanTokens
    val W = 4
    val docs = graft.operators.DedupQueries.corpus(spark, sf)
      .as[(Long, String)].collect()
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.winnowedSpanDedup(input.toDS(), spanTokens = L,
        winnowW = W, hashAlgo = "xxhash64")
      .writeStream.format("memory").queryName("wsd_xx").outputMode("append").start()
    try {
      input.addData(docs.map { case (id, t) => EventStreams.Doc(ts(0), id, t) }.toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("wsd_xx").as[EventStreams.SpanDup].collect()
        .groupBy(_.docId).flatMap { case (doc, ds) =>
          val idxs = ds.map(_.idx).distinct.sorted
          val runs = idxs.foldLeft(List.empty[List[Int]]) {
            case (cur :: rest, i) if i - cur.head <= W => (i :: cur) :: rest
            case (acc, i) => List(i) :: acc
          }
          runs.map(r =>
            (doc, r.last.toLong, (r.head + L - 1).toLong, r.length.toLong))
        }.toSet
      spark.conf.set(graft.GraftConf.SpanHash, "xxhash64")
      val batch = try {
        graft.SparkEntry.queries("d22_winnowed_spans")(spark, sf)
          .collect().map(r => (r.getAs[Number]("doc_id").longValue,
            r.getAs[Long]("span_start"), r.getAs[Long]("span_end"),
            r.getAs[Long]("n_fingerprints"))).toSet
      } finally spark.conf.unset(graft.GraftConf.SpanHash)
      assert(streamed == batch,
        s"stream-batch: ${(streamed -- batch).take(3)}; batch-stream: ${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("a cross-batch duplicated fingerprint retroactively emits the first occurrence") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Doc]
    // spanTokens=3, winnowW=2 keeps fixtures small; "p q r" has ONE
    // window, trivially selected
    val q = EventStreams.winnowedSpanDedup(input.toDS(), spanTokens = 3, winnowW = 2)
      .writeStream.format("memory").queryName("wsd_retro").outputMode("append").start()
    try {
      input.addData(EventStreams.Doc(ts(0), 1L, "p q r"))
      q.processAllAvailable()
      assert(spark.table("wsd_retro").isEmpty)
      input.addData(EventStreams.Doc(ts(5), 2L, "p q r"))
      q.processAllAvailable()
      val out = spark.table("wsd_retro").as[EventStreams.SpanDup].collect().toSet
      assert(out == Set(EventStreams.SpanDup(1L, 0), EventStreams.SpanDup(2L, 0)), s"got $out")
    } finally q.stop()
  }

  test("xxhash64 window keys survive empty tokens at the window edge (split is mkString's inverse)") {
    // doc text with consecutive spaces produces empty tokens; a window
    // whose LAST token is empty renders as "a b " and a default
    // split(" ") would drop the trailing empty — folding one hash
    // fewer than batch d22 hashed for the same window. The stream key
    // must equal the batch fingerprint for every token shape.
    import graft.functions.TokenWindowHashes
    def key(tokens: Seq[String]): Long = {
      val th = tokens.map(t => TokenWindowHashes.tokenHash(
        t.getBytes(java.nio.charset.StandardCharsets.UTF_8))).toArray
      TokenWindowHashes.windowKey(th, 0, th.length)
    }
    for (tokens <- Seq(Seq("a", ""), Seq("", "a"), Seq("a", "", "b"),
        Seq("", ""), Seq("a", "b"))) {
      val win = tokens.mkString(" ")
      assert(EventStreams.windowHash("xxhash64")(win) == key(tokens),
        s"tokens $tokens (win '$win'): stream key must fold every token hash")
    }
    // and md5 keys are a pure function of the string, trivially stable
    assert(EventStreams.windowHash("md5")("a ") == EventStreams.md5Hash60("a "))
  }
}
