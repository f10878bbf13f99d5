package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Ops

class EventStreamsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  /** Raw fixture frame -> `ts` as an absolute TimestampType instant, via
   * the one shared nanos normalization (fixture has shipped ts as both
   * nanos-long and TIMESTAMP_NTZ across rounds — see Ops.events). */
  private def withTsInstant(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    Ops.tsAsNanos(df).withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("tumblingCounts aggregates per hour/type and drops late events past watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    // update mode: watermark-based late-row dropping actually applies
    // (complete mode retains all state and would pass even with the
    // watermark removed — the regression this test exists to catch)
    val q = EventStreams.tumblingCounts(
        input.toDF().toDF("ts", "event_type", "value"), watermark = "30 minutes")
      .writeStream.format("memory").queryName("tumbling").outputMode("update").start()
    try {
      input.addData((ts(5), "click", 1.0), (ts(10), "click", 2.0), (ts(65), "view", 5.0))
      q.processAllAvailable()
      input.addData((ts(200), "click", 1.0)) // watermark -> 02:50, far past hour 0
      q.processAllAvailable()
      input.addData((ts(15), "click", 9.0)) // LATE: hour-0 event behind the watermark
      q.processAllAvailable()
      val updates = spark.table("tumbling")
        .select(date_format(col("hour"), "HH:mm").as("h"), col("event_type"), col("cnt"))
        .as[(String, String, Long)].collect().toSeq
      // the late event must NOT have produced an updated count of 3
      val hour0Clicks = updates.filter(u => u._1 == "00:00" && u._2 == "click").map(_._3)
      assert(hour0Clicks.max == 2L, s"late event was counted: $updates")
      assert(updates.contains(("01:00", "view", 1L)))
    } finally q.stop()
  }

  test("streaming tumbling counts equal the batch query on the real events table") {
    // file-source stream over the same parquet the batch query reads:
    // readStream -> transform -> sink must reproduce q17's hourly counts
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val batchDf = spark.read.parquet(s"$dir/events.parquet")
    // the file stream source requires a directory
    val streamDir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = spark.readStream
      .schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamDir.toString)
    val q = EventStreams.tumblingCounts(withTsInstant(stream))
      .writeStream.format("memory").queryName("parity").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streaming = spark.table("parity")
        .select(date_format(col("hour"), "yyyy-MM-dd HH:mm").as("h"),
          col("event_type"), col("cnt"), col("sum_value"))
        .as[(String, String, Long, Double)].collect().toSet
      val batch = withTsInstant(batchDf)
        .withColumnRenamed("ts", "tsu")
        .groupBy(date_format(date_trunc("hour", col("tsu")), "yyyy-MM-dd HH:mm").as("h"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .as[(String, String, Long, Double)].collect().toSet
      assert(streaming == batch, s"stream/batch divergence: " +
        s"${(streaming -- batch).take(3)} vs ${(batch -- streaming).take(3)}")
    } finally q.stop()
  }

  test("scbfSink appends each micro-batch as immutable scbf files") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("scbf-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("scbf-ckpt").toString
    val input = MemoryStream[(Int, String, Double)]
    val q = EventStreams.scbfSink(
      input.toDF().toDF("id", "name", "score"), out, ckpt)
    try {
      input.addData((1, "a", 1.5), (2, "b", 2.5))
      q.processAllAvailable()
      input.addData((3, "c", 3.5))
      q.processAllAvailable()
      // native sink: flat directory, no per-batch glob needed
      val back = spark.read.format("scbf").load(out)
      assert(back.count() == 3)
      assert(back.select("name").as[String].collect().sorted.toSeq == Seq("a", "b", "c"))
    } finally q.stop()
  }

  test("sessionize does not fold a too-old straggler into a newer session") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("straggler").outputMode("append").start()
    try {
      input.addData(EventStreams.Event(ts(120), 1L, "click", 1.0)) // session at 02:00
      q.processAllAvailable()
      // straggler from 01:10 — newer than the watermark (01:00, so Spark
      // does NOT drop it) but older than 02:00 minus the 30-min gap; it
      // must become its own 1-event session, not join or close the 02:00
      // one (events older than the watermark never reach the operator)
      input.addData(EventStreams.Event(ts(70), 1L, "view", 1.0))
      q.processAllAvailable()
      input.addData(EventStreams.Event(ts(600), 2L, "click", 1.0)) // advance watermark
      q.processAllAvailable()
      val sessions = spark.table("straggler").as[EventStreams.Session]
        .collect().filter(_.userId == 1L).sortBy(_.startMs)
      assert(sessions.length == 2)
      assert(sessions(0).events == 1 && sessions(0).startMs == ts(70).getTime)
      assert(sessions(1).events == 1 && sessions(1).startMs == ts(120).getTime)
    } finally q.stop()
  }

  test("clickPurchaseJoin matches purchases to in-window clicks only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val q = EventStreams.clickPurchaseJoin(
        clicks.toDF().toDF("event_id", "user_id", "ts"),
        purchases.toDF().toDF("event_id", "user_id", "ts"))
      .writeStream.format("memory").queryName("cpjoin").outputMode("append").start()
    try {
      clicks.addData((100L, 1L, ts(5)), (101L, 1L, ts(25)), (102L, 2L, ts(10)))
      purchases.addData((200L, 1L, ts(30)))   // joins clicks 100 + 101
      q.processAllAvailable()
      purchases.addData((201L, 1L, ts(300)))  // > 1h after any click: no match
      purchases.addData((202L, 3L, ts(31)))   // user with no clicks: no match
      q.processAllAvailable()
      val got = spark.table("cpjoin")
        .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
      assert(got == Set((200L, 100L), (200L, 101L)), got.toString)
    } finally q.stop()
  }

  test("streaming interval join equals the batch join on the real events table") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val batchDf = withTsInstant(spark.read.parquet(s"$dir/events.parquet"))
    val streamDir = java.nio.file.Files.createTempDirectory("events-join-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    def side(tpe: String) = withTsInstant(spark.readStream
      .schema(spark.read.parquet(s"$dir/events.parquet").schema)
      .parquet(streamDir.toString))
      .filter(col("event_type") === tpe)
    val q = EventStreams.clickPurchaseJoin(side("click"), side("purchase"))
      .writeStream.format("memory").queryName("cpparity").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streaming = spark.table("cpparity")
        .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
      val c = batchDf.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      val p = batchDf.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
          col("ts").as("purchase_ts"))
      val batch = c.join(p,
          col("user_id") === col("p_user_id") &&
            col("click_ts") <= col("purchase_ts") &&
            col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
        .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
      assert(batch.nonEmpty, "parity test is vacuous: no joinable pairs in testdata")
      assert(streaming == batch, s"stream/batch divergence: " +
        s"${(streaming -- batch).take(3)} vs ${(batch -- streaming).take(3)}")
    } finally q.stop()
  }

  test("dedupEvents drops repeated event ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val q = EventStreams.dedupEvents(
        input.toDF().toDF("ts", "event_id", "event_type"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      input.addData((ts(0), 1L, "click"), (ts(1), 2L, "view"), (ts(2), 1L, "click"))
      q.processAllAvailable()
      input.addData((ts(3), 2L, "view"), (ts(4), 3L, "buy"))
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("sessionize closes sessions after the inactivity gap via event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then silence;
      // user 2 keeps the clock advancing so the watermark closes it.
      input.addData(
        EventStreams.Event(ts(0), 1L, "click", 1.0),
        EventStreams.Event(ts(10), 1L, "view", 1.0))
      q.processAllAvailable()
      input.addData(EventStreams.Event(ts(300), 2L, "click", 1.0))
      q.processAllAvailable()
      input.addData(EventStreams.Event(ts(600), 2L, "click", 1.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions").as[EventStreams.Session].collect()
      val u1 = sessions.filter(_.userId == 1L)
      assert(u1.length == 1)
      assert(u1.head.events == 2)
      assert(u1.head.endMs - u1.head.startMs == 10 * 60 * 1000L)
    } finally q.stop()
  }

  test("nearDupPairs surfaces cross-batch near-duplicates, ignores distinct docs") {
    implicit val sqlCtx = spark.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val nearDup = base.replace("pi ", "") // one token dropped: high Jaccard
    val distinctDoc = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen"
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.nearDupPairs(input.toDS())
      .writeStream.format("memory").queryName("neardups").outputMode("append").start()
    try {
      input.addData(EventStreams.Doc(ts(0), 1L, base),
        EventStreams.Doc(ts(1), 3L, distinctDoc))
      q.processAllAvailable()
      // the near-dup arrives in a LATER micro-batch: detection must go
      // through bucket state, not within-batch comparison
      input.addData(EventStreams.Doc(ts(5), 2L, nearDup))
      q.processAllAvailable()
      val hits = spark.table("neardups").as[EventStreams.NearDupHit].collect()
      val pairs = hits.map(h => (h.docA, h.docB)).distinct.toSeq
      assert(pairs == Seq((1L, 2L)), s"got $hits")
      assert(hits.forall(_.estSim >= 0.6), s"got $hits")
    } finally q.stop()
  }

  test("nearDupPairs never pairs zero-shingle (short) docs") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.nearDupPairs(input.toDS())
      .writeStream.format("memory").queryName("neardups_s").outputMode("append").start()
    try {
      // under 3 words each: no shingles, so no signature — a sentinel
      // signature here would fake-match all of them at estSim 1.0
      input.addData(EventStreams.Doc(ts(0), 1L, "hello world"),
        EventStreams.Doc(ts(0), 2L, "foo bar"), EventStreams.Doc(ts(0), 3L, ""))
      q.processAllAvailable()
      input.addData(EventStreams.Doc(ts(5), 4L, "tiny doc"))
      q.processAllAvailable()
      assert(spark.table("neardups_s").isEmpty,
        s"short docs paired: ${spark.table("neardups_s").collect().toSeq}")
    } finally q.stop()
  }

  test("nearDupPairs finds planted near-duplicates across the real corpus") {
    implicit val sqlCtx = spark.sqlContext
    // d2's planted-mutation scheme on the real documents table: every
    // doc and its 'value '-stripped twin, originals in batch 1 and
    // mutants in batch 2 so every hit must cross bucket STATE
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.nearDupPairs(input.toDS())
      .writeStream.format("memory").queryName("neardups_c").outputMode("append").start()
    try {
      input.addData(docs.map { case (id, t) => EventStreams.Doc(ts(0), id, t) }.toSeq: _*)
      q.processAllAvailable()
      input.addData(docs.map { case (id, t) =>
        EventStreams.Doc(ts(5), id + 100000, t.replace("value ", "")) }.toSeq: _*)
      q.processAllAvailable()
      val pairs = spark.table("neardups_c").as[EventStreams.NearDupHit].collect()
        .map(h => (h.docA, h.docB)).distinct.toSet
      // docs whose mutation changed nothing (no 'value ' token) are
      // exact dups (J=1, always detected); the rest are true near-dups —
      // LSH banding at 24x2 should surface the overwhelming majority
      val planted = docs.map { case (id, _) => (id, id + 100000) }.toSet
      val recall = (pairs & planted).size.toDouble / planted.size
      assert(recall >= 0.9, f"planted-pair recall $recall%.2f below 0.9 " +
        s"(${(pairs & planted).size}/${planted.size})")
    } finally q.stop()
  }

  test("nearDupPairs state is horizon-bounded: ancient docs stop matching") {
    implicit val sqlCtx = spark.sqlContext
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val input = MemoryStream[EventStreams.Doc]
    val q = EventStreams.nearDupPairs(input.toDS(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("neardups_h").outputMode("append").start()
    try {
      input.addData(EventStreams.Doc(ts(0), 1L, text))
      q.processAllAvailable()
      // advance the watermark far past doc 1's horizon
      input.addData(EventStreams.Doc(ts(300), 9L, "unrelated filler words here"))
      q.processAllAvailable()
      // an identical doc arriving now must NOT pair with the evicted doc 1
      input.addData(EventStreams.Doc(ts(305), 2L, text))
      q.processAllAvailable()
      val hits = spark.table("neardups_h").as[EventStreams.NearDupHit].collect()
      assert(!hits.exists(h => h.docA == 1L && h.docB == 2L),
        s"evicted doc still paired: ${hits.toSeq}")
    } finally q.stop()
  }
}
