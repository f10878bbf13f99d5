package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming renderings of the event-pipeline operators: the
 * batch queries in TextQueries/RelationalQueries (tumbling windows,
 * sessionization) re-expressed as incremental streams. `readStream` on
 * any source with (ts: timestamp, user_id, event_type, value) columns
 * plugs in unchanged — the transformations are source-agnostic.
 */
object EventStreams {

  /** Tumbling 1-hour windowed counts/sums with a 1-hour watermark: the
   * streaming twin of q17_events_tumbling. Late events beyond the
   * watermark are dropped; state for closed windows is evicted, so state
   * size is bounded by (windows in flight × event types) at any scale. */
  def tumblingCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      // decimal accumulation like the batch twin (q17/Ops.dsum): state
      // merges across micro-batches must not be order-dependent
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("cnt"), col("sum_value"))

  /** Streaming exact dedup — the streaming twin of d1_dedup_exact: drop
   * repeated event_ids within the watermark horizon. State holds only
   * ids inside the horizon, so memory is bounded by arrival rate ×
   * watermark, not stream length. */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each purchase matched to the same
   * user's clicks from the preceding hour — the streaming rendering of
   * the q21 as-of shape (the exact latest-click-only semantics needs
   * per-key state; the watermark-bounded interval join is the standard
   * streaming composition, emitting every candidate click in range).
   * Both inputs carry watermarks and the join condition bounds click_ts
   * to [purchase_ts - 1h, purchase_ts], so each side's buffered rows are
   * evicted as the other side's watermark passes the interval — state is
   * arrival-rate × (watermark + interval), never stream length. */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      watermark: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
        col("ts").as("purchase_ts"))
    c.join(p,
        col("user_id") === col("p_user_id") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        col("purchase_ts"), col("click_ts"))
  }

  /** Stream → SCBF ingest through the connector's native DSv2 streaming
   * sink (graft.sources.ScbfStreamingWrite): per-epoch staged commit
   * with deterministic (epoch, partition) file names, so a replayed
   * epoch republishes the same files instead of duplicating — flat
   * output directory, plain `spark.read.format("scbf").load(outDir)`
   * for consumers. (Earlier rounds composed this with foreachBatch and
   * one overwritten subdirectory per batch; that shape remains valid
   * for sinks without native streaming support.) */
  def scbfSink(df: DataFrame, outDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.format("scbf")
      .option("checkpointLocation", checkpoint)
      .start(outDir)

  case class Event(ts: Timestamp, userId: Long, eventType: String, value: Double)
  case class SessionState(start: Long, lastTs: Long, events: Int)
  case class Session(userId: Long, startMs: Long, endMs: Long, events: Int)

  /** Event-time sessionization with a 30-minute inactivity gap — the
   * streaming twin of t5_sessionize, via flatMapGroupsWithState with an
   * event-time timeout. Emits a session once the watermark passes its
   * gap deadline; per-user state is one small struct, so state scales
   * with active users only. */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start, s.lastTs, s.events))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            // Cross-batch stragglers (older than the live session can
            // reach) accumulate into their own session so consecutive
            // late events from one delayed producer group together; a
            // bare `t - lastTs <= gapMs` check would fold them into the
            // newer session (vacuously true for any past timestamp).
            // Known limit: the accumulator is per-micro-batch (state
            // holds only the live session), so stragglers split across
            // triggers emit as separate sessions.
            var late: Option[SessionState] = None
            def flushLate(): Unit = late.foreach { l =>
              closed ::= Session(userId, l.start, l.lastTs, l.events)
              late = None
            }
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t < s.start - gapMs =>
                  late match {
                    case Some(l) if t - l.lastTs <= gapMs =>
                      late = Some(SessionState(l.start, t, l.events + 1))
                    case _ =>
                      flushLate()
                      late = Some(SessionState(t, t, 1))
                  }
                case Some(s) if t - s.lastTs <= gapMs =>
                  cur = Some(SessionState(math.min(s.start, t),
                    math.max(s.lastTs, t), s.events + 1))
                case Some(s) =>
                  closed ::= Session(userId, s.start, s.lastTs, s.events)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            flushLate()
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
