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

  case class Doc(ts: Timestamp, docId: Long, text: String)
  case class DocChunk(ts: Timestamp, docId: Long, chunkId: Int,
      chunkText: String, nTokens: Int)
  case class BandRow(ts: Timestamp, bandIdx: Int, bandKey: Long,
      docId: Long, sig: Array[Long])
  case class BucketState(docs: List[(Long, Long, Array[Long])]) // (tsMs, docId, sig)
  case class NearDupHit(docA: Long, docB: Long, bandIdx: Int, estSim: Double)

  case class ChunkRow(ts: Timestamp, docId: Long, idx: Int, chunk: String)
  case class ChunkState(seen: List[String], newestTsMs: Long)
  case class ChunkDecision(docId: Long, idx: Int, chunk: String, kept: Boolean)

  case class WindowRow(ts: Timestamp, docId: Long, idx: Int, win: String)
  case class SpanEntry(win: String, firstDocId: Long, firstIdx: Int, cnt: Long)
  case class SpanState(entries: List[SpanEntry], newestTsMs: Long)
  case class SpanDup(docId: Long, idx: Int)

  case class DocSignals(ts: Timestamp, docId: Long, text: String,
      predLang: String, quality: Double, nPii: Int)
  case class DocVerdict(docId: Long, predLang: String, quality: Double,
      nPii: Int, keeper: Int, keep: Int, reason: String)

  case class Clip(ts: Timestamp, docId: Long, payload: Array[Byte])
  case class ImageRow(ts: Timestamp, docId: Long, w: Int, h: Int, phash: Long)
  case class ImageDecision(docId: Long, w: Int, h: Int, phash: Long, keeper: Boolean)
  case class FrameRow(ts: Timestamp, docId: Long, frameIdx: Int,
      w: Int, h: Int, contentId: String)
  case class FrameDecision(docId: Long, frameIdx: Int, w: Int, h: Int,
      keeper: Boolean)

  private val NdNumHashes = 48
  private val NdBands = 24 // 2 rows per band — d2's banding geometry

  @transient private lazy val NdSeeds =
    graft.functions.MinHashSketch.familySeeds(NdNumHashes)

  /** MinHash signature of a document's word-trigram shingle set,
   * computed per row (no aggregation — keeps the stateful pipeline to
   * ONE stateful operator), or None for a zero-shingle doc (< 3
   * words): banding the untouched sentinel buffer would make every
   * short doc collide with every other in all bands — the exact "fake
   * all-bands match" the batch side avoids by exploding no shingle
   * rows. Uses the SAME xxhash64(shingle) + seed-42 XXH64 family as
   * batch d2 / [[graft.functions.MinHashSketch]], so streaming and
   * batch signatures are comparable, not look-alike duplicates. */
  private[streaming] def minhashSig(text: String): Option[Array[Long]] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.Platform
    // limit -1 matches batch SQL split/string_split: trailing empty
    // tokens are kept, so stream and batch tokenize identically for
    // EVERY text shape (consecutive/trailing spaces included)
    val words = text.split(" ", -1)
    if (words.length < 3) return None
    val sig = Array.fill(NdNumHashes)(Long.MaxValue)
    var w = 0
    while (w <= words.length - 3) {
      val bytes = (words(w) + "_" + words(w + 1) + "_" + words(w + 2))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      // = Spark's xxhash64(string) over the shingle, as d2 hashes them
      val base = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
      var i = 0
      while (i < NdNumHashes) {
        val h = XXH64.hashLong(base, NdSeeds(i))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      w += 1
    }
    Some(sig)
  }

  /** Streaming near-duplicate detection — the streaming twin of d2's
   * MinHash-LSH dedup, for ingest-time filtering of a training-data
   * stream. Per doc: a 48-hash MinHash signature (computed per-row, no
   * aggregation), banded 24×2; docs landing in the same (bandIdx,
   * bandKey) bucket within the watermark horizon emit a candidate pair
   * with the estimated Jaccard (= fraction of matching minhashes, the
   * standard unbiased estimator) when it clears `threshold`.
   *
   * One stateful operator: `flatMapGroupsWithState` keyed on the band
   * bucket. State per bucket holds (ts, docId, signature) entries
   * inside the horizon; entries behind the watermark are pruned on
   * every invocation (arrivals older than the watermark never reach
   * the operator, so they can never pair) and an event-time timeout
   * removes idle buckets outright — state is bounded by arrival rate ×
   * horizon, never stream length. A pair sharing several buckets emits
   * once per shared band (bandIdx is in the output for provenance);
   * exact-dedup downstream (d1 / dropDuplicates on the pair) collapses
   * them, the same division of labor as batch d2's
   * candidates-then-verify. */
  def nearDupPairs(docs: Dataset[Doc], threshold: Double = 0.6,
      watermark: String = "1 hour"): Dataset[NearDupHit] = {
    implicit val hitEnc = Encoders.product[NearDupHit]
    implicit val stateEnc = Encoders.product[BucketState]
    implicit val bandEnc = Encoders.product[BandRow]
    // watermark AFTER the typed flatMap: the event-time annotation does
    // not survive an object transform, and the stateful operator below
    // needs it on its input
    val banded = docs
      .flatMap { d =>
        minhashSig(d.text).toSeq.flatMap { sig =>
          (0 until NdBands).map { b =>
            // band key folds the band's two minhashes into one long —
            // an 8-byte shuffle key, as in batch d2
            val key = sig(2 * b) * 0x9E3779B97F4A7C15L + sig(2 * b + 1)
            BandRow(d.ts, b, key, d.docId, sig)
          }
        }
      }
      .withWatermark("ts", watermark)
    banded
      .groupByKey(r => (r.bandIdx, r.bandKey))(
        Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong))
      .flatMapGroupsWithState[BucketState, NearDupHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_, rows: Iterator[BandRow], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            val live = state.getOption.map(_.docs).getOrElse(Nil)
              .filter(_._1 >= wm)
            var kept = live
            val hits = List.newBuilder[NearDupHit]
            rows.toSeq.sortBy(r => (r.ts.getTime, r.docId)).foreach { r =>
              kept.foreach { case (_, otherId, otherSig) =>
                if (otherId != r.docId) {
                  var eq = 0
                  var i = 0
                  while (i < NdNumHashes) {
                    if (otherSig(i) == r.sig(i)) eq += 1
                    i += 1
                  }
                  val est = eq.toDouble / NdNumHashes
                  if (est >= threshold)
                    hits += NearDupHit(math.min(otherId, r.docId),
                      math.max(otherId, r.docId), r.bandIdx, est)
                }
              }
              kept = (r.ts.getTime, r.docId, r.sig) :: kept
            }
            // kept always holds at least this batch's rows here (the
            // timed-out branch above handles expiry), so update
            // unconditionally; the bucket dies once the watermark
            // passes its newest entry (+1: the timeout must be
            // strictly beyond the current watermark, and entries AT
            // the watermark are still live)
            state.update(BucketState(kept))
            state.setTimeoutTimestamp(kept.map(_._1).max + 1)
            hits.result().iterator
          }
      }
  }

  /** Streaming sub-document dedup — the streaming twin of
   * d14_paragraph_dedup, for ingest-time removal of repeated passages.
   * Docs are split into non-overlapping `chunkTokens`-token chunks and
   * each chunk is kept on its FIRST ARRIVAL within the watermark
   * horizon (the streaming rendering of batch d14's global first-wins:
   * an unbounded stream can't hold an all-time seen set, the same
   * horizon trade `dropDuplicates`+watermark makes; within a
   * micro-batch, (ts, docId, idx) order makes decisions
   * deterministic). One stateful operator keyed on the chunk's
   * xxhash64: state per key holds the distinct chunk strings seen (so
   * a 64-bit collision can't drop a novel chunk — decisions are exact)
   * and refreshes its event-time timeout on every sighting, so hot
   * boilerplate chunks stay deduped as long as they keep arriving
   * while idle keys expire — state is arrival-rate × horizon, never
   * stream length. Emits per-chunk keep/drop decisions; per-doc
   * reassembly composes downstream (foreachBatch or batch d14 over the
   * sink), the same division of labor as [[nearDupPairs]]'
   * candidates-then-verify. */
  def chunkDedup(docs: Dataset[Doc], chunkTokens: Int = 16,
      watermark: String = "1 hour"): Dataset[ChunkDecision] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.Platform
    implicit val rowEnc = Encoders.product[ChunkRow]
    implicit val stateEnc = Encoders.product[ChunkState]
    implicit val decEnc = Encoders.product[ChunkDecision]
    // watermark AFTER the typed flatMap (see nearDupPairs)
    val rows = docs.flatMap { d =>
      val w = d.text.split(" ", -1)
      val n = math.max(1, math.ceil(w.length / chunkTokens.toDouble).toInt)
      (0 until n).map { i =>
        ChunkRow(d.ts, d.docId, i,
          w.slice(i * chunkTokens, math.min(w.length, (i + 1) * chunkTokens))
            .mkString(" "))
      }
    }.withWatermark("ts", watermark)
    rows
      .groupByKey { r =>
        val b = r.chunk.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
      }(Encoders.scalaLong)
      .flatMapGroupsWithState[ChunkState, ChunkDecision](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_, it: Iterator[ChunkRow], state: GroupState[ChunkState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var seen = state.getOption.map(_.seen).getOrElse(Nil)
            var newest = state.getOption.map(_.newestTsMs).getOrElse(Long.MinValue)
            val out = List.newBuilder[ChunkDecision]
            it.toSeq.sortBy(r => (r.ts.getTime, r.docId, r.idx)).foreach { r =>
              val kept = !seen.contains(r.chunk)
              if (kept) seen ::= r.chunk
              if (r.ts.getTime > newest) newest = r.ts.getTime
              out += ChunkDecision(r.docId, r.idx, r.chunk, kept)
            }
            state.update(ChunkState(seen, newest))
            // strictly beyond the newest sighting, refreshed every
            // batch this key appears in (see nearDupPairs)
            state.setTimeoutTimestamp(newest + 1)
            out.result().iterator
          }
      }
  }

  /** Streaming duplicated-span detection — the streaming twin of
   * d16_dup_spans, completing the batch↔stream pairing of every dedup
   * operator (d1→dedupEvents, d2→nearDupPairs, d14→chunkDedup,
   * d16→this). Docs explode into stride-1 `spanTokens`-token windows; a
   * window whose string has been seen ≥2 times within the watermark
   * horizon emits a duplicated-window decision for EVERY occurrence —
   * including the FIRST, retroactively, when its duplicate arrives
   * (batch d16 flags all occurrences of a duplicated window; storing
   * the first-arrival identity makes the stream agree — a cross-batch
   * duplicate emits the first occurrence's decision in the later
   * batch, the inherent streaming rendering of retroactivity). One
   * stateful operator keyed on the window's xxhash64 (batch d16's hash
   * family); state per key holds the distinct window STRINGS seen (the
   * chunkDedup collision guard: a 64-bit collision cannot conflate
   * different passages — decisions are exact), each with first-arrival
   * location and count, with per-sighting timeout refresh, so hot
   * boilerplate passages stay flagged while idle keys expire — state
   * is arrival-rate × horizon, never stream length. Emits duplicated
   * window STARTS; consecutive starts merge into maximal spans
   * downstream exactly as batch d16's gaps-and-islands (the spec pins
   * the single-batch composition to batch d16's spans). */
  def spanDedup(docs: Dataset[Doc], spanTokens: Int = 8,
      watermark: String = "1 hour"): Dataset[SpanDup] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.Platform
    implicit val rowEnc = Encoders.product[WindowRow]
    // watermark AFTER the typed flatMap (see nearDupPairs)
    val rows = docs.flatMap { d =>
      val w = d.text.split(" ", -1)
      (0 to w.length - spanTokens).map { i =>
        WindowRow(d.ts, d.docId, i, w.slice(i, i + spanTokens).mkString(" "))
      }
    }.withWatermark("ts", watermark)
    dupDetect(rows) { r =>
      val b = r.win.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
    }
  }

  /** The shared stateful core of [[spanDedup]] and
   * [[winnowedSpanDedup]]: hash-keyed duplicated-window detection with
   * exact string-guarded state, retroactive first-occurrence emission
   * and per-sighting timeout refresh. The key function is a pure
   * function of the window STRING, so a 64-bit collision can never
   * conflate passages (the entries list compares strings). */
  private def dupDetect(rows: Dataset[WindowRow])(
      keyFn: WindowRow => Long): Dataset[SpanDup] = {
    implicit val stateEnc = Encoders.product[SpanState]
    implicit val dupEnc = Encoders.product[SpanDup]
    rows
      .groupByKey(keyFn)(Encoders.scalaLong)
      .flatMapGroupsWithState[SpanState, SpanDup](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_, it: Iterator[WindowRow], state: GroupState[SpanState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
            var newest = state.getOption.map(_.newestTsMs).getOrElse(Long.MinValue)
            val out = List.newBuilder[SpanDup]
            it.toSeq.sortBy(r => (r.ts.getTime, r.docId, r.idx)).foreach { r =>
              if (r.ts.getTime > newest) newest = r.ts.getTime
              entries.find(_.win == r.win) match {
                case None =>
                  entries = SpanEntry(r.win, r.docId, r.idx, 1L) :: entries
                case Some(e) =>
                  // the count crossing 2 flags the stored FIRST
                  // occurrence too — batch d16's retroactivity
                  if (e.cnt == 1L) out += SpanDup(e.firstDocId, e.firstIdx)
                  out += SpanDup(r.docId, r.idx)
                  entries = entries.map(x =>
                    if (x.win == r.win) x.copy(cnt = x.cnt + 1) else x)
              }
            }
            state.update(SpanState(entries, newest))
            // strictly beyond the newest sighting, refreshed every
            // batch this key appears in (see nearDupPairs)
            state.setTimeoutTimestamp(newest + 1)
            out.result().iterator
          }
      }
  }

  case class KeyedRow(ts: Timestamp, key: String)
  case class HeavyHit(key: String, count: Long)

  /** q47's streaming twin: heavy-hitter detection at ingest. One
   * stateful operator keyed on the value; state is a single running
   * count per live key, and a key EMITS exactly once — the batch (its
   * threshold-crossing batch) carries (key, count-so-far). Batch q47
   * probes a Count-Min sketch because a 100 TB BATCH wants one pass
   * and no per-key shuffle; the STREAM's natural rendering is exact
   * state — per-key counts are precisely what
   * flatMapGroupsWithState holds, the state row is one long, and
   * idle keys expire with the event-time horizon so state tracks the
   * live key set, not stream history. The parity spec pins the
   * single-batch emitted key set to batch q47's heavy keys. */
  def heavyHitters(rows: Dataset[KeyedRow], minCount: Long = 40L,
      watermark: String = "1 hour"): Dataset[HeavyHit] = {
    implicit val rowEnc = Encoders.product[KeyedRow]
    implicit val stateEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    implicit val outEnc = Encoders.product[HeavyHit]
    rows.withWatermark("ts", watermark)
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[(Long, Long), HeavyHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key, it: Iterator[KeyedRow], state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val (prev, prevNewest) = state.getOption.getOrElse((0L, Long.MinValue))
            var newest = prevNewest
            var c = prev
            it.foreach { r =>
              c += 1
              if (r.ts.getTime > newest) newest = r.ts.getTime
            }
            state.update((c, newest))
            state.setTimeoutTimestamp(newest + 1)
            // exactly-once emission: the count crossed the bar in THIS
            // batch iff it was below before and at-or-above now
            if (prev < minCount && c >= minCount) Iterator(HeavyHit(key, c))
            else Iterator.empty
          }
      }
  }

  /** Batch d22's md5-derived 60-bit window hash — first 15 hex chars
   * of md5, base-16 — value-identical to the engine/oracle expression
   * `conv(substr(md5(x), 1, 15), 16, 10)`, so the stream's winnowing
   * selects exactly the positions batch d22 selects. */
  private[streaming] def md5Hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.take(8).map(b => f"$b%02x").mkString // 16 hex chars
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** The window hash of a single L-token window string under the
   * graft.span.hash knob — md5's 60-bit convention or the d16/d22
   * xxhash64 per-token fold (shared [[graft.functions.TokenWindowHashes]]
   * helpers, so stream keys equal batch fingerprint hashes under
   * either family). */
  private[streaming] def windowHash(algo: String)(win: String): Long =
    if (algo == "md5") md5Hash60(win)
    else {
      // split with limit -1: the exact inverse of the producer's
      // mkString(" ") (window tokens never contain spaces). The
      // default split DROPS trailing empty tokens, so a window whose
      // last token is empty (doc text with consecutive spaces) would
      // fold one hash fewer than batch d22 hashed for the same window
      // and the stream key would diverge from the batch fingerprint.
      val th = win.split(" ", -1).map(t => graft.functions.TokenWindowHashes
        .tokenHash(t.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      graft.functions.TokenWindowHashes.windowKey(th, 0, th.length)
    }

  /** d22's streaming twin: WINNOWED duplicated-fingerprint detection
   * at ingest. Winnowing runs per doc inside the flatMap — the
   * streaming rendering of batch d22's array-domain selection: in
   * every run of `winnowW` consecutive window hashes only the minimum
   * (leftmost on ties, batch's array_position rule) becomes a
   * fingerprint row, so the stateful operator shuffles and keys on
   * ~2/(W+1) of the window stream and holds proportionally fewer
   * state entries — the same cut that funds d22 at 100 TB, applied to
   * the dominant streaming cost (state size × shuffle volume). Dup
   * detection, retroactive first emission, string-guarded exactness
   * and horizon expiry are [[spanDedup]]'s shared core; the parity
   * spec pins the single-batch gap-W island composition span-for-span
   * to batch d22. */
  def winnowedSpanDedup(docs: Dataset[Doc], spanTokens: Int = 8,
      winnowW: Int = 4, watermark: String = "1 hour",
      hashAlgo: String = graft.GraftConf.str(graft.GraftConf.SpanHash, "md5"))
      : Dataset[SpanDup] = {
    require(hashAlgo == "md5" || hashAlgo == "xxhash64",
      s"hashAlgo must be md5 or xxhash64, got $hashAlgo")
    implicit val rowEnc = Encoders.product[WindowRow]
    val rows = docs.flatMap { d =>
      val w = d.text.split(" ", -1)
      if (w.length < spanTokens) Iterator.empty
      else {
        // window hashing + winnow selection are the SHARED batch-kernel
        // helpers (functions.WinnowFingerprints): same hash family,
        // same O(nWin) monotonic-deque argmin, same leftmost-on-ties
        // rule and same truncated-single-run edge for docs with fewer
        // windows than W — the stream selects exactly the positions
        // batch d22 selects, under either knob value, by construction.
        val toks = w.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val th = graft.functions.WinnowFingerprints
          .hashWindows(toks, spanTokens, hashAlgo)
        val selected = graft.functions.WinnowFingerprints
          .winnowSelect(th, winnowW)
        Iterator.range(0, th.length).filter(selected(_)).map(
          i => WindowRow(d.ts, d.docId, i, w.slice(i, i + spanTokens).mkString(" ")))
      }
    }.withWatermark("ts", watermark)
    dupDetect(rows)(r => windowHash(hashAlgo)(r.win))
  }

  /** Per-row Scala spelling of batch t13's signal stage (t1 language
   * scores, t2 quality formula, t9 planted-PII counts) — the constants
   * come from TextQueries so the two spellings cannot drift, and the
   * parity spec pins the outputs value-for-value. */
  private[streaming] def docSignals(d: Doc): DocSignals = {
    import graft.operators.TextQueries.{EmailRe, IpRe, LangOrder, PhoneRe, Stopwords}
    val w = d.text.split(" ", -1)
    val scores = LangOrder.map(l => l -> w.count(Stopwords(l).toSet)).toMap
    val mx = LangOrder.map(scores).max
    val predLang =
      if (mx == 0) "und" else LangOrder.find(l => scores(l) == mx).get
    val stopSet = Stopwords("en").toSet
    val quality = 0.5 * (w.distinct.length.toDouble / w.length) +
      0.3 * (math.min(w.length, 100).toDouble / 100.0) +
      0.2 * (1.0 - w.count(stopSet).toDouble / w.length)
    // t9's deterministic plants, by doc_id residue (withPiiPlants' twin)
    val txt = d.text +
      (if (d.docId % 7 == 0) s" contact user${d.docId}@example.com now" else "") +
      (if (d.docId % 11 == 0) s" from 192.168.${d.docId % 256}.${d.docId % 100} logged" else "") +
      (if (d.docId % 13 == 0) " call 555-123-4567 soon" else "")
    def count(re: String): Int = {
      val m = java.util.regex.Pattern.compile(re).matcher(txt)
      var n = 0
      while (m.find()) n += 1
      n
    }
    DocSignals(d.ts, d.docId, d.text, predLang, quality,
      count(EmailRe) + count(IpRe) + count(PhoneRe))
  }

  /** Streaming corpus curation — the streaming twin of t13_curation,
   * for keep/drop verdicts at ingest. The language/quality/PII signals
   * are pure per-row work ([[docSignals]]); the one stateful piece is
   * the exact-dup gate: first arrival of a text within the watermark
   * horizon is the keeper (the d1→dedupEvents horizon trade), through
   * ONE flatMapGroupsWithState keyed on the text's xxhash64 with state
   * holding the distinct text STRINGS seen (the chunkDedup collision
   * guard) and per-sighting timeout refresh. Verdict rule order is
   * batch t13's: dup → lang → quality → pii → keep. */
  def curateDocs(docs: Dataset[Doc],
      watermark: String = "1 hour"): Dataset[DocVerdict] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.Platform
    implicit val sigEnc = Encoders.product[DocSignals]
    implicit val stateEnc = Encoders.product[ChunkState]
    implicit val outEnc = Encoders.product[DocVerdict]
    // watermark AFTER the typed map (see nearDupPairs)
    val sig = docs.map(docSignals).withWatermark("ts", watermark)
    sig
      .groupByKey { r =>
        val b = r.text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
      }(Encoders.scalaLong)
      .flatMapGroupsWithState[ChunkState, DocVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_, it: Iterator[DocSignals], state: GroupState[ChunkState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var seen = state.getOption.map(_.seen).getOrElse(Nil)
            var newest = state.getOption.map(_.newestTsMs).getOrElse(Long.MinValue)
            val out = List.newBuilder[DocVerdict]
            it.toSeq.sortBy(r => (r.ts.getTime, r.docId)).foreach { r =>
              val keeper = !seen.contains(r.text)
              if (keeper) seen ::= r.text
              if (r.ts.getTime > newest) newest = r.ts.getTime
              val reason =
                if (!keeper) "dup"
                else if (r.predLang == "und") "lang"
                else if (r.quality < 0.6) "quality"
                else if (r.nPii > 0) "pii"
                else "keep"
              out += DocVerdict(r.docId, r.predLang, r.quality, r.nPii,
                if (keeper) 1 else 0, if (reason == "keep") 1 else 0, reason)
            }
            state.update(ChunkState(seen, newest))
            state.setTimeoutTimestamp(newest + 1)
            out.result().iterator
          }
      }
  }

  /** Streaming frame-level dedup — the streaming twin of
   * m5_frame_dedup, for ingest-time reused-footage detection: decoded
   * frames keep on FIRST ARRIVAL within the watermark horizon, exactly
   * as [[chunkDedup]] keeps text chunks (same state discipline:
   * event-time timeout refreshed per sighting, so state is
   * arrival-rate × horizon). Decode runs map-side in the flatMap;
   * identity is a 128-bit md5 over dims + raster — state CANNOT hold
   * rasters at production frame sizes, so unlike chunkDedup's
   * keep-the-strings collision guard this twin accepts the standard
   * content-address trade (2⁻¹²⁸ conflation; batch m5 makes the same
   * trade at 56 bits and its oracle gate bounds it). Uniform-ts
   * single-batch input reproduces batch m5's keeper flags exactly
   * ((ts, docId, frameIdx) arrival order ≡ batch's min(struct)
   * first-wins — spec-anchored). */
  def frameDedup(clips: Dataset[Clip],
      watermark: String = "1 hour"): Dataset[FrameDecision] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.Platform
    implicit val rowEnc = Encoders.product[FrameRow]
    implicit val stateEnc = Encoders.product[ChunkState]
    implicit val decEnc = Encoders.product[FrameDecision]
    // watermark AFTER the typed flatMap (see nearDupPairs)
    val rows = clips.flatMap { c =>
      graft.operators.PpmCodec.decodeFrames(c.payload).zipWithIndex.map {
        case (img, f) =>
          FrameRow(c.ts, c.docId, f, img.width, img.height,
            graft.operators.PpmCodec.frameDigest(img)
              .map("%02x".format(_)).mkString)
      }
    }.withWatermark("ts", watermark)
    rows
      .groupByKey { r =>
        val b = r.contentId.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
      }(Encoders.scalaLong)
      .flatMapGroupsWithState[ChunkState, FrameDecision](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_, it: Iterator[FrameRow], state: GroupState[ChunkState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var seen = state.getOption.map(_.seen).getOrElse(Nil)
            var newest = state.getOption.map(_.newestTsMs).getOrElse(Long.MinValue)
            val out = List.newBuilder[FrameDecision]
            it.toSeq.sortBy(r => (r.ts.getTime, r.docId, r.frameIdx)).foreach { r =>
              val keeper = !seen.contains(r.contentId)
              if (keeper) seen ::= r.contentId
              if (r.ts.getTime > newest) newest = r.ts.getTime
              out += FrameDecision(r.docId, r.frameIdx, r.w, r.h, keeper)
            }
            state.update(ChunkState(seen, newest))
            state.setTimeoutTimestamp(newest + 1)
            out.result().iterator
          }
      }
  }

  /** Streaming perceptual image dedup — the streaming twin of
   * m6_image_phash, completing the dedup-family rule that every batch
   * dedup op has an ingest-time twin: images keep on FIRST ARRIVAL of
   * their PERCEPTUAL address within the watermark horizon. Decode +
   * average-hash run map-side; identity is (w, h, aHash) — NOT byte
   * identity, so a re-encoded / lightly-perturbed copy of an already-
   * seen image is dropped at ingest exactly as batch m6 collapses it.
   * Same state discipline as [[frameDedup]] (event-time timeout
   * refreshed per sighting; state holds the compact address strings, a
   * few dozen bytes per distinct image, never rasters). Uniform-ts
   * single-batch input reproduces batch m6's keeper flags exactly
   * ((ts, docId) arrival order ≡ batch's min(doc_id) first-wins —
   * spec-anchored). */
  def imageDedup(images: Dataset[Clip],
      watermark: String = "1 hour"): Dataset[ImageDecision] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.Platform
    implicit val rowEnc = Encoders.product[ImageRow]
    implicit val stateEnc = Encoders.product[ChunkState]
    implicit val decEnc = Encoders.product[ImageDecision]
    // watermark AFTER the typed map (see nearDupPairs)
    val rows = images.map { c =>
      val img = graft.operators.PpmCodec.decode(c.payload)
      ImageRow(c.ts, c.docId, img.width, img.height,
        graft.operators.PpmCodec.aHash(img))
    }.withWatermark("ts", watermark)
    def address(r: ImageRow): String = s"${r.w}:${r.h}:${r.phash}"
    rows
      .groupByKey { r =>
        val b = address(r).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
      }(Encoders.scalaLong)
      .flatMapGroupsWithState[ChunkState, ImageDecision](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_, it: Iterator[ImageRow], state: GroupState[ChunkState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var seen = state.getOption.map(_.seen).getOrElse(Nil)
            var newest = state.getOption.map(_.newestTsMs).getOrElse(Long.MinValue)
            val out = List.newBuilder[ImageDecision]
            it.toSeq.sortBy(r => (r.ts.getTime, r.docId)).foreach { r =>
              val a = address(r)
              val keeper = !seen.contains(a)
              if (keeper) seen ::= a
              if (r.ts.getTime > newest) newest = r.ts.getTime
              out += ImageDecision(r.docId, r.w, r.h, r.phash, keeper)
            }
            state.update(ChunkState(seen, newest))
            state.setTimeoutTimestamp(newest + 1)
            out.result().iterator
          }
      }
  }

  /** Event-time sessionization with a 30-minute inactivity gap — the
   * streaming twin of t5_sessionize, via flatMapGroupsWithState with an
   * event-time timeout. Emits a session once the watermark passes its
   * gap deadline; per-user state is one small struct, so state scales
   * with active users only. */
  /** t15's streaming twin: chunk-at-ingest. Stateless — each arriving
   * document immediately emits its fixed-size overlapping token
   * windows (no state, no watermark; append-mode safe at any rate),
   * with the SAME window geometry as batch t15 (size 64, stride 48):
   * starts are every `stride`-th token index strictly inside the
   * token list, so the final partial window is kept and an empty text
   * (one empty token under split-by-space) still emits chunk 0. */
  def chunkDocs(docs: Dataset[Doc], size: Int = 64,
      stride: Int = 48): Dataset[DocChunk] = {
    implicit val enc = Encoders.product[DocChunk]
    docs.flatMap { d =>
      val w = d.text.split(" ", -1)
      (0 until w.length by stride).map { st =>
        DocChunk(d.ts, d.docId, st / stride,
          w.slice(st, st + size).mkString(" "),
          math.min(size, w.length - st))
      }
    }
  }

  /**
   * t16's streaming twin: INCREMENTAL corpus-LM scoring. The model
   * (unigram counts, bigram counts, vocabulary size) lives as
   * epoch-keyed DELTA relations under `modelDir` — distributed parquet,
   * never a driver table — and each epoch's arriving documents are
   * scored against the model folded from every epoch up to and
   * including their own (the PREFIX model). Scores land under
   * `scoresDir/epoch=N`.
   *
   * Exactly-once without a sink log: deltas and scores are keyed by the
   * micro-batch epoch and OVERWRITTEN in place, so a replayed epoch
   * rewrites identical content instead of double-counting; deltas from
   * a crashed run's later epochs are excluded by the `epoch <= current`
   * filter, keeping prefix semantics exact across restarts.
   *
   * Scale shape: the per-epoch delta is a map-side aggregate of that
   * epoch's docs; the fold is a sum-groupBy over vocabulary-sized
   * relations (words and word pairs — slowly-growing, corpus-sublinear),
   * re-run per epoch. That O(model) fold per epoch is the same cost
   * class as the compacting merge any incremental-materialization sink
   * pays; throttle triggers (or compact every Nth epoch like the SCBF
   * manifest) if epochs are tiny. Tokenization and smoothing reuse
   * batch t16's exact expressions (TextQueries.BigramExpr /
   * lmScoreAgainst), so streaming epoch-k scores are parity-anchored to
   * batch t16 run over the same document prefix.
   */
  def lmScoreStream(docs: Dataset[Doc], modelDir: String, scoresDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.toDF().writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        lmScoreEpoch(batch, epochId, modelDir, scoresDir)
      }
      .start()

  private[streaming] def lmScoreEpoch(batch: DataFrame, epoch: Long,
      modelDir: String, scoresDir: String): Unit = {
    import graft.operators.TextQueries
    val s = batch.sparkSession
    if (batch.isEmpty) return // idle trigger: no delta, no scores
    val docs = batch.select(col("docId").as("doc_id"),
      split(col("text"), " ").as("w"))
    val bg = docs.withColumn("b", explode(expr(TextQueries.BigramExpr)))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    // this epoch's model delta, written BEFORE scoring so the prefix
    // model below includes the epoch's own documents (batch parity)
    bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      .write.mode("overwrite").parquet(s"$modelDir/c2/epoch=$epoch")
    docs.select(explode(col("w")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      .write.mode("overwrite").parquet(s"$modelDir/c1/epoch=$epoch")
    val c2 = s.read.parquet(s"$modelDir/c2").filter(col("epoch") <= epoch)
      .groupBy(col("w1"), col("w2")).agg(sum(col("c2")).as("c2"))
    val c1 = s.read.parquet(s"$modelDir/c1").filter(col("epoch") <= epoch)
      .groupBy(col("w1")).agg(sum(col("c1")).as("c1"))
    val vocab = c1.agg(count(lit(1)).as("v"))
    TextQueries.lmScoreAgainst(bg, c2, c1, vocab)
      .write.mode("overwrite").parquet(s"$scoresDir/epoch=$epoch")
  }

  case class SrcDoc(ts: Timestamp, docId: Long, source: String, text: String)
  case class MixtureAdmit(source: String, docId: Long, tokens: Int,
      cumTokens: Long, budget: Long)

  /**
   * t14's streaming twin: budget-capped mixture sampling at ingest.
   * Per-source state is ONE long (tokens consumed so far — bounded by
   * source count, not stream length); an arriving doc is admitted iff
   * the running total stays within the source's budget, and its tokens
   * count toward the total EITHER WAY — batch t14 filters a prefix sum
   * (`cum <= budget`), so once the total overflows, everything after is
   * rejected too; mirroring that keeps the two implementations
   * convergent rather than look-alike.
   *
   * Ordering: batch t14 samples by md5(doc_id) — a deterministic
   * pseudo-random shuffle of the WHOLE corpus, which no stream can
   * reproduce across epochs without buffering everything. The twin
   * applies the same md5 order WITHIN each micro-batch and
   * first-arrival precedence ACROSS batches (the same semantic shape
   * as the dedup twins' first-arrival-wins vs batch's min-key winner);
   * a single-batch run is therefore EXACTLY batch t14, pinned by the
   * parity spec.
   *
   * Budget formula shared with batch t14: base × (1 + srcIndex % 3),
   * srcIndex parsed from the source name's digits.
   */
  def mixtureSample(docs: Dataset[SrcDoc], budgetBase: Int = 400): Dataset[MixtureAdmit] = {
    implicit val outEnc = Encoders.product[MixtureAdmit]
    implicit val stateEnc = Encoders.scalaLong
    docs.groupByKey(_.source)(Encoders.STRING)
      .flatMapGroupsWithState[Long, MixtureAdmit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (source: String, batch: Iterator[SrcDoc], state: GroupState[Long]) =>
          val budget = budgetBase.toLong *
            (1L + (source.dropWhile(!_.isDigit) match {
              case "" => 0L
              // first 18 digits only: a 20+-digit run would overflow
              // toLong and fail the query; batch t14's CAST(... AS INT)
              // is equally partial on such names, so truncation (not a
              // crash) is the matching behavior
              case ds => ds.takeWhile(_.isDigit).take(18).toLong % 3
            }))
          var consumed = state.getOption.getOrElse(0L)
          val md = java.security.MessageDigest.getInstance("MD5")
          def md5hex(s: String): String =
            md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
          val out = batch.toSeq
            .sortBy(d => (md5hex(d.docId.toString), d.docId))
            .flatMap { d =>
              val tokens = d.text.split(" ", -1).length
              consumed += tokens
              if (consumed <= budget)
                Some(MixtureAdmit(source, d.docId, tokens, consumed, budget))
              else None
            }
          state.update(consumed)
          out.iterator
      }
  }

  /** t17's streaming twin: the per-source dataset digest as a RUNNING
   * streaming aggregate — count + XOR fold of the same canonical row
   * hash (shared via [[graft.operators.TextQueries.rowDigest]], so the
   * two can never drift). XOR is associative/commutative, so the
   * incremental state (one long per source) equals the batch digest
   * over everything ingested so far — a training pipeline reads the
   * CURRENT dataset identity off the stream at any epoch. Run it in
   * update mode (re-emits changed sources per trigger) or complete
   * mode (the full per-source table, what the parity spec uses). */
  def datasetFingerprint(docs: Dataset[SrcDoc]): DataFrame =
    graft.operators.TextQueries.rowDigest(
        docs.toDF().select(col("docId").as("doc_id"), col("source"), col("text")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("xor_digest"))

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
