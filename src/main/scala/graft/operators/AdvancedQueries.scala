package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Advanced operator coverage: the operators Spark has no single built-in
 * for (as-of join, range/band join, second-max UDAF) composed from
 * primitives per the design preference order — compose existing ops
 * first, custom expression/UDAF only when composition can't express it.
 */
object AdvancedQueries {

  import Ops.{t, events, dsum, spread}

  /** q47's heavy-hitter threshold (occurrences of one l_partkey) —
   * picks the upper tail at every driver SF (6 keys at sf0.001, 85 at
   * sf0.01, 914 at sf0.1). */
  private val HeavyHitterMin = 40

  /** Strictly-less-than-max second maximum, as a typed Aggregator — the
   * UDAF surface. Buffer is the (top1, top2) pair; merge is associative
   * and commutative, so partial aggregation applies as usual. */
  class SecondMax extends Aggregator[Double, (Double, Double), Double] {
    def zero: (Double, Double) = (Double.NegativeInfinity, Double.NegativeInfinity)
    def reduce(b: (Double, Double), v: Double): (Double, Double) =
      if (v > b._1) (v, b._1)
      else if (v < b._1 && v > b._2) (b._1, v)
      else b
    def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) = {
      val r = reduce(a, b._1)
      if (b._2 > Double.NegativeInfinity) reduce(r, b._2) else r
    }
    def finish(r: (Double, Double)): Double = r._2
    def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- as-of join: latest click at-or-before each purchase ----
    // The scalable composition: union both sides into one stream, one
    // window pass with last(_, ignoreNulls) — no range join, no skewed
    // per-key explosion; shuffle is a single hash on user_id.
    "q21_asof_join" -> { (s, dir) =>
      // order by MICROsecond ts like the oracle (epoch_us): nanosecond
      // ordering could flip two same-user events within one microsecond
      val w = Window.partitionBy(col("user_id"))
        .orderBy(expr("ts div 1000"), col("event_id"))
      events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
        .withColumn("click_ts", when(col("event_type") === "click", col("ts")))
        .withColumn("asof_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        // DuckDB reads TIMESTAMP(NANOS) parquet at microsecond precision,
        // so report both timestamps in µs
        .select(col("event_id").as("purchase_id"), col("user_id"),
          expr("ts div 1000").as("purchase_ts"), // integer div: ts/1000 in
          // double arithmetic is off by 1 at 1.7e18
          coalesce(expr("asof_click_ts div 1000"), lit(-1L)).as("asof_click_ts"))
    },

    // ---- range (band) join: orders into price bands ----
    // Broadcast the tiny band table; the fact side streams through a
    // nested-loop probe with no shuffle — the standard banding shape.
    "q22_range_join" -> { (s, dir) =>
      val bands = s.range(0, 5).select(
        col("id").cast("int").as("band"),
        (col("id") * 100000).cast("double").as("lo"),
        ((col("id") + 1) * 100000).cast("double").as("hi"))
      t(s, dir, "orders")
        .join(broadcast(bands), col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice"), 2).as("sum_price"))
    },

    // ---- full cube with explicit grouping bits ----
    // Pre-aggregate per (rf, ls) BEFORE the cube (optimization r15):
    // Spark's cube/rollup plans an Expand that multiplies the input
    // stream by the number of grouping sets (×4 here) before the first
    // partial aggregate — four corpus passes through the hash aggregate
    // at 100 TB. The aggregates are distributive (decimal SUM;
    // COUNT re-aggregates as SUM), so they re-aggregate exactly from
    // the tiny (rf, ls) base relation: the Expand now multiplies
    // |rf × ls| rows and the corpus passes ONE partial-aggregated
    // groupBy. The inner sum stays DECIMAL until the single final cast,
    // so two-level summation is bit-identical to single-level (exact
    // integer arithmetic at both levels — the dsum discipline).
    "q23_cube" -> { (s, dir) =>
      Ops.rfLsQtyBase(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("q")).cast("double").as("sum_qty"), sum(col("c")).as("cnt"),
          (grouping(col("l_returnflag")).cast("int") * 2 +
            grouping(col("l_linestatus")).cast("int")).as("grp"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
          coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
          col("grp"), col("sum_qty"), col("cnt"))
    },

    // ---- window-function breadth: lag, dense_rank, frames, ntile ----
    // Partitioned by priority (5 groups): per-row window output cannot
    // be candidate-pruned like q6's top-k, so at extreme scale the
    // partition key would need a finer time-bucketed composite; kept
    // simple here to exercise the frame/rank/ntile surface.
    "q24_window_frames" -> { (s, dir) =>
      val w1 = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wRank = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc)
      t(s, dir, "orders").select(
        col("o_orderkey"),
        coalesce(lag(col("o_totalprice"), 1).over(w1), lit(-1.0)).as("lag_price"),
        dense_rank().over(wRank).as("drank"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .over(w1.rowsBetween(-2, 0)).cast("double").as("mov3"),
        ntile(4).over(w1).as("nt"))
    },

    // ---- JSON scalar functions over the events props column ----
    "q25_json_extract" -> { (s, dir) =>
      events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    },

    // ---- array/map/math scalar functions over part ----
    "q26_array_fns" -> { (s, dir) =>
      t(s, dir, "part")
        .withColumn("words", split(col("p_name"), " "))
        .withColumn("uw", array_distinct(col("words")))
        .select(col("p_partkey"),
          size(col("words")).as("n_words"),
          element_at(col("words"), 1).as("first_word"),
          array_join(array_sort(col("words")), "_").as("sorted_name"),
          array_contains(col("words"), "green").as("has_green"),
          // map functions: word -> length lookup of the first word
          element_at(map_from_arrays(col("uw"),
            expr("transform(uw, x -> length(x))")), element_at(col("words"), 1))
            .as("first_word_len"),
          // math functions with IEEE-exact cross-engine results
          sqrt(col("p_size").cast("double")).as("sqrt_size"),
          abs(col("p_retailprice") - 1000.0).as("abs_ctr"))
    },

    // ---- custom UDAF: strictly-less second max per priority ----
    "q27_second_max" -> { (s, dir) =>
      val secondMax = udaf(new SecondMax())
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(secondMax(col("o_totalprice")).as("second_max"))
        // a group with no strictly-smaller second value yields the
        // -Infinity sentinel; the oracle's WHERE drops such groups
        .filter(col("second_max") =!= Double.NegativeInfinity)
    },

    // ---- pivot: long-to-wide reshaping ----
    // Explicit value list: at scale the implicit variant would scan once
    // just to discover pivot values.
    "q30_pivot" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(Ops.dsum(col("l_quantity"), 2))
        .withColumnsRenamed(Map("F" -> "qty_f", "O" -> "qty_o"))
        .na.fill(0.0, Seq("qty_f", "qty_o"))
    },

    // ---- unpivot: wide-to-long reshaping (inverse of q30) ----
    "q31_unpivot" -> { (s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          col("p_size").cast("double").as("size"),
          col("p_retailprice").as("retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("size"), col("retailprice")), "metric", "value")
    },

    // ---- explicit GROUPING SETS (SQL surface; distinct from rollup/cube) ----
    "q29_grouping_sets" -> { (s, dir) =>
      // Dataset.groupingSets (Spark 4): same Expand-based plan as the SQL
      // GROUPING SETS surface, with zero catalog mutation — the previous
      // fixed-name temp view raced concurrent callers over different dirs.
      // Pre-aggregated per (rf, ls) before the Expand — the q23
      // rationale: ×3 grouping sets now multiply the tiny base
      // relation, not the corpus; distributive aggregates re-aggregate
      // exactly (decimal stays decimal until the one final cast).
      Ops.rfLsQtyBase(s, dir)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("q")).cast("double").as("sum_qty"), sum(col("c")).as("cnt"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
          coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
          col("sum_qty"), col("cnt"))
    },

    // ---- sketch aggregates (HLL++, approximate quantiles) ----
    // The approximate-but-mergeable aggregates that actually run at
    // 100 TB where exact distinct/percentile cannot. Approximate ≠
    // uncheckable: the query computes the EXACT twins alongside the
    // sketches and emits bounded-error verdict booleans — HLL++
    // (rsd 0.02) within 4×rsd of COUNT(DISTINCT), percentile_approx
    // (accuracy 1000, rank error 1/1000) inside the exact values at
    // ±0.01 rank (10× the guarantee — slack for interpolation at the
    // exact side). The oracle asserts the exact columns and literal
    // TRUE for every verdict, so a sketch drifting out of bounds is a
    // hash mismatch — a real machine gate, not a rows-only count.
    // Plan shape matters here (the round-7 floors run caught the naive
    // form at 46 s): TWO countDistincts in one aggregate force an
    // Expand (×3 the input), and Spark's EXACT `percentile` aggregate
    // merges a value→count hash map per group — ~every distinct price
    // serialized between partial and merge. Instead: (a) the sketches
    // run alone in one mergeable small-state pass — the 100 TB path;
    // (b) each exact distinct twin is its own expand-free two-phase
    // aggregate; (c) the exact rank bounds come from a per-group
    // row_number sort, reading off the values at the bracketing ranks
    // — rank ⌊0.49(n−1)⌋+1 ≤ interp(0.49) and interp(0.51) ≤ rank
    // ⌈0.51(n−1)⌉+1, so the bracket still bounds the sketch's rank
    // error at 10× its 1/1000 guarantee. The exact twins are the
    // GATE's cost, not the operator's: a deployment runs (a) alone.
    "q28_sketches" -> { (s, dir) =>
      val li = t(s, dir, "lineitem").select(col("l_returnflag").as("rf"),
        col("l_partkey"), col("l_orderkey"), col("l_extendedprice"))
      val sk = li.groupBy(col("rf")).agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("ao"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("am"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(1000)).as("a95"))
      val ep = li.select(col("rf"), col("l_partkey")).distinct()
        .groupBy(col("rf")).agg(count(lit(1)).as("exact_parts"))
      val eo = li.select(col("rf"), col("l_orderkey")).distinct()
        .groupBy(col("rf")).agg(count(lit(1)).as("exact_orders"))
      // Exact value-at-rank WITHOUT the per-rf global sort at scale
      // (optimization r15): a row_number over partitionBy(rf) funnels
      // the whole table through |rf| = 3 tasks (profiled: a 673 ms
      // 3-task stage at sf0.1 — and a straggler sort of N/3 rows at
      // 100 TB). valueAtRankBounds picks the plan from the source's
      // split count vs the session's parallelism (the spreadIfNarrow
      // rule): a narrow source cannot fill the session anyway, so the
      // 3-task sort is bounded by the (small) input and skips the
      // chunked path's sampling pass + checkpoint; a wide source takes
      // q34's chunked-rank machinery — all chunks sorting in parallel.
      // Both paths read identical boundary values (RankBoundsSpec).
      val rfv = li.select(col("rf"), col("l_extendedprice").as("v"))
      val bounds = valueAtRankBounds(s, rfv, chunked = !Ops.isNarrow(s, rfv))
      sk.join(ep, "rf").join(eo, "rf").join(bounds, "rf")
        .select(col("rf"), col("exact_parts"), col("exact_orders"),
          (abs(col("ap") - col("exact_parts")) <= col("exact_parts") * lit(0.08))
            .as("parts_ok"),
          (abs(col("ao") - col("exact_orders")) <= col("exact_orders") * lit(0.08))
            .as("orders_ok"),
          (col("am") >= col("mlo_v") && col("am") <= col("mhi_v")).as("median_ok"),
          (col("a95") >= col("plo_v") && col("a95") <= col("phi_v")).as("p95_ok"))
    },

    // ---- approximate heavy hitters: Count-Min sketch, bounded-error gate ----
    // The third sketch family (q28 covers HLL++ and quantiles): at
    // 100 TB exact per-key counts of a high-cardinality column are a
    // full shuffle, while the CMS is ONE mergeable ~112 KB summary
    // built in a single pass. Spark provides the `count_min_sketch`
    // AGGREGATE but no probe function — CmsEstimate (a codegen
    // expression carrying the sketch as plan-attached model state, the
    // CentroidSims pattern) supplies per-row estimates through the
    // same byte path the aggregate adds with. The gate is q28's
    // pattern made CMS-shaped: per heavy key, assert the structural
    // guarantees — est ≥ exact (CMS never undercounts) and
    // est ≤ exact + 2εN (twice the ε-bound the depth/confidence pair
    // guarantees w.p. 0.99 — deterministic for a fixed seed, verified
    // at sf0.001/0.01/0.1 AND the 100× fixture). The exact twin
    // exists to power the gate; a deployment runs the sketch alone.
    "q47_heavy_hitters" -> { (s, dir) =>
      val eps = 0.001
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey").cast("string").as("part_key"))
      // driver-side collect of the MODEL (the IVF-centroid precedent):
      // one 112 KB sketch row, never the data
      val skBytes = li
        .agg(expr(s"count_min_sketch(part_key, ${eps}d, 0.99d, 42)").as("sk"))
        .head.getAs[Array[Byte]](0)
      val exact = li.groupBy(col("part_key"))
        .agg(count(lit(1)).as("exact_cnt"))
        .filter(col("exact_cnt") >= HeavyHitterMin)
      val total = li.agg(count(lit(1)).as("n"))
      exact
        .withColumn("est",
          graft.functions.GraftFunctions.cmsEstimate(col("part_key"), skBytes))
        .crossJoin(broadcast(total))
        .select(col("part_key"), col("exact_cnt"),
          (col("est") >= col("exact_cnt")).as("no_undercount"),
          (col("est") <= col("exact_cnt") +
            ceil(lit(2 * eps) * col("n")).cast("long")).as("bounded_overcount"))
    },

    // ---- q24's frame surface at scale: chunked windows throughout ----
    // q24 exercises lag / dense_rank / moving frames / ntile with the
    // semantic partition key (o_orderpriority, 5 values) — correct, but
    // each of 5 tasks sorts N/5 rows at scale (the acknowledged weak
    // spot of round 1). q34 computes the IDENTICAL output with bounded
    // tasks: (a) lag + mov3 via per-chunk windows on a (priority, date,
    // key) range partitioning, with the previous chunk's last two rows
    // joined in from a ≤ chunks×priorities summary table; (b)
    // dense_rank via a second range partitioning in rank order, local
    // dense ranks + prefix distinct-counts minus boundary-value
    // overlaps; (c) ntile arithmetically from the prefix-scan row
    // number and per-priority totals (Spark's first-buckets-get-the-
    // remainder rule). Every global window here runs over the summary
    // table (rows = chunks × priorities), never the data. Oracle:
    // q24's own SQL — the two must hash-match; ScalableFramesSpec also
    // pins q34 == q24 row for row.
    "q34_scalable_frames" -> { (s, dir) =>
      val n = 4 // ntile buckets, as q24
      val dec = DecimalType(18, 2)
      val pri = col("o_orderpriority")
      // ---- pipeline A: date-ordered frames (lag, mov3, rn, ntile) ----
      val ordA = t(s, dir, "orders")
        .select(col("o_orderkey"), pri, col("o_orderdate"), col("o_totalprice"))
        .repartitionByRange(spread(s), pri, col("o_orderdate"), col("o_orderkey"))
        .withColumn("pid", spark_partition_id())
      val wA = Window.partitionBy(col("pid"), pri)
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      // checkpoint AFTER the window pass (q32's pattern): pins pid↔row
      // for the two consumers AND materializes the heavy per-chunk
      // sort+window exactly once — checkpointing ordA instead would run
      // it twice (once per consumer subtree).
      // Pipelines A and B are data-INDEPENDENT until the final join, so
      // their checkpoints materialize concurrently (optimization r15,
      // guide §2.6): profiled serially, each front is a range-sampling
      // job + a 1-task boundary job + the chunk sort — ~1.4 s of the
      // query's wall was the two fronts queueing behind each other.
      val (locA, ordB) = Ops.overlap {
        ordA
          .withColumn("lrn", row_number().over(wA))
          .withColumn("lcnt", count(lit(1)).over(
            wA.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .withColumn("llag", lag(col("o_totalprice"), 1).over(wA))
          .withColumn("lmov3", sum(col("o_totalprice").cast(dec))
            .over(wA.rowsBetween(-2, 0)))
          .localCheckpoint()
      } {
        t(s, dir, "orders")
          .select(col("o_orderkey"), pri, col("o_totalprice"))
          .repartitionByRange(spread(s), pri, col("o_totalprice").desc, col("o_orderkey"))
          .withColumn("pid", spark_partition_id())
          .localCheckpoint()
      }
      // last two rows of each (chunk, priority) group, for boundary fix
      val summA = locA
        .filter(col("lrn") >= col("lcnt") - 1)
        .groupBy(col("pid"), pri).agg(
          max(col("lcnt")).as("cnt"),
          max(when(col("lrn") === col("lcnt"), col("o_totalprice"))).as("last1"),
          max(when(col("lrn") === col("lcnt") - 1, col("o_totalprice"))).as("last2"))
      val wPri = Window.partitionBy(pri).orderBy(col("pid"))
      val prefixA = summA.select(col("pid"), pri,
          coalesce(sum(col("cnt")).over(wPri.rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)).as("precnt"),
          sum(col("cnt")).over(
            wPri.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
            .as("totcnt"),
          lag(col("last1"), 1).over(wPri).as("prev1"),
          // second-to-last row before this chunk: the previous group's
          // last2 if it had >= 2 rows, else the group before that's last1
          when(lag(col("cnt"), 1).over(wPri) >= 2, lag(col("last2"), 1).over(wPri))
            .otherwise(lag(col("last1"), 2).over(wPri)).as("prev2"))
      val a = locA.join(broadcast(prefixA), Seq("pid", "o_orderpriority"))
        .withColumn("rn", col("precnt") + col("lrn"))
        .withColumn("lag_price",
          coalesce(when(col("lrn") === 1, col("prev1")).otherwise(col("llag")), lit(-1.0)))
        .withColumn("mov3",
          (col("lmov3")
            + coalesce(when(col("lrn") <= 2, col("prev1").cast(dec)), lit(0).cast(dec))
            + coalesce(when(col("lrn") === 1, col("prev2").cast(dec)), lit(0).cast(dec)))
            .cast("double"))
        // Spark ntile: base rows per bucket, first (cnt % n) buckets
        // take one extra — pure arithmetic on (rn, totcnt). `div`, not
        // `/`: SQL division on longs is a double. The base=0 case
        // (fewer rows than buckets) is fully covered by the first
        // branch, so the otherwise-branch div-by-zero is unreachable.
        .withColumn("base", expr(s"totcnt div $n"))
        .withColumn("rem", col("totcnt") % n)
        .withColumn("nt",
          when(col("rn") <= col("rem") * (col("base") + 1),
            expr("(rn - 1) div (base + 1) + 1"))
            .otherwise(expr("rem + (rn - rem * (base + 1) - 1) div base + 1"))
            .cast("int"))
        .select(col("o_orderkey"), col("lag_price"), col("mov3"), col("nt"))
      // ---- pipeline B: rank-ordered dense_rank (ordB built above) ----
      val wB = Window.partitionBy(col("pid"), pri).orderBy(col("o_totalprice").desc)
      val locB = ordB.withColumn("ldr", dense_rank().over(wB))
      val summB = ordB.groupBy(col("pid"), pri).agg(
        countDistinct(col("o_totalprice")).as("cntd"),
        max(col("o_totalprice")).as("firstPrice"), // chunk sorts desc
        min(col("o_totalprice")).as("lastPrice"))
      val dupe = when(lag(col("lastPrice"), 1).over(wPri) === col("firstPrice"), 1L)
        .otherwise(0L)
      val prefixB = summB.select(col("pid"), pri,
        (coalesce(sum(col("cntd")).over(wPri.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L))
          - sum(dupe).over(wPri.rowsBetween(Window.unboundedPreceding, 0))).as("droff"))
      val b = locB.join(broadcast(prefixB), Seq("pid", "o_orderpriority"))
        .select(col("o_orderkey"), (col("ldr") + col("droff")).cast("int").as("drank"))
      a.join(b, "o_orderkey")
        .select(col("o_orderkey"), col("lag_price"), col("drank"), col("mov3"), col("nt"))
    },

    // ---- built-in session windows (declarative twin of t5) ----
    // t5 builds sessions by hand (gaps-and-islands window); this is the
    // Spark-first spelling — `session_window` plans as one aggregation
    // with session merge, partial-aggregates map-side, and is the same
    // construct the streaming path uses with watermarks. Session merge
    // rule (probed empirically on this Spark build): next <= previous
    // end (= prev_ts + gap) — events EXACTLY one gap apart merge — so
    // the oracle's island break is strictly diff > gap, pinned by
    // SessionBoundarySpec. Timestamps stay in exact integer micros
    // end-to-end (nanos div 1000 both engines).
    "q33_session_window" -> { (s, dir) =>
      events(s, dir)
        .withColumn("tsm", expr("timestamp_micros(ts div 1000)")) // integer div: SQL `/` on longs is a lossy double at 1.7e18 ns
        .groupBy(col("user_id"), session_window(col("tsm"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("ev_cnt"))
        .select(col("user_id"),
          unix_micros(col("sw.start")).as("sess_start_us"),
          unix_micros(col("sw.end")).as("sess_end_us"),
          col("ev_cnt"))
    }
  )

  /** q28's exact value-at-rank bounds — two plans, one result.
   * Input must have exactly (rf, v); output is one row per rf with the
   * four boundary values (mlo_v, mhi_v, plo_v, phi_v) at the bracketing
   * ranks. `chunked = false`: one row_number window per rf (|rf| tasks
   * — fine only when the source cannot fill the session anyway).
   * `chunked = true`: range-partition by (rf, v) into spread(s) chunks,
   * rank locally per (chunk, rf), add a broadcast per-rf prefix of
   * chunk counts (q34's machinery) — every chunk sorts in parallel and
   * no task holds more than ~N/spread rows. Values at each rank are
   * invariant to how range partitioning splits ties (ordering is by v
   * alone), so the boundary values are identical on both paths;
   * RankBoundsSpec pins that on tie-heavy data. */
  private[graft] def valueAtRankBounds(s: SparkSession, rfv: DataFrame,
      chunked: Boolean): DataFrame = {
    val ranked =
      if (!chunked) {
        rfv.withColumn("rn",
            row_number().over(Window.partitionBy(col("rf")).orderBy(col("v"))))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("rf"))))
      } else {
        val vals = rfv
          .repartitionByRange(spread(s), col("rf"), col("v"))
          .withColumn("pid", spark_partition_id())
          .localCheckpoint() // pins pid↔row for the two consumers below
        val summ = vals.groupBy(col("pid"), col("rf")).agg(count(lit(1)).as("cnt"))
        val wPre = Window.partitionBy(col("rf")).orderBy(col("pid"))
        val prefix = summ.select(col("pid"), col("rf"),
          coalesce(sum(col("cnt")).over(wPre.rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)).as("precnt"),
          sum(col("cnt")).over(wPre.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)).as("n"))
        val wLoc = Window.partitionBy(col("pid"), col("rf")).orderBy(col("v"))
        vals.withColumn("lrn", row_number().over(wLoc))
          .join(broadcast(prefix), Seq("pid", "rf"))
          .withColumn("rn", col("precnt") + col("lrn"))
      }
    ranked
      .select(col("rf"), col("v"), col("rn"),
        (floor(lit(0.49) * (col("n") - 1)) + 1).as("mlo"),
        least(ceil(lit(0.51) * (col("n") - 1)) + 1, col("n")).as("mhi"),
        (floor(lit(0.94) * (col("n") - 1)) + 1).as("plo"),
        least(ceil(lit(0.96) * (col("n") - 1)) + 1, col("n")).as("phi"))
      .filter(col("rn") === col("mlo") || col("rn") === col("mhi") ||
        col("rn") === col("plo") || col("rn") === col("phi"))
      .groupBy(col("rf")).agg(
        max(when(col("rn") === col("mlo"), col("v"))).as("mlo_v"),
        max(when(col("rn") === col("mhi"), col("v"))).as("mhi_v"),
        max(when(col("rn") === col("plo"), col("v"))).as("plo_v"),
        max(when(col("rn") === col("phi"), col("v"))).as("phi_v"))
  }

  /** q24's frame-surface oracle, shared verbatim by q34 (identical
    * output contract, scalable plan). */
  private val FrameOracleSql =
    """SELECT o_orderkey,
      |  COALESCE(lag(o_totalprice) OVER (PARTITION BY o_orderpriority
      |    ORDER BY o_orderdate, o_orderkey), -1) AS lag_price,
      |  DENSE_RANK() OVER (PARTITION BY o_orderpriority
      |    ORDER BY o_totalprice DESC) AS drank,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov3,
      |  NTILE(4) OVER (PARTITION BY o_orderpriority
      |    ORDER BY o_orderdate, o_orderkey) AS nt
      |FROM orders""".stripMargin

  val oracles: Map[String, String] = Map(
    // q28's bounded-error gate: the oracle re-computes the EXACT
    // columns and asserts literal TRUE for every sketch-error verdict
    // — a drifting sketch breaks the hash match (see the query's note)
    "q28_sketches" ->
      """SELECT l_returnflag AS rf,
        |  COUNT(DISTINCT l_partkey) AS exact_parts,
        |  COUNT(DISTINCT l_orderkey) AS exact_orders,
        |  true AS parts_ok, true AS orders_ok,
        |  true AS median_ok, true AS p95_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q21_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) tsn FROM events),
        |marked AS (SELECT event_id, user_id, event_type, tsn,
        |  last_value(CASE WHEN event_type = 'click' THEN tsn END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY tsn, event_id) AS asof_ts
        |  FROM e)
        |SELECT event_id AS purchase_id, user_id, tsn AS purchase_ts,
        |  COALESCE(asof_ts, -1) AS asof_click_ts
        |FROM marked WHERE event_type = 'purchase'""".stripMargin,

    "q22_range_join" ->
      """SELECT CAST(i AS INT) AS band, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN (SELECT unnest(generate_series(0, 4)) AS i) b
        |  ON o_totalprice >= i * 100000.0 AND o_totalprice < (i + 1) * 100000.0
        |GROUP BY 1""".stripMargin,

    "q23_cube" ->
      """SELECT COALESCE(l_returnflag, '(all)') AS rf,
        |  COALESCE(l_linestatus, '(all)') AS ls,
        |  CAST(GROUPING(l_returnflag) AS INT) * 2
        |    + CAST(GROUPING(l_linestatus) AS INT) AS grp,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS cnt
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q24_window_frames" -> FrameOracleSql,

    // q34 computes the same surface with chunked execution — one
    // oracle, two plans, both must hash-match it
    "q34_scalable_frames" -> FrameOracleSql,

    "q25_json_extract" ->
      """SELECT event_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,

    "q26_array_fns" ->
      """WITH w AS (SELECT p_partkey, p_size, p_retailprice,
        |    string_split(p_name, ' ') AS words,
        |    list_distinct(string_split(p_name, ' ')) AS uw
        |  FROM part)
        |SELECT p_partkey,
        |  CAST(len(words) AS INT) AS n_words,
        |  words[1] AS first_word,
        |  array_to_string(list_sort(words), '_') AS sorted_name,
        |  list_contains(words, 'green') AS has_green,
        |  CAST(map(uw, list_transform(uw, x -> length(x)))[words[1]][1] AS INT)
        |    AS first_word_len,
        |  sqrt(CAST(p_size AS DOUBLE)) AS sqrt_size,
        |  abs(p_retailprice - 1000.0) AS abs_ctr
        |FROM w""".stripMargin,

    "q31_unpivot" ->
      """SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part""".stripMargin,

    "q30_pivot" ->
      """SELECT l_returnflag,
        |  CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'F'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS qty_f,
        |  CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'O'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS qty_o
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q47_heavy_hitters" ->
      """SELECT CAST(l_partkey AS VARCHAR) AS part_key, COUNT(*) AS exact_cnt,
        |  true AS no_undercount, true AS bounded_overcount
        |FROM lineitem GROUP BY 1 HAVING COUNT(*) >= 40""".stripMargin,

    "q29_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, '(all)') AS rf,
        |  COALESCE(l_linestatus, '(all)') AS ls,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin,

    "q27_second_max" ->
      """WITH mx AS (SELECT o_orderpriority, MAX(o_totalprice) m
        |            FROM orders GROUP BY 1)
        |SELECT o.o_orderpriority, MAX(o_totalprice) AS second_max
        |FROM orders o JOIN mx ON o.o_orderpriority = mx.o_orderpriority
        |WHERE o_totalprice < m
        |GROUP BY o.o_orderpriority""".stripMargin,

    "q33_session_window" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS tsu FROM events),
        |f AS (SELECT user_id, tsu,
        |  CASE WHEN lag(tsu) OVER w IS NULL
        |         OR tsu - lag(tsu) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu)),
        |g AS (SELECT user_id, tsu, SUM(brk) OVER (
        |        PARTITION BY user_id ORDER BY tsu
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |      FROM f)
        |SELECT user_id, MIN(tsu) AS sess_start_us,
        |  MAX(tsu) + 1800000000 AS sess_end_us,
        |  COUNT(*) AS ev_cnt
        |FROM g GROUP BY user_id, sess""".stripMargin
  )
}
