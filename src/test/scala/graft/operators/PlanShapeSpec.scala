package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.SparkEntry

/**
 * Guards the physical-plan shapes that matter at scale: filters reaching
 * the parquet scan, dimension joins broadcasting, top-k avoiding global
 * sorts, and SCBF column pruning reaching storage. A correctness-equal
 * plan regression (e.g. a broadcast silently becoming a shuffle join)
 * fails here, not in production.
 */
class PlanShapeSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  // the d2/d10/d8 pair queries serve a STAGED (localCheckpoint'd) graph,
  // whose lineage truncation hides the pipeline from the plan — their
  // shape locks target the unstaged builders instead
  private def builderPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("the five ExplainAudit flagships hold their plan shape (the audit, as a gate)") {
    // the counts the manually-run ExplainAudit tool reports, pinned so
    // a plan regression fails the build instead of waiting for someone
    // to run the tool. Counts are observed-at-HEAD floors/equalities,
    // deliberately loose enough to survive cosmetic plan changes.
    // under AQE the final (codegen-collapsed) plan exists after execution
    def executed(name: String): String = {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    def shape(name: String): (Int, Int, Int, Int) = {
      val p = executed(name)
      ("BroadcastHashJoin".r.findAllIn(p).size,
        "SortMergeJoin".r.findAllIn(p).size,
        "PushedFilters: \\[[^\\]]".r.findAllIn(p).size,
        "\\*\\(\\d+\\)".r.findAllIn(p).map(identity).toSet.size)
    }
    // q1: one scan with pushed filters, no joins, codegen'd agg pipeline
    val (b1, s1, f1, c1) = shape("q1_pricing_summary")
    assert(b1 == 0 && s1 == 0 && f1 >= 1 && c1 >= 2, s"q1: ($b1,$s1,$f1,$c1)")
    // q5: the 5-table star joins ALL broadcast — a single SMJ here
    // means a dimension grew past the threshold or stats regressed
    val (b5, s5, f5, _) = shape("q5_multi_join")
    assert(b5 >= 4 && s5 == 0 && f5 >= 4, s"q5: ($b5,$s5,$f5)")
    // q21 (as-of): no join materializes at all — the as-of composes
    // union + window, never a range join blowup or a cartesian
    val p21 = executed("q21_asof_join")
    assert(!p21.contains("CartesianProduct") &&
      !p21.contains("BroadcastNestedLoopJoin"), p21)
    assert(p21.contains("Window") || p21.contains("RunningWindowFunction"), p21)
    // t3: per-doc token counts are a PURE MAP — no join, no shuffle,
    // one codegen span straight off the scan
    val (bt, st, _, ct) = shape("t3_token_count")
    assert(bt == 0 && st == 0 && ct >= 1, s"t3: ($bt,$st,$ct)")
    val pt3 = executed("t3_token_count")
    assert(!pt3.contains("Exchange") && !pt3.contains("Join"), pt3)
    // d1: hash-groupBy dedup — partial+final aggregate, no window
    val pd1 = executed("d1_dedup_exact")
    assert("HashAggregate".r.findAllIn(pd1).size >= 2, pd1)
    assert(!pd1.contains("Window"), pd1)
  }

  test("q2: filters are pushed down to the parquet scan") {
    val p = plan("q2_filter_project")
    // plan strings truncate long filter lists; the IsNotNull prefix in
    // PushedFilters proves pushdown reached the scan
    assert(p.contains("PushedFilters: [IsNotNull"), p)
    // column pruning: tax is unused and must not be read
    assert(!p.contains("l_tax"), p)
  }

  test("q4: dimension join broadcasts (no shuffle of the fact side)") {
    val p = plan("q4_broadcast_join")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q7: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q7_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q14/q15: semi and anti joins keep their join type") {
    assert(plan("q14_semi_join").contains("LeftSemi"))
    assert(plan("q15_anti_join").contains("LeftAnti"))
  }

  test("q1: aggregation is partial (map-side) before the shuffle") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("HashAggregate"), p)
    // partial + final pair means map-side combine happened
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("d5: ANN brute force broadcasts the query side") {
    // the ranked lists are staged (d21 consumes them), so lock the
    // unstaged builder — the checkpoint hides lineage from the query
    val p = builderPlan(DedupQueries.d5TopKPlan(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("d5/d6/t6: per-group ranking is salted — local top-k windows precede the final rank") {
    // two Window operators per query: (group, __salt) local pass, then
    // the per-group final rank over surviving candidates only
    val plans = Seq(
      "d5" -> builderPlan(DedupQueries.d5TopKPlan(spark, sf)),
      "d6" -> builderPlan(DedupQueries.d6TopKPlan(spark, sf)),
      "t6" -> plan("t6_top_terms"))
    plans.foreach { case (q, p) =>
      assert(p.contains("__salt"), s"$q lost its salted local top-k pass:\n$p")
      assert("row_number".r.findAllIn(p).length >= 2, s"$q:\n$p")
    }
  }

  test("d10: simhash pair generation is an equi-join on chunk values, never a cartesian") {
    val p = builderPlan(DedupQueries.d10PairsPlan(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the exact-verification filter must sit above candidates, with the
    // chunk equality as the join key
    assert(p.contains("chunk_val"), p)
  }

  test("d4: gram DF cap is a partial-combine aggregate + equi-join, never a window") {
    val p = plan("d4_ngram_jaccard")
    // the cap must be an AGGREGATE over (source, gram) joined back onto
    // the exploded relation: a window partitioned on the gram would
    // funnel every copy of a hot stopword-pair gram — the very rows the
    // cap discards — through one unsplittable task (the d14 skew
    // lesson); the aggregate partial-combines map-side and the flagging
    // join is AQE-skew-splittable
    assert(!p.contains("windowspecdefinition(source"), p)
    assert("partial_count".r.findAllIn(p).nonEmpty, p)
  }

  test("t17: digest is one partial-aggregated groupBy; no window, no join, no row-data shuffle") {
    val p = plan("t17_dataset_fingerprint")
    assert(p.contains("HashAggregate"), p)
    // partial agg before the exchange: only (source, partial state) rows
    // ever shuffle — never the hashed row data
    val firstAgg = p.indexOf("HashAggregate")
    val firstExchange = p.indexOf("Exchange")
    assert(firstExchange >= 0 && p.indexOf("HashAggregate", firstExchange) >= 0,
      s"expected partial+final aggregate around the exchange:\n$p")
    assert(!p.contains("Window") && !p.contains("Join") && !p.contains("Sort"),
      s"digest must be a pure map+agg pass:\n$p")
  }

  test("q35: the SCBF read carries pushed filters for stats-based file skipping") {
    val p = plan("q35_scbf_stats_skip")
    assert(p.contains("PushedFilters"), p)
  }

  test("d2: LSH banding runs over collapsed, checkpointed unique texts") {
    val p = builderPlan(DedupQueries.d2PairsPlan(spark, sf))
    // the md5 pre-collapse is materialized via localCheckpoint: the
    // shingle/member inputs surface as ExistingRDD scans, computed once
    // for their four consumers instead of re-derived per consumer
    assert(p.contains("Scan ExistingRDD"), p)
    // re-expansion joins members back in: least/greatest ordering proves
    // the cross-group expansion stage exists
    assert(p.contains("least") && p.contains("greatest"), p)
  }

  test("hive-style partitioned writes prune partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("part-prune").toString
    spark.read.parquet(s"$sf/part.parquet")
      .write.partitionBy("p_brand").mode("overwrite").parquet(dir)
    val pruned = spark.read.parquet(dir)
      .filter(org.apache.spark.sql.functions.col("p_brand") === "Brand#11")
    pruned.collect()
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(p_brand"), p)
  }

  test("t9/d12/t15: per-row scrub, quantization and chunking stay map-only (no Exchange)") {
    assert(!plan("t9_pii_scan").contains("Exchange"), plan("t9_pii_scan"))
    assert(!plan("d12_embed_quantize").contains("Exchange"), plan("d12_embed_quantize"))
    // chunking's explode is a Generate off the scan — no shuffle, no window
    val t15 = plan("t15_chunking")
    assert(!t15.contains("Exchange") && !t15.contains("Window"), t15)
    assert(t15.contains("Generate"), t15)
  }

  test("t16: LM counts partial-aggregate; no window, no driver-side model") {
    val p = plan("t16_lm_score")
    // the bigram/unigram count relations partial-combine before their
    // shuffles (map-side partial_count), and the whole pipeline is
    // joins+aggregates — no Window, no collect-shaped LocalTableScan
    // of model rows
    assert(p.contains("partial_count") || p.contains("partial, [count"), p)
    assert(!p.contains("Window"), p)
  }

  test("t10: the benchmark gram side broadcasts; the corpus side never shuffles gram strings") {
    val p = plan("t10_decontam")
    assert(p.contains("BroadcastHashJoin"), p)
    // exactly two hash shuffles: the explicit corpus doc_id spread and
    // the (tiny, pre-broadcast) benchmark side's gram distinct. The
    // corpus-side (doc_id, g) distinct and the matched-pair groupBy
    // must REUSE the doc_id partitioning — a third exchange here means
    // corpus gram strings started shuffling, the exact regression this
    // test guards
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 2, s"expected 2 hash exchanges, got $hashExchanges:\n$p")
    assert("Exchange hashpartitioning\\(doc_id".r.findAllIn(p).length == 1, p)
  }

  test("t8: per-(doc, gram) counts partial-aggregate before the shuffle") {
    val p = plan("t8_repetition")
    assert("HashAggregate".r.findAllIn(p).length >= 4, p) // partial+final × two levels
  }

  test("d11: IVF assignment runs as the single centroid_sims expression, no UDF") {
    val p = builderPlan(DedupQueries.d11TopKPlan(spark, sf))
    assert(!p.contains("ScalaUDF"), p)
    assert(p.contains("centroid_sims"), p)
  }

  test("d21: the quality report adds no candidate generation of its own") {
    Ops.stagedClear()
    val base = Ops.stagedBuildCount
    // first consumers stage the three ranked lists…
    SparkEntry.queries("d5_ann_bruteforce")(spark, sf)
    SparkEntry.queries("d6_ann_lsh")(spark, sf)
    SparkEntry.queries("d11_ann_ivf")(spark, sf)
    assert(Ops.stagedBuildCount == base + 3)
    // …and d21 is a pure join/aggregate over them: zero new stages
    val out = SparkEntry.queries("d21_ann_quality")(spark, sf)
    assert(Ops.stagedBuildCount == base + 3)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("cosine_sim") && !p.contains("centroid_sims"),
      s"d21 re-scored embeddings instead of consuming the staged lists:\n$p")
  }

  test("whole-stage codegen covers the q1 aggregation pipeline") {
    // under AQE the final plan only exists after execution
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark operators fused into WholeStageCodegen stages
    assert(p.contains("*(1)"), p)
    assert(p.contains("*(2)"), p) // final agg after the shuffle is fused too
  }

  test("d8: near-dup candidates come from a bucket equi-join, never all-pairs") {
    val p = builderPlan(DedupQueries.d8PairsPlan(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // bucketing runs as the codegen hyperplane_buckets expression, no UDF
    assert(p.contains("hyperplane_buckets"), p)
    assert(!p.contains("UDF"), p)
  }

  test("d3/d10: the SimHash signature is ONE sketch aggregate, not 64 slots") {
    val p = plan("d3_simhash")
    assert(p.contains("simhash_sketch"), p)
    // the spelled-out form carried 64 named bit-sum buffer slots
    assert(!p.contains("b63"), p)
  }

  test("scbf reads execute the vectorized (ColumnarBatch) scan path") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scbf_colscan").toString
    Seq((1, 1.5, "a"), (2, 2.5, "b")).toDF("i", "d", "s")
      .write.format("scbf").mode("overwrite").save(dir)
    val q = spark.read.format("scbf").load(dir).filter($"i" > 0).select($"s")
    assert(q.as[String].collect().sorted.toSeq == Seq("a", "b"))
    val p = q.queryExecution.executedPlan.toString
    // the batch scan feeds ColumnarToRow inside a codegen stage — i.e.
    // supportColumnarReads actually engaged, no row-reader fallback
    assert(p.contains("ColumnarToRow"), p)
    assert(p.contains("BatchScan scbf"), p)
  }

  test("d14: first-wins is a partial-combined aggregate, not a hash-keyed window") {
    val p = plan("d14_paragraph_dedup")
    // the winner per chunk hash must come from min(struct) aggregation
    // (map-side combine collapses hot boilerplate chunks BEFORE the
    // shuffle; the flagging equi-join is AQE-skew-splittable) — a
    // Window partitioned on the hash funnels every copy of a hot chunk
    // through one unsplittable task and must not come back
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_min"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("pair graphs stage ONCE: d13/d15 reuse the d10/d8 materializations") {
    Ops.stagedClear()
    val base = Ops.stagedBuildCount
    val p10 = SparkEntry.queries("d10_simhash_neardup")(spark, sf)
    assert(Ops.stagedBuildCount == base + 1)
    // the same query again serves the SAME checkpointed RDD, not a rebuild
    val p10b = SparkEntry.queries("d10_simhash_neardup")(spark, sf)
    def rddIds(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id.toLong
      }
    assert(rddIds(p10) == rddIds(p10b) && rddIds(p10).size == 1)
    // d13 consumes the staged graph — no second pair materialization
    SparkEntry.queries("d13_dedup_clusters")(spark, sf)
    assert(Ops.stagedBuildCount == base + 1)
    // same contract on the d8 → d15 edge
    SparkEntry.queries("d8_embed_neardup")(spark, sf)
    assert(Ops.stagedBuildCount == base + 2)
    SparkEntry.queries("d15_semantic_dedup")(spark, sf)
    assert(Ops.stagedBuildCount == base + 2)
    // d18 consumes BOTH the d2 and d10 graphs: one build for d2 (not
    // yet staged in this test), zero for the already-staged d10
    SparkEntry.queries("d18_pair_agreement")(spark, sf)
    assert(Ops.stagedBuildCount == base + 3)
    // d16 stages the span-winners aggregate; d17 must reuse it
    SparkEntry.queries("d16_dup_spans")(spark, sf)
    assert(Ops.stagedBuildCount == base + 4)
    SparkEntry.queries("d17_span_dedup")(spark, sf)
    assert(Ops.stagedBuildCount == base + 4)
    // d20's increment verdict is a view over the already-staged d2
    // graph — adding it must not introduce a pair stage
    SparkEntry.queries("d20_incremental_neardup")(spark, sf)
    assert(Ops.stagedBuildCount == base + 4)
  }

  test("d17/t13: the composed pipeline ops stay window-free and equi-join-only") {
    // d17: winner selection is the staged min(struct) aggregate and
    // flagging/reassembly are equi-joins + aggregates — a Window here
    // would mean a hot duplicated window hash funnels one task (the
    // d14 regression this family of operators is designed against)
    val p17 = plan("d17_span_dedup")
    assert(!p17.contains("Window"), p17)
    assert(!p17.contains("CartesianProduct") && !p17.contains("BroadcastNestedLoopJoin"), p17)
    // t13: all signals are map-side; the only shuffles are the keeper
    // aggregate (partial-combined) and its equi-join
    val p13 = plan("t13_curation")
    assert(!p13.contains("Window"), p13)
    assert(!p13.contains("CartesianProduct") && !p13.contains("BroadcastNestedLoopJoin"), p13)
    assert(p13.contains("partial_min"), p13)
  }

  test("m5/m6: frame and image dedup winners are aggregates, and m6 decodes once") {
    // the binary-modality dedups follow the d14 shape: the group winner
    // is a partial-combine min/count AGGREGATE joined back on the
    // fixed-width content key — a window partitioned on the key would
    // funnel every copy of a hot reused frame / popular image through
    // one unsplittable task
    Seq("m5_frame_dedup", "m6_image_phash").foreach { qn =>
      val p = plan(qn)
      assert(!p.contains("Window"), s"$qn: $p")
      assert("partial_min".r.findAllIn(p).nonEmpty, s"$qn: $p")
      // decode happens ONCE, at the localCheckpoint materialization:
      // both the winner aggregate and the flag join read the decoded
      // fixed-width rows as ExistingRDD scans — the executed plan must
      // contain NO decode pipeline (a MapPartitions would mean some
      // consumer re-parses payloads; AQE's broadcast choice defeats
      // ReusedExchange here, so materialization is the guarantee)
      assert(p.contains("Scan ExistingRDD"), s"$qn: $p")
      assert(!p.contains("MapPartitions"), s"$qn: $p")
    }
  }

  test("the bench heavies never regress to cartesian or nested-loop shapes") {
    // d2/d4/d13/q34 are the audited slowest queries — each is inherent
    // work (banded LSH, DF-capped join, contraction CC, chunked
    // windows), and the audit's conclusion is only durable if their
    // executed plans stay free of the shapes that would silently turn
    // "slow but scale-sublinear" into "quadratic": a cartesian product
    // or a nested-loop join anywhere in the final pipeline.
    Seq("d2_minhash_lsh", "d4_ngram_jaccard", "d13_dedup_clusters",
        "q34_scalable_frames").foreach { qn =>
      val df = SparkEntry.queries(qn)(spark, sf)
      df.collect() // AQE: judge the final adaptive plan
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$qn grew a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$qn grew an NL join:\n$p")
    }
  }

  test("d15: keeper selection adds no pair stage of its own") {
    // the pair graph's shape is d8's lock (bucket equi-join, no
    // all-pairs) and the component iteration is ComponentsSpec's; what
    // d15 itself adds must stay join-light: one anti join for the
    // singleton union, nothing cartesian
    val p = plan("d15_semantic_dedup")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("LeftAnti"), p)
  }
}
