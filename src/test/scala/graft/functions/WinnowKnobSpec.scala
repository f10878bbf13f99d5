package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftConf, SparkTestBase}

/** The graft.span.hash knob and the O(nWin) winnow selection.
 *
 * Pins (1) md5-family bit-identity to the SQL HOF chain — hashing AND
 * selection, so the monotonic-deque rewrite carries the oracle gate
 * over unchanged; (2) deque-vs-rescan bit-identity on adversarial
 * tie-heavy inputs at production window widths; (3) the xxhash64
 * family's value convention (fingerprints ⊂ d16 window keys, shared
 * code); (4) d22 plan-shape and span-semantics invariance across the
 * knob; (5) the gate guard: oracle runs reject the non-md5 family. */
class WinnowKnobSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val L = graft.operators.DedupQueries.DupSpanTokens
  private val W = graft.operators.DedupQueries.WinnowWindow

  private def corpusArrays = graft.operators.DedupQueries.corpus(spark, sf)
    .limit(200)
    .select(split(col("text"), " ").as("w"))
    .filter(size(col("w")) >= L)

  test("md5 family: fingerprints (idx AND hash) bit-identical to the SQL HOF chain") {
    val viaHof = corpusArrays
      .select(expr(
        s"""transform(sequence(0, size(w) - $L),
           |  i -> CAST(conv(substr(md5(concat_ws(' ', slice(w, i + 1, $L))), 1, 15), 16, 10) AS BIGINT))"""
          .stripMargin).as("th"))
      .select(expr(
        s"""transform(
           |  array_sort(array_distinct(transform(sequence(0, greatest(size(th) - $W, 0)),
           |    j -> j + array_position(slice(th, j + 1, $W), array_min(slice(th, j + 1, $W))) - 1))),
           |  i -> struct(CAST(i AS INT) AS idx, element_at(th, CAST(i AS INT) + 1) AS h))"""
          .stripMargin))
      .as[Seq[(Int, Long)]].collect()
    val viaKernel = corpusArrays
      .select(GraftFunctions.winnowFingerprints(col("w"), L, W, "md5"))
      .as[Seq[(Int, Long)]].collect()
    assert(viaHof.length == viaKernel.length && viaHof.nonEmpty)
    viaHof.zip(viaKernel).zipWithIndex.foreach { case ((h, k), i) =>
      assert(h == k, s"doc $i: HOF $h != kernel $k")
    }
  }

  test("deque selection is bit-identical to the per-position rescan, ties included") {
    def rescan(th: Array[Long], winnowW: Int): Array[Boolean] = {
      val selected = new Array[Boolean](th.length)
      if (th.isEmpty) return selected
      val lastStart = math.max(th.length - winnowW, 0)
      var j = 0
      while (j <= lastStart) {
        val end = math.min(j + winnowW, th.length)
        var best = j
        var k = j + 1
        while (k < end) { if (th(k) < th(best)) best = k; k += 1 }
        selected(best) = true
        j += 1
      }
      selected
    }
    val rnd = new scala.util.Random(42)
    // tiny value ranges force long tie runs — the leftmost-on-ties rule
    // is exactly where a strict/non-strict deque pop goes wrong
    for (n <- Seq(0, 1, 2, 3, 7, 50, 500); range <- Seq(2, 3, 16, 1 << 30);
         w <- Seq(1, 2, 4, 43, 50)) {
      val th = Array.fill(n)(rnd.nextInt(range).toLong)
      val a = WinnowFingerprints.winnowSelect(th, w)
      val b = rescan(th, w)
      assert(a.sameElements(b),
        s"n=$n range=$range w=$w: deque ${a.mkString(",")} vs rescan ${b.mkString(",")}")
    }
    // monotone runs in both directions — deque degenerate cases
    for (w <- Seq(2, 4, 50)) {
      val asc = Array.tabulate(100)(_.toLong)
      val desc = asc.reverse
      assert(WinnowFingerprints.winnowSelect(asc, w).sameElements(rescan(asc, w)))
      assert(WinnowFingerprints.winnowSelect(desc, w).sameElements(rescan(desc, w)))
      val flat = Array.fill(100)(7L)
      assert(WinnowFingerprints.winnowSelect(flat, w).sameElements(rescan(flat, w)))
    }
  }

  test("xxhash64 family: fingerprint hashes ARE d16's window keys at the selected positions") {
    val rows = corpusArrays
      .select(
        GraftFunctions.winnowFingerprints(col("w"), L, W, "xxhash64").as("f"),
        GraftFunctions.tokenWindowHashes(col("w"), L).as("wk"))
      .as[(Seq[(Int, Long)], Seq[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (fps, keys) =>
      assert(fps.nonEmpty)
      fps.foreach { case (idx, h) =>
        assert(h == keys(idx), s"fingerprint at $idx: $h != window key ${keys(idx)}")
      }
    }
  }

  test("SQL surface accepts the 4th hashAlgo literal and rejects junk") {
    GraftFunctions.register(spark)
    val xs = spark.sql(
      "SELECT winnow_fingerprints(array('a','b','c','d'), 2, 2, 'xxhash64') AS f")
      .selectExpr("size(f)").as[Int].head
    assert(xs >= 1)
    val e = intercept[Exception] {
      spark.sql("SELECT winnow_fingerprints(array('a','b'), 2, 2, 'sha1')").collect()
    }
    assert(e.getMessage.contains("md5 or xxhash64"))
  }

  test("d22 under xxhash64: same plan shape, same span guarantees, oracle guard trips") {
    // another suite may have .cache()d the default-knob d22 — that
    // would collapse the md5 baseline plan to InMemoryRelation and
    // poison the shape comparison
    spark.sharedState.cacheManager.clearCache()
    val d16 = graft.SparkEntry.queries("d16_dup_spans")(spark, sf).cache()
    def planOps(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect { case p => p.getClass.getSimpleName }
    val md5Plan = planOps(graft.SparkEntry.queries("d22_winnowed_spans")(spark, sf))
    spark.conf.set(GraftConf.SpanHash, "xxhash64")
    try {
      val xxFresh = graft.SparkEntry.queries("d22_winnowed_spans")(spark, sf)
      // 1. the knob changes hash VALUES only — operator-for-operator
      // the optimized plan is the same shape (read before caching)
      assert(planOps(xxFresh) == md5Plan,
        s"plan shape moved across the knob:\n${planOps(xxFresh)}\nvs\n$md5Plan")
      val xx = xxFresh.cache()
      // 2. the winnowing guarantee is hash-agnostic: every exact span
      // of ≥ L+W−1 tokens still carries an overlapping winnowed span
      val long16 = d16.filter(col("span_tokens") >= L + W - 1)
        .select(col("doc_id"), col("span_start").as("s16"), col("span_end").as("e16"))
      val misses = long16.join(
          xx.select(col("doc_id"), col("span_start"), col("span_end")),
          Seq("doc_id"), "left")
        .groupBy(col("doc_id"), col("s16"), col("e16"))
        .agg(max(when(col("span_start") <= col("e16") &&
          col("span_end") >= col("s16"), 1).otherwise(0)).as("covered"))
        .filter(col("covered") === 0).count()
      assert(misses == 0, s"$misses guaranteed spans uncovered under xxhash64")
      // 3. soundness: no invented duplication under the new family
      val orphans = xx.join(
          d16.select(col("doc_id"), col("span_start").as("s16"), col("span_end").as("e16")),
          Seq("doc_id"), "left")
        .groupBy(col("doc_id"), col("span_start"), col("span_end"))
        .agg(max(when(col("s16") <= col("span_start") &&
          col("e16") >= col("span_end"), 1).otherwise(0)).as("inside"))
        .filter(col("inside") === 0).count()
      assert(orphans == 0, s"$orphans winnowed spans outside exact duplication")
      // 4. a gate run under the production family must fail fast, at
      // the knob, not hash-mismatch an oracle that can't follow
      val guard = intercept[IllegalArgumentException] {
        GraftConf.requireOracleConsistency(spark)
      }
      assert(guard.getMessage.contains("md5"))
    } finally spark.conf.unset(GraftConf.SpanHash)
    // default restored: the gate guard passes again
    GraftConf.requireOracleConsistency(spark)
  }
}
