package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

/** Semantic invariants of d22 (winnowed duplicated-span detection)
 * beyond the hash oracle: the winnowing GUARANTEE (every exact
 * duplicated span of ≥ L + W − 1 tokens is covered by a winnowed
 * span), the selection-density bound that funds the shuffle-reduction
 * claim, soundness (every reported fingerprint really is duplicated),
 * and the map-side plan shape of the selection stage. */
class WinnowedSpansSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private val L = DedupQueries.DupSpanTokens
  private val W = DedupQueries.WinnowWindow

  private lazy val d22 =
    SparkEntry.queries("d22_winnowed_spans")(spark, sf).cache()
  private lazy val d16 =
    SparkEntry.queries("d16_dup_spans")(spark, sf).cache()

  test("geometry: spans are ordered, L-token-wide at minimum, fingerprints positive") {
    assert(d22.count() > 0)
    val bad = d22.filter(
      col("span_end") - col("span_start") + 1 < L ||
        col("n_fingerprints") < 1).count()
    assert(bad == 0)
  }

  test("the winnowing guarantee: every exact span of ≥ L+W−1 tokens is covered") {
    // d16 is the exact reference: each of its maximal spans with
    // span_tokens ≥ L+W−1 contains a full shared winnow window, so d22
    // must report a span overlapping it in the same doc
    val long16 = d16.filter(col("span_tokens") >= L + W - 1)
      .select(col("doc_id"), col("span_start").as("s16"), col("span_end").as("e16"))
    val misses = long16.join(
        d22.select(col("doc_id"), col("span_start"), col("span_end")),
        Seq("doc_id"), "left")
      .groupBy(col("doc_id"), col("s16"), col("e16"))
      .agg(max(when(col("span_start") <= col("e16") &&
        col("span_end") >= col("s16"), 1).otherwise(0)).as("covered"))
      .filter(col("covered") === 0)
      .count()
    assert(misses == 0,
      s"$misses exact spans of ≥ ${L + W - 1} tokens have no overlapping winnowed span")
  }

  test("soundness: no winnowed span lands where d16 found nothing") {
    // d22 must not invent duplication: every winnowed span must lie
    // within some exact duplicated span (d16's output is the complete
    // set of duplicated window positions)
    val orphans = d22.join(
        d16.select(col("doc_id"), col("span_start").as("s16"), col("span_end").as("e16")),
        Seq("doc_id"), "left")
      .groupBy(col("doc_id"), col("span_start"), col("span_end"))
      .agg(max(when(col("s16") <= col("span_start") &&
        col("e16") >= col("span_end"), 1).otherwise(0)).as("inside"))
      .filter(col("inside") === 0)
      .count()
    assert(orphans == 0, s"$orphans winnowed spans outside any exact duplicated span")
  }

  test("selection density is bounded: the shuffled fingerprint relation is a fraction of the window relation") {
    // expected density 2/(W+1); allow generous slack for short docs
    // (trailing partial windows select extra) — the point pinned here
    // is the ORDER: a W=4 winnow must shuffle well under 60% of what
    // d16 shuffles, which is the whole reason d22 exists
    val windows = DedupQueries.corpus(spark, sf)
      .select(size(split(col("text"), " ")).as("n"))
      .filter(col("n") >= L)
      .agg(sum(col("n") - L + 1)).head.getLong(0)
    // count selected fingerprints exactly as d22 builds them
    val selected = DedupQueries.corpus(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= L)
      .select(expr(
        s"""transform(sequence(0, size(w) - $L),
           |  i -> CAST(conv(substr(md5(concat_ws(' ', slice(w, i + 1, $L))), 1, 15), 16, 10) AS BIGINT))"""
          .stripMargin).as("th"))
      .select(expr(
        s"""size(array_distinct(transform(sequence(0, greatest(size(th) - $W, 0)),
           |  j -> j + array_position(slice(th, j + 1, $W), array_min(slice(th, j + 1, $W))) - 1)))"""
          .stripMargin).as("k"))
      .agg(sum(col("k"))).head.getLong(0)
    val density = selected.toDouble / windows
    assert(density < 0.6, f"selection density $density%.2f must stay well under 1")
    assert(density > 0.2, f"density $density%.2f implausibly low for W=$W")
  }

  test("the winnow-window knob moves engine and generated oracle together") {
    def withProp[A](key: String, value: String)(body: => A): A = {
      sys.props(key) = value
      try body finally sys.props -= key
    }
    val dflt = DedupQueries.oracles("d22_winnowed_spans")
    assert(dflt.contains(s"j + 1, j + $W"), "shipped oracle carries the default W")
    withProp(graft.GraftConf.WinnowW, "6") {
      val o = DedupQueries.oracles("d22_winnowed_spans")
      assert(o.contains("j + 1, j + 6") && !o.contains("j + 1, j + 4"),
        "regenerated oracle must carry the overridden W")
      // engine side under W=6: soundness must still hold (wider
      // windows only select FEWER fingerprints; every span remains
      // inside an exact duplicated region)
      val wide = SparkEntry.queries("d22_winnowed_spans")(spark, sf).cache()
      val orphans = wide.join(
          d16.select(col("doc_id"), col("span_start").as("s16"), col("span_end").as("e16")),
          Seq("doc_id"), "left")
        .groupBy(col("doc_id"), col("span_start"), col("span_end"))
        .agg(max(when(col("s16") <= col("span_start") &&
          col("e16") >= col("span_end"), 1).otherwise(0)).as("inside"))
        .filter(col("inside") === 0).count()
      assert(orphans == 0)
      val fpWide = wide.agg(sum(col("n_fingerprints"))).head.getLong(0)
      val fpDflt = d22.agg(sum(col("n_fingerprints"))).head.getLong(0)
      assert(fpWide <= fpDflt,
        s"W=6 must select no more fingerprints than W=$W ($fpWide vs $fpDflt)")
    }
    assert(DedupQueries.oracles("d22_winnowed_spans") == dflt,
      "property cleanup must restore the shipped oracle")
  }

  test("plan shape: selection is map-side — no Window operator, one shuffle for the dup count") {
    // the winnowed fingerprint relation (corpus → arrays → explode)
    // must contain NO Window/Sort before its first exchange: selection
    // happens in the array domain inside project/generate operators
    val qe = SparkEntry.queries("d22_winnowed_spans")(spark, sf).queryExecution
    // the island grouping (post-dup-join, SMALL relation) legitimately
    // uses lag + running-sum windows; the SELECTION stage must add
    // none (its work lives in Project/Generate array expressions) —
    // so the whole plan holds at most those two Window nodes
    val windowOps = qe.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.size
    assert(windowOps <= 2,
      s"selection must not add window passes (found $windowOps):\n${qe.optimizedPlan}")
    // and the fingerprint relation reaches its first aggregate straight
    // from generate/project — no sort below the dup-count exchange
    val plan = qe.optimizedPlan.toString
    assert(plan.contains("Generate explode"), s"array-domain selection missing:\n$plan")
  }
}
