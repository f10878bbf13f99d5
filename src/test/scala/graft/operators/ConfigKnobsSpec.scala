package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftConf, SparkEntry, SparkTestBase}

/** The ANN/LSH scale knobs (GraftConf): defaults must reproduce the
 * shipped behavior bit-for-bit, and a non-default setting must move
 * the ENGINE and its GENERATED ORACLE together (single-source planes),
 * while the staged pair graph re-keys so no stale graph is served. */
class ConfigKnobsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def withProp[A](key: String, value: String)(body: => A): A = {
    sys.props(key) = value
    try body finally sys.props -= key
  }

  test("explicit defaults regenerate the shipped oracles verbatim") {
    val shipped = DedupQueries.oracles
    val explicit = withProp(GraftConf.LshD8Bits, "12") {
      withProp(GraftConf.LshBits, "10") {
        withProp(GraftConf.AnnKCells, "16")(DedupQueries.oracles)
      }
    }
    Seq("d8_embed_neardup", "d15_semantic_dedup", "d6_ann_lsh", "d11_ann_ivf")
      .foreach(q => assert(shipped(q) == explicit(q), q))
  }

  test("t14 at a non-default budget: engine and regenerated oracle move together") {
    val dflt = TextQueries.oracles("t14_mixture_sample")
    assert(dflt.contains("400 *"))
    withProp(GraftConf.MixtureBudget, "150") {
      val o = TextQueries.oracles("t14_mixture_sample")
      assert(o.contains("150 *") && !o.contains("400 *"))
      // engine side: every kept row respects the 150-base ladder and
      // greedy maximality (the next doc in hash order would overflow)
      val rows = TextQueries.queries("t14_mixture_sample")(spark, sf)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      assert(rows.nonEmpty)
      rows.foreach { case (src, _, _, cum, budget) =>
        assert(budget == 150L * (1 + src.drop(3).toInt % 3), src)
        assert(cum <= budget)
      }
    }
    assert(TextQueries.oracles("t14_mixture_sample") == dflt,
      "property cleanup must restore the shipped oracle")
  }

  test("d8 at a non-default bit width: engine and regenerated oracle move together") {
    val dflt = DedupQueries.oracles("d8_embed_neardup")
    withProp(GraftConf.LshD8Bits, "6") {
      // oracle side: 4 tables × 6 sign-bit tests instead of 4 × 12
      val o = DedupQueries.oracles("d8_embed_neardup")
      assert(o != dflt)
      assert("CASE WHEN".r.findAllIn(o).length == 24, "expected 4x6 plane tests")
      assert("CASE WHEN".r.findAllIn(dflt).length == 48, "expected 4x12 plane tests")

      // engine side: the same property must reach the plane generator —
      // the operator still finds every planted near-duplicate and every
      // reported pair still passes exact verification (recomputed here
      // from the raw embeddings, independently of the engine)
      val out = SparkEntry.queries("d8_embed_neardup")(spark, sf).collect()
        .map(r => (r.getAs[Number]("vec_a").longValue,
          r.getAs[Number]("vec_b").longValue)).toSet
      val base = Ops.t(spark, sf, "embeddings").collect()
        .map(r => r.getAs[Number]("vec_id").longValue ->
          r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
        .toMap
      val all = base ++ base.map { case (id, e) =>
        (id + 100000L) -> e.zipWithIndex.map { case (x, i) =>
          x * (1.0 + 0.01 * ((i % 7) - 3)) }
      }
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      // exact verification survived the knob change
      out.foreach { case (a, b) =>
        assert(cos(all(a), all(b)) >= 0.8, s"pair ($a,$b) below threshold") }
      // planted recall stays 1.0 at the wider buckets 6 bits produce
      base.keys.foreach { id =>
        assert(out.contains((id, id + 100000L)), s"planted pair for $id missed") }
    }
  }

  test("d2 minhash banding knobs re-key the staged graph and preserve exactness") {
    // the d2 oracle is the EXACT all-pairs Jaccard, so the gate doubles
    // as a recall test: the shipped 48/24 banding passes it (CORRECTNESS
    // r4), meaning the default output IS the exact pair set. A banding
    // with at least as many 2-row bands can only add candidates, and
    // exact verification filters them — so its output must EQUAL the
    // default's. That gives a knob-change equivalence check with no
    // DuckDB in the loop.
    def pairs(): Set[(Long, Long, Long, Long)] =
      SparkEntry.queries("d2_minhash_lsh")(spark, sf).collect()
        .map(r => (r.getAs[Number]("doc_a").longValue, r.getAs[Number]("doc_b").longValue,
          r.getAs[Number]("inter_cnt").longValue, r.getAs[Number]("union_cnt").longValue))
        .toSet
    val dflt = pairs()
    assert(dflt.nonEmpty)
    val buildsBefore = Ops.stagedBuildCount
    withProp(GraftConf.MinHashHashes, "64") {
      withProp(GraftConf.MinHashBands, "32") {
        assert(pairs() == dflt, "64/32 banding must reproduce the exact pair set")
        assert(Ops.stagedBuildCount > buildsBefore,
          "a knob change must re-key the staged graph, not serve the 48/24 one")
        // and the re-keyed graph is then REUSED, not rebuilt per consumer
        val after = Ops.stagedBuildCount
        pairs()
        assert(Ops.stagedBuildCount == after)
      }
    }
    // a banding that doesn't divide the sketch fails loudly at the source
    withProp(GraftConf.MinHashHashes, "48") {
      withProp(GraftConf.MinHashBands, "7") {
        val e = intercept[IllegalArgumentException](pairs())
        assert(e.getMessage.contains("must divide"))
      }
    }
  }

  test("d3/d10 under the xxhash64 span-hash family: exact-duplicate pairs survive, staging re-keys") {
    // identical texts hash to identical SimHash signatures under ANY
    // token-hash family (hamming 0), so the exact-duplicate pair set is
    // a family-invariant floor under d10's hamming ≤ 3 cut
    val txt = DedupQueries.corpus(spark, sf).collect()
      .map(r => r.getAs[Number]("doc_id").longValue -> r.getString(1))
    val dupPairs = txt.groupBy(_._2).values.filter(_.length > 1).flatMap { g =>
      val ids = g.map(_._1).sorted
      for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j))
    }.toSet
    assert(dupPairs.nonEmpty, "fixture needs exact duplicates")
    def pairs(): Set[(Long, Long)] =
      SparkEntry.queries("d10_simhash_neardup")(spark, sf).collect()
        .map(r => (r.getAs[Number]("doc_a").longValue,
          r.getAs[Number]("doc_b").longValue)).toSet
    val underMd5 = pairs()
    spark.conf.set(GraftConf.SpanHash, "xxhash64")
    val underXx = try pairs() finally spark.conf.unset(GraftConf.SpanHash)
    assert(dupPairs.subsetOf(underMd5), "md5 family lost exact duplicates")
    assert(dupPairs.subsetOf(underXx),
      s"xxhash64 family lost exact duplicates: ${(dupPairs -- underXx).take(3)}")
    // and the signatures really moved (different family, different
    // near-miss frontier) — proving the knob reached the engine and the
    // staged graph re-keyed instead of serving the md5 build
    val sigMd5 = SparkEntry.queries("d3_simhash")(spark, sf).collect()
      .map(r => (r.getAs[Number]("doc_id").longValue, r.getAs[Long]("simhash"))).toMap
    spark.conf.set(GraftConf.SpanHash, "xxhash64")
    val sigXx = try {
      SparkEntry.queries("d3_simhash")(spark, sf).collect()
        .map(r => (r.getAs[Number]("doc_id").longValue, r.getAs[Long]("simhash"))).toMap
    } finally spark.conf.unset(GraftConf.SpanHash)
    assert(sigMd5.keySet == sigXx.keySet)
    assert(sigMd5.exists { case (id, s) => sigXx(id) != s },
      "xxhash64 family produced identical signatures — knob not reaching the hash stage")
  }

  test("d11 kCells knob reaches the trained index and its oracle") {
    withProp(GraftConf.AnnKCells, "8") {
      assert(DedupQueries.oracles("d11_ann_ivf").contains("cell < 8"))
      val out = SparkEntry.queries("d11_ann_ivf")(spark, sf).collect()
      assert(out.nonEmpty)
      assert(out.map(_.getAs[Number]("query_id").longValue).toSet.size == 5)
    }
  }
}
