package graft.sources

import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

/** ScbfStrTopK: construction from values, weighted merge, render/parse
 * round-trip, and the selectivity estimates the planner consumes. */
class ScbfStrTopKSpec extends AnyFunSuite {

  private def bytes(s: String) = s.getBytes("UTF-8")

  test("fromValues captures hot values with exact-at-small-n counts") {
    // 950×en, 40×fr, 9×de, 1×kw
    val vals = Array.fill(950)("en") ++ Array.fill(40)("fr") ++
      Array.fill(9)("de") ++ Array("kw")
    val t = ScbfStrTopK.fromValues(vals.length, vals.length)(i => bytes(vals(i))).get
    assert(t.rows == 1000)
    assert(t.entries.take(3) == Vector("en" -> 950L, "fr" -> 40L, "de" -> 9L))
    assert(t.entries.toMap.get("kw").contains(1L))
    assert(t.otherRows == 0)
  }

  test("K caps the summary; displaced mass pools into otherRows") {
    val vals = (0 until 100).flatMap(i => Seq.fill(100 - i)(f"v$i%03d")).toArray
    val t = ScbfStrTopK.fromValues(vals.length, vals.length, k = 8)(
      i => bytes(vals(i))).get
    assert(t.entries.size == 8)
    assert(t.entries.head == ("v000" -> 100L))
    assert(t.otherRows == t.rows - t.entries.map(_._2).sum)
    assert(t.otherRows > 0)
  }

  test("values beyond MaxValBytes never enter; their mass is other") {
    val long = "x" * (ScbfStrTopK.MaxValBytes + 1)
    val vals = Array.fill(10)(long) ++ Array.fill(5)("hot")
    val t = ScbfStrTopK.fromValues(vals.length, vals.length)(i => bytes(vals(i))).get
    assert(t.entries == Vector("hot" -> 5L))
    assert(t.otherRows == 10)
  }

  test("merge sums matching values exactly and re-caps") {
    val a = ScbfStrTopK.TopK(100, Vector("en" -> 90L, "fr" -> 10L), 0)
    val b = ScbfStrTopK.TopK(50, Vector("en" -> 30L, "de" -> 20L), 0)
    val m = ScbfStrTopK.merge(Seq(a, b)).get
    assert(m.rows == 150)
    assert(m.entries == Vector("en" -> 120L, "de" -> 20L, "fr" -> 10L))
    assert(m.otherRows == 0)
    val capped = ScbfStrTopK.merge(Seq(a, b), k = 1).get
    assert(capped.entries == Vector("en" -> 120L) && capped.otherRows == 30)
  }

  test("render/parse round-trips exactly, separators and unicode included") {
    val t = ScbfStrTopK.TopK(1234,
      Vector("a|b;c:d" -> 600L, "héllo\tworld" -> 300L, "" -> 34L), 300)
    assert(ScbfStrTopK.parse(ScbfStrTopK.render(t)).contains(t))
    assert(ScbfStrTopK.parse("garbage").isEmpty)
    assert(ScbfStrTopK.parse("10|x:1").isEmpty)
  }

  test("equality selectivity: hot value true mass, rare value average-other, never zero") {
    val t = ScbfStrTopK.TopK(10000,
      Vector("en" -> 9500L, "fr" -> 400L, "kw" -> 10L), 90)
    val ndv = Some(12L) // 3 summarized + ~9 others
    def sel(f: Filter) = ScbfStrTopK.selectivity(t, ndv, None, f).get
    assert(sel(EqualTo("lang", "en")) == 0.95)
    assert(sel(EqualTo("lang", "kw")) == 0.001)
    // unseen value: otherRows / otherNdv = 90/9 = 10 rows
    assert(sel(EqualTo("lang", "xx")) == 0.001)
    // In sums its members
    assert(sel(In("lang", Array("fr", "kw"))) == 0.041)
    // NDV-based 1/ndv would say 1/12 ≈ 8.3% for EVERY value — wrong by
    // 11x for 'en' and 83x for 'kw'; that gap is the point
  }

  test("estimator calibration invariants on randomized distributions") {
    // the selectivity estimator has four paths (top-K mass, residual
    // average, histogram interpolation, flat interpolation); these
    // invariants hold across ALL of them and catch a regression in
    // any: never-zero, range monotonicity, >=/< complementarity, and
    // hot-value equality accuracy when sampling is exact
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { trial =>
      // mixture: a few hot values + a random tail, n small enough that
      // the stride sample is the full data (exact counts)
      val hot = (1 to (1 + rnd.nextInt(3))).map(h =>
        f"hot$h%02d" -> (500 + rnd.nextInt(4000)))
      val tailN = 200 + rnd.nextInt(800)
      val vals = hot.flatMap { case (v, c) => Seq.fill(c)(v) } ++
        (1 to tailN).map(_ => f"t${rnd.nextInt(100000)}%05d${('a' + rnd.nextInt(26)).toChar}")
      val arr = rnd.shuffle(vals).toArray
      val n = arr.length
      val t = ScbfStrTopK.fromValues(n, n, k = 8)(i => bytes(arr(i))).get
      val hist = ScbfHistogram.fromValues(
        arr.map(v => ScbfStrTopK.prefixKey(bytes(v))), n, 32)
      val ndv = Some(arr.distinct.length.toLong)
      val sorted = arr.map(bytes).sortWith((a, b) =>
        java.util.Arrays.compareUnsigned(a, b) < 0)
      // both anchored residual models: flat bounds and the histogram
      // (unanchored is DELIBERATELY conservative — it keeps the
      // residual whole in both directions, so complementarity
      // overshoots; that behavior is pinned in the range test below)
      val bounds = Some((sorted.head, Some(sorted.last)))
      def sel(f: Filter, h: Option[ScbfHistogram.Hist]): Double =
        ScbfStrTopK.selectivity(t, ndv, bounds, f, h).get
      for (h <- Seq(None, hist)) {
        // 1. hot-value equality is exact (counts are exact at this n)
        hot.foreach { case (v, c) =>
          val s = sel(EqualTo("c", v), h)
          assert(math.abs(s - c.toDouble / n) < 1e-9,
            s"trial $trial: hot $v $s vs ${c.toDouble / n}")
        }
        // 2. never zero, never above one — any value, any cut
        assert(sel(EqualTo("c", "never-seen"), h) >= 1.0 / n)
        assert(sel(EqualTo("c", "never-seen"), h) <= 1.0)
        // 3. range monotonicity in the cut point
        val cuts = Seq("a", "hot00", "hot99", "t3", "t99999z", "zz")
        val ge = cuts.map(c => sel(GreaterThanOrEqual("c", c), h))
        ge.sliding(2).foreach { case Seq(a, b) =>
          assert(a >= b - 1e-9, s"trial $trial h=${h.isDefined}: >= not monotone: $ge")
        }
        // 4. >= and < complement to ~1 (slack: the one-row floor and
        // residual-model seams, both bounded)
        cuts.foreach { c =>
          val s = sel(GreaterThanOrEqual("c", c), h) + sel(LessThan("c", c), h)
          assert(s > 0.9 && s < 1.2,
            s"trial $trial h=${h.isDefined} cut=$c: complement sum $s")
        }
      }
    }
  }

  test("range selectivity: exact over top-K, bound-interpolated residual, conservative without bounds") {
    val t = ScbfStrTopK.TopK(10000,
      Vector("aa" -> 9000L, "mm" -> 500L, "zz" -> 100L), 400)
    val bounds = Some((bytes("aa"), Some(bytes("zz"))))
    def sel(f: Filter, b: Option[(Array[Byte], Option[Array[Byte]])]) =
      ScbfStrTopK.selectivity(t, Some(100L), b, f).get
    // >= "zz": only the zz mass plus ~0 interpolated residual
    val hi = sel(GreaterThanOrEqual("k", "zz"), bounds)
    assert(hi >= 0.01 && hi < 0.02, s"got $hi")
    // < "mm": the aa mass plus roughly half the residual
    val lo = sel(LessThan("k", "mm"), bounds)
    assert(lo > 0.9 && lo < 0.95, s"got $lo")
    // startsWith keeps matching top-K values
    val sw = sel(StringStartsWith("k", "m"), bounds)
    assert(sw >= 0.05 && sw < 0.08, s"got $sw")
    // without bounds the residual stays whole — shrink only on evidence
    val noB = sel(GreaterThanOrEqual("k", "zz"), None)
    assert(noB >= (100 + 400) / 10000.0, s"got $noB")
    // unsupported shapes estimate nothing
    assert(ScbfStrTopK.selectivity(t, None, None,
      StringContains("k", "a")).isEmpty)
  }

  test("startsWith with an 8+ byte prefix never zeroes the residual (key-resolution limit)") {
    // 'https://' is exactly 8 bytes: in the 8-byte prefix-key domain
    // the [p, p∥0xff…] interval collapses to zero width — but the
    // filter truly keeps every https URL (here ~all the mass, all of
    // it residual because URLs exceed nothing but are high-cardinality
    // singletons). The estimator must keep the residual whole, not
    // floor a 90%-keep filter at one row and wrongly broadcast.
    val t = ScbfStrTopK.TopK(100000, Vector("https://a.example/0" -> 4L), 99996)
    // mixed http/https bounds: the single-point-domain fallback can't fire
    val bounds = Some((bytes("http://a.example"), Some(bytes("https://z.example"))))
    val s = ScbfStrTopK.selectivity(t, Some(90000L), bounds,
      StringStartsWith("u", "https://")).get
    assert(s >= 0.9, s"8-byte prefix, no point evidence: residual must stay whole, got $s")
    // WITH a prefix-key histogram the residual is bounded by the mass
    // of the bins covering the key point — real evidence, so it may
    // shrink, but exactly to the covering mass, never to zero
    val x = ScbfStrTopK.prefixKey(bytes("https://"))
    val h = ScbfHistogram.Hist(25000.0, Vector(
      ScbfHistogram.Bin(x - 2e15, x - 1e15, 5000),
      ScbfHistogram.Bin(x, x, 1),
      ScbfHistogram.Bin(x, x, 1),
      ScbfHistogram.Bin(x + 1e15, x + 2e15, 5000)))
    val s2 = ScbfStrTopK.selectivity(t, Some(90000L), bounds,
      StringStartsWith("u", "https://"), Some(h)).get
    assert(s2 >= 0.45 && s2 <= 0.55,
      s"two of four bins cover the prefix key: residual ~0.5, got $s2")
  }

  test("string interval conjunctions estimate one interval (the utf8 date-range shape)") {
    // 100 distinct day strings, uniform mass, all residual (k small);
    // day >= 'd040' AND day < 'd060' truly keeps 20% — a per-side
    // product would say ~36%, a contradictory band ~9% where truth is 0
    val days = (0 until 100).map(i => f"d$i%03d")
    val vals = days.flatMap(d => Seq.fill(10)(d)).toArray
    val t = ScbfStrTopK.fromValues(vals.length, vals.length, k = 4)(
      i => bytes(vals(i))).get
    val hist = ScbfHistogram.fromValues(
      vals.map(v => ScbfStrTopK.prefixKey(bytes(v))), vals.length, 32)
    val bounds = Some((bytes("d000"), Some(bytes("d099"))))
    for (h <- Seq(None, hist)) {
      val band = ScbfStrTopK.selectivityInterval(t, bounds,
        Seq("d040" -> true), Seq("d060" -> false), h).get
      assert(band > 0.14 && band < 0.26,
        s"h=${h.isDefined}: ~20% expected, product would say 36%: $band")
      val empty = ScbfStrTopK.selectivityInterval(t, bounds,
        Seq("d070" -> false), Seq("d030" -> false), h).get
      assert(empty <= 1.0 / vals.length + 1e-9,
        s"h=${h.isDefined}: contradictory band floors at one row: $empty")
      // single-sided interval == the corresponding range selectivity
      val one = ScbfStrTopK.selectivityInterval(t, bounds,
        Seq("d040" -> true), Seq.empty, h).get
      val ref = ScbfStrTopK.selectivity(t, Some(100L), bounds,
        GreaterThanOrEqual("c", "d040"), h).get
      assert(math.abs(one - ref) < 1e-12, s"h=${h.isDefined}: $one vs $ref")
      // several bounds per side fold to the tightest
      val tight = ScbfStrTopK.selectivityInterval(t, bounds,
        Seq("d010" -> true, "d040" -> true), Seq("d090" -> false, "d060" -> false), h).get
      assert(math.abs(tight - band) < 1e-12, s"h=${h.isDefined}: $tight vs $band")
    }
    // sub-resolution band: a DAILY range whose bounds share the first
    // 8 bytes ('2024-01-') collapses to one prefix key — the key
    // domain cannot resolve it, so the residual must stay WHOLE (the
    // old per-side product overestimated; zeroing would underestimate
    // a filter that truly keeps 1/30 of the data, the OOM direction)
    val tsVals = (1 to 30).flatMap(d => (0 until 20).map(h =>
      f"2024-01-$d%02dT$h%02d")).toArray
    val tt = ScbfStrTopK.fromValues(tsVals.length, tsVals.length, k = 4)(
      i => bytes(tsVals(i))).get
    val tsHist = ScbfHistogram.fromValues(
      tsVals.map(v => ScbfStrTopK.prefixKey(bytes(v))), tsVals.length, 32)
    val tsBounds = Some((bytes("2024-01-01T00"), Some(bytes("2024-01-30T19"))))
    for (h <- Seq(None, tsHist)) {
      val daily = ScbfStrTopK.selectivityInterval(tt, tsBounds,
        Seq("2024-01-15" -> true), Seq("2024-01-16" -> false), h).get
      assert(daily >= 0.9,
        s"h=${h.isDefined}: sub-key-resolution band must not shrink the residual: $daily")
    }

    // hot values stay exact through the top-K regardless of the model:
    // a band holding a 60%-hot value keeps at least that mass
    val hotVals = Array.fill(600)("d050") ++ vals.take(400)
    val th = ScbfStrTopK.fromValues(hotVals.length, hotVals.length, k = 4)(
      i => bytes(hotVals(i))).get
    val s = ScbfStrTopK.selectivityInterval(th,
      Some((bytes("d000"), Some(bytes("d099")))),
      Seq("d045" -> true), Seq("d055" -> false), None).get
    assert(s >= 0.6, s"the hot value's exact mass must survive the band: $s")
  }

  test("merge preserves summaries wider than DefaultK (a topkK knob survives the dir merge)") {
    val wide = ScbfStrTopK.TopK(10000,
      (0 until 100).map(i => f"v$i%03d" -> (200L - i)).toVector, 0)
    val m = ScbfStrTopK.merge(Seq(wide, wide)).get
    assert(m.entries.size == 100,
      s"a 100-entry summary must not truncate to DefaultK on merge: ${m.entries.size}")
    assert(m.entries.head == ("v000" -> 400L) && m.otherRows == 0)
    // the explicit-k overload still caps
    assert(ScbfStrTopK.merge(Seq(wide), k = 8).get.entries.size == 8)
  }
}
