package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ScbfHistogram.{Bin, Hist}

/** ScbfHistogram unit surface: equi-height construction (uniform and
 * skewed), the sidecar/manifest text round-trip, the weighted mixture
 * merge, and the deterministic writer sample. */
class ScbfHistogramSpec extends AnyFunSuite {

  test("uniform values: bins tile the range with ~equal ndv") {
    val vs = Array.tabulate(1000)(_.toDouble)
    val h = ScbfHistogram.fromValues(vs, 1000, 32).get
    assert(h.bins.length == 32)
    assert(h.height == 1000.0 / 32)
    assert(h.bins.head.lo == 0.0 && h.bins.last.hi == 999.0)
    // contiguous tiling: each bin starts where the previous ended
    h.bins.sliding(2).foreach { case Seq(a, b) => assert(a.hi == b.lo) }
    // ~31 distinct values per bin on uniform data
    assert(h.bins.forall(b => b.ndv >= 25 && b.ndv <= 40),
      s"uniform ndv per bin: ${h.bins.map(_.ndv)}")
  }

  test("skew: a hot value occupies most bins as point bins") {
    // 99% zeros, 1% spread over [1, 1e6]
    val vs = Array.tabulate(10000)(i =>
      if (i % 100 == 99) (i * 101 % 1000000 + 1).toDouble else 0.0)
    val h = ScbfHistogram.fromValues(vs, 10000, 32).get
    val pointBinsAtZero = h.bins.count(b => b.lo == 0.0 && b.hi == 0.0)
    assert(pointBinsAtZero >= 30,
      s"99% mass at 0 must occupy ≥30 of 32 equi-height bins, got $pointBinsAtZero")
    // the spread mass is confined to the last bin(s): anything above 0
    // holds ≤ 2/32 of the rows — the skew signal uniformity cannot see
    val aboveZeroBins = h.bins.count(_.hi > 0.0)
    assert(aboveZeroBins <= 2, s"spread mass must sit in ≤2 bins, got $aboveZeroBins")
  }

  test("render/parse round-trips exactly; garbage parses to None") {
    val h = Hist(31.25, Vector(Bin(0.0, 1.5, 3), Bin(1.5, 2.5E10, 7)))
    assert(ScbfHistogram.parse(ScbfHistogram.render(h)).contains(h))
    assert(ScbfHistogram.parse("").isEmpty)
    assert(ScbfHistogram.parse("no-bar-here").isEmpty)
    assert(ScbfHistogram.parse("1.0|bad:bins").isEmpty)
    assert(ScbfHistogram.parse("1.0|NaN:2.0:1").isEmpty)
    assert(ScbfHistogram.parse("-1.0|0.0:1.0:1").isEmpty, "height must be positive")
  }

  test("merge of disjoint uniform histograms preserves mass and range") {
    val a = ScbfHistogram.fromValues(Array.tabulate(1000)(_.toDouble), 1000, 32).get
    val b = ScbfHistogram.fromValues(Array.tabulate(1000)(i => 2000.0 + i), 3000, 32).get
    val m = ScbfHistogram.merge(Seq(a, b), 32).get
    assert(math.abs(m.rows - 4000.0) < 1.0, s"total rows ${m.rows}")
    assert(m.bins.head.lo == 0.0 && m.bins.last.hi >= 2990.0)
    // b carries 3× a's rows: ~3/4 of the bins must lie in b's range
    val inB = m.bins.count(_.lo >= 1990.0)
    assert(inB >= 20 && inB <= 28, s"weighted mixture: $inB of 32 bins in the heavy range")
  }

  test("merge respects a single dominant point mass") {
    val hot = Hist(100.0, Vector.fill(32)(Bin(5.0, 5.0, 1)))     // 3200 rows of '5'
    val cold = Hist(1.0, Vector(Bin(0.0, 10.0, 10)))              // 1 row-ish spread
    val m = ScbfHistogram.merge(Seq(hot, cold), 32).get
    assert(m.bins.count(b => b.lo == 5.0 && b.hi == 5.0) >= 30,
      "the dominant atom must occupy nearly every output bin")
  }

  test("writer sample is deterministic, capped, and stride-spaced") {
    val vs = Array.tabulate(200000)(_.toDouble)
    val s1 = ScbfHistogram.sample(vs)
    val s2 = ScbfHistogram.sample(vs)
    assert(s1.sameElements(s2), "sample must be deterministic")
    assert(s1.length <= ScbfHistogram.SampleCap && s1.length > ScbfHistogram.SampleCap / 2)
    assert(s1.head == 0.0)
    // under the cap: identity
    val small = Array.tabulate(100)(_.toDouble)
    assert(ScbfHistogram.sample(small) eq small)
  }

  test("sampled construction scales height to the true row count") {
    val vs = Array.tabulate(200000)(i => (i % 1000).toDouble)
    val h = ScbfHistogram.fromValues(ScbfHistogram.sample(vs), 200000, 32).get
    assert(math.abs(h.rows - 200000.0) < 1.0,
      s"height must represent the real rows, got ${h.rows}")
  }

  test("merge of random splits conserves mass, bounds and quantiles") {
    // deterministic LCG so the "random" data is reproducible
    var seed = 0x2545F4914F6CDD1DL
    def next(): Double = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      // mix of a hot value and a heavy tail — the merge must survive both
      val u = (seed >>> 11).toDouble / (1L << 53).toDouble
      if (u < 0.5) 7.0 else math.pow(u, 4) * 10000.0
    }
    val n = 40000
    val all = Array.fill(n)(next())
    (1 to 3).foreach { trial =>
      val parts = 2 + trial * 3 // 5, 8, 11 splits
      val chunks = all.grouped(math.ceil(n.toDouble / parts).toInt).toSeq
      val hists = chunks.map(c => ScbfHistogram.fromValues(c, c.length, 32).get)
      val m = ScbfHistogram.merge(hists, 32).get
      // mass conservation
      assert(math.abs(m.rows - n) < 2.0, s"parts=$parts mass ${m.rows}")
      // bound containment: outer bin edges are the global extrema
      val sorted = all.clone(); java.util.Arrays.sort(sorted)
      assert(m.bins.head.lo == sorted.head && m.bins.last.hi == sorted.last,
        s"parts=$parts bounds [${m.bins.head.lo}, ${m.bins.last.hi}]")
      // quantile fidelity: the merged equi-height boundary nearest the
      // median must land within a few bins' mass of the exact median
      val exactMedian = sorted(n / 2)
      val medianBin = m.bins(m.bins.length / 2)
      val nearExact = sorted((n * 14) / 32) // ±2 bins of slack
      val farExact = sorted(math.min(n - 1, (n * 18) / 32))
      assert(medianBin.hi >= nearExact && medianBin.lo <= farExact,
        s"parts=$parts median bin [${medianBin.lo}, ${medianBin.hi}] " +
          s"vs exact median $exactMedian")
    }
  }

  test("merge stays equi-height under front-loaded mass and extreme weight ratios") {
    // adversarial mixtures: a huge front-loaded point mass forces the
    // cut loop through many point-bin emissions early, and a 1e12
    // weight ratio maximizes fp drift in the mass accounting — the
    // regression shape where greedy target-subtraction could silently
    // drop a cut and lump several targets into the final bin while
    // still REPORTING height = totalW/bins
    var seed = 42L
    def nextW(): Double = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      math.pow(10.0, ((seed >>> 11) % 13).toDouble) // 1 .. 1e12
    }
    (1 to 50).foreach { trial =>
      val heavy = ScbfHistogram.Hist(nextW() * 1e3,
        Vector(ScbfHistogram.Bin(0.0, 0.0, 1)))
      val tails = (1 to 4).map { t =>
        ScbfHistogram.Hist(nextW(),
          Vector.tabulate(8)(i => ScbfHistogram.Bin(i * 10.0 + t, i * 10.0 + t + 9, 5)))
      }
      val m = ScbfHistogram.merge(heavy +: tails, 32).get
      val totalW = heavy.rows + tails.map(_.rows).sum
      // exactly the requested bin count — a dropped cut shows up here
      assert(m.bins.length == 32, s"trial $trial: ${m.bins.length} bins")
      // and the reported height is consistent with the represented mass,
      // so each bin really stands for totalW/32 rows
      assert(math.abs(m.rows - totalW) / totalW < 1e-9,
        s"trial $trial: rows ${m.rows} vs $totalW")
      // when the front mass dominates a bin's worth, it renders as a
      // point bin at the hot value
      if (heavy.rows >= totalW / 32)
        assert(m.bins.head.lo == 0.0 && m.bins.head.hi == 0.0, s"trial $trial")
    }
  }

  test("keepFraction calibration invariants on randomized distributions") {
    // the numeric mirror of the string estimator's calibration gate:
    // range estimates land within bin resolution of the truth, are
    // monotone in the cut, complement exactly, and equality shrinks
    // ONLY on point-bin evidence (in-range non-hot values estimate
    // nothing rather than guessing)
    import org.apache.spark.sql.sources._
    val rnd = new scala.util.Random(13)
    (1 to 20).foreach { trial =>
      val hot = (1 to (1 + rnd.nextInt(3)))
        .map(h => (h * 17).toDouble -> (800 + rnd.nextInt(4000)))
      val tail = Array.fill(300 + rnd.nextInt(700))(rnd.nextDouble() * 1e6)
      val vals = hot.flatMap { case (v, c) => Seq.fill(c)(v) }.toArray ++ tail
      val n = vals.length
      val h = ScbfHistogram.fromValues(vals, n, 32).get
      def truth(p: Double => Boolean) = vals.count(p).toDouble / n
      def est(f: Filter): Option[Double] = ScbfHistogram.keepFraction(h, f)
      // 1. range accuracy within a few bins' resolution
      val cuts = Seq(-1.0, 5.0, 20.0, 1e3, 1e5, 5e5, 9.9e5, 2e6)
      cuts.foreach { c =>
        val e = est(GreaterThan("x", c)).get
        assert(math.abs(e - truth(_ > c)) < 5.0 / 32,
          s"trial $trial cut $c: est $e truth ${truth(_ > c)}")
      }
      // 2. monotone in the cut
      cuts.map(c => est(GreaterThanOrEqual("x", c)).get)
        .sliding(2).foreach { case Seq(a, b) =>
          assert(a >= b - 1e-9, s"trial $trial: >= not monotone")
        }
      // 3. exact complements by construction
      cuts.foreach { c =>
        assert(math.abs(est(GreaterThanOrEqual("x", c)).get +
          est(LessThan("x", c)).get - 1.0) < 1e-9)
        assert(math.abs(est(GreaterThan("x", c)).get +
          est(LessThanOrEqual("x", c)).get - 1.0) < 1e-9)
      }
      // 4. hot-value equality tracks the true mass (point-bin evidence)
      hot.foreach { case (v, c) =>
        val e = est(EqualTo("x", v)).get
        assert(math.abs(e - c.toDouble / n) < 2.5 / 32,
          s"trial $trial hot $v: est $e truth ${c.toDouble / n}")
      }
      // 5. in-range non-hot equality: NO estimate (1/NDV is the
      // estimator's job; shrinking on no evidence is the OOM direction)
      assert(est(EqualTo("x", 123456.789)).isEmpty)
      // 6. out-of-range equality/In is provably empty
      assert(est(EqualTo("x", -5.0)).contains(0.0))
      assert(est(In("x", Array(-5.0, 2e6))).contains(0.0))
      // 7. non-numeric literals and unsupported shapes estimate nothing
      assert(est(EqualTo("x", "s")).isEmpty)
      assert(est(IsNull("x")).isEmpty)
      // 8. interval conjunction: a band estimates its true mass (the
      // per-side product overestimates), a contradictory band is zero
      val band = ScbfHistogram.intervalFraction(h,
        Some((2e5, true)), Some((6e5, false))).get
      assert(math.abs(band - truth(v => v >= 2e5 && v < 6e5)) < 5.0 / 32,
        s"trial $trial band: $band vs ${truth(v => v >= 2e5 && v < 6e5)}")
      assert(ScbfHistogram.intervalFraction(h,
        Some((7e5, false)), Some((3e5, false))).contains(0.0))
      // one-sided intervals equal the corresponding range estimate
      assert(math.abs(ScbfHistogram.intervalFraction(h, Some((1e3, false)), None).get -
        est(GreaterThan("x", 1e3)).get) < 1e-12)
      // 9. zero-width bands follow the equality evidence rule: a HOT
      // value's point-bin mass shows through the difference; a
      // non-hot in-domain value yields NO estimate (shrinking there
      // would be a guess — BETWEEN x AND x never folds to EqualTo in
      // pushed filters); out-of-domain is provably empty
      hot.foreach { case (v, c) =>
        val e = ScbfHistogram.intervalFraction(h,
          Some((v, true)), Some((v, true))).get
        assert(math.abs(e - c.toDouble / n) < 2.5 / 32,
          s"trial $trial hot band [$v,$v]: $e vs ${c.toDouble / n}")
      }
      assert(ScbfHistogram.intervalFraction(h,
        Some((123456.789, true)), Some((123456.789, true))).isEmpty)
      assert(ScbfHistogram.intervalFraction(h,
        Some((2e6, true)), Some((3e6, true))).contains(0.0))
    }
  }

  test("empty/degenerate inputs yield None") {
    assert(ScbfHistogram.fromValues(Array.empty[Double], 0, 32).isEmpty)
    assert(ScbfHistogram.fromValues(Array(1.0), 0, 32).isEmpty)
    assert(ScbfHistogram.merge(Seq.empty, 32).isEmpty)
    // single-value column: one point bin per slot, all at the value
    val h = ScbfHistogram.fromValues(Array.fill(50)(7.0), 50, 32).get
    assert(h.bins.forall(b => b.lo == 7.0 && b.hi == 7.0))
  }
}
