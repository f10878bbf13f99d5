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

  test("empty/degenerate inputs yield None") {
    assert(ScbfHistogram.fromValues(Array.empty[Double], 0, 32).isEmpty)
    assert(ScbfHistogram.fromValues(Array(1.0), 0, 32).isEmpty)
    assert(ScbfHistogram.merge(Seq.empty, 32).isEmpty)
    // single-value column: one point bin per slot, all at the value
    val h = ScbfHistogram.fromValues(Array.fill(50)(7.0), 50, 32).get
    assert(h.bins.forall(b => b.lo == 7.0 && b.hi == 7.0))
  }
}
