package graft.sources

import scala.collection.mutable.ArrayBuffer

/**
 * Compact equi-height histograms for SCBF numeric columns — the
 * skew-awareness half of the planner statistics story. min/max + HLL
 * NDV ([[ScbfNdv]]) already flow to Catalyst, but selectivity on a
 * SKEWED range predicate still assumed uniformity: `col > v` over a
 * column with 99% of its mass below v estimated ~(max−v)/(max−min) of
 * the rows surviving — orders of magnitude off, and the CBO's
 * broadcast/join-reorder decisions inherit the error. An equi-height
 * histogram (the same shape Spark's own ANALYZE .. FOR COLUMNS
 * computes, and what Catalyst's FilterEstimation/JoinEstimation
 * consume: `computeComparisonPossibilityByHistogram`,
 * `getOverlappedRanges`) carries the mass distribution in ~32 bins.
 *
 * Placement mirrors [[ScbfNdv]]: each file's sidecar records its own
 * exact histogram (the writer sees every value), and the MANIFEST
 * keeps one merged histogram per column per DIRECTORY (`dirhist`
 * lines) — per-file histograms in the manifest would grow it by
 * ~1 KB × columns × files, unreadable-in-one-go at 10⁵ files.
 * Like the NDV registers, the directory histogram is insert-only
 * across appends (merge is a weighted mixture) and is only rebuilt
 * from scratch by a fresh overwrite/OPTIMIZE — after a DELETE it
 * over-represents deleted mass until then, the documented staleness
 * contract of the whole stats layer. Histograms are ESTIMATOR input
 * only: no pruning or correctness path reads them.
 *
 * Equi-height semantics (Catalyst's contract): `height` rows per bin,
 * bins ordered, each [lo, hi] with its distinct-value count. A heavily
 * repeated value shows up as several consecutive point bins
 * (lo == hi), exactly how ANALYZE's percentile-based generation
 * renders skew — FilterEstimation counts each such bin's full height
 * toward any range containing the value.
 */
object ScbfHistogram {

  /** Hadoop-conf key for the per-write bin count (0 disables histogram
   * collection). Set via the `histogramBins` write option, which rides
   * a per-job Configuration copy the same way bloomMaxBytes does. */
  val BinsKey = "graft.stats.histogram.bins"
  val DefaultBins = 32

  /** Above this many buffered values the writer histograms a
   * deterministic stride sample instead of sorting everything: the
   * sort is the only super-linear step in the write-path stats, and a
   * 64Ki sample bounds it at ~ms while keeping bin boundaries within
   * a fraction of a bin of exact (estimator input — exactness buys
   * nothing past the bin resolution). Deterministic (every k-th
   * value), so streaming-epoch replays write byte-identical sidecars. */
  val SampleCap = 65536

  /** Sub-points per source bin when merging: each input bin is
   * re-discretized into this many equally-spaced weighted points, so
   * merge accuracy is ~1/(SubPoints × bins) of the mass. */
  val SubPoints = 8

  final case class Bin(lo: Double, hi: Double, ndv: Long)

  /** `height` = rows per bin (equi-height). Total represented rows =
   * height × bins.length, carried implicitly. */
  final case class Hist(height: Double, bins: Vector[Bin]) {
    def rows: Double = height * bins.length
  }

  /**
   * Exact equi-height histogram from a column's (possibly sampled)
   * values. `rows` is the TRUE row count the histogram represents —
   * when `values` is a sample, height scales to it (bin boundaries
   * come from the sample, mass from reality). Per-bin NDV is the
   * distinct count within the bin's value slice (under sampling, of
   * the sample — an under-estimate, documented estimator input).
   * None for empty input. NaN-bearing columns must be filtered by the
   * caller (same contract as ColRange — NaN breaks interval math).
   */
  def fromValues(values: Array[Double], rows: Long, bins: Int = DefaultBins): Option[Hist] = {
    if (values.isEmpty || rows <= 0 || bins <= 0) return None
    val sorted = values.clone()
    java.util.Arrays.sort(sorted)
    val n = sorted.length
    val b = math.min(bins, n)
    // percentile endpoints, Spark's ANALYZE shape: e_k at rank
    // k(n−1)/b; duplicates collapse consecutive endpoints into point
    // bins, which is how skew is represented
    val ends = Array.tabulate(b + 1)(k => sorted(((k.toLong * (n - 1)) / b).toInt))
    val out = Vector.newBuilder[Bin]
    // the bins tile (e_{k-1}, e_k] (first bin closed below), so one
    // forward walk assigns every value to the first bin whose hi
    // reaches it; a repeated endpoint's mass lands in the first of its
    // point bins and the rest record the endpoint value alone (ndv 1)
    var i = 0
    var k = 1
    while (k <= b) {
      val lo = ends(k - 1)
      val hi = ends(k)
      var ndv = 0L
      var last = 0.0
      while (i < n && sorted(i) <= hi) {
        if (ndv == 0 || sorted(i) != last) { ndv += 1; last = sorted(i) }
        i += 1
      }
      out += Bin(lo, hi, math.max(ndv, 1L))
      k += 1
    }
    Some(Hist(rows.toDouble / b, out.result()))
  }

  /**
   * Merge histograms into one equi-height histogram of `bins` bins —
   * the weighted mixture of the inputs' piecewise-uniform
   * distributions. Used by the manifest merge (directory histogram ⊎
   * new files' sidecars) and by planning (kept directories' dirhists).
   * Each input bin re-discretizes into [[SubPoints]] equally-spaced
   * weighted points (point bins stay single atoms), the pooled points
   * sort once, and equal-mass cuts form the output bins. Per-output-bin
   * NDV sums the contributing fractions — an over-estimate when files
   * share values (the caller may rescale against the HLL directory
   * NDV, which handles cross-file duplicates exactly).
   */
  def merge(hists: Seq[Hist], bins: Int = DefaultBins): Option[Hist] = {
    val nonEmpty = hists.filter(h => h.bins.nonEmpty && h.height > 0)
    if (nonEmpty.isEmpty || bins <= 0) return None
    if (nonEmpty.sizeIs == 1 && nonEmpty.head.bins.length <= bins)
      return Some(nonEmpty.head)
    // (position, rowWeight, ndvWeight)
    val pts = new ArrayBuffer[(Double, Double, Double)]()
    nonEmpty.foreach { h =>
      h.bins.foreach { b =>
        if (b.lo == b.hi) pts += ((b.lo, h.height, b.ndv.toDouble))
        else {
          val step = (b.hi - b.lo) / (SubPoints - 1)
          var j = 0
          while (j < SubPoints) {
            pts += ((b.lo + j * step, h.height / SubPoints, b.ndv.toDouble / SubPoints))
            j += 1
          }
        }
      }
    }
    val sorted = pts.sortBy(_._1)
    val totalW = sorted.iterator.map(_._2).sum
    val out = Vector.newBuilder[Bin]
    var binLo = sorted.head._1
    var lastPos = sorted.head._1
    var cum = 0.0 // mass consumed through the last cut
    var acc = 0.0 // mass accumulated since the last cut
    var ndvAcc = 0.0
    var k = 1 // next cut index
    // cut k lands where cumulative mass reaches k·totalW/bins — the
    // thresholds come from the TOTAL, not from repeated target
    // subtraction, so fp drift cannot suppress a cut and lump several
    // targets into the final bin: exactly bins−1 cuts always fire
    // (the last threshold sits a full target below totalW) and every
    // bin holds totalW/bins of mass to ulp accuracy — the equi-height
    // property FilterEstimation assumes when it weighs bins uniformly
    sorted.foreach { case (pos, w, nw) =>
      var remaining = w
      ndvAcc += nw
      lastPos = pos
      // a heavy point can span several output bins: emit point bins
      // until its remaining mass fits the current one
      while (k < bins && cum + acc + remaining >= k * totalW / bins) {
        val take = math.max(k * totalW / bins - cum - acc, 0.0)
        remaining -= take
        out += Bin(binLo, pos, math.max(1L, math.round(ndvAcc)))
        cum = k * totalW / bins
        k += 1
        binLo = pos
        acc = 0.0
        ndvAcc = 0.0
      }
      acc += remaining
    }
    out += Bin(binLo, lastPos, math.max(1L, math.round(math.max(ndvAcc, 1.0))))
    Some(Hist(totalW / bins, out.result()))
  }

  /** Mass fraction of the histogram at or above `x` (equi-height:
   * every bin carries 1/bins of the mass; a straddled range bin
   * contributes linearly, a point bin all-or-nothing). Domain-neutral:
   * numeric column values, or utf8 prefix keys (ScbfStrTopK). */
  def fracAbove(h: Hist, x: Double, inclusive: Boolean): Double = {
    val n = h.bins.length
    if (n == 0) return 1.0
    var s = 0.0
    h.bins.foreach { b =>
      if (b.lo == b.hi) {
        if (b.lo > x || (inclusive && b.lo == x)) s += 1.0
      } else if (b.lo >= x) s += 1.0
      else if (b.hi > x) s += (b.hi - x) / (b.hi - b.lo)
    }
    s / n
  }

  /** Keep-fraction of a conjunctive numeric interval — mass in
   * [lo, hi] with per-bound inclusivity, either side open. The
   * BETWEEN shape: estimating the two sides independently and
   * multiplying assumes independence between perfectly-correlated
   * predicates and OVERESTIMATES (a 20%-wide band in the middle of a
   * uniform column multiplies to 36%), and for contradictory bounds
   * reports a product where the truth is exactly zero.
   *
   * None = no evidence, do not shrink. Zero comes back ONLY as proof:
   * a contradictory/point-excluding band, or a band outside the
   * histogram's domain. A non-empty in-domain band whose interpolated
   * mass is zero is NARROWER THAN THE BIN RESOLUTION (point-bin mass
   * would have shown in the difference — fracAbove counts a point bin
   * at the cut inclusively on one side and exclusively on the other);
   * shrinking there would be the guess `keepFraction`'s equality path
   * explicitly refuses (the broadcast-OOM direction), so it estimates
   * nothing instead. */
  def intervalFraction(h: Hist,
      lo: Option[(Double, Boolean)], hi: Option[(Double, Boolean)]): Option[Double] = {
    val emptyBand = (lo, hi) match {
      case (Some((l, li)), Some((u, ui))) => l > u || (l == u && !(li && ui))
      case _ => false
    }
    if (emptyBand) return Some(0.0)
    if (h.bins.isEmpty) return None
    val aboveLo = lo.map { case (x, incl) => fracAbove(h, x, incl) }.getOrElse(1.0)
    // mass STRICTLY above an inclusive hi / at-or-above an exclusive hi
    val aboveHi = hi.map { case (x, incl) => fracAbove(h, x, !incl) }.getOrElse(0.0)
    val diff = aboveLo - aboveHi
    if (diff > 0) Some(math.min(1.0, diff))
    else {
      val beyond = lo.exists { case (x, incl) =>
        x > h.bins.last.hi || (!incl && x >= h.bins.last.hi) }
      val before = hi.exists { case (x, incl) =>
        x < h.bins.head.lo || (!incl && x <= h.bins.head.lo) }
      if (beyond || before) Some(0.0) else None // sub-resolution: no evidence
    }
  }

  /** Upper bound on the mass fraction at point `x`: every bin whose
   * interval contains `x` contributes in full. Used when a predicate's
   * true interval is narrower than the histogram's domain resolution
   * (a long string prefix in the 8-byte prefix-key domain) — the bins
   * covering the point bound what the predicate can keep there. */
  def fracAt(h: Hist, x: Double): Double = {
    val n = h.bins.length
    if (n == 0) 1.0
    else h.bins.count(b => b.lo <= x && x <= b.hi).toDouble / n
  }

  /** Estimated keep-fraction of one pushed predicate with a NUMERIC
   * literal against this histogram, or None when the histogram can't
   * say (unsupported shape, non-numeric literal). Ranges interpolate
   * bin mass; equality/In shrink ONLY on point-bin evidence (a value
   * heavy enough to occupy its own bins — for everything else 1/NDV
   * is the estimator's job, and without evidence we must not shrink).
   * The planning-side mirror of the string path (ScbfStrTopK): it
   * feeds the scan's own reported numRows/sizeInBytes, so numeric
   * skew flips broadcasts in DEFAULT (cbo.enabled=false) deployments
   * where Catalyst's FilterEstimation never runs. */
  def keepFraction(h: Hist,
      filter: org.apache.spark.sql.sources.Filter): Option[Double] = {
    import org.apache.spark.sql.sources._
    def num(v: Any): Option[Double] = v match {
      case n: java.lang.Number => Some(n.doubleValue())
      case _                   => None
    }
    def pointMass(x: Double): Option[Double] = {
      val pts = h.bins.count(b => b.lo == x && b.hi == x)
      if (pts > 0) Some(pts.toDouble / h.bins.length)
      else if (x < h.bins.head.lo || x > h.bins.last.hi) Some(0.0)
      else None // in-range, not point-heavy: no evidence, don't shrink
    }
    if (h.bins.isEmpty) return None
    filter match {
      case GreaterThan(_, v) => num(v).map(fracAbove(h, _, inclusive = false))
      case GreaterThanOrEqual(_, v) => num(v).map(fracAbove(h, _, inclusive = true))
      case LessThan(_, v) => num(v).map(x => 1.0 - fracAbove(h, x, inclusive = true))
      case LessThanOrEqual(_, v) =>
        num(v).map(x => 1.0 - fracAbove(h, x, inclusive = false))
      case EqualTo(_, v) => num(v).flatMap(pointMass)
      case EqualNullSafe(_, v) => num(v).flatMap(pointMass)
      case In(_, vs) =>
        val xs = vs.toSeq.map(num)
        if (xs.exists(_.isEmpty)) None
        else {
          val ms = xs.flatten.distinct.map(pointMass)
          if (ms.exists(_.isEmpty)) None
          else Some(math.min(1.0, ms.flatten.sum))
        }
      case _ => None
    }
  }

  /** `height|lo:hi:ndv;lo:hi:ndv;…` — Double.toString round-trips
   * exactly and never contains the separators. */
  def render(h: Hist): String =
    s"${h.height}|" + h.bins.map(b => s"${b.lo}:${b.hi}:${b.ndv}").mkString(";")

  /** None on any malformed input — histograms are a pure estimator
   * hint, so a torn line only costs this column its histogram. */
  def parse(s: String): Option[Hist] =
    try {
      val bar = s.indexOf('|')
      if (bar < 0) return None
      val height = s.substring(0, bar).toDouble
      val bins = s.substring(bar + 1).split(";").toVector.map { t =>
        val Array(lo, hi, ndv) = t.split(":", 3)
        Bin(lo.toDouble, hi.toDouble, ndv.toLong)
      }
      if (height > 0 && bins.nonEmpty &&
          bins.forall(b => b.lo <= b.hi && !b.lo.isNaN && !b.hi.isNaN && b.ndv >= 0))
        Some(Hist(height, bins))
      else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic stride sample for the writer: every k-th value of
   * the buffer (k = ⌈n/cap⌉), preserving first/last after sort is not
   * needed — boundaries are percentile-accurate to ~n/cap rows.
   * Accessor form so the writer samples straight off its typed column
   * builders without materializing a full-width Double copy; this is
   * THE stride-sampling definition (byte-identical streaming-replay
   * sidecars depend on every caller agreeing on cap and stride
   * arithmetic — do not re-implement it). */
  def sample(n: Int, cap: Int = SampleCap)(get: Int => Double): Array[Double] = {
    val stride = math.max(1, (n + cap - 1) / cap)
    val out = new Array[Double]((n + stride - 1) / stride)
    var i = 0
    var j = 0
    while (i < n) { out(j) = get(i); j += 1; i += stride }
    out
  }

  /** Array convenience overload of [[sample]]; returns the input
   * unchanged when it already fits the cap. */
  def sample(values: Array[Double], cap: Int): Array[Double] =
    if (values.length <= cap) values
    else sample(values.length, cap)(values(_))

  def sample(values: Array[Double]): Array[Double] = sample(values, SampleCap)
}
