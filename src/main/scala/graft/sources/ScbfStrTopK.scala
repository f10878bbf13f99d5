package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/**
 * Per-column top-K frequency summaries for SCBF utf8 columns — the
 * string half of the skew-awareness story. Numeric skew reaches the
 * planner through [[ScbfHistogram]] (Catalyst's FilterEstimation
 * consumes equi-height histograms natively), but STRING columns are
 * the skew-prone keys of an LLM pipeline (source, lang, domain), and
 * Catalyst has no string-histogram path at all: equality selectivity
 * falls back to 1/NDV, which on a 95%-'en' / 0.1%-'kw' language
 * column is off by orders of magnitude in BOTH directions — and the
 * CBO's broadcast decisions inherit the error.
 *
 * A top-K summary (value → estimated row count for the K most
 * frequent values, plus the residual mass) is the right shape for
 * exactly that: hot values get their true mass, everything else gets
 * `otherRows / (ndv − K)` — the classic frequency-sketch split of
 * ANALYZE's histogram point bins, rendered where the connector can
 * actually use it. Because Catalyst cannot consume it, the summary is
 * applied INSIDE the connector: `estimateStatistics` scales its
 * reported numRows/sizeInBytes by the estimated selectivity of the
 * PUSHED string predicates (the same authority it already exercises
 * by reporting kept-file sizes under pruning). That lever works with
 * the CBO on or off — a rare-value equality filter on a fact table
 * shrinks the scan's reported size below the broadcast threshold, and
 * the join flips, which file-level pruning alone cannot do when every
 * file contains a few matching rows.
 *
 * Placement mirrors [[ScbfNdv]]/[[ScbfHistogram]]: each file's sidecar
 * records its own summary (`topk` lines), the manifest keeps one
 * merged summary per column per directory (`dirtopk`), merged
 * insert-only across appends and rebuilt by overwrite/OPTIMIZE — the
 * same staleness contract as the whole stats layer. Summaries are
 * ESTIMATOR input only: no pruning or correctness path reads them.
 *
 * Estimates, and why they are sound enough: counts come from the same
 * deterministic stride sample as the histograms (hot values are what
 * samples capture best; byte-identical streaming replays hold), merge
 * sums matching values exactly and pools the rest, and selectivity
 * never reports below one row. A value longer than [[MaxValBytes]]
 * never enters a summary (its mass pools into `otherRows`): pipeline
 * group keys are short, and the cap bounds sidecar size.
 */
object ScbfStrTopK {

  /** Hadoop-conf key for the per-write K (0 disables collection). Set
   * via the `topkK` write option, riding the same per-job
   * Configuration copy as histogramBins. */
  val KKey = "graft.stats.topk.k"
  val DefaultK = 32

  /** Values longer than this never enter a summary. */
  val MaxValBytes = 64

  /** rows: total rows the summary represents. entries: the ≤K most
   * frequent values with estimated counts, ordered by (count desc,
   * value asc — deterministic). otherRows: rows − Σ entry counts. */
  final case class TopK(rows: Long, entries: Vector[(String, Long)], otherRows: Long)

  /** Summary from a column's values via the deterministic stride
   * sample (cap shared with [[ScbfHistogram]]); counts scale from the
   * sample to `rows`. None for empty input or k <= 0. */
  def fromValues(n: Int, rows: Long, k: Int = DefaultK)(
      get: Int => Array[Byte]): Option[TopK] = {
    if (n <= 0 || rows <= 0 || k <= 0) return None
    val stride = math.max(1, (n + ScbfHistogram.SampleCap - 1) / ScbfHistogram.SampleCap)
    val counts = new java.util.HashMap[String, Long]()
    var sampled = 0L
    var i = 0
    while (i < n) {
      val b = get(i)
      if (b.length <= MaxValBytes)
        counts.merge(new String(b, UTF_8), 1L, (a, x) => a + x)
      sampled += 1
      i += stride
    }
    val scale = rows.toDouble / sampled
    val top = {
      import scala.jdk.CollectionConverters._
      counts.asScala.toVector
        .sortBy { case (v, c) => (-c, v) }
        .take(k)
        .map { case (v, c) => v -> math.max(1L, math.round(c * scale)) }
    }
    val covered = top.iterator.map(_._2).sum
    Some(TopK(rows, top, math.max(0L, rows - covered)))
  }

  /** Weighted merge: matching values sum exactly, the combined tail
   * keeps the K heaviest, everything displaced pools into otherRows —
   * the standard mergeable heavy-hitter summary (a directory's hot
   * values are hot in most of its files, so displacement noise stays
   * in the tail the estimator already treats as average-mass). */
  def merge(ts: Seq[TopK], k: Int = 0): Option[TopK] = {
    val nonEmpty = ts.filter(_.rows > 0)
    if (nonEmpty.isEmpty || k < 0) return None
    // k=0 (the default) infers the budget from the inputs: summaries
    // written with a larger `topkK` option keep their width through
    // the dirtopk merge and the planning-side merge instead of being
    // silently truncated to DefaultK
    val kEff =
      if (k > 0) k
      else math.max(DefaultK, nonEmpty.iterator.map(_.entries.size).max)
    val rows = nonEmpty.iterator.map(_.rows).sum
    val summed = nonEmpty.flatMap(_.entries)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toVector
      .sortBy { case (v, c) => (-c, v) }
    val top = summed.take(kEff)
    val covered = top.iterator.map(_._2).sum
    Some(TopK(rows, top, math.max(0L, rows - covered)))
  }

  /** `rows|v:c;v:c;…|other` with base64url values (never contains the
   * separators). */
  def render(t: TopK): String = {
    val enc = java.util.Base64.getUrlEncoder.withoutPadding()
    s"${t.rows}|" + t.entries.map { case (v, c) =>
      s"${enc.encodeToString(v.getBytes(UTF_8))}:$c"
    }.mkString(";") + s"|${t.otherRows}"
  }

  /** None on any malformed input — summaries are a pure estimator
   * hint, so a torn line only costs this column its summary. */
  def parse(s: String): Option[TopK] =
    try {
      val parts = s.split('|')
      if (parts.length != 3) return None
      val dec = java.util.Base64.getUrlDecoder
      val entries =
        if (parts(1).isEmpty) Vector.empty[(String, Long)]
        else parts(1).split(";").toVector.map { t =>
          val Array(v, c) = t.split(":", 2)
          new String(dec.decode(v), UTF_8) -> c.toLong
        }
      val t = TopK(parts(0).toLong, entries, parts(2).toLong)
      if (t.rows > 0 && t.otherRows >= 0 && t.entries.forall(_._2 >= 0)) Some(t)
      else None
    } catch { case scala.util.control.NonFatal(_) => None }

  // ---- selectivity estimation (planning-side) -----------------------------

  /** First-8-bytes big-endian unsigned prefix of a utf8 value, as a
   * Double — a monotone embedding of the lexicographic byte order.
   * EFFECTIVE resolution is the double's 53-bit mantissa, ~6½ bytes:
   * two values differing only in the last ~1.4 of the 8 bytes
   * collapse to one key, and a band between them interpolates to an
   * IN-DOMAIN zero that [[selectivityInterval]] conservatively keeps
   * whole (never shrink below the model's resolution). Compact
   * `yyMMdd`-style stamps resolve daily bands; ISO `2024-01-10`
   * spends the key on the shared `2024-01-` prefix and resolves only
   * month-crossing bands. A monotone embedding,
   * used to interpolate how much of the NON-top-K mass a range
   * predicate keeps (the truncated-bound ordering the utf8 min/max
   * stats already live in). Also the domain of the utf8 EQUI-HEIGHT
   * histograms ([[ScbfHistogram]] over prefix keys): the writer
   * histograms each utf8 column's prefix keys, and range estimation
   * prefers that bin-accurate mass over the flat [min,max]
   * interpolation when the directory carries one. */
  def prefixKey(b: Array[Byte]): Double = {
    var l = 0L
    var i = 0
    while (i < 8) {
      l = (l << 8) | (if (i < b.length) b(i) & 0xffL else 0L)
      i += 1
    }
    // unsigned long → double
    if (l >= 0) l.toDouble else l.toDouble + 1.8446744073709552e19
  }

  private def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** See [[ScbfHistogram.fracAbove]] — one definition for both the
   * numeric and prefix-key domains. */
  def fracAbove(h: ScbfHistogram.Hist, x: Double, inclusive: Boolean): Double =
    ScbfHistogram.fracAbove(h, x, inclusive)

  /** Estimated fraction of rows a single pushed predicate on this
   * column keeps, or None when the summary can't say (unsupported
   * filter shape, non-string literal). `ndv` refines the average mass
   * of non-top-K values. For ranges, the non-top-K mass interpolates
   * through `prefixHist` when the directory carries a utf8 equi-height
   * histogram (bin-accurate mass over the prefix-key ordering — the
   * shape that matters when the value distribution is skewed along
   * the range), else through `bounds` (the folded utf8 min/max, flat
   * model) — absent both, that mass stays whole, erring toward NOT
   * shrinking (a wrongly-broadcast big side is the failure mode to
   * avoid; a missed broadcast is just the status quo). The histogram
   * describes ALL values including the top-K ones, so hot values can
   * overweight their own region of the residual — estimator slack,
   * bounded by the top-K's exact handling of those values. */
  /** Residual-mass interpolation in the 8-byte prefix-key domain:
   * prefix-key histogram when present (bin-accurate under skew), else
   * the flat model between the folded utf8 bounds, else 1.0 (no
   * anchor: keep the residual whole — shrink only on evidence). */
  private def interpFrac(
      bounds: Option[(Array[Byte], Option[Array[Byte]])],
      prefixHist: Option[ScbfHistogram.Hist])(
      litB: Array[Byte], keepAbove: Boolean, inclusive: Boolean): Double =
    prefixHist match {
      case Some(h) if h.bins.nonEmpty =>
        val x = prefixKey(litB)
        if (keepAbove) fracAbove(h, x, inclusive)
        else 1.0 - fracAbove(h, x, !inclusive)
      case _ => bounds match {
        case Some((mn, Some(mx))) =>
          val (lo, hi, x) = (prefixKey(mn), prefixKey(mx), prefixKey(litB))
          if (hi <= lo) { // single-point domain: compare directly
            val c = cmpBytes(mn, litB)
            val keeps = if (keepAbove) c > 0 || (inclusive && c == 0)
                        else c < 0 || (inclusive && c == 0)
            if (keeps) 1.0 else 0.0
          }
          else if (keepAbove) (hi - x) / (hi - lo)
          else (x - lo) / (hi - lo)
        case _ => 1.0 // no anchor: keep the residual mass whole
      }
    }

  /** Keep-fraction of a conjunctive string RANGE interval — lower and
   * upper bounds with per-bound inclusivity, either side open, several
   * bounds per side allowed. No NDV input: a range keeps or drops MASS
   * over the key domain — unlike [[selectivity]]'s equality shapes,
   * nothing here splits the residual per distinct value. Exact over
   * the top-K mass (every bound applied), residual as ONE prefix-key
   * interval: the per-side
   * product assumes independence between predicates that are perfectly
   * correlated through the value. This is the scbf DATE-RANGE shape —
   * timestamps live in utf8 columns in the 3-type format, so
   * `ts >= '2024-01' AND ts < '2024-02'` is a string conjunction.
   * Tightness folds in MASS space: the mass satisfying every lower
   * bound is the MIN of the per-bound above-masses (the tightest
   * bound), violating any upper bound the MAX. */
  def selectivityInterval(t: TopK,
      bounds: Option[(Array[Byte], Option[Array[Byte]])],
      los: Seq[(String, Boolean)], his: Seq[(String, Boolean)],
      prefixHist: Option[ScbfHistogram.Hist] = None): Option[Double] = {
    if (t.rows <= 0) return None
    def keeps(v: String): Boolean = {
      val b = v.getBytes(UTF_8)
      los.forall { case (s, incl) =>
        val c = cmpBytes(b, s.getBytes(UTF_8)); c > 0 || (incl && c == 0) } &&
      his.forall { case (s, incl) =>
        val c = cmpBytes(b, s.getBytes(UTF_8)); c < 0 || (incl && c == 0) }
    }
    val topMass = t.entries.iterator.collect {
      case (v, c) if keeps(v) => c.toDouble }.sum
    // tightest bounds in VALUE space: emptiness and domain checks must
    // be exact even where the 8-byte key resolution is not
    val tLo = los.reduceOption { (a, b) =>
      val c = cmpBytes(a._1.getBytes(UTF_8), b._1.getBytes(UTF_8))
      if (c > 0 || (c == 0 && !a._2)) a else b
    }
    val tHi = his.reduceOption { (a, b) =>
      val c = cmpBytes(a._1.getBytes(UTF_8), b._1.getBytes(UTF_8))
      if (c < 0 || (c == 0 && !a._2)) a else b
    }
    val emptyBand = (tLo, tHi) match {
      case (Some((l, li)), Some((u, ui))) =>
        val c = cmpBytes(l.getBytes(UTF_8), u.getBytes(UTF_8))
        c > 0 || (c == 0 && !(li && ui))
      case _ => false
    }
    val anchored = prefixHist.exists(_.bins.nonEmpty) ||
      bounds.exists(_._2.isDefined)
    // Residual evidence rules (mirror ScbfHistogram.intervalFraction):
    // a provably empty band is zero; without an anchor there is no
    // evidence, keep the residual whole; with one, a zero interpolated
    // mass is exact only when the band misses the domain — an
    // IN-DOMAIN zero means the band is narrower than the 8-byte
    // prefix-key resolution (a daily range under a shared '2024-01-'
    // prefix), and shrinking on that would be a guess in the
    // broadcast-OOM direction. The top-K mass stays exact throughout.
    val residFrac: Double =
      if (emptyBand) 0.0
      else if (!anchored) 1.0
      else {
        val interp = interpFrac(bounds, prefixHist) _
        val aboveLo = los.map { case (s, incl) =>
          interp(s.getBytes(UTF_8), true, incl) }.minOption.getOrElse(1.0)
        // mass strictly above an inclusive hi / at-or-above an exclusive hi
        val aboveHi = his.map { case (s, incl) =>
          interp(s.getBytes(UTF_8), true, !incl) }.maxOption.getOrElse(0.0)
        val diff = aboveLo - aboveHi
        if (diff > 0) math.min(1.0, diff)
        else {
          val outOfDomain = prefixHist match {
            case Some(h) if h.bins.nonEmpty =>
              tLo.exists { case (s, _) =>
                prefixKey(s.getBytes(UTF_8)) > h.bins.last.hi } ||
              tHi.exists { case (s, _) =>
                prefixKey(s.getBytes(UTF_8)) < h.bins.head.lo }
            case _ => bounds match {
              case Some((mn, Some(mx))) =>
                tLo.exists { case (s, incl) =>
                  val c = cmpBytes(s.getBytes(UTF_8), mx); c > 0 || (!incl && c == 0) } ||
                tHi.exists { case (s, incl) =>
                  val c = cmpBytes(s.getBytes(UTF_8), mn); c < 0 || (!incl && c == 0) }
              case _ => false
            }
          }
          if (outOfDomain) 0.0 else 1.0 // sub-resolution: no evidence
        }
      }
    val kept = topMass + t.otherRows * residFrac
    Some(math.min(1.0, math.max(1.0, kept) / t.rows))
  }

  def selectivity(t: TopK, ndv: Option[Long],
      bounds: Option[(Array[Byte], Option[Array[Byte]])],
      filter: org.apache.spark.sql.sources.Filter,
      prefixHist: Option[ScbfHistogram.Hist] = None): Option[Double] = {
    import org.apache.spark.sql.sources._
    def str(v: Any): Option[String] = v match {
      case s: String                                   => Some(s)
      case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
      case _                                           => None
    }
    val otherNdv = math.max(1L, ndv.getOrElse(t.entries.size + 1L) - t.entries.size)
    val otherAvg = t.otherRows.toDouble / otherNdv
    def equality(v: String): Double =
      t.entries.find(_._1 == v).map(_._2.toDouble).getOrElse(otherAvg)
    // range keep-fraction: exact over the top-K values, interpolated
    // (prefix-key domain) over the residual mass when bounds exist
    def range(keepTop: String => Boolean, otherFrac: => Double): Double = {
      val topMass = t.entries.iterator.collect {
        case (v, c) if keepTop(v) => c.toDouble }.sum
      topMass + t.otherRows * math.min(1.0, math.max(0.0, otherFrac))
    }
    def interp(litB: Array[Byte], keepAbove: Boolean, inclusive: Boolean): Double =
      interpFrac(bounds, prefixHist)(litB, keepAbove, inclusive)
    val kept: Option[Double] = filter match {
      case EqualTo(_, v) => str(v).map(equality)
      case EqualNullSafe(_, v) => str(v).map(equality)
      case In(_, vs) =>
        val ss = vs.toSeq.flatMap(str(_))
        if (ss.size != vs.length) None
        else Some(ss.distinct.map(equality).sum)
      case StringStartsWith(_, p) =>
        // v startsWith p  ⟺  p <= v < p+ε: exact over top-K, and the
        // residual interpolates the [p, p∥0xff…] prefix interval.
        // A prefix of 8+ bytes collapses that interval to zero width
        // in the 8-byte prefix-key domain (`url LIKE 'https://%'` is
        // exactly 8) — the key resolution can't discriminate, so the
        // residual is BOUNDED by the histogram mass at the key point
        // (or kept whole without one), never shrunk to zero on no
        // evidence
        val pb = p.getBytes(UTF_8)
        val residual: Double =
          if (pb.length >= 8) prefixHist match {
            case Some(h) if h.bins.nonEmpty =>
              ScbfHistogram.fracAt(h, prefixKey(pb))
            case _ => 1.0
          } else {
            val hiB = pb ++ Array.fill(8)(0xff.toByte)
            math.max(0.0, interp(pb, keepAbove = true, inclusive = true) -
              interp(hiB, keepAbove = true, inclusive = false))
          }
        Some(range(_.startsWith(p), residual))
      case GreaterThan(_, v) => str(v).map { s =>
        val b = s.getBytes(UTF_8)
        range(tv => cmpBytes(tv.getBytes(UTF_8), b) > 0,
          interp(b, keepAbove = true, inclusive = false))
      }
      case GreaterThanOrEqual(_, v) => str(v).map { s =>
        val b = s.getBytes(UTF_8)
        range(tv => cmpBytes(tv.getBytes(UTF_8), b) >= 0,
          interp(b, keepAbove = true, inclusive = true))
      }
      case LessThan(_, v) => str(v).map { s =>
        val b = s.getBytes(UTF_8)
        range(tv => cmpBytes(tv.getBytes(UTF_8), b) < 0,
          interp(b, keepAbove = false, inclusive = false))
      }
      case LessThanOrEqual(_, v) => str(v).map { s =>
        val b = s.getBytes(UTF_8)
        range(tv => cmpBytes(tv.getBytes(UTF_8), b) <= 0,
          interp(b, keepAbove = false, inclusive = true))
      }
      case _ => None
    }
    // floor at one row — an estimator must never claim empty — and
    // cap at 1: a frequency summary can locally exceed its own total
    kept.map(r => math.min(1.0, math.max(1.0, r) / t.rows))
  }
}
