package graft.sources

import scala.util.control.NonFatal

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.sources._

/**
 * Per-file column statistics for SCBF scans — the file-skipping layer
 * (Delta/Iceberg-style data skipping, and the reference's own listed
 * future work: reference README.md:157 "column statistics (min/max)").
 *
 * The SCBF format itself is FROZEN by reference interop (its readers
 * must keep parsing our files byte-for-byte), so stats live in a
 * SIDECAR: `.{file}.scbf.stats` next to each data file — dot-prefixed,
 * so the data-file listing ignores it and reference tooling never sees
 * it. Batch writes publish a sidecar after each data file at task
 * commit; a missing, corrupt, or stale-schema sidecar simply disables
 * skipping for that file (stats are a pure pruning hint — row-level
 * filtering always remains with Spark, so correctness can never depend
 * on a sidecar).
 *
 * Format: one line `rows <n>`, then one line per numeric column
 * `col\t<name>\t<min>\t<max>` (tab-separated; doubles via
 * toString/toDouble round-trip exactly). Utf8 columns carry no stats
 * (their blocks are zlib'd wholesale); a double column containing NaN
 * is omitted (NaN breaks interval reasoning).
 *
 * At 100 TB the one-small-read-per-file planning cost is real; the
 * production path compacts sidecars into a manifest per directory —
 * the skipping predicate below is unchanged by where the stats are
 * stored.
 */
object ScbfStats {

  final case class ColRange(min: Double, max: Double)
  final case class FileStats(rows: Long, cols: Map[String, ColRange])

  def sidecarPath(data: Path): Path =
    new Path(data.getParent, s".${data.getName}.stats")

  /** Atomic publish (temp + rename, the data-file discipline): a torn
   * in-place write could parse as a WELL-FORMED prefix with narrower
   * bounds and wrongly skip live rows — "corrupt disables skipping"
   * only holds when partial states are unreadable, and rename gives
   * exactly that (the sidecar either exists whole or not at all). */
  def write(data: Path, conf: Configuration, stats: FileStats): Unit = {
    val p = sidecarPath(data)
    val fs = p.getFileSystem(conf)
    val tmp = new Path(p.getParent,
      s"${p.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try {
      val sb = new StringBuilder(s"rows\t${stats.rows}\n")
      stats.cols.toSeq.sortBy(_._1).foreach { case (n, r) =>
        sb.append(s"col\t$n\t${r.min}\t${r.max}\n")
      }
      out.write(sb.toString.getBytes("UTF-8"))
    } finally out.close()
    // replace-by-rename: a reader between the delete and the rename
    // sees NO sidecar (skipping disabled — safe), never a partial one
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p)) {
      fs.delete(tmp, false)
      throw new graft.scbf.ScbfFormatException(s"failed to publish stats sidecar $p")
    }
  }

  /** The one file-skipping predicate, shared by the batch scan and the
   * micro-batch stream (they are contractually required to prune
   * identically): keep unless a present-and-whole sidecar proves no
   * row can match. */
  def keepFile(data: Path, conf: Configuration, filters: Seq[Filter]): Boolean =
    filters.isEmpty || read(data, conf).forall(st => mayMatch(filters, st))

  /** None on a missing or unparsable sidecar — skipping is best-effort. */
  def read(data: Path, conf: Configuration): Option[FileStats] =
    try {
      val p = sidecarPath(data)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val text =
          try {
            val len = fs.getFileStatus(p).getLen.toInt
            val buf = new Array[Byte](len)
            in.readFully(0, buf)
            new String(buf, "UTF-8")
          } finally in.close()
        val lines = text.split("\n").filter(_.nonEmpty)
        val rows = lines.collectFirst {
          case l if l.startsWith("rows\t") => l.stripPrefix("rows\t").toLong
        }
        val cols = lines.collect { case l if l.startsWith("col\t") =>
          val Array(_, n, mn, mx) = l.split("\t", 4)
          n -> ColRange(mn.toDouble, mx.toDouble)
        }.toMap
        rows.map(FileStats(_, cols))
      }
    } catch { case NonFatal(_) => None }

  /** Can this filter ever contribute to file skipping? (Used to avoid
   * reading sidecars when no pushed filter could prune anything.) */
  def usable(f: Filter): Boolean = f match {
    case EqualTo(_, v)            => numeric(v)
    case GreaterThan(_, v)        => numeric(v)
    case GreaterThanOrEqual(_, v) => numeric(v)
    case LessThan(_, v)           => numeric(v)
    case LessThanOrEqual(_, v)    => numeric(v)
    case In(_, vs)                => vs.nonEmpty && vs.forall(numeric)
    case And(l, r)                => usable(l) || usable(r)
    case Or(l, r)                 => usable(l) && usable(r)
    case _                        => false
  }

  /** Conjunction semantics: the file may hold matching rows unless some
   * filter PROVABLY excludes its whole [min, max] interval. Unknown
   * filters and non-stats columns never exclude. A 0-row file (an
   * empty partition's placeholder) can never match anything. */
  def mayMatch(filters: Seq[Filter], stats: FileStats): Boolean =
    stats.rows > 0 && filters.forall(f => mayMatchOne(f, stats))

  private def mayMatchOne(f: Filter, s: FileStats): Boolean = f match {
    case EqualTo(c, v)            => range(s, c, v).forall { case (r, d) => d >= r.min && d <= r.max }
    case GreaterThan(c, v)        => range(s, c, v).forall { case (r, d) => r.max > d }
    case GreaterThanOrEqual(c, v) => range(s, c, v).forall { case (r, d) => r.max >= d }
    case LessThan(c, v)           => range(s, c, v).forall { case (r, d) => r.min < d }
    case LessThanOrEqual(c, v)    => range(s, c, v).forall { case (r, d) => r.min <= d }
    case In(c, vs)                => vs.exists(v => mayMatchOne(EqualTo(c, v), s))
    case And(l, r)                => mayMatchOne(l, s) && mayMatchOne(r, s)
    case Or(l, r)                 => mayMatchOne(l, s) || mayMatchOne(r, s)
    case _                        => true
  }

  /** The (range, filter value) pair when both sides are numeric; None
   * disables exclusion for this predicate. */
  private def range(s: FileStats, col: String, v: Any): Option[(ColRange, Double)] =
    s.cols.get(col).flatMap(r => toDouble(v).map(d => (r, d)))

  private def numeric(v: Any): Boolean = toDouble(v).isDefined

  private def toDouble(v: Any): Option[Double] = v match {
    case n: java.lang.Number => Some(n.doubleValue())
    case _                   => None
  }
}
