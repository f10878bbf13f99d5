package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable
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
 * must keep parsing our files byte-for-byte), so stats live OUTSIDE the
 * data files, dot-prefixed so the data-file listing ignores them and
 * reference tooling never sees them:
 *
 *  - `.{file}.scbf.stats` — one sidecar per data file, published by the
 *    writer right after the data file. The unit of truth.
 *  - `.scbf.stats.manifest` — one per directory, a compaction of the
 *    sidecars written at JOB/EPOCH commit on the driver. Planning reads
 *    the manifest ONCE per directory instead of one sidecar per file:
 *    at 100 TB (~10⁵ files/dir) per-file sidecar reads are 10⁵ serial
 *    driver round-trips before the first task launches, the manifest is
 *    one. Each manifest entry carries the data file's LENGTH; an entry
 *    whose length disagrees with the live listing is stale (the file
 *    was replaced out-of-band) and planning falls back to that file's
 *    own sidecar. A missing/corrupt/lost manifest degrades to per-file
 *    sidecars; a missing sidecar degrades to no skipping. Concurrent
 *    append jobs race on the manifest last-writer-wins — the loser's
 *    files simply fall back to their sidecars.
 *
 * A missing, corrupt, or stale sidecar/manifest only ever DISABLES
 * skipping (stats are a pure pruning hint — row-level filtering always
 * remains with Spark, so correctness can never depend on a stats file).
 *
 * Sidecar format: one line `len <dataFileBytes>` (the sidecar's own
 * staleness guard — pruning trusts a sidecar only when it matches the
 * live listing), one line `rows <n>`, then per numeric column
 * `col\t<name>\t<min>\t<max>` (doubles via toString/toDouble round-trip
 * exactly; int32 columns append a 5th field, the exact Long sum, for
 * aggregate pushdown), then per utf8 column
 * `scol\t<name>\t<b64min>\t<b64max|->`.
 * then per utf8 column `slen\t<name>\t<totalBytes>\t<maxBytes>`, then
 * per column `ndv\t<name>\t<b64 HLL registers>` ([[ScbfNdv]]) and per
 * numeric column `hist\t<name>\t<equi-height histogram>`
 * ([[ScbfHistogram]]) — the last two sidecar-only; the manifest
 * carries one merged `dirndv`/`dirhist` line per column instead.
 * A double column containing NaN is omitted (NaN breaks interval
 * reasoning). String bounds are TRUNCATED byte prefixes (Parquet's
 * strategy, cap [[MaxStrBound]] bytes): the min prefix is always a
 * valid lower bound (a prefix sorts ≤ the full string under unsigned
 * byte order, which is UTF8String's binary ordering); a truncated max
 * is made a valid UPPER bound by incrementing its last non-0xFF byte —
 * if every byte is 0xFF the column has no storable upper bound and max
 * is recorded as `-` (unbounded above). Bounds are raw UTF-8 bytes
 * (truncation may split a code point), hence base64 in the file.
 *
 * The manifest is the sidecar format prefixed per file with
 * `file\t<name>\t<dataLen>`; `manifest\t1` heads the file.
 *
 * Publish discipline (write/writeManifest): temp + POSIX atomic rename,
 * the same discipline the data files use. On an object store without
 * atomic rename the worst case is an absent or ignored stats file —
 * skipping disabled, results unchanged — because partial states are
 * unreadable by construction (a torn in-place write, by contrast, could
 * parse as a well-formed prefix with narrower bounds and wrongly skip
 * live rows). The DATA-file publish shares the atomic-rename
 * assumption with sharper consequences (visibility of a whole file),
 * so a deployment that satisfies it for data satisfies it for stats.
 */
object ScbfStats {

  /** Cap on stored string-bound length, à la Parquet's truncation. */
  val MaxStrBound = 48

  /** Numeric column bounds; `sum` is the EXACT Long sum, recorded for
   * int32 columns only (integer arithmetic is order-independent, so a
   * stats-derived sum is bit-identical to a scan's — a float sum is
   * not, and is never recorded). Carried for aggregate pushdown. */
  final case class ColRange(min: Double, max: Double, sum: Option[Long] = None)

  /** Truncated utf8 bounds: `min` is a valid lower bound by prefix
   * order; `max` is a valid upper bound by construction (incremented on
   * truncation) or None when unbounded above (untruncatable 0xFF run).
   * `exactMin`/`exactMax` mark a bound that is the column's EXACT
   * extremum (it fit under [[MaxStrBound]], no truncation) — the flag
   * that lets [[ScbfAgg]] answer `MIN/MAX(string)` from the manifest
   * for short-string columns (codes, labels, categories) while long
   * strings keep declining. Absent on pre-flag sidecars (parses to
   * `false` — conservative: bounds stay valid for skipping, pushdown
   * declines). Flags are deliberately OUTSIDE equals/hashCode: a
   * range's identity is its bounds (specs written against pre-flag
   * fixtures must keep comparing equal); exactness is a refinement. */
  final case class StrRange(min: Array[Byte], max: Option[Array[Byte]],
      exactMin: Boolean = false, exactMax: Boolean = false) {
    // Array equality is reference equality; specs compare StrRanges.
    override def equals(o: Any): Boolean = o match {
      case StrRange(m, x, _, _) =>
        java.util.Arrays.equals(min, m) && (((max, x)) match {
          case (Some(a), Some(b)) => java.util.Arrays.equals(a, b)
          case (None, None)       => true
          case _                  => false
        })
      case _ => false
    }
    override def hashCode(): Int =
      java.util.Arrays.hashCode(min) * 31 + max.map(java.util.Arrays.hashCode).getOrElse(0)
  }

  /** `ndvs`: per-column HLL registers ([[ScbfNdv]]) — carried by
   * SIDECARS and commit messages only; the manifest keeps one MERGED
   * array per column per directory (see writeManifest) so it stays a
   * small single read at any file count.
   * `strLens`: per-utf8-column (total bytes, max bytes) — feeds the
   * CBO's avgLen/maxLen so row-size estimates of string-heavy tables
   * (hence broadcast decisions) stop guessing the 20-byte default.
   * `hists`: per-numeric-column equi-height histograms
   * ([[ScbfHistogram]]) — sidecar-only like ndvs; the manifest keeps
   * one merged histogram per column per directory (`dirhist`).
   * `topks`: per-utf8-column top-K frequency summaries
   * ([[ScbfStrTopK]]) — sidecar-only like hists; the manifest keeps
   * one merged summary per column per directory (`dirtopk`). */
  final case class FileStats(
      rows: Long,
      cols: Map[String, ColRange],
      strCols: Map[String, StrRange] = Map.empty,
      ndvs: Map[String, Array[Byte]] = Map.empty,
      strLens: Map[String, (Long, Int)] = Map.empty,
      hists: Map[String, ScbfHistogram.Hist] = Map.empty,
      topks: Map[String, ScbfStrTopK.TopK] = Map.empty)

  /** One manifest entry: `dataLen` is the staleness guard — the live
   * listing's length must match for the entry to be trusted. */
  final case class FileEntry(name: String, dataLen: Long, stats: FileStats)

  /**
   * Directory-level pre-aggregation, written at the HEAD of every
   * manifest (directly after the version line) so a consumer can read
   * it with a tiny head-read instead of parsing 10⁴ per-file entries:
   * the O(partitions)-not-O(files) path for metadata-only rollups.
   *
   * `fpA`/`fpB` are an order-independent fingerprint over the
   * manifest's (name, dataLen) pairs; [[matches]] recomputes it from a
   * LIVE listing, so a summary is trusted only when the manifest
   * covered exactly the listed files at their listed lengths — the
   * same evidence the per-file path derives from its per-entry length
   * guards. Any divergence (unmanifested append, dropped file, crashed
   * rewrite) fails the fingerprint and the consumer falls back to the
   * per-file path.
   *
   * `cols` holds ONLY columns every live (rows > 0) entry carried, with
   * min/max folded over those entries and the exact int sum when every
   * live entry recorded one ([[toFileStats]] then behaves, under
   * [[ScbfAgg]]'s fold, exactly like the per-file stats would). */
  final case class DirSummary(
      nEntries: Int, fpA: Long, fpB: Long, rows: Long,
      cols: Map[String, ColRange],
      strCols: Map[String, StrRange] = Map.empty) {
    def matches(files: Seq[org.apache.hadoop.fs.FileStatus]): Boolean =
      matchesNames(files.map(f => (f.getPath.getName, f.getLen)))
    def matchesNames(pairs: Seq[(String, Long)]): Boolean = {
      if (pairs.size != nEntries) return false
      val (a, b) = fingerprint(pairs)
      a == fpA && b == fpB
    }
    def toFileStats: FileStats = FileStats(rows, cols, strCols)
  }

  /** Order-independent 128-bit-ish fingerprint over (name, len) pairs:
   * two independent 64-bit accumulations (sum and xor of two seeded
   * 32-bit hashes packed per pair). Not adversarial-proof — a
   * consistency check against torn/raced metadata, like the per-entry
   * length guard it generalizes. */
  def fingerprint(pairs: Iterable[(String, Long)]): (Long, Long) = {
    var sum = 0L
    var xor = 0L
    pairs.foreach { case (n, l) =>
      val s = n + "\u0000" + l
      val h1 = scala.util.hashing.MurmurHash3.stringHash(s, 0x9747b28c)
      val h2 = scala.util.hashing.MurmurHash3.stringHash(s, 0x1b873593)
      val packed = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
      sum += packed
      xor ^= java.lang.Long.rotateLeft(packed, (h1 & 63))
    }
    (sum, xor)
  }

  private def summarize(entries: Seq[FileEntry]): DirSummary = {
    val (fpA, fpB) = fingerprint(entries.map(e => (e.name, e.dataLen)))
    val live = entries.filter(_.stats.rows > 0)
    val colNames: Set[String] =
      if (live.isEmpty) Set.empty
      else live.map(_.stats.cols.keySet).reduce(_ intersect _)
    val cols = colNames.iterator.map { n =>
      val rs = live.map(_.stats.cols(n))
      val sums = rs.map(_.sum)
      val total =
        if (sums.exists(_.isEmpty)) None
        else try Some(sums.flatten.foldLeft(0L)(Math.addExact))
        catch { case _: ArithmeticException => None }
      n -> ColRange(rs.map(_.min).min, rs.map(_.max).max, total)
    }.toMap
    // utf8 bounds fold like ScbfScan.boundsFor: min of mins (always a
    // valid lower bound); max only when EVERY live entry has one (any
    // unbounded-above file makes the fold unbounded too). Exactness
    // folds by WINNER: recorded mins never exceed true mins, so when
    // the entry achieving the fold's min is exact, its value IS the
    // directory's true minimum (every other file's true min sits at or
    // above its own recorded min ≥ the winner); symmetrically for max.
    val strNames: Set[String] =
      if (live.isEmpty) Set.empty
      else live.map(_.stats.strCols.keySet).reduce(_ intersect _)
    val strCols = strNames.iterator.map { n =>
      val rs = live.map(_.stats.strCols(n))
      val mn = rs.reduce((a, b) =>
        if (cmp(a.min, b.min) < 0) a
        else if (cmp(a.min, b.min) > 0) b
        else if (a.exactMin) a else b)
      val mx =
        if (rs.forall(_.max.isDefined))
          Some(rs.reduce((a, b) =>
            if (cmp(a.max.get, b.max.get) > 0) a
            else if (cmp(a.max.get, b.max.get) < 0) b
            else if (a.exactMax) a else b))
        else None
      n -> StrRange(mn.min, mx.map(_.max.get),
        exactMin = mn.exactMin, exactMax = mx.exists(_.exactMax))
    }.toMap
    DirSummary(entries.size, fpA, fpB, entries.map(_.stats.rows).sum, cols, strCols)
  }

  /** Head-read of a manifest's [[DirSummary]] block: opens the file and
   * reads ONLY the leading dirsum lines (the block is written first by
   * design), never the 10⁴+ per-file entries below. None on a manifest
   * without a summary (pre-summary writers) — consumers fall back to
   * the per-file path. */
  def readDirSummary(dir: Path, conf: Configuration): Option[DirSummary] =
    try {
      val p = manifestPath(dir)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) return None
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(fs.open(p), UTF_8))
      try {
        if (in.readLine() != "manifest\t1") return None
        val head = in.readLine()
        if (head == null || !head.startsWith("dirsum\t")) return None
        val Array(_, n, a, b, rows) = head.split("\t", 5)
        val cols = Map.newBuilder[String, ColRange]
        val strCols = Map.newBuilder[String, StrRange]
        var line = in.readLine()
        while (line != null &&
            (line.startsWith("dirsumcol\t") || line.startsWith("dirsumscol\t"))) {
          if (line.startsWith("dirsumcol\t")) line.split("\t", 5) match {
            case Array(_, cn, mn, mx, sm) =>
              cols += cn -> ColRange(mn.toDouble, mx.toDouble,
                if (sm == "-") None else Some(sm.toLong))
            case _ =>
          } else line.split("\t", 5) match {
            case Array(_, cn, mn, mx, e) => strCols += cn -> parseStrRange(mn, mx, Some(e))
            case Array(_, cn, mn, mx)    => strCols += cn -> parseStrRange(mn, mx, None)
            case _ =>
          }
          line = in.readLine()
        }
        summaryReads.incrementAndGet()
        Some(DirSummary(n.toInt, a.toLong, b.toLong, rows.toLong,
          cols.result(), strCols.result()))
      } finally in.close()
    } catch { case NonFatal(_) => None }

  /** Everything one manifest read yields: per-file entries plus the
   * directory-level merged NDV registers and merged histograms (one
   * per column each — see writeManifest). */
  final case class ManifestData(
      entries: Map[String, FileEntry],
      ndv: Map[String, Array[Byte]],
      hist: Map[String, ScbfHistogram.Hist],
      topk: Map[String, ScbfStrTopK.TopK] = Map.empty)

  object ManifestData {
    val empty: ManifestData = ManifestData(Map.empty, Map.empty, Map.empty)
  }

  // test hooks: how many stats files did planning actually open?
  val sidecarReads = new AtomicLong(0)
  val manifestReads = new AtomicLong(0)
  /** Successful [[readDirSummary]] head-reads. DISTINCT counter from
   * manifestReads (which counts FULL entry parses only): a fast-path
   * rollup shows summaryReads == touched directories with
   * manifestReads == 0; any fallback shows manifestReads > 0. */
  val summaryReads = new AtomicLong(0)

  def sidecarPath(data: Path): Path =
    new Path(data.getParent, s".${data.getName}.stats")

  def manifestPath(dir: Path): Path = new Path(dir, ".scbf.stats.manifest")

  /** Atomic publish (temp + rename — see the discipline note in the
   * object scaladoc). The sidecar records the data file's LENGTH as
   * its own staleness guard (`len` line): pruning trusts a sidecar
   * only when that length matches the live listing, so a file
   * replaced out-of-band without a sidecar refresh can never be
   * skipped on its predecessor's bounds. */
  def write(data: Path, conf: Configuration, stats: FileStats, dataLen: Long): Unit =
    publish(sidecarPath(data), conf, s"len\t$dataLen\n" + render(stats))

  /** Compact `entries` into the directory manifest (driver-side, at job
   * or epoch commit). Deterministic order so streaming-epoch replays
   * rewrite identical bytes. Per-file NDV registers are NOT written
   * per entry (that would grow the manifest by ~2 KB × columns × files,
   * unreadable-in-one-go at 10⁵ files); instead `dirNdv` holds one
   * merged register array per column for the whole directory. */
  def writeManifest(dir: Path, conf: Configuration, entries: Seq[FileEntry],
      dirNdv: Map[String, Array[Byte]] = Map.empty,
      dirHist: Map[String, ScbfHistogram.Hist] = Map.empty,
      dirTopK: Map[String, ScbfStrTopK.TopK] = Map.empty): Unit = {
    val sb = new StringBuilder("manifest\t1\n")
    // directory summary FIRST so readDirSummary's head-read never
    // touches the (potentially multi-KB) sketch lines or file entries
    val sum = summarize(entries)
    sb.append(s"dirsum\t${sum.nEntries}\t${sum.fpA}\t${sum.fpB}\t${sum.rows}\n")
    sum.cols.toSeq.sortBy(_._1).foreach { case (n, r) =>
      sb.append(s"dirsumcol\t$n\t${r.min}\t${r.max}\t${r.sum.getOrElse("-")}\n")
    }
    sum.strCols.toSeq.sortBy(_._1).foreach { case (n, r) =>
      val mx = r.max.map(b64e.encodeToString).getOrElse("-")
      sb.append(s"dirsumscol\t$n\t${b64e.encodeToString(r.min)}\t$mx\t${eFlags(r)}\n")
    }
    dirNdv.toSeq.sortBy(_._1).foreach { case (n, regs) =>
      sb.append(s"dirndv\t$n\t${b64e.encodeToString(regs)}\n")
    }
    dirHist.toSeq.sortBy(_._1).foreach { case (n, h) =>
      sb.append(s"dirhist\t$n\t${ScbfHistogram.render(h)}\n")
    }
    dirTopK.toSeq.sortBy(_._1).foreach { case (n, t) =>
      sb.append(s"dirtopk\t$n\t${ScbfStrTopK.render(t)}\n")
    }
    entries.sortBy(_.name).foreach { e =>
      sb.append(s"file\t${e.name}\t${e.dataLen}\n")
        .append(render(e.stats, withNdv = false))
    }
    publish(manifestPath(dir), conf, sb.toString)
  }

  /** Read-merge-publish of the directory manifest — the ONE place the
   * merge discipline lives (both commit paths call it). `fresh` starts
   * from empty (overwrite replaces the directory's contents, so stale
   * entries must not survive); otherwise new entries overlay the
   * existing map name-keyed. Concurrent writers race last-writer-wins:
   * the loser's files simply fall back to their (length-guarded)
   * sidecars until the next merge picks them up. */
  /** `drop`: names removed from the merged result IN THE SAME
   * read-modify-write as the merge — a rewrite's "merge my new files,
   * drop the files I replaced" must be one cycle, not a merge followed
   * by a separate prune (an append committing between two cycles would
   * have its just-merged entries dropped by the prune's stale read).
   * Dropping by explicit name — not retaining a listed live set — also
   * keeps an append that lands between the caller's listing and this
   * merge: its names are never in the drop set. */
  def mergeManifest(dir: Path, conf: Configuration,
      entries: Seq[FileEntry], fresh: Boolean,
      drop: Set[String] = Set.empty): Unit = {
    val prev = if (fresh) ManifestData.empty else readManifestFull(dir, conf)
    // fold the new entries' per-file registers into the directory's
    // merged sketch (insert-only: overwritten files' contributions are
    // only shed by a FRESH rebuild — documented over-estimate)
    val dirNdv = entries.foldLeft(prev.ndv) { (acc, e) =>
      e.stats.ndvs.foldLeft(acc) { case (m, (n, regs)) =>
        m.updated(n, m.get(n).map(ScbfNdv.merge(_, regs)).getOrElse(regs))
      }
    }
    // same insert-only discipline for the directory histograms: the
    // existing merged histogram is one weighted input among the new
    // files' sidecar histograms
    val histCols = prev.hist.keySet ++ entries.flatMap(_.stats.hists.keys)
    val dirHist = histCols.iterator.flatMap { n =>
      val inputs = prev.hist.get(n).toSeq ++ entries.flatMap(_.stats.hists.get(n))
      ScbfHistogram.merge(inputs).map(n -> _)
    }.toMap
    // and for the string top-K summaries (same insert-only staleness)
    val topkCols = prev.topk.keySet ++ entries.flatMap(_.stats.topks.keys)
    val dirTopK = topkCols.iterator.flatMap { n =>
      val inputs = prev.topk.get(n).toSeq ++ entries.flatMap(_.stats.topks.get(n))
      ScbfStrTopK.merge(inputs).map(n -> _)
    }.toMap
    val merged = (prev.entries ++ entries.map(e => e.name -> e)).values.toSeq
    writeManifest(dir, conf,
      if (drop.isEmpty) merged else merged.filterNot(e => drop.contains(e.name)),
      dirNdv, dirHist, dirTopK)
  }

  /** The directory manifest as name → entry; empty on missing/corrupt. */
  def readManifest(dir: Path, conf: Configuration): Map[String, FileEntry] =
    readManifestFull(dir, conf).entries

  /** Manifest entries PLUS the directory-level merged NDV registers
   * and histograms (one per column each — see writeManifest). */
  def readManifestFull(dir: Path, conf: Configuration): ManifestData =
    try {
      val p = manifestPath(dir)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) ManifestData.empty
      else {
        manifestReads.incrementAndGet()
        val lines = slurp(fs, p).split("\n").filter(_.nonEmpty)
        if (!lines.headOption.contains("manifest\t1")) ManifestData.empty
        else {
          val ndv = Map.newBuilder[String, Array[Byte]]
          val hist = Map.newBuilder[String, ScbfHistogram.Hist]
          val topk = Map.newBuilder[String, ScbfStrTopK.TopK]
          val out = Map.newBuilder[String, FileEntry]
          var i = 1
          while (i < lines.length && !lines(i).startsWith("file\t")) {
            if (lines(i).startsWith("dirndv\t")) try {
              val Array(_, n, regs) = lines(i).split("\t", 3)
              val r = b64d.decode(regs)
              if (r.length == ScbfNdv.M) ndv += n -> r
            } catch { case NonFatal(_) => /* this column loses NDV only */ }
            else if (lines(i).startsWith("dirhist\t")) try {
              val Array(_, n, h) = lines(i).split("\t", 3)
              ScbfHistogram.parse(h).foreach(hist += n -> _)
            } catch { case NonFatal(_) => /* this column loses its histogram only */ }
            else if (lines(i).startsWith("dirtopk\t")) try {
              val Array(_, n, t) = lines(i).split("\t", 3)
              ScbfStrTopK.parse(t).foreach(topk += n -> _)
            } catch { case NonFatal(_) => /* this column loses its summary only */ }
            i += 1
          }
          while (i < lines.length) {
            // per-ENTRY resilience: one corrupt entry (torn line, bad
            // number) must cost only that file's skipping — its scan
            // falls back to the sidecar — not the other 10⁵ entries'
            // (the outer catch still guards structural corruption)
            try {
              val Array(_, name, len) = lines(i).split("\t", 3)
              var j = i + 1
              while (j < lines.length && !lines(j).startsWith("file\t")) j += 1
              parse(lines.slice(i + 1, j).toIndexedSeq).foreach(st =>
                out += name -> FileEntry(name, len.toLong, st))
              i = j
            } catch {
              case NonFatal(_) =>
                i += 1
                while (i < lines.length && !lines(i).startsWith("file\t")) i += 1
            }
          }
          ManifestData(out.result(), ndv.result(), hist.result(), topk.result())
        }
      }
    } catch { case NonFatal(_) => ManifestData.empty }

  /** None on a missing or unparsable sidecar — skipping is best-effort.
   * (Stats only; see [[readGuarded]] for the pruning path.) */
  def read(data: Path, conf: Configuration): Option[FileStats] =
    readGuarded(data, conf).map(_._2)

  /** The sidecar's (recorded data length, stats). None on a missing or
   * unparsable sidecar OR one without a `len` guard — pruning must
   * never trust unguarded bounds (the file they describe may have been
   * replaced out-of-band). */
  def readGuarded(data: Path, conf: Configuration): Option[(Long, FileStats)] =
    try {
      val p = sidecarPath(data)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) None
      else {
        sidecarReads.incrementAndGet()
        val lines = slurp(fs, p).split("\n").filter(_.nonEmpty)
        val len = lines.collectFirst {
          case l if l.startsWith("len\t") => l.stripPrefix("len\t").toLong
        }
        for (l <- len; st <- parse(lines.toIndexedSeq)) yield (l, st)
      }
    } catch { case NonFatal(_) => None }

  /**
   * Length-guarded stats lookup, manifest-first: reads each directory's
   * manifest at most once and falls back to per-file sidecars only for
   * files the manifest misses or got stale on — O(1) stats opens per
   * directory on the happy path, not O(files). BOTH stats sources are
   * length-guarded against the live listing: a manifest entry (or
   * sidecar) whose recorded length disagrees describes a replaced file —
   * trusting it could skip live rows or mis-answer an aggregate, so a
   * guard miss always returns None. Not thread-safe; planning is
   * single-threaded on the driver.
   */
  final class Lookup(conf: Configuration) {
    private val manifests = mutable.Map.empty[Path, ManifestData]

    private def manifest(dir: Path): ManifestData =
      manifests.getOrElseUpdate(dir, readManifestFull(dir, conf))

    /** Parallel manifest prewarm for plans touching MANY partition
     * directories (grouped rollups, wide partitioned scans): loads
     * each not-yet-cached directory's manifest on the shared daemon
     * pool, so the driver bill is ~max(one parse) instead of
     * sum(parses) — at 100 partitions × ~1 MB manifests that is
     * seconds of driver wall (BENCH_NOTES round 10, 10⁶-file probe).
     * Same reads, same cache, same counters as the sequential path —
     * only the schedule changes. */
    def prewarm(dirs: Seq[Path]): Unit = {
      val missing = dirs.distinct.filterNot(manifests.contains)
      if (missing.size <= 1) { missing.foreach(manifest); return }
      val futures = missing.map(d => d -> bloomFetchPool.submit(
        new java.util.concurrent.Callable[ManifestData] {
          override def call(): ManifestData = readManifestFull(d, conf)
        }))
      futures.foreach { case (d, f) =>
        manifests.getOrElseUpdate(d,
          try f.get()
          catch { case _: java.util.concurrent.ExecutionException |
                       _: InterruptedException =>
            // degrade to the sequential read — a pool failure must
            // surface the SAME error (or success) the caller would
            // have seen without the prewarm
            readManifestFull(d, conf)
          })
      }
    }

    def stats(data: Path, dataLen: Long): Option[FileStats] = {
      val man = manifest(data.getParent).entries
      man.get(data.getName) match {
        case Some(e) if e.dataLen == dataLen => Some(e.stats)
        case _ =>
          readGuarded(data, conf).collect { case (l, st) if l == dataLen => st }
      }
    }

    /** The directory's merged NDV registers (cached with the manifest —
     * no extra IO beyond the one manifest read planning already pays). */
    def dirNdv(dir: Path): Map[String, Array[Byte]] = manifest(dir).ndv

    /** The directory's merged per-column histograms (same one read). */
    def dirHist(dir: Path): Map[String, ScbfHistogram.Hist] = manifest(dir).hist

    /** The directory's merged per-column string top-K summaries. */
    def dirTopK(dir: Path): Map[String, ScbfStrTopK.TopK] = manifest(dir).topk

    /** Memoized directory summary. Served from the full-manifest cache
     * when this Lookup already paid that parse (synthesized by the same
     * fold the writer uses — zero IO, and the ONE-read-per-directory
     * invariant planning pins stays intact); a head-read otherwise. */
    private val summaries = mutable.Map.empty[Path, Option[DirSummary]]
    def dirSummary(dir: Path): Option[DirSummary] =
      summaries.getOrElseUpdate(dir,
        manifests.get(dir) match {
          case Some(m) if m.entries.nonEmpty =>
            Some(summarize(m.entries.values.toSeq))
          case Some(_) => None // cached-as-missing/corrupt manifest
          case None    => readDirSummary(dir, conf)
        })
  }

  /**
   * Per-plan file pruner, shared by the batch scan and the micro-batch
   * stream (contractually required to prune identically). Stats reads go
   * through a [[Lookup]]; stats are read only when a usable filter
   * exists, and a file without trusted stats always plans.
   */
  /** Lazily-created daemon pool for parallel bloom-sidecar fetches,
   * shared across all [[Pruner]] instances for the JVM's lifetime.
   * Daemon threads so an idle pool never blocks driver shutdown. */
  private[graft] def ioPool: java.util.concurrent.ExecutorService = bloomFetchPool
  private lazy val bloomFetchPool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(
      math.min(32, math.max(2, Runtime.getRuntime.availableProcessors())),
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger(0)
        override def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"scbf-bloom-fetch-${n.getAndIncrement()}")
          t.setDaemon(true)
          t
        }
      })

  /** Per-file cap on waiting for a pooled bloom fetch before falling
   * back to keeping the file (see keepAll) — generous against slow
   * stores, small against a truly hung stream. */
  val BloomFetchTimeoutMs: Long = 60_000L

  final class Pruner(conf: Configuration, filters: Seq[Filter],
      sharedLookup: Lookup = null) {
    // callers that plan repeatedly over one scan pass a shared Lookup so
    // manifests load once across the pruner instances (ScbfScan)
    private val lookup = Option(sharedLookup).getOrElse(new Lookup(conf))
    private val active = filters.nonEmpty
    // bloom files are read LAZILY: only when an equality-shaped filter
    // could use one, and only for files range pruning failed to exclude
    // (the && below short-circuits) — see ScbfBloom's design note
    private val bloomActive = filters.exists(ScbfBloom.usable)
    // `_file_path` predicates decide per file EXACTLY (the metadata
    // column is the file's own path — ScbfPartitions.filePathTruth):
    // provably-false drops the file from any scan, provably-true is a
    // whole-file all-match proof with NO stats read — the zero-IO
    // takedown `DELETE FROM t WHERE _file_path = '…'` rides on
    private val pathActive =
      filters.exists(_.references.contains(ScbfDataSource.FilePathCol))
    private def pathExcludes(data: Path): Boolean =
      pathActive && filters.exists(f =>
        ScbfPartitions.filePathTruth(f, data.toString).contains(false))

    /** Proof that EVERY row matches — the DELETE whole-file fast
     * path's evidence: each conjunct proven either by the file's path
     * (exact — [[ScbfPartitions.filePathTruth]]) or by trusted stats
     * ([[ScbfStats.mustMatchAll]]; those must EXIST — `exists`, not
     * keep's conservative `forall`: no stats, no proof, the file
     * rewrites instead). A fully path-proven condition never reads
     * stats at all. */
    def provablyAllMatch(data: Path, dataLen: Long): Boolean = {
      val truths =
        if (pathActive) filters.map(f =>
          f -> ScbfPartitions.filePathTruth(f, data.toString))
        else filters.map(_ -> (None: Option[Boolean]))
      if (truths.exists(_._2.contains(false))) return false
      val residual = truths.collect { case (f, t) if !t.contains(true) => f }
      if (residual.isEmpty) filters.nonEmpty
      else lookup.stats(data, dataLen).exists(st => mustMatchAll(residual, st))
    }

    /** Keep unless provably no row can match — a definitively-false
     * `_file_path` predicate first (exact, zero IO), then
     * present-and-whole stats by min/max interval reasoning, then (for
     * survivors, under equality-shaped filters) per-file Bloom
     * membership. */
    def keep(data: Path, dataLen: Long): Boolean =
      !active ||
        (!pathExcludes(data) &&
          lookup.stats(data, dataLen).forall(st => mayMatch(filters, st)) &&
          (!bloomActive || ScbfBloom.read(data, dataLen, conf).forall(b =>
            ScbfBloom.mayMatch(filters, b))))

    /**
     * Batched [[keep]] preserving input order. The interval pass stays
     * serial (manifest-backed: O(1) stats opens per directory), but
     * bloom sidecars are PER FILE by design (see ScbfBloom's
     * out-of-manifest note), so an equality probe over an unclustered
     * 10⁵-file directory would otherwise serialize 10⁵ driver
     * round-trips — the same planning-stall shape the manifest was
     * built to kill. Survivor blooms are fetched on a bounded pool
     * instead; each fetch is independent and the decision per file is
     * deterministic, so parallelism changes wall-clock only.
     */
    def keepAll[T](fs: Seq[T])(path: T => Path, len: T => Long): Seq[T] = {
      if (!active) return fs
      // path-excluded files never consult stats; the rest will, one
      // manifest per directory — load those in parallel first so a
      // many-partition scan pays ~one parse of driver wall, not a
      // sequential sum (the 10⁶-file probe's dominant rollup cost)
      val candidates0 = fs.filter(f => !pathExcludes(path(f)))
      // whole-DIRECTORY pre-prune: a fingerprint-validated dirsum
      // bounds every row in its directory, so an interval-excluded
      // summary drops the directory without ever LOADING its manifest
      // — on a partition-clustered table a narrow band keeps O(1)
      // directories and the other 10² manifests (10⁶ entries) are
      // never parsed. Partial candidate sets (path-excluded members),
      // absent/stale summaries, or a may-match verdict all fall
      // through to the per-file path below unchanged — the drop is
      // taken only on the same interval proof a per-file drop uses,
      // applied to bounds that cover the whole directory. Input order
      // is preserved (keepAll's contract): the pass computes a
      // dropped-directory SET and filters the original sequence.
      val droppedDirs: java.util.HashSet[Path] = {
        // cheap screen first: bounds-excluded directories by summary
        // alone (memoized ~200 B head-reads). The common all-touched
        // case exits here having built NOTHING per file beyond the
        // parent dedupe the prewarm below pays anyway.
        val parents = new java.util.LinkedHashSet[Path]()
        candidates0.foreach(f => parents.add(path(f).getParent))
        val excluded = new java.util.HashSet[Path]()
        parents.forEach { d =>
          if (lookup.dirSummary(d).exists(s => !mayMatch(filters, s.toFileStats)))
            excluded.add(d)
        }
        val dropped = new java.util.HashSet[Path]()
        if (!excluded.isEmpty) {
          // fingerprint validation only for the would-drop directories:
          // the summary must cover exactly the candidate (name, len)
          // pairs, else the directory stays on the per-file path
          val byDir = new java.util.HashMap[Path, mutable.ArrayBuffer[(String, Long)]]()
          candidates0.foreach { f =>
            val p = path(f)
            val par = p.getParent
            if (excluded.contains(par))
              byDir.computeIfAbsent(par,
                _ => mutable.ArrayBuffer.empty).append((p.getName, len(f)))
          }
          byDir.forEach { (d, pairs) =>
            if (lookup.dirSummary(d).exists(_.matchesNames(pairs.toSeq)))
              dropped.add(d)
          }
        }
        dropped
      }
      val candidates =
        if (droppedDirs.isEmpty) candidates0
        else candidates0.filterNot(f => droppedDirs.contains(path(f).getParent))
      lookup.prewarm(candidates.map(f => path(f).getParent))
      val statsKept = candidates.filter(f =>
        lookup.stats(path(f), len(f)).forall(st => mayMatch(filters, st)))
      if (!bloomActive) statsKept
      else if (statsKept.size <= 1)
        statsKept.filter(f => ScbfBloom.read(path(f), len(f), conf).forall(b =>
          ScbfBloom.mayMatch(filters, b)))
      else {
        // shared daemon pool (object-level): planInputPartitions AND
        // estimateStatistics both prune, so a single query can invoke
        // keepAll several times — allocating 32 threads per call was
        // measurable churn at high planning rates
        val futures = statsKept.map { f =>
          bloomFetchPool.submit(new java.util.concurrent.Callable[Boolean] {
            override def call(): Boolean =
              ScbfBloom.read(path(f), len(f), conf).forall(b =>
                ScbfBloom.mayMatch(filters, b))
          })
        }
        // bounded wait: the pool is JVM-wide, so one query's stalled
        // bloom reads (hung object-store stream) must not wedge every
        // other concurrently-planning query behind an unbounded get().
        // Bloom skipping is a pure hint — on timeout, KEEP the file
        // (never skip on evidence we failed to fetch) and cancel the
        // straggler so it releases its pool slot.
        statsKept.zip(futures).collect { case (f, fut) if (
          try fut.get(BloomFetchTimeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
          catch { case _: java.util.concurrent.TimeoutException =>
            fut.cancel(true); true
          }) => f }
      }
    }
  }

  /** Can this filter ever contribute to file skipping? (Used to avoid
   * reading stats when no pushed filter could prune anything.) */
  def usable(f: Filter): Boolean = f match {
    case EqualTo(_, v)            => comparable(v)
    case GreaterThan(_, v)        => comparable(v)
    case GreaterThanOrEqual(_, v) => comparable(v)
    case LessThan(_, v)           => comparable(v)
    case LessThanOrEqual(_, v)    => comparable(v)
    case In(_, vs)                => vs.nonEmpty && vs.forall(comparable)
    case StringStartsWith(_, p)   => p != null
    case IsNull(_)                => true
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
    case EqualTo(c, v) =>
      range(s, c, v).forall { case (r, d) => d >= r.min && d <= r.max } &&
        srange(s, c, v).forall { case (r, b) =>
          cmp(b, r.min) >= 0 && r.max.forall(mx => cmp(b, mx) <= 0) }
    case GreaterThan(c, v) =>
      range(s, c, v).forall { case (r, d) => r.max > d } &&
        srange(s, c, v).forall { case (r, b) => r.max.forall(mx => cmp(mx, b) > 0) }
    case GreaterThanOrEqual(c, v) =>
      range(s, c, v).forall { case (r, d) => r.max >= d } &&
        srange(s, c, v).forall { case (r, b) => r.max.forall(mx => cmp(mx, b) >= 0) }
    case LessThan(c, v) =>
      range(s, c, v).forall { case (r, d) => r.min < d } &&
        srange(s, c, v).forall { case (r, b) => cmp(r.min, b) < 0 }
    case LessThanOrEqual(c, v) =>
      range(s, c, v).forall { case (r, d) => r.min <= d } &&
        srange(s, c, v).forall { case (r, b) => cmp(r.min, b) <= 0 }
    case StringStartsWith(c, p) =>
      // strings with prefix p live in [p, succ(p)): the file may hold
      // one iff that interval intersects [min, max]
      s.strCols.get(c).forall { r =>
        val pb = utf8(p)
        r.max.forall(mx => cmp(pb, mx) <= 0) &&
          succ(pb).forall(ub => cmp(r.min, ub) < 0)
      }
    case In(c, vs)  => vs.exists(v => mayMatchOne(EqualTo(c, v), s))
    // SCBF cannot store nulls (numeric nulls abort the write, null
    // strings become ""), so a column PROVEN present by its stats
    // entry satisfies IsNull on zero rows — the whole file skips. A
    // column without a stats entry (e.g. a NaN-bearing double) might
    // not exist in this file at all: keep, conservatively.
    case IsNull(c)  => !(s.cols.contains(c) || s.strCols.contains(c))
    case And(l, r)  => mayMatchOne(l, s) && mayMatchOne(r, s)
    case Or(l, r)   => mayMatchOne(l, s) || mayMatchOne(r, s)
    case _          => true
  }

  /**
   * Dual of [[mayMatch]]: trusted-stats PROOF that EVERY row satisfies
   * the filters — the evidence behind DELETE's whole-file fast path
   * (drop the file instead of reading and rewriting it; the partition-
   * takedown shape: `DELETE WHERE source = 'x'` on files whose stored
   * cell is exactly 'x'). Strictness is INVERTED from mayMatch:
   * absence of a column's stats, an unknown filter shape, or an
   * uncomparable literal all yield FALSE (no proof, rewrite instead) —
   * an over-claim here would OVER-DELETE, the one failure class a
   * takedown path must never have. Sound under bound truncation
   * because the stored min is ALWAYS a valid lower bound and the
   * stored max a valid upper bound (see strRange): interval
   * containment of the stored bounds proves containment of the true
   * values. A rows==0 file is vacuously all-matching (dropping it
   * removes nothing).
   */
  def mustMatchAll(filters: Seq[Filter], stats: FileStats): Boolean =
    filters.forall(f => mustMatchOne(f, stats))

  private def mustMatchOne(f: Filter, s: FileStats): Boolean =
    s.rows == 0 || (f match {
      case AlwaysTrue() => true
      case EqualTo(c, v) =>
        // min == v == max pins every value to v exactly
        range(s, c, v).exists { case (r, d) => r.min == d && r.max == d } ||
          srange(s, c, v).exists { case (r, b) =>
            cmp(r.min, b) == 0 && r.max.exists(mx => cmp(mx, b) == 0) }
      case EqualNullSafe(c, v) if v != null => mustMatchOne(EqualTo(c, v), s)
      case GreaterThan(c, v) =>
        range(s, c, v).exists { case (r, d) => r.min > d } ||
          srange(s, c, v).exists { case (r, b) => cmp(r.min, b) > 0 }
      case GreaterThanOrEqual(c, v) =>
        range(s, c, v).exists { case (r, d) => r.min >= d } ||
          srange(s, c, v).exists { case (r, b) => cmp(r.min, b) >= 0 }
      case LessThan(c, v) =>
        range(s, c, v).exists { case (r, d) => r.max < d } ||
          srange(s, c, v).exists { case (r, b) =>
            r.max.exists(mx => cmp(mx, b) < 0) }
      case LessThanOrEqual(c, v) =>
        range(s, c, v).exists { case (r, d) => r.max <= d } ||
          srange(s, c, v).exists { case (r, b) =>
            r.max.exists(mx => cmp(mx, b) <= 0) }
      case StringStartsWith(c, p) =>
        // every value in [p, succ(p)) ⟸ storedMin ≥ p ∧ storedMax < succ(p)
        s.strCols.get(c).exists { r =>
          val pb = utf8(p)
          cmp(r.min, pb) >= 0 &&
            succ(pb).exists(ub => r.max.exists(mx => cmp(mx, ub) < 0))
        }
      case In(c, vs)    => vs.exists(v => mustMatchOne(EqualTo(c, v), s))
      // the format stores no nulls (numeric nulls abort the write,
      // null strings become "") — every row satisfies IsNotNull
      case IsNotNull(_) => true
      // every row satisfies NOT g ⟺ no row satisfies g — which is
      // exactly what mayMatch=false proves
      case Not(g)       => !mayMatch(Seq(g), s)
      case And(l, r)    => mustMatchOne(l, s) && mustMatchOne(r, s)
      case Or(l, r)     => mustMatchOne(l, s) || mustMatchOne(r, s)
      case _            => false
    })

  /** Build the truncated bounds for a utf8 column from its exact
   * byte-wise min and max values (writer side). Bounds short enough to
   * store whole are flagged exact — the extremum itself, servable to
   * aggregate pushdown; truncated ones stay valid bounds only. */
  def strRange(exactMin: Array[Byte], exactMax: Array[Byte]): StrRange =
    StrRange(
      exactMin.take(MaxStrBound),
      if (exactMax.length <= MaxStrBound) Some(exactMax)
      else succ(exactMax.take(MaxStrBound)),
      exactMin = exactMin.length <= MaxStrBound,
      exactMax = exactMax.length <= MaxStrBound)

  /** Unsigned byte-wise lexicographic order — UTF8String's binary
   * comparison, which is Spark's (non-collated) string ordering. */
  def cmp(a: Array[Byte], b: Array[Byte]): Int =
    java.util.Arrays.compareUnsigned(a, b)

  /** Smallest byte string strictly greater than every string with
   * prefix `p`: increment the last non-0xFF byte and drop the rest.
   * None when `p` is all 0xFF (no such bound exists). */
  private def succ(p: Array[Byte]): Option[Array[Byte]] = {
    var i = p.length - 1
    while (i >= 0 && p(i) == 0xFF.toByte) i -= 1
    if (i < 0) None
    else {
      val out = p.take(i + 1)
      out(i) = (out(i) + 1).toByte
      Some(out)
    }
  }

  // ---- rendering / parsing ------------------------------------------------

  private val b64e = java.util.Base64.getEncoder
  private val b64d = java.util.Base64.getDecoder

  /** The exactness tag rendered after a string-bounds pair. */
  private def eFlags(r: StrRange): String =
    s"E:${if (r.exactMin) 1 else 0}${if (r.exactMax) 1 else 0}"

  /** Dual of [[eFlags]] — the ONE decoder for a string-bounds line's
   * fields (`scol` and `dirsumscol` share it); a missing 5th field
   * (pre-flag writers) parses to inexact, the conservative reading. */
  private def parseStrRange(mn: String, mx: String, e: Option[String]): StrRange =
    StrRange(b64d.decode(mn),
      if (mx == "-") None else Some(b64d.decode(mx)),
      exactMin = e.exists(v => v == "E:11" || v == "E:10"),
      exactMax = e.exists(v => v == "E:11" || v == "E:01"))

  private def render(stats: FileStats, withNdv: Boolean = true): String = {
    val sb = new StringBuilder(s"rows\t${stats.rows}\n")
    stats.cols.toSeq.sortBy(_._1).foreach { case (n, r) =>
      // optional 5th field: the exact Long sum (int32 columns only)
      sb.append(s"col\t$n\t${r.min}\t${r.max}${r.sum.map(s => s"\t$s").getOrElse("")}\n")
    }
    stats.strCols.toSeq.sortBy(_._1).foreach { case (n, r) =>
      val mx = r.max.map(b64e.encodeToString).getOrElse("-")
      // 5th field: exactness flags (format evolution — old readers'
      // 4-field split folds it into max and fails that line's parse,
      // losing only that sidecar's skipping; new readers of old lines
      // default both flags to false, declining pushdown, never wrong)
      sb.append(s"scol\t$n\t${b64e.encodeToString(r.min)}\t$mx\t${eFlags(r)}\n")
    }
    stats.strLens.toSeq.sortBy(_._1).foreach { case (n, (sum, mx)) =>
      sb.append(s"slen\t$n\t$sum\t$mx\n")
    }
    if (withNdv) {
      stats.ndvs.toSeq.sortBy(_._1).foreach { case (n, regs) =>
        sb.append(s"ndv\t$n\t${b64e.encodeToString(regs)}\n")
      }
      // per-file histograms are sidecar-only, like the NDV registers:
      // the manifest carries one merged dirhist per column instead
      stats.hists.toSeq.sortBy(_._1).foreach { case (n, h) =>
        sb.append(s"hist\t$n\t${ScbfHistogram.render(h)}\n")
      }
      // same for the string top-K summaries (merged as dirtopk)
      stats.topks.toSeq.sortBy(_._1).foreach { case (n, t) =>
        sb.append(s"topk\t$n\t${ScbfStrTopK.render(t)}\n")
      }
    }
    sb.toString
  }

  private def parse(lines: Seq[String]): Option[FileStats] = {
    val rows = lines.collectFirst {
      case l if l.startsWith("rows\t") => l.stripPrefix("rows\t").toLong
    }
    val cols = lines.collect { case l if l.startsWith("col\t") =>
      l.split("\t", 5) match {
        case Array(_, n, mn, mx)     => n -> ColRange(mn.toDouble, mx.toDouble)
        case Array(_, n, mn, mx, sm) => n -> ColRange(mn.toDouble, mx.toDouble, Some(sm.toLong))
      }
    }.toMap
    val strCols = lines.collect { case l if l.startsWith("scol\t") =>
      l.split("\t", 5) match {
        case Array(_, n, mn, mx, e) => n -> parseStrRange(mn, mx, Some(e))
        case Array(_, n, mn, mx)    => n -> parseStrRange(mn, mx, None)
      }
    }.toMap
    val ndvs = lines.collect { case l if l.startsWith("ndv\t") =>
      val Array(_, n, regs) = l.split("\t", 3)
      n -> b64d.decode(regs)
    }.filter(_._2.length == ScbfNdv.M).toMap
    val strLens = lines.collect { case l if l.startsWith("slen\t") =>
      val Array(_, n, sum, mx) = l.split("\t", 4)
      n -> ((sum.toLong, mx.toInt))
    }.toMap
    val hists = lines.collect { case l if l.startsWith("hist\t") =>
      val Array(_, n, h) = l.split("\t", 3)
      ScbfHistogram.parse(h).map(n -> _)
    }.flatten.toMap
    val topks = lines.collect { case l if l.startsWith("topk\t") =>
      val Array(_, n, t) = l.split("\t", 3)
      ScbfStrTopK.parse(t).map(n -> _)
    }.flatten.toMap
    rows.map(FileStats(_, cols, strCols, ndvs, strLens, hists, topks))
  }

  private def publish(p: Path, conf: Configuration, content: String): Unit = {
    val fs = p.getFileSystem(conf)
    val tmp = new Path(p.getParent,
      s"${p.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(UTF_8)) finally out.close()
    // replace-by-rename: a reader between the delete and the rename
    // sees NO stats file (skipping disabled — safe), never a partial one
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p)) {
      fs.delete(tmp, false)
      throw new graft.scbf.ScbfFormatException(s"failed to publish stats file $p")
    }
  }

  private def slurp(fs: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      in.readFully(0, buf)
      new String(buf, UTF_8)
    } finally in.close()
  }

  // ---- value plumbing -----------------------------------------------------

  /** The (range, filter value) pair when both sides are numeric; None
   * disables exclusion for this predicate. */
  private def range(s: FileStats, col: String, v: Any): Option[(ColRange, Double)] =
    s.cols.get(col).flatMap(r => toDouble(v).map(d => (r, d)))

  private def srange(s: FileStats, col: String, v: Any): Option[(StrRange, Array[Byte])] =
    s.strCols.get(col).flatMap(r => toBytes(v).map(b => (r, b)))

  private def comparable(v: Any): Boolean = toDouble(v).isDefined || toBytes(v).isDefined

  private def toDouble(v: Any): Option[Double] = v match {
    case n: java.lang.Number => Some(n.doubleValue())
    case _                   => None
  }

  private def toBytes(v: Any): Option[Array[Byte]] = v match {
    case s: String                                   => Some(utf8(s))
    case u: org.apache.spark.unsafe.types.UTF8String => Some(u.getBytes)
    case _                                           => None
  }

  private def utf8(s: String): Array[Byte] = s.getBytes(UTF_8)
}
