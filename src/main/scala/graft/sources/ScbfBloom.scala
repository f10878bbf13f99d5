package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicLong

import scala.util.control.NonFatal

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.sources._

/**
 * Per-file Bloom filters for SCBF scans — equality/IN file skipping on
 * columns where min/max is powerless (Parquet's bloom_filter /
 * ClickHouse's bloom_filter skip index, applied at file granularity).
 *
 * Min/max stats prune RANGE-clustered layouts; a high-cardinality key
 * in an UNCLUSTERED layout (doc_id under a round-robin write, event_id
 * in arrival order) spans [global min, global max] in every file, so
 * `doc_id = k` / `doc_id IN (...)` — including the `In` filters the
 * runtime join-pruning path pushes — can never skip on ranges. A Bloom
 * filter answers exactly that query: "can this file contain value v?",
 * with no false negatives, so skipping stays a pure pruning hint.
 *
 * Layout: one dot-prefixed `.{file}.bloom` sidecar per data file (the
 * data-file listing ignores it; reference tooling never sees it),
 * holding one filter per int32/utf8 column. Blooms are deliberately
 * NOT compacted into the directory stats manifest: useful filters are
 * KiB-scale per column (the manifest would grow to ~GB at 10⁵ files,
 * defeating its one-small-read purpose), so planning reads a bloom
 * lazily — only under an equality-shaped pushed filter, and only for
 * files that min/max pruning already failed to exclude. That matches
 * the engines this is modeled on (Parquet reads bloom pages on demand;
 * Iceberg reads per-file puffin blobs), and the read cost is bounded
 * by candidate count, not directory size.
 *
 * Like the stats sidecars, a bloom file records the data file's LENGTH
 * as a staleness guard, publishes via temp + atomic rename, and a
 * missing/corrupt/stale/disabled bloom only ever DISABLES skipping.
 *
 * Sizing: `bitsPerKey` (default 10 → k = 7 probes, FPR ≈ 1%) scaled by
 * the file's row count, capped at `graft.scbf.bloom.maxbytes` per
 * column (default 16 KiB → exact sizing up to ~13k rows/file; beyond
 * the cap the FPR degrades smoothly toward "never prunes" — still
 * correct, documented trade). 0 disables bloom generation. A 100 TB
 * deployment with large files raises the cap on its ingest writers for
 * the columns it point-queries; the per-file cost is metadata-scale
 * (the data file is MBs, the bloom KiBs).
 *
 * File format (text, like the stats sidecar):
 * {{{
 * bloomv1
 * len\t<dataFileBytes>
 * col\t<name>\t<k>\t<mBits>\t<base64 words LE>
 * }}}
 */
object ScbfBloom {

  /** Hadoop-conf key for the per-column byte cap (write side); also
   * settable per-session via `spark.hadoop.graft.scbf.bloom.maxbytes`.
   * 0 disables bloom sidecars entirely. */
  val MaxBytesKey = "graft.scbf.bloom.maxbytes"
  val DefaultMaxBytes = 16384
  val BitsPerKey = 10
  /** k = round(ln2 * bitsPerKey) — optimal probe count for the target
   * bits/key; fixed so writer and reader always agree. */
  val Probes = 7

  // test hook: how many bloom files did planning actually open?
  val bloomReads = new AtomicLong(0)

  def bloomPath(data: Path): Path =
    new Path(data.getParent, s".${data.getName}.bloom")

  /** One column's filter: `m` bits in little-endian long words. */
  final case class ColBloom(k: Int, m: Int, words: Array[Long]) {
    def mayContain(valueBytes: Array[Byte]): Boolean = {
      val h1 = hash64(valueBytes)
      val h2 = mix64(h1) | 1L // odd stride: visits all residues mod m
      var i = 0
      while (i < k) {
        val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, m.toLong).toInt
        if ((words(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
        i += 1
      }
      true
    }
  }

  final case class FileBloom(cols: Map[String, ColBloom])

  /** Writer-side accumulator for one column. */
  final class Builder(rows: Long, maxBytes: Int) {
    // next multiple of 64 ≥ bitsPerKey·rows, capped; ≥ 512 so tiny
    // files still get a real filter
    private val m: Int = {
      val want = math.max(512L, BitsPerKey * rows)
      // clamp the byte cap so m stays a valid Int even under an
      // absurd bloomMaxBytes (e.g. 2 GiB): 64 MiB of bits per column
      // is already far past any useful file-level filter
      val capBits = math.min(maxBytes.toLong, 64L * 1024 * 1024) * 8L
      val capped = math.min(want, math.max(512L, capBits))
      (((capped + 63) / 64) * 64).toInt
    }
    private val words = new Array[Long]((m + 63) / 64)

    def add(valueBytes: Array[Byte]): Unit = {
      val h1 = hash64(valueBytes)
      val h2 = mix64(h1) | 1L
      var i = 0
      while (i < Probes) {
        val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, m.toLong).toInt
        words(bit >>> 6) |= 1L << (bit & 63)
        i += 1
      }
    }

    def result: ColBloom = ColBloom(Probes, m, words)
  }

  /** Canonical hashed encoding per SCBF column type, shared by writer
   * and pruner: int32 → 4-byte big-endian; utf8 → raw bytes. A filter
   * value that doesn't losslessly narrow to the column's encoding
   * (fractional double against an int column) yields None — bloom
   * declines, range stats already reason about such values. */
  def encodeInt(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  def encodeFilterValue(v: Any): Option[Array[Byte]] = v match {
    case i: java.lang.Integer => Some(encodeInt(i))
    case l: java.lang.Long if l >= Int.MinValue && l <= Int.MaxValue =>
      Some(encodeInt(l.toInt))
    case s: String => Some(s.getBytes(UTF_8))
    case u: org.apache.spark.unsafe.types.UTF8String => Some(u.getBytes)
    case _ => None
  }

  /** Can the filter tree profit from a bloom read at all? (Planning
   * reads a bloom file only when this holds — see the lazy-read design
   * note in the object scaladoc.) */
  def usable(f: Filter): Boolean = f match {
    case EqualTo(_, v) => encodeFilterValue(v).isDefined
    case In(_, vs)     => vs.nonEmpty && vs.forall(v => encodeFilterValue(v).isDefined)
    case And(l, r)     => usable(l) || usable(r)
    case Or(l, r)      => usable(l) && usable(r)
    case _             => false
  }

  /** Conjunction semantics over the pushed filters, mirroring
   * ScbfStats.mayMatch: a file is skippable only when some conjunct
   * PROVABLY excludes it. Columns without a filter, and filter shapes
   * blooms can't decide, never exclude. */
  def mayMatch(filters: Seq[Filter], bloom: FileBloom): Boolean =
    filters.forall(f => mayMatchOne(f, bloom))

  private def mayMatchOne(f: Filter, b: FileBloom): Boolean = f match {
    case EqualTo(c, v) =>
      b.cols.get(c).forall(cb => encodeFilterValue(v).forall(cb.mayContain))
    case In(c, vs) =>
      b.cols.get(c).forall(cb =>
        vs.exists(v => encodeFilterValue(v).forall(cb.mayContain)))
    case And(l, r) => mayMatchOne(l, b) && mayMatchOne(r, b)
    case Or(l, r)  => mayMatchOne(l, b) || mayMatchOne(r, b)
    case _         => true
  }

  // ---- file rendering / parsing -------------------------------------------

  private val b64e = java.util.Base64.getEncoder
  private val b64d = java.util.Base64.getDecoder

  def render(dataLen: Long, bloom: FileBloom): String = {
    val sb = new StringBuilder("bloomv1\n").append(s"len\t$dataLen\n")
    bloom.cols.toSeq.sortBy(_._1).foreach { case (n, cb) =>
      val bytes = java.nio.ByteBuffer.allocate(cb.words.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      cb.words.foreach(bytes.putLong)
      sb.append(s"col\t$n\t${cb.k}\t${cb.m}\t${b64e.encodeToString(bytes.array())}\n")
    }
    sb.toString
  }

  /** Length-guarded read; None on missing/corrupt/stale — skipping is
   * best-effort, exactly like the stats sidecars. */
  def read(data: Path, dataLen: Long, conf: Configuration): Option[FileBloom] =
    try {
      val p = bloomPath(data)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) None
      else {
        bloomReads.incrementAndGet()
        val lines = slurp(fs, p).split("\n").filter(_.nonEmpty)
        if (!lines.headOption.contains("bloomv1")) None
        else {
          val len = lines.collectFirst {
            case l if l.startsWith("len\t") => l.stripPrefix("len\t").toLong
          }
          if (!len.contains(dataLen)) None
          else {
            val cols = lines.collect { case l if l.startsWith("col\t") =>
              val Array(_, n, k, m, bits) = l.split("\t", 5)
              val bb = java.nio.ByteBuffer.wrap(b64d.decode(bits))
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              val words = new Array[Long](bb.remaining() / 8)
              var i = 0
              while (i < words.length) { words(i) = bb.getLong(); i += 1 }
              n -> ColBloom(k.toInt, m.toInt, words)
            }.collect {
              // drop malformed entries a parse accepts but membership
              // would CRASH on (m=0 divides, short words array indexes
              // out of bounds) — planning must degrade to keep, never
              // throw, exactly like an unparsable stats sidecar
              case e @ (_, cb)
                  if cb.k >= 1 && cb.m >= 64 && cb.m % 64 == 0 &&
                    cb.words.length == cb.m / 64 => e
            }.toMap
            Some(FileBloom(cols))
          }
        }
      }
    } catch { case NonFatal(_) => None }

  // ---- hashing ------------------------------------------------------------

  /** 64-bit byte-string hash: FNV-1a accumulation + a splitmix finalizer
   * (FNV alone diffuses low bits poorly; the finalizer fixes that).
   * Bloom membership needs speed and spread, not cryptographic
   * strength — an adversarial collision merely keeps a file. */
  def hash64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** splitmix64 finalizer. */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  private def slurp(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      in.readFully(0, buf)
      new String(buf, UTF_8)
    } finally in.close()
  }
}
