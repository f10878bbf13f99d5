package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import scala.util.control.NonFatal

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}

import graft.scbf.ScbfFormatException

/**
 * Zero-copy SHALLOW CLONE — the experimentation-branch primitive for a
 * 100 TB corpus: a new table whose data is a LIST OF REFERENCES to the
 * source's files (live now, or the `TIMESTAMP/VERSION AS OF` rendering)
 * instead of a CTAS copy. Creating one is metadata cost: one sidecar
 * write, zero data files opened or copied.
 *
 * Layout: the clone directory holds a dot-prefixed `.scbf.clone` ref
 * file (invisible to data listings and reference tooling, like every
 * other sidecar):
 * {{{
 *   clone\t1
 *   source\t<absolute source root>
 *   ref\t<absolute file path>\t<expected length>
 *   ...
 * }}}
 *
 * Semantics, deliberately narrow and loud:
 *  - READS resolve refs ∪ the clone directory's own files. Every ref
 *    is length-guarded: a referenced file a later source
 *    DELETE/UPDATE/OPTIMIZE/RESTORE physically removed (or rewrote)
 *    fails the read with the dangling-reference contract, never a
 *    silent partial table. Stats skipping, bloom pruning and manifest
 *    lookups ride the SOURCE directories' sidecars unchanged, and
 *    `_file_path` lineage points at the real (source) bytes.
 *  - APPENDS (INSERT INTO / streaming sink) land as ordinary files in
 *    the clone directory — the source is never touched.
 *  - Everything that would REWRITE shared bytes refuses on a clone:
 *    INSERT OVERWRITE, DELETE/UPDATE/MERGE, OPTIMIZE/ZORDER, RESTORE,
 *    ALTER COLUMN rewrites. The cure is always named: materialize
 *    with CTAS first.
 *  - VACUUM on the source only sweeps temps/orphans (never live data),
 *    so it cannot dangle a clone; the mutating ops above can, and the
 *    length-guard turns that into a loud read-time refusal.
 *  - A clone of a partitioned source reads every row correctly (SCBF
 *    stores partition VALUES in the data files — the layout is an
 *    optimization, not the truth), but the clone itself is a FLAT
 *    relation: no directory pruning / SPJ on the refs. Declared cost
 *    of zero-copy branching; partition-grade clones are a CTAS.
 *  - Cloning a clone works: resolution flattens through the ref list
 *    (the new clone references the same underlying absolute paths).
 */
object ScbfClone {

  val RefFile = ".scbf.clone"

  private val Header = "clone\t1"

  def refPath(dir: Path): Path = new Path(dir, RefFile)

  def isClone(dir: Path, conf: Configuration): Boolean =
    try refPath(dir).getFileSystem(conf).exists(refPath(dir))
    catch { case NonFatal(_) => false }

  /** Loud guard for every rewrite surface a clone must refuse. */
  def refuseIfClone(dir: Path, conf: Configuration, op: String): Unit =
    if (isClone(dir, conf))
      throw new ScbfFormatException(
        s"$op on $dir: the table is a SHALLOW CLONE — its data files are " +
          "references into the source table, and this operation would " +
          "rewrite or delete shared bytes. Appends and reads are the " +
          "clone contract; for anything else, materialize first: " +
          "CREATE TABLE m USING scbf AS SELECT * FROM <clone>.")

  /** Publish the ref file (temp + atomic rename, the sidecar
   * discipline). `files` are the source files the clone references —
   * their ABSOLUTE paths and lengths at clone time. */
  def write(dir: Path, conf: Configuration, sourceRoot: Path,
      files: Seq[FileStatus]): Unit = {
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val body = (Seq(Header, s"source\t$sourceRoot") ++
      files.map(f => s"ref\t${f.getPath}\t${f.getLen}")).mkString("\n")
    val tmp = new Path(dir, s"$RefFile.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(UTF_8)) finally out.close()
    if (!fs.rename(tmp, refPath(dir))) {
      fs.delete(tmp, false)
      throw new ScbfFormatException(s"could not publish clone ref file at $dir")
    }
  }

  /** The ref list: (source root, refs as (path, expected length)).
   * None when the directory is not a clone. A present-but-corrupt ref
   * file REFUSES (unlike best-effort stats: refs ARE the data — a
   * quietly half-read list would be a silently partial table). */
  def read(dir: Path, conf: Configuration): Option[(Path, Seq[(Path, Long)])] = {
    val p = refPath(dir)
    val fs = p.getFileSystem(conf)
    if (!(try fs.exists(p) catch { case NonFatal(_) => false })) return None
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    val lines = new String(buf, UTF_8).split("\n").toSeq.filter(_.nonEmpty)
    if (!lines.headOption.contains(Header))
      throw new ScbfFormatException(
        s"clone ref file at $dir is unreadable — the clone cannot be " +
          "resolved (refs are the table's data, a partial list would be a " +
          "silently partial table). Re-create the clone.")
    val src = lines.collectFirst { case l if l.startsWith("source\t") =>
      new Path(l.stripPrefix("source\t")) }
      .getOrElse(throw new ScbfFormatException(
        s"clone ref file at $dir has no source line — re-create the clone."))
    val refs = lines.filter(_.startsWith("ref\t")).map { l =>
      l.split("\t", 3) match {
        case Array(_, path, ln) => (new Path(path), ln.toLong)
        case _ => throw new ScbfFormatException(
          s"clone ref file at $dir has a torn ref line — re-create the clone.")
      }
    }
    Some((src, refs))
  }

  /** ONE referenced file's status — schema inference needs a single
   * header, so a 10⁵-ref clone must not stat every ref for it. A
   * dangling first ref refuses with the same contract as [[resolve]]
   * (schema inference is just the earliest reader to trip over it). */
  def firstRef(dir: Path, conf: Configuration): Option[FileStatus] =
    read(dir, conf).flatMap { case (src, refs) =>
      refs.headOption.map { case (p, _) =>
        try src.getFileSystem(conf).getFileStatus(p)
        catch {
          case _: java.io.FileNotFoundException =>
            throw new ScbfFormatException(
              s"shallow clone at $dir: referenced file $p no longer exists. " +
                s"A mutating operation on the source ($src) rewrote or " +
                "removed bytes the clone references; re-create the clone " +
                "from the current source, or keep a materialized CTAS copy.")
        }
      }
    }

  /** Resolve the refs to live FileStatuses — pooled stats (a clone can
   * reference 10⁵+ files; object-store HEADs must overlap), each
   * length-guarded: missing or resized files refuse with the
   * dangling-reference contract. */
  def resolve(dir: Path, conf: Configuration): Seq[FileStatus] =
    read(dir, conf) match {
      case None => Seq.empty
      case Some((src, refs)) =>
        val fs = src.getFileSystem(conf)
        val futures = refs.map { case (p, expect) =>
          (p, expect, ScbfStats.ioPool.submit(
            new java.util.concurrent.Callable[FileStatus] {
              override def call(): FileStatus = fs.getFileStatus(p)
            }))
        }
        futures.map { case (p, expect, f) =>
          def dangling(why: String): Nothing = throw new ScbfFormatException(
            s"shallow clone at $dir: referenced file $p $why. A mutating " +
              s"operation on the source ($src) — DELETE/UPDATE/OPTIMIZE/" +
              "RESTORE — rewrote or removed bytes the clone references; " +
              "shallow clones share bytes by design (zero-copy) and cannot " +
              "survive source rewrites. Re-create the clone from the " +
              "current source, or keep a materialized CTAS copy for " +
              "long-horizon branches.")
          val st =
            try f.get()
            catch {
              case e: java.util.concurrent.ExecutionException
                  if e.getCause.isInstanceOf[java.io.FileNotFoundException] =>
                dangling("no longer exists")
              case e: java.util.concurrent.ExecutionException => throw e.getCause
            }
          if (st.getLen != expect)
            dangling(s"changed length (${st.getLen} != recorded $expect)")
          st
        }
    }
}
