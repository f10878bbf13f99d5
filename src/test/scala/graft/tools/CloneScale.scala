package graft.tools

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.sources._

/**
 * SHALLOW CLONE at metadata scale: clone an n-file table (the
 * [[PlanningScale]] fixture — real readable files, honest manifest)
 * and measure what the zero-copy claim costs at the file counts a
 * 100 TB table has: creation (one listing + one ref-file write, ZERO
 * data opens), ref resolution (pooled length-guarded stats — the
 * planning bill every clone read pays), the first read, and the
 * dangling-ref detection (delete one source file → the next clone read
 * must refuse loudly, and the refusal must not cost more than the
 * resolution that found it).
 *
 * Usage: Test/runMain graft.tools.CloneScale [nFiles] [rowsPerFile]
 */
object CloneScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 100000
    val rows = if (args.length > 1) args(1).toInt else 10
    val dir = s"/tmp/graft_clone_scale_$n"
    val cloneDir = s"$dir.branch"
    val d = new java.io.File(dir)
    org.apache.commons.io.FileUtils.deleteQuietly(d)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(cloneDir))
    val conf = new Configuration()

    println(s"[clone100k] generating $n files x $rows rows at $dir")
    PlanningScale.generate(dir, n, rows)

    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("DROP TABLE IF EXISTS clone_scale_src")
    spark.sql("DROP TABLE IF EXISTS clone_scale_br")
    spark.sql("CREATE TABLE clone_scale_src (id INT, v DOUBLE) USING scbf " +
      s"LOCATION '$dir'")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[clone100k] $label: ${(System.nanoTime() - t0) / 1e6}%.1f ms")
      r
    }

    ScbfUtil.dataFileOpens.set(0)
    val r = timed(s"SHALLOW CLONE of $n files (create)") {
      spark.sql("CREATE TABLE clone_scale_br SHALLOW CLONE clone_scale_src " +
        s"LOCATION '$cloneDir'").head()
    }
    require(ScbfUtil.dataFileOpens.get == 0, "clone creation must open no data")
    require(r.getInt(0) == n, s"refs: $r")
    println(s"[clone100k]   refs=${r.getInt(0)} bytes=${r.getLong(1)} dataOpens=0")

    // the planning bill every clone read pays: pooled length-guarded
    // stats over all refs
    timed(s"ref resolution ($n pooled stats)") {
      val got = ScbfClone.resolve(new Path(cloneDir), conf)
      require(got.size == n, s"resolved ${got.size}")
    }
    val cnt = timed("first clone COUNT(*)") {
      spark.table("clone_scale_br").count()
    }
    require(cnt == n.toLong * rows, s"count: $cnt")

    // dangling detection: kill ONE referenced file — the next read
    // refuses loudly at resolution cost, never a silent partial table
    val victim = new java.io.File(d, f"part-${n / 2}%06d${graft.scbf.Scbf.FileExtension}")
    require(victim.delete(), s"could not delete $victim")
    val t0 = System.nanoTime()
    val e = try { spark.table("clone_scale_br").count(); null }
      catch { case ex: Exception => ex }
    println(f"[clone100k] dangling-ref refusal in ${(System.nanoTime() - t0) / 1e6}%.1f ms")
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    require(msgs.contains("shallow clone") && msgs.contains("no longer exists"),
      s"expected the dangling-ref contract, got: $msgs")

    spark.sql("DROP TABLE IF EXISTS clone_scale_br")
    spark.sql("DROP TABLE IF EXISTS clone_scale_src")
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(d)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(cloneDir))
    println("[clone100k] OK")
  }
}
