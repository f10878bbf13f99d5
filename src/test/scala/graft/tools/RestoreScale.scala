package graft.tools

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.sources._

/**
 * RESTORE at metadata scale: generate an n-file table (the
 * [[PlanningScale]] fixture — real readable files, honest manifest,
 * bloom sidecars), announce it to the discovery log as TWO waves with
 * distinct timestamps, then measure `RESTORE TABLE … TO TIMESTAMP AS
 * OF <between the waves>` — the undo-a-bad-ingest-wave primitive at
 * the file counts a 100 TB table has. The counters prove the design
 * claim: ZERO data-file opens (the restore is file deletes + one
 * manifest drop), and wall-clock is the parallel-delete schedule on
 * the shared IO pool.
 *
 * Usage: Test/runMain graft.tools.RestoreScale [nFiles] [rowsPerFile]
 */
object RestoreScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 100000
    val rows = if (args.length > 1) args(1).toInt else 10
    val dir = s"/tmp/graft_restore_scale_$n"
    val d = new java.io.File(dir)
    org.apache.commons.io.FileUtils.deleteQuietly(d)
    val conf = new Configuration()

    println(s"[restore100k] generating $n files x $rows rows at $dir")
    PlanningScale.generate(dir, n, rows)
    // two ingest waves in the log: first half at ts=1000, the "bad
    // wave" second half at ts=2000 (explicit stamps — the chain is
    // what matters, not wall time)
    val names = (0 until n).map(i => f"part-$i%06d${graft.scbf.Scbf.FileExtension}")
    val lens = names.map(nm => new java.io.File(d, nm).length())
    val root = new Path(dir)
    ScbfDiscovery.append(root, conf,
      (0 until n / 2).map(i => ScbfDiscovery.Entry(names(i), lens(i), 1000L)))
    ScbfDiscovery.append(root, conf,
      (n / 2 until n).map(i => ScbfDiscovery.Entry(names(i), lens(i), 2000L)))

    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("DROP TABLE IF EXISTS restore_scale_t")
    spark.sql("CREATE TABLE restore_scale_t (id INT, v DOUBLE) USING scbf " +
      s"LOCATION '$dir'")

    ScbfUtil.dataFileOpens.set(0)
    ScbfStats.manifestReads.set(0)
    ScbfDataSource.listings.set(0)
    val t0 = System.nanoTime()
    val r = spark.sql("RESTORE TABLE restore_scale_t TO TIMESTAMP AS OF 1500").head()
    val ms = (System.nanoTime() - t0) / 1e6
    println(f"[restore100k] RESTORE removed=${r.getInt(0)} kept=${r.getInt(1)} " +
      f"in ${ms}%.1f ms  dataOpens=${ScbfUtil.dataFileOpens.get} " +
      s"manifestReads=${ScbfStats.manifestReads.get} " +
      s"listings=${ScbfDataSource.listings.get}")
    require(ScbfUtil.dataFileOpens.get == 0, "restore must be zero-read")
    require(r.getInt(0) == n / 2 && r.getInt(1) == n / 2, r.toString)
    // idempotence at scale: the second run lists + replays and removes 0
    val t1 = System.nanoTime()
    val r2 = spark.sql("RESTORE TABLE restore_scale_t TO TIMESTAMP AS OF 1500").head()
    println(f"[restore100k] re-RESTORE removed=${r2.getInt(0)} in " +
      f"${(System.nanoTime() - t1) / 1e6}%.1f ms")
    // the restored table still plans off ONE manifest and reads exactly
    // the surviving rows
    val cnt = spark.table("restore_scale_t").count()
    require(cnt == (n / 2).toLong * rows, s"count after restore: $cnt")
    println(s"[restore100k] post-restore count=$cnt (exact)")
    spark.sql("DROP TABLE restore_scale_t")
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(d)
  }
}
