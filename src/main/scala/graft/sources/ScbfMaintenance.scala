package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/**
 * Directory maintenance for SCBF tables — the OPTIMIZE/compaction step
 * a 100 TB deployment runs between ingest and query.
 *
 * `cluster` rewrites a directory range-partitioned on the given
 * columns: a streaming ingest's many small epoch files (or an
 * unclustered batch write) become `numFiles` files with DISJOINT value
 * ranges on the cluster columns — the layout under which every
 * stats-driven optimization in this connector actually bites:
 * predicate file-skipping (q35/q36), runtime join pruning (q38), limit
 * prefixes, and top-k pruning (q39) all degrade to full scans when
 * every file spans the whole value range, and all prune to O(1) files
 * when ranges are disjoint.
 *
 * Safety is inherited from the connector's own write path, not
 * reimplemented: the overwrite captures the old files at job start and
 * deletes them only at job COMMIT (a failed rewrite leaves the old
 * table intact — ScbfBatchWrite's scaladoc), new files stage as
 * invisible dot-temps, and the job-commit manifest merge starts fresh
 * so no stale stats survive the rewrite. The read and the write are
 * separated by the range shuffle, so the input is fully consumed
 * before any publication happens. Concurrent READERS are safe at every
 * point (they see old files, or old+new during the commit window —
 * never partial files); a concurrent WRITER to the same directory is
 * the same single-writer contract the streaming sink documents.
 */
object ScbfMaintenance {

  def cluster(
      spark: SparkSession,
      dir: String,
      clusterCols: Seq[String],
      numFiles: Int,
      maxBufferedBytes: Option[Long] = None): Unit = {
    require(clusterCols.nonEmpty, "cluster requires at least one column")
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val df = spark.read.format("scbf").load(dir)
    val writer = df
      .repartitionByRange(numFiles, clusterCols.map(col): _*)
      .write.format("scbf").mode("overwrite")
    maxBufferedBytes.foreach(b => writer.option("maxBufferedBytes", b))
    writer.save(dir)
  }

  /** CLI: `cluster <dir> <numFiles> <col> [col ...]` — the maintenance
   * entry point alongside the reference-shaped CSV CLI (CsvScbfApps). */
  def main(args: Array[String]): Unit = args.toSeq match {
    case Seq("cluster", dir, n, cols @ _*) if cols.nonEmpty =>
      val spark = SparkSession.builder().getOrCreate()
      cluster(spark, dir, cols, n.toInt)
    case _ =>
      System.err.println("usage: ScbfMaintenance cluster <dir> <numFiles> <col> [col ...]")
      sys.exit(2)
  }
}
