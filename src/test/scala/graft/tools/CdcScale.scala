package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.sources._

/**
 * Row-level CDC at scale (round 13) — the costs the 100 TB story
 * claims, measured:
 *
 *  1. CAPTURE is metadata-priced: a whole-file takedown on a
 *     CDC-enabled table retains its victims by RENAME — wall clock
 *     within the same order as the plain (delete) takedown, never a
 *     second write of the bytes.
 *  2. ENUMERATION is window-priced: `ScbfCdc.changes` over the last
 *     few commits of a long history replays only the post-point
 *     deltas (deltaReads pinned) and plans ONE scan per change type
 *     regardless of how many commits the window spans.
 *  3. TIME TRAVEL ACROSS a captured takedown serves the pre-delete
 *     rendering from retention — exact rows, no refusal.
 *
 * Usage: Test/runMain graft.tools.CdcScale [files] [rowsPerFile]
 */
object CdcScale {
  def main(args: Array[String]): Unit = {
    val nFiles = if (args.length > 0) args(0).toInt else 2000
    val rows = if (args.length > 1) args(1).toInt else 50
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val conf = spark.sessionState.newHadoopConf()

    def timed[T](label: String)(f: => T): (T, Double) = {
      val s = System.nanoTime()
      val r = f
      val ms = (System.nanoTime() - s) / 1e6
      println(f"[cdcscale] $label: $ms%.1f ms")
      (r, ms)
    }

    def build(tag: String, cdc: Boolean): (String, Long) = {
      val dir = s"/tmp/graft_cdc_scale_$tag"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      PlanningScale.generate(dir, nFiles, rows) // clustered ids, real files
      val p = new Path(dir)
      val qroot = p.getFileSystem(conf).makeQualified(p)
      // the raw fixture has no discovery log — announce the generated
      // files as one ingest commit (the connector-write shape), which
      // is what the CDC replay and the takedown's log records ride on
      val now = System.currentTimeMillis()
      ScbfDiscovery.append(qroot, conf,
        ScbfDataSource.resolveFiles(Seq(dir), conf)
          .map(f => ScbfDiscovery.Entry(f.getPath.getName, f.getLen, now)))
      if (cdc) ScbfCdc.enable(p, conf)
      // a takedown point AFTER the generated history
      Thread.sleep(5)
      (dir, System.currentTimeMillis())
    }

    // ---- 1. capture cost: whole-table takedown, CDC off vs on ------
    // (the generated ids are clustered per file, so a full-range
    // DELETE drops every file whole — the zero-IO fast path)
    val (dirOff, _) = build("off", cdc = false)
    spark.sql("DROP TABLE IF EXISTS cdc_scale_off")
    spark.sql(s"CREATE TABLE cdc_scale_off (id INT, v DOUBLE) USING scbf LOCATION '$dirOff'")
    val (_, wallOff) = timed(s"whole-file takedown of $nFiles files, CDC OFF (deletes)") {
      spark.sql("DELETE FROM cdc_scale_off WHERE id >= 0")
    }
    val (dirOn, t1) = build("on", cdc = true)
    spark.sql("DROP TABLE IF EXISTS cdc_scale_on")
    spark.sql(s"CREATE TABLE cdc_scale_on (id INT, v DOUBLE) USING scbf LOCATION '$dirOn'")
    val (_, wallOn) = timed(s"whole-file takedown of $nFiles files, CDC ON (renames)") {
      spark.sql("DELETE FROM cdc_scale_on WHERE id >= 0")
    }
    println(f"[cdcscale] capture overhead: ${wallOn / math.max(wallOff, 1.0)}%.2fx " +
      "(rename vs delete — same metadata order)")
    require(wallOn < wallOff * 5,
      f"retention must stay metadata-priced: $wallOn%.0f ms vs $wallOff%.0f ms")

    // ---- 2. enumeration: window-priced over a long history ---------
    ScbfDiscovery.deltaReads.set(0)
    val (df, _) = timed("ScbfCdc.changes window resolution (replay + plan, no data)") {
      ScbfCdc.changes(spark, dirOn, since = Some(t1))
    }
    val (byType, _) = timed("enumerate + group by change type") {
      df.groupBy(ScbfCdc.ChangeTypeCol).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val reads = ScbfDiscovery.deltaReads.get
    println(s"[cdcscale]   change rows=$byType deltaReads=$reads")
    require(byType("delete") == nFiles.toLong * rows,
      s"every removed row enumerates: ${byType("delete")}")
    require(reads <= 6,
      s"the window replay must read only the post-point deltas, read $reads")

    // ---- 3. AS OF across the captured takedown ---------------------
    val (asOfCnt, _) = timed("TIMESTAMP AS OF before the takedown (from retention)") {
      spark.read.format("scbf").option("asOfTimestamp", t1).load(dirOn).count()
    }
    require(asOfCnt == nFiles.toLong * rows, s"as-of rows: $asOfCnt")

    // ---- 4. STREAMING CDC catch-up (round 14): a readChangeFeed
    // stream entering at the takedown point delivers the same rows the
    // batch enumeration serves, and its per-trigger driver cost stays
    // bounded by the trigger's own commits — the replay reads only the
    // post-point deltas (plus the capped admission's own delta reads),
    // never the 2000-file history
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdc_scale_ckpt").toString
    ScbfDiscovery.deltaReads.set(0)
    val delivered = new java.util.concurrent.atomic.AtomicLong(0)
    val (_, wallStream) = timed("readChangeFeed stream catch-up from the takedown point") {
      val q = spark.readStream.format("scbf")
        .option("readChangeFeed", "true")
        .option("startingTimestamp", t1.toString)
        .load(dirOn)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          delivered.addAndGet(df.count())
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    val streamReads = ScbfDiscovery.deltaReads.get
    println(s"[cdcscale]   stream delivered=${delivered.get} deltaReads=$streamReads " +
      f"wall=$wallStream%.0f ms")
    require(delivered.get == nFiles.toLong * rows,
      s"the stream must deliver every takedown row once: ${delivered.get}")
    require(streamReads <= 12,
      s"per-trigger stream planning must read only post-point deltas, read $streamReads")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))

    spark.sql("DROP TABLE cdc_scale_off")
    spark.sql("DROP TABLE cdc_scale_on")
    spark.stop()
    Seq(dirOff, dirOn).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    println("[cdcscale] OK")
  }
}
