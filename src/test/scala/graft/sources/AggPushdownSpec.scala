package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Stats-answered aggregate pushdown (ScbfAgg): a global
 * COUNT/MIN/MAX/SUM(int) over an SCBF directory — or the same GROUPED
 * BY partition columns (one row per live partition) — is served from
 * the stats manifest without opening ONE data file: the 100 TB shapes
 * of `SELECT count(*) FROM table` and the per-partition rollup.
 * Anything not provably answerable (filters, group-by on a data
 * column, a stray file without a partition cell, NaN-suppressed or
 * truncated bounds, a file without trusted stats) falls back to the
 * normal scan, and fallback results are always identical to pushed
 * ones. */
class AggPushdownSpec extends AnyFunSuite with SparkTestBase {

  private def writeRanged(dir: String): Unit = {
    spark.range(0, 1000)
      .select(col("id").cast("int").as("id"),
        (col("id") * 2.5).as("score"),
        concat(lit("row"), col("id")).as("tag"))
      .repartitionByRange(4, col("id"))
      .write.format("scbf").mode("overwrite").save(dir)
  }

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("directory summary: the O(partitions) head-read answers the rollup, no entry parse") {
    val dir = tmpDir("scbf-aggsum")
    spark.range(0, 1200)
      .select(col("id").cast("int").as("id"),
        concat(lit("g"), (col("id") % 3).cast("int")).as("grp"))
      .repartition(4, col("id")) // mixed grps per task → several files per dir
      .write.format("scbf").partitionBy("grp").mode("overwrite").save(dir)
    val q = spark.read.format("scbf").load(dir)
      .groupBy("grp").agg(count(lit(1)).as("cnt"),
        min(col("id")).as("mn"), max(col("id")).as("mx"), sum(col("id")).as("sm"))
    ScbfUtil.dataFileOpens.set(0)
    ScbfStats.manifestReads.set(0)
    ScbfStats.summaryReads.set(0)
    val rows = q.collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2),
      r.getInt(3), r.getLong(4))).toMap
    assert(ScbfUtil.dataFileOpens.get == 0, "rollup must not open data files")
    // the FAST path: one head-read per partition directory, and no
    // manifest was ever parsed entry-by-entry
    assert(ScbfStats.summaryReads.get == 3,
      s"expected 3 summary head-reads, got ${ScbfStats.summaryReads.get}")
    assert(ScbfStats.manifestReads.get == 0,
      s"fast path must not fall back to full manifest parses: " +
        s"${ScbfStats.manifestReads.get} parses")
    // and the answers are the exact fold
    (0 until 3).foreach { g =>
      val ids = (0 until 1200).filter(_ % 3 == g)
      assert(rows(s"g$g") == ((ids.size.toLong, ids.min, ids.max,
        ids.map(_.toLong).sum)), s"group g$g")
    }
    // summary round-trip + staleness: matches the live listing, and a
    // file removed out-of-band fails the fingerprint so consumers fall
    // back to per-file evidence
    val conf = new Configuration()
    val d0 = new Path(dir, "grp=g0")
    val fs = d0.getFileSystem(conf)
    val s0 = ScbfStats.readDirSummary(d0, conf).get
    val listed = ScbfDataSource.resolveFiles(Seq(d0.toString), conf)
    assert(s0.matches(listed))
    assert(s0.rows == 400L && s0.cols.contains("id"))
    val victim = listed.head.getPath
    fs.delete(victim, false)
    val relisted = ScbfDataSource.resolveFiles(Seq(d0.toString), conf)
    assert(!s0.matches(relisted), "a dropped file must fail the fingerprint")
    // the stale-summary directory now falls back (and the per-file path
    // refuses the pushdown for the DELETED file's absence is fine — the
    // remaining files still carry length-guarded entries, so the query
    // answers exactly over what exists)
    ScbfStats.manifestReads.set(0)
    ScbfStats.summaryReads.set(0)
    val after = spark.read.format("scbf").load(dir)
      .groupBy("grp").agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after.get("g0").exists(_ < 400L) && after("g1") == 400L,
      s"post-delete counts must reflect the live files: $after")
    assert(ScbfStats.manifestReads.get > 0,
      "the stale directory must have fallen back to a full manifest read")
  }

  test("global count/min/max/sum(int) answers from stats: zero data files opened") {
    val dir = tmpDir("scbf-aggpush")
    writeRanged(dir)
    val q = spark.read.format("scbf").load(dir)
      .agg(count(lit(1)).as("cnt"), count(col("tag")).as("cnt_tag"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"),
        min(col("score")).as("min_s"), max(col("score")).as("max_s"),
        sum(col("id")).as("sum_id"))
    ScbfUtil.dataFileOpens.set(0)
    val row = q.head()
    assert(ScbfUtil.dataFileOpens.get == 0,
      "a pushed aggregate must never open a data file")
    assert(plan(q).contains("PushedAggregation"),
      "explain must surface the pushed aggregation")
    assert(row == Row(1000L, 1000L, 0, 999, 0.0, 2497.5, 499500L))
  }

  test("fallback (aggPushdown=false) computes the identical answer by scanning") {
    val dir = tmpDir("scbf-aggpush-off")
    writeRanged(dir)
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), min(col("id")), max(col("score")), sum(col("id")))
    val pushed = agg(spark.read.format("scbf").load(dir))
    val scanned = agg(spark.read.format("scbf").option("aggPushdown", "false").load(dir))
    ScbfUtil.dataFileOpens.set(0)
    assert(pushed.head() == scanned.head())
    assert(!plan(scanned).contains("PushedAggregation"))
    assert(ScbfUtil.dataFileOpens.get > 0, "the fallback really scanned")
  }

  test("a filter or a group-by disables pushdown and still answers exactly") {
    val dir = tmpDir("scbf-aggpush-filter")
    writeRanged(dir)
    val filtered = spark.read.format("scbf").load(dir)
      .filter(col("id") < 100)
      .agg(count(lit(1)).as("cnt"), sum(col("id")).as("s"))
    assert(!plan(filtered).contains("PushedAggregation"),
      "an aggregate above a residual filter must NOT be answered from whole-file stats")
    assert(filtered.head() == Row(100L, 4950L))
    val grouped = spark.read.format("scbf").load(dir)
      .groupBy((col("id") / 250).cast("int").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    assert(!plan(grouped).contains("PushedAggregation"))
    assert(grouped.collect().map(r => (r.getInt(0), r.getLong(1))).sorted
      .toSeq == (0 until 4).map((_, 250L)))
  }

  test("min/max on a NaN-bearing double column falls back (stats are suppressed)") {
    val dir = tmpDir("scbf-aggpush-nan")
    spark.range(0, 10)
      .select(col("id").cast("int").as("id"),
        when(col("id") === 5, lit(Double.NaN)).otherwise(col("id") * 1.0).as("v"))
      .coalesce(1)
      .write.format("scbf").mode("overwrite").save(dir)
    val q = spark.read.format("scbf").load(dir).agg(max(col("v")).as("mx"))
    assert(!plan(q).contains("PushedAggregation"),
      "suppressed NaN stats must disable the pushdown, not mis-answer it")
    // Spark's ordering puts NaN above every double — the scan says so
    assert(q.head().getDouble(0).isNaN)
    // count(*) alone remains answerable: NaN is not null
    val c = spark.read.format("scbf").load(dir).agg(count(lit(1)))
    assert(plan(c).contains("PushedAggregation") && c.head().getLong(0) == 10L)
  }

  test("min/max on SHORT utf8 answers from exact-flagged bounds, zero data opens") {
    val dir = tmpDir("scbf-aggpush-str")
    writeRanged(dir) // tags "row0".."row999": all under the truncation cap
    val q = spark.read.format("scbf").load(dir)
      .agg(min(col("tag")).as("mn"), max(col("tag")).as("mx"))
    assert(plan(q).contains("PushedAggregation"), plan(q))
    ScbfUtil.dataFileOpens.set(0)
    assert(q.head() == Row("row0", "row999"))
    assert(ScbfUtil.dataFileOpens.get == 0,
      "short-string MIN/MAX must answer from the manifest")
  }

  test("min/max on LONG utf8 declines: truncated bounds are not the extrema") {
    val dir = tmpDir("scbf-aggpush-strlong")
    // values longer than MaxStrBound (48): bounds store truncated
    // prefixes, flagged inexact — serving them would be WRONG (the
    // recorded min is a prefix strictly below the true minimum)
    spark.range(0, 500)
      .select(col("id").cast("int").as("id"),
        concat(lit("x" * 60), col("id")).as("tag"))
      .repartitionByRange(3, col("id"))
      .write.format("scbf").mode("overwrite").save(dir)
    val q = spark.read.format("scbf").load(dir)
      .agg(min(col("tag")).as("mn"), max(col("tag")).as("mx"))
    assert(!plan(q).contains("PushedAggregation"), plan(q))
    assert(q.head() == Row("x" * 60 + "0", "x" * 60 + "99"))
    // MIXED: one directory exact, another truncated on the same column
    // — the fold's winner decides; here the truncated file owns the
    // max, so MAX declines while MIN (owned by an exact bound) serves
    val dir2 = tmpDir("scbf-aggpush-strmix")
    spark.range(0, 10)
      .select(col("id").cast("int").as("id"),
        concat(lit("a"), col("id")).as("tag"))
      .coalesce(1).write.format("scbf").mode("overwrite").save(dir2)
    spark.range(0, 10)
      .select((col("id") + 100).cast("int").as("id"),
        concat(lit("z" * 60), col("id")).as("tag"))
      .coalesce(1).write.format("scbf").mode("append").save(dir2)
    val mn2 = spark.read.format("scbf").load(dir2).agg(min(col("tag")).as("mn"))
    assert(plan(mn2).contains("PushedAggregation"), plan(mn2))
    assert(mn2.head() == Row("a0"))
    val mx2 = spark.read.format("scbf").load(dir2).agg(max(col("tag")).as("mx"))
    assert(!plan(mx2).contains("PushedAggregation"), plan(mx2))
    assert(mx2.head() == Row("z" * 60 + "9"))
  }

  test("a file without trusted stats disables the whole pushdown") {
    val dir = tmpDir("scbf-aggpush-nostats")
    writeRanged(dir)
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    // lose the manifest and ONE sidecar: three trusted files out of four
    // cannot answer a whole-directory aggregate
    fs.delete(ScbfStats.manifestPath(p), false)
    val victim = fs.listStatus(p).map(_.getPath)
      .filter(f => f.getName.endsWith(".scbf") && !f.getName.startsWith(".")).head
    fs.delete(ScbfStats.sidecarPath(victim), false)
    val q = spark.read.format("scbf").load(dir)
      .agg(count(lit(1)).as("cnt"), min(col("id")).as("mn"))
    assert(!plan(q).contains("PushedAggregation"))
    assert(q.head() == Row(1000L, 0))
  }

  test("empty table: count 0, null min/max — matching the scanned answer") {
    val dir = tmpDir("scbf-aggpush-empty")
    spark.range(0, 10)
      .select(col("id").cast("int").as("id"))
      .filter(col("id") < 0) // empty, but batch write still emits a 0-row file
      .coalesce(1)
      .write.format("scbf").mode("overwrite").save(dir)
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), min(col("id")), max(col("id")), sum(col("id")))
    val pushed = agg(spark.read.format("scbf").load(dir))
    assert(plan(pushed).contains("PushedAggregation"))
    val scanned = agg(spark.read.format("scbf").option("aggPushdown", "false").load(dir))
    assert(pushed.head() == scanned.head())
    assert(pushed.head() == Row(0L, null, null, null))
  }

  test("the streaming path never carries a pushed aggregation") {
    val dir = tmpDir("scbf-aggpush-stream")
    writeRanged(dir)
    // a streaming read plans through toMicroBatchStream — the guard is
    // unreachable from SQL (aggregates push on the batch path only),
    // asserted here directly
    val conf = new Configuration()
    val files = ScbfDataSource.resolveFiles(Seq(dir), conf)
    val schema = spark.read.format("scbf").load(dir).schema
    val scan = new ScbfScan(schema, schema, files, conf, tablePaths = Seq(dir),
      aggregated = Some(ScbfAgg.Result(schema, Seq(Seq(1L)), "count(*)")))
    intercept[IllegalArgumentException] {
      scan.toMicroBatchStream(tmpDir("scbf-aggpush-ck"))
    }
  }

  /** A partitioned table for the GROUPED pushdown: two ingest waves so
   * every partition holds several files whose stats must merge. */
  private def mkPart(name: String): String = {
    val dir = tmpDir(s"scbf-aggpush-$name")
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name (id INT, v DOUBLE, grp STRING) USING scbf " +
      s"PARTITIONED BY (grp) LOCATION '$dir'")
    (0 until 2).foreach { w =>
      spark.range(0, 300)
        .select((col("id") + w * 1000).cast("int").as("id"),
          (col("id") * 0.5).as("v"),
          concat(lit("g"), (col("id") % 3).cast("int")).as("grp"))
        .createOrReplaceTempView(s"${name}_src")
      spark.sql(s"INSERT INTO $name SELECT /*+ REPARTITION(3, grp) */ " +
        s"id, v, grp FROM ${name}_src")
    }
    dir
  }

  test("GROUP BY the partition column answers from stats: zero data files opened") {
    val dir = mkPart("aggp_grp")
    def q(table: String, off: Boolean = false) = {
      val t = if (off) spark.read.format("scbf").option("aggPushdown", "false")
        .load(dir) else spark.table(table)
      t.groupBy(col("grp"))
        .agg(count(lit(1)).as("cnt"), count(col("id")).as("cnt_id"),
          min(col("id")).as("mn"), max(col("id")).as("mx"),
          min(col("v")).as("mnv"), max(col("v")).as("mxv"),
          sum(col("id")).as("s"))
    }
    val pushed = q("aggp_grp")
    ScbfUtil.dataFileOpens.set(0)
    val rows = pushed.collect()
    assert(ScbfUtil.dataFileOpens.get == 0,
      "a grouped pushed aggregate must never open a data file")
    assert(plan(pushed).contains("PushedAggregation"), plan(pushed))
    val scanned = q("aggp_grp", off = true).collect()
    assert(rows.sortBy(_.getString(0)).toSeq == scanned.sortBy(_.getString(0)).toSeq)
    assert(rows.length == 3 && rows.map(_.getLong(1)).sum == 600L)
  }

  test("grouped MIN/MAX(string) rides the exactness flags per group, zero data opens") {
    val dir = tmpDir("scbf-aggpush-grpstr")
    spark.range(0, 600)
      .select(col("id").cast("int").as("id"),
        concat(lit("tag"), col("id")).as("tag"),
        concat(lit("g"), (col("id") % 3).cast("int")).as("grp"))
      .repartition(3, col("grp"))
      .write.format("scbf").partitionBy("grp").mode("overwrite").save(dir)
    val q = spark.read.format("scbf").load(dir)
      .groupBy(col("grp"))
      .agg(min(col("tag")).as("mn"), max(col("tag")).as("mx"))
    assert(plan(q).contains("PushedAggregation"), plan(q))
    ScbfUtil.dataFileOpens.set(0)
    val rows = q.collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(ScbfUtil.dataFileOpens.get == 0, "grouped string MIN/MAX must answer from stats")
    (0 until 3).foreach { g =>
      val tags = (0 until 600).filter(_ % 3 == g).map(i => s"tag$i")
      assert(rows(s"g$g") == ((tags.min, tags.max)), s"group g$g")
    }
  }

  test("a keeper partition (0-row file) makes NO group — matching SQL semantics") {
    mkPart("aggp_keep")
    spark.sql("ALTER TABLE aggp_keep ADD PARTITION (grp='empty')")
    val pushed = spark.table("aggp_keep").groupBy(col("grp"))
      .agg(count(lit(1)).as("cnt"))
    assert(plan(pushed).contains("PushedAggregation"))
    val got = pushed.collect().map(_.getString(0)).toSet
    assert(got == Set("g0", "g1", "g2"),
      s"the keeper-only partition must not surface as a group: $got")
  }

  test("GROUP BY a non-partition column (or mixed) still falls back exactly") {
    mkPart("aggp_data")
    val byData = spark.table("aggp_data").groupBy((col("id") % 2).as("parity"))
      .agg(count(lit(1)).as("cnt"))
    assert(!plan(byData).contains("PushedAggregation"))
    assert(byData.collect().map(_.getLong(1)).sum == 600L)
    val mixed = spark.table("aggp_data")
      .groupBy(col("grp"), (col("id") % 2).as("parity"))
      .agg(count(lit(1)).as("cnt"))
    assert(!plan(mixed).contains("PushedAggregation"))
    assert(mixed.collect().length == 6)
  }

  test("a stray file outside the k=v tree disables the grouped pushdown") {
    val dir = mkPart("aggp_stray")
    val conf = new Configuration()
    val files = ScbfDataSource.resolveFiles(Seq(dir), conf)
    val src = files.head.getPath
    val fs = src.getFileSystem(conf)
    val strayDir = new Path(dir, "stray.scbf")
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, strayDir, false, conf)
    // copy the SIDECAR too: the stray file must have trusted stats, so
    // the decline is forced by the missing-partition-cell guard (the
    // one this test pins), not the earlier missing-stats guard
    org.apache.hadoop.fs.FileUtil.copy(fs, ScbfStats.sidecarPath(src), fs,
      ScbfStats.sidecarPath(strayDir), false, conf)
    // the stray file has no grp cell on its path: grouping by path
    // cells would mis-bucket its rows, so the pushdown must decline
    val q = spark.read.format("scbf").load(dir).groupBy(col("grp"))
      .agg(count(lit(1)).as("cnt"))
    assert(!plan(q).contains("PushedAggregation"))
    assert(q.collect().map(_.getLong(1)).sum > 600L) // stray rows counted by the scan
  }

  test("-0.0 and 0.0 partition cells are ONE key: one directory, one group") {
    val dir = tmpDir("scbf-aggpush-negzero")
    spark.sql("DROP TABLE IF EXISTS aggp_zero")
    spark.sql("CREATE TABLE aggp_zero (id INT, db DOUBLE) USING scbf " +
      s"PARTITIONED BY (db) LOCATION '$dir'")
    spark.createDataFrame(Seq((1, 0.0), (2, -0.0), (3, 1.5)))
      .toDF("id", "db").createOrReplaceTempView("aggp_zero_src")
    spark.sql("INSERT INTO aggp_zero SELECT id, db FROM aggp_zero_src")
    // the writer routes both zeros to ONE directory
    val dirs = new java.io.File(new java.net.URI(new Path(dir).getFileSystem(
      new Configuration()).makeQualified(new Path(dir)).toString))
      .list().filter(_.startsWith("db=")).toSet
    assert(dirs.contains("db=0.0") && !dirs.exists(_.contains("-0.0")), dirs)
    // grouped pushdown returns the same (normalized) groups as a scan
    val pushed = spark.table("aggp_zero").groupBy(col("db"))
      .agg(count(lit(1)).as("cnt"))
    assert(plan(pushed).contains("PushedAggregation"))
    val got = pushed.collect().map(r => (r.getDouble(0), r.getLong(1))).toMap
    assert(got == Map(0.0 -> 2L, 1.5 -> 1L), got.toString)
    // a LEGACY -0.0 directory (pre-normalization writer) parses to the
    // normalized key, merging with 0.0 exactly like a scan + aggregate
    val parsed = ScbfPartitions.parseCell(
      org.apache.spark.sql.types.DoubleType, "-0.0")
    assert(parsed.contains(0.0) && java.lang.Double.doubleToRawLongBits(
      parsed.get.asInstanceOf[Double]) == 0L, s"got $parsed")
  }
}
