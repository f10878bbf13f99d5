package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThan, LessThan, StringStartsWith}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** File-skipping via stats sidecars: batch writes publish per-file
 * numeric min/max next to each .scbf file; a scan with pushed filters
 * plans only files whose stats admit matches. Filters always re-apply
 * row-level (pushFilters returns everything as residual), so results
 * are identical with sidecars present, absent, or corrupt. */
class StatsSkipSpec extends AnyFunSuite with SparkTestBase {

  private def writeRanged(dir: String): Unit = {
    // range-partition on id → files with disjoint id ranges, the layout
    // a time/id-ordered ingest produces naturally
    spark.range(0, 1000)
      .select(col("id").cast("int").as("id"),
        (col("id") * 2.5).as("score"),
        concat(lit("row"), col("id")).as("tag"))
      .repartitionByRange(4, col("id"))
      .write.format("scbf").mode("overwrite").save(dir)
  }

  private def scbfFiles(dir: String): Seq[Path] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    fs.listStatus(p).toSeq.map(_.getPath)
      .filter(x => x.getName.endsWith(".scbf") && !x.getName.startsWith("."))
  }

  test("sidecars record exact per-file min/max for numeric columns only") {
    val dir = java.nio.file.Files.createTempDirectory("scbf-stats").toString
    writeRanged(dir)
    val conf = new Configuration()
    val all = scbfFiles(dir)
    assert(all.size == 4)
    all.foreach { f =>
      val st = ScbfStats.read(f, conf)
        .getOrElse(fail(s"missing sidecar for $f"))
      val rows = spark.read.format("scbf").option("aggPushdown", "false")
        .load(f.toString)
        .select(min("id"), max("id"), min("score"), max("score"), count(lit(1)),
          sum("id"))
        .head()
      // int columns also record their exact Long sum (aggregate pushdown)
      assert(st.cols("id") == ScbfStats.ColRange(rows.getInt(0), rows.getInt(1),
        Some(rows.getLong(5))))
      assert(st.cols("score") == ScbfStats.ColRange(rows.getDouble(2), rows.getDouble(3)))
      assert(st.rows == rows.getLong(4))
      assert(!st.cols.contains("tag"), "utf8 stats live in strCols, not cols")
      val srows = spark.read.format("scbf").load(f.toString)
        .select(min("tag"), max("tag")).head()
      assert(st.strCols("tag") == ScbfStats.strRange(
        srows.getString(0).getBytes("UTF-8"), srows.getString(1).getBytes("UTF-8")))
    }
  }

  test("utf8 bounds truncate like Parquet: min by prefix, max by increment") {
    def b(s: String, n: Int) = Array.fill(n)(s.head.toByte)
    // short values survive exactly
    val exact = ScbfStats.strRange("abc".getBytes, "xyz".getBytes)
    assert(exact == ScbfStats.StrRange("abc".getBytes, Some("xyz".getBytes)))
    // long min truncates to a prefix (still a valid lower bound); long
    // max truncates AND increments its last byte (a valid upper bound)
    val long = ScbfStats.strRange(b("a", 60), b("b", 60))
    assert(long.min.length == ScbfStats.MaxStrBound)
    assert(long.max.get.length == ScbfStats.MaxStrBound)
    assert(long.max.get.last == 'c'.toByte, "last byte incremented on truncation")
    val st = ScbfStats.FileStats(10, Map.empty, Map("s" -> long))
    // the true max ("b"*60) sorts BELOW the widened bound → still kept
    assert(ScbfStats.mayMatch(Seq(EqualTo("s", "b" * 60)), st))
    assert(!ScbfStats.mayMatch(Seq(EqualTo("s", "z")), st))
    assert(!ScbfStats.mayMatch(Seq(LessThan("s", "a")), st))
    // an all-0xFF prefix cannot be widened: max must vanish, not lie
    val ff = Array.fill(60)(0xFF.toByte)
    assert(ScbfStats.strRange("a".getBytes, ff).max.isEmpty)
    val stFF = ScbfStats.FileStats(10, Map.empty,
      Map("s" -> ScbfStats.strRange("a".getBytes, ff)))
    assert(ScbfStats.mayMatch(Seq(EqualTo("s", "zzzz")), stFF),
      "unbounded-above column can never exclude by max")
  }

  test("mustMatchAll proves every-row containment and never over-claims") {
    import org.apache.spark.sql.sources._
    def num(min: Double, max: Double) =
      ScbfStats.FileStats(10, Map("id" -> ScbfStats.ColRange(min, max)))
    def str(min: String, max: String) =
      ScbfStats.FileStats(10, Map.empty,
        Map("s" -> ScbfStats.StrRange(min.getBytes, Some(max.getBytes))))
    def must(f: Filter, st: ScbfStats.FileStats) = ScbfStats.mustMatchAll(Seq(f), st)
    // numeric point ranges pin equality; anything wider does not
    assert(must(EqualTo("id", 5), num(5, 5)))
    assert(!must(EqualTo("id", 5), num(5, 6)))
    assert(must(In("id", Array[Any](3, 5, 9)), num(5, 5)))
    assert(!must(In("id", Array[Any](3, 9)), num(5, 5)))
    // range containment, boundary-exact
    assert(must(GreaterThan("id", 4), num(5, 9)) && !must(GreaterThan("id", 5), num(5, 9)))
    assert(must(GreaterThanOrEqual("id", 5), num(5, 9)))
    assert(must(LessThan("id", 10), num(5, 9)) && !must(LessThan("id", 9), num(5, 9)))
    assert(must(LessThanOrEqual("id", 9), num(5, 9)))
    // conjunction = the whole-file band-victim proof
    assert(ScbfStats.mustMatchAll(
      Seq(GreaterThanOrEqual("id", 0), LessThan("id", 10)), num(0, 9)))
    // string point pins equality; prefixes prove StartsWith by interval
    assert(must(EqualTo("s", "src4"), str("src4", "src4")))
    assert(!must(EqualTo("s", "src4"), str("src3", "src4")))
    assert(must(StringStartsWith("s", "src4"), str("src4_a", "src4_z")))
    assert(!must(StringStartsWith("s", "src5"), str("src4_a", "src4_z")))
    // TRUNCATION soundness: a 60-byte min/max stores a 48-byte prefix
    // min and an incremented max — equality on the stored PREFIX must
    // NOT claim proof (the true values differ from the prefix)
    val longB = ("b" * 60).getBytes
    val stLong = ScbfStats.FileStats(10, Map.empty,
      Map("s" -> ScbfStats.strRange(longB, longB)))
    assert(!must(EqualTo("s", "b" * ScbfStats.MaxStrBound), stLong),
      "truncated bounds must never prove equality to the prefix")
    // Not(g) is proven by mayMatch(g)=false, and only then
    assert(must(Not(EqualTo("id", 100)), num(5, 9)))
    assert(!must(Not(EqualTo("id", 7)), num(5, 9)))
    // absence of stats is absence of proof
    assert(!must(EqualTo("other", 5), num(5, 5)))
    // the format stores no nulls: IsNotNull holds for every row
    assert(must(IsNotNull("anything"), num(5, 9)))
    // a 0-row file is vacuously all-matching (dropping it is free)
    assert(ScbfStats.mustMatchAll(Seq(EqualTo("id", 5)), ScbfStats.FileStats(0, Map.empty)))
    // unknown shapes: no proof
    assert(!must(StringEndsWith("s", "x"), str("a", "a")))
  }

  test("a 0-row placeholder file is skippable under any filter") {
    assert(!ScbfStats.mayMatch(Seq(EqualTo("id", 5)), ScbfStats.FileStats(0, Map.empty)))
    assert(ScbfStats.mayMatch(Seq(EqualTo("id", 5)),
      ScbfStats.FileStats(1, Map.empty)), "no stats for the column → must keep")
  }

  test("a filtered scan plans only the files whose stats admit matches") {
    val dir = java.nio.file.Files.createTempDirectory("scbf-skip").toString
    writeRanged(dir)
    val conf = new Configuration()
    val files = ScbfDataSource.resolveFiles(Seq(dir), conf)
    def planned(filters: org.apache.spark.sql.sources.Filter*): Int = {
      val b = new ScbfScanBuilder(
        spark.read.format("scbf").load(dir).schema, files, conf)
      b.pushFilters(filters.toArray)
      b.build().asInstanceOf[ScbfScan].planInputPartitions().length
    }
    assert(planned() == 4)
    assert(planned(EqualTo("id", 10)) == 1, "point lookup → one range file")
    assert(planned(LessThan("id", 250)) == 1)
    assert(planned(GreaterThan("score", 1250.0)) == 2)
    assert(planned(EqualTo("id", 100000)) == 0, "out of range → nothing planned")
    // "row5" sorts inside only file 0's byte range ("row0".."row99");
    // files 1-3 hold row250+ whose byte ranges exclude it
    assert(planned(EqualTo("tag", "row5")) == 1, "utf8 bounds prune too")
  }

  test("dirsum pre-prune: a band over partition-clustered ids parses ONE manifest") {
    val dir = tmpDir("scbf-dirprune")
    // ids clustered BY PARTITION (disjoint ranges per grp directory) —
    // the natural time/ingest-partitioned layout
    spark.range(0, 900)
      .select(col("id").cast("int").as("id"),
        concat(lit("g"), (col("id") / 300).cast("int")).as("grp"))
      .repartition(3, col("grp"))
      .write.format("scbf").partitionBy("grp").mode("overwrite").save(dir)
    val q = spark.read.format("scbf").load(dir)
      .filter(col("id") >= 400 && col("id") < 410) // lives entirely in g1
    ScbfStats.manifestReads.set(0)
    ScbfStats.summaryReads.set(0)
    assert(q.count() == 10L)
    // head-read per directory; only the surviving directory's manifest
    // is ever parsed entry-by-entry — the other directories drop on
    // their fingerprint-validated summary bounds
    assert(ScbfStats.summaryReads.get == 3,
      s"expected 3 summary head-reads, got ${ScbfStats.summaryReads.get}")
    assert(ScbfStats.manifestReads.get == 1,
      s"expected ONE manifest parse (the surviving dir), got ${ScbfStats.manifestReads.get}")
    // and the drop is evidence-gated: results identical when summaries
    // can't serve (manifests removed → sidecar path)
    val conf = new Configuration()
    (0 until 3).foreach { g =>
      val m = ScbfStats.manifestPath(new Path(s"$dir/grp=g$g"))
      m.getFileSystem(conf).delete(m, false)
    }
    assert(spark.read.format("scbf").load(dir)
      .filter(col("id") >= 400 && col("id") < 410).count() == 10L)
  }

  test("dirsum pre-prune works for STRING bands too (folded utf8 bounds)") {
    val dir = tmpDir("scbf-dirprune-str")
    // tags clustered by partition: grp=g0 holds a##, g1 holds b##, g2 c##
    spark.range(0, 300)
      .select(col("id").cast("int").as("id"),
        concat(lit("abc").substr((col("id") / 100 + 1).cast("int"), lit(1)),
          format_string("%02d", col("id") % 100)).as("tag"),
        concat(lit("g"), (col("id") / 100).cast("int")).as("grp"))
      .repartition(2, col("id"))
      .write.format("scbf").partitionBy("grp").mode("overwrite").save(dir)
    val q = spark.read.format("scbf").load(dir)
      .filter(col("tag") >= "b10" && col("tag") < "b20") // lives in g1 only
    ScbfStats.manifestReads.set(0)
    ScbfStats.summaryReads.set(0)
    assert(q.count() == 10L)
    assert(ScbfStats.summaryReads.get == 3,
      s"expected 3 summary head-reads, got ${ScbfStats.summaryReads.get}")
    assert(ScbfStats.manifestReads.get == 1,
      s"string band must parse ONE manifest, got ${ScbfStats.manifestReads.get}")
    // round-trip: the folded utf8 bounds survive the head-read
    val s = ScbfStats.readDirSummary(new Path(s"$dir/grp=g1"), new Configuration()).get
    assert(s.strCols.contains("tag"))
    assert(new String(s.strCols("tag").min, "UTF-8") == "b00")
  }

  test("query results are identical with sidecars present or deleted; explain shows pushed filters") {
    val dir = java.nio.file.Files.createTempDirectory("scbf-skip-e2e").toString
    writeRanged(dir)
    val q = spark.read.format("scbf").load(dir).filter(col("id") < 100)
    assert(q.queryExecution.executedPlan.toString.contains("PushedFilters"),
      "scan description must surface the pushed filters for .explain")
    val withStats = q.collect().map(_.getInt(0)).sorted
    assert(withStats.toSeq == (0 until 100).toSeq)
    // delete every sidecar: skipping disabled, same rows
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    fs.listStatus(p).filter(_.getPath.getName.endsWith(".stats"))
      .foreach(f => fs.delete(f.getPath, false))
    val without = spark.read.format("scbf").load(dir)
      .filter(col("id") < 100).collect().map(_.getInt(0)).sorted
    assert(without.toSeq == withStats.toSeq)
  }

  test("a corrupt sidecar disables skipping but never breaks the read") {
    val dir = java.nio.file.Files.createTempDirectory("scbf-skip-corrupt").toString
    writeRanged(dir)
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    fs.listStatus(p).filter(_.getPath.getName.endsWith(".stats")).foreach { f =>
      val out = fs.create(f.getPath, true)
      out.write("not a stats file".getBytes("UTF-8")); out.close()
    }
    val rows = spark.read.format("scbf").load(dir)
      .filter(col("id") === 500).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(500))
  }

  test("a streaming backfill read prunes files through the same pushed filters") {
    val dir = java.nio.file.Files.createTempDirectory("scbf-skip-stream").toString
    writeRanged(dir)
    val conf = new Configuration()
    val files = ScbfDataSource.resolveFiles(Seq(dir), conf)
    val schema = spark.read.format("scbf").load(dir).schema
    def planned(filters: org.apache.spark.sql.sources.Filter*): Int = {
      val ckpt = java.nio.file.Files.createTempDirectory("scbf-skip-ck").toString
      val b = new ScbfScanBuilder(schema, files, conf, tablePaths = Seq(dir))
      b.pushFilters(filters.toArray)
      val ms = b.build().asInstanceOf[ScbfScan].toMicroBatchStream(ckpt)
        .asInstanceOf[ScbfMicroBatchStream]
      val st = ms.initialOffset()
      val en = ms.latestOffset(st,
        org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
      ms.planInputPartitions(st, en).length
    }
    assert(planned() == 4)
    assert(planned(LessThan("id", 250)) == 1,
      "streaming backfill must prune like the batch scan")
    // e2e: the filtered streaming read returns exactly the batch answer
    val ckpt = java.nio.file.Files.createTempDirectory("scbf-skip-ck2").toString
    val got = scala.collection.mutable.ArrayBuffer.empty[Int]
    val q = spark.readStream.format("scbf").schema(schema).load(dir)
      .filter(col("id") < 250)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= df.select("id").collect().map(_.getInt(0)) }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(got.sorted.toSeq == (0 until 250).toSeq)
  }

  private def plannedIn(dir: String, filters: org.apache.spark.sql.sources.Filter*): Int = {
    val conf = new Configuration()
    val files = ScbfDataSource.resolveFiles(Seq(dir), conf)
    val b = new ScbfScanBuilder(
      spark.read.format("scbf").load(dir).schema, files, conf)
    b.pushFilters(filters.toArray)
    b.build().asInstanceOf[ScbfScan].planInputPartitions().length
  }

  test("string filters prune files through the truncated utf8 bounds") {
    val dir = java.nio.file.Files.createTempDirectory("scbf-skip-str").toString
    // range-partition on a STRING key — the curation layout (t13/t14
    // key on `source`) where `source = '...'` should open one file
    spark.range(0, 1000)
      .select(col("id").cast("int").as("id"),
        concat(lit("src_"), (col("id") / 250).cast("int")).as("source"))
      .repartitionByRange(4, col("source"))
      .write.format("scbf").mode("overwrite").save(dir)
    assert(plannedIn(dir) == 4)
    assert(plannedIn(dir, EqualTo("source", "src_2")) == 1,
      "string point lookup → one range file")
    assert(plannedIn(dir, StringStartsWith("source", "src_0")) == 1)
    assert(plannedIn(dir, LessThan("source", "src_1")) == 1)
    assert(plannedIn(dir, EqualTo("source", "zzz")) == 0)
    assert(plannedIn(dir, StringStartsWith("source", "other_")) == 0)
    // e2e rows unchanged by the pruning
    val got = spark.read.format("scbf").load(dir)
      .filter(col("source") === "src_2").count()
    assert(got == 250)
  }

  test("planning reads one manifest per directory, not one sidecar per file") {
    val dir = java.nio.file.Files.createTempDirectory("scbf-skip-man").toString
    writeRanged(dir)
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    assert(fs.exists(ScbfStats.manifestPath(p)), "batch commit writes the manifest")
    ScbfStats.manifestReads.set(0); ScbfStats.sidecarReads.set(0)
    assert(plannedIn(dir, LessThan("id", 250)) == 1)
    assert(ScbfStats.manifestReads.get == 1,
      "one stats read per DIRECTORY — the 100 TB planning contract")
    assert(ScbfStats.sidecarReads.get == 0,
      "no per-file sidecar reads when the manifest covers every file")
    // manifest lost → per-file sidecars carry the same decisions
    fs.delete(ScbfStats.manifestPath(p), false)
    ScbfStats.manifestReads.set(0); ScbfStats.sidecarReads.set(0)
    assert(plannedIn(dir, LessThan("id", 250)) == 1)
    assert(ScbfStats.sidecarReads.get == 4, "fallback reads each file's sidecar")
  }

  test("a stale manifest entry (file replaced out-of-band) falls back to the sidecar") {
    val dir = java.nio.file.Files.createTempDirectory("scbf-skip-stale").toString
    writeRanged(dir)
    val conf = new Configuration()
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    // replace ONE data file out-of-band (no job commit → manifest keeps
    // the old entry) with content from a disjoint id range + a fresh
    // sidecar — the manifest's len guard must reject its stale entry
    val victim = scbfFiles(dir).head
    val tmp = java.nio.file.Files.createTempDirectory("scbf-skip-stale-src").toString
    spark.range(9000, 9011)
      .select(col("id").cast("int").as("id"),
        (col("id") * 2.5).as("score"),
        concat(lit("row"), col("id")).as("tag"))
      .coalesce(1)
      .write.format("scbf").mode("overwrite").save(tmp)
    val src = scbfFiles(tmp).head
    fs.delete(victim, false)
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, victim, false, conf)
    org.apache.hadoop.fs.FileUtil.copy(fs, ScbfStats.sidecarPath(src),
      fs, ScbfStats.sidecarPath(victim), false, conf)
    assert(fs.getFileStatus(victim).getLen !=
      ScbfStats.readManifest(p, conf)(victim.getName).dataLen,
      "test setup: the replacement must change the length")
    // the stale manifest entry says this file's ids are far below 9005;
    // trusting it would wrongly skip — the len mismatch forces the
    // (fresh, length-matching) sidecar, which admits the file
    assert(plannedIn(dir, EqualTo("id", 9005)) == 1)
    val got = spark.read.format("scbf").load(dir)
      .filter(col("id") === 9005).collect().map(_.getInt(0)).toSeq
    assert(got == Seq(9005))
    // second victim: data replaced but its OLD sidecar left in place.
    // Both guards now fire (manifest len mismatch AND sidecar len
    // mismatch) — the stale bounds, which would exclude id 9505, must
    // not be trusted from either source; the file plans and the row
    // survives
    val victim2 = scbfFiles(dir).find(f =>
      f.getName != victim.getName &&
        ScbfStats.readManifest(p, conf).get(f.getName)
          .exists(_.stats.cols("id").max < 9000)).get
    val tmp2 = java.nio.file.Files.createTempDirectory("scbf-skip-stale-src2").toString
    spark.range(9500, 9511)
      .select(col("id").cast("int").as("id"),
        (col("id") * 2.5).as("score"),
        concat(lit("row"), col("id")).as("tag"))
      .coalesce(1)
      .write.format("scbf").mode("overwrite").save(tmp2)
    fs.delete(victim2, false)
    org.apache.hadoop.fs.FileUtil.copy(fs, scbfFiles(tmp2).head, fs, victim2, false, conf)
    val got2 = spark.read.format("scbf").load(dir)
      .filter(col("id") === 9505).collect().map(_.getInt(0)).toSeq
    assert(got2 == Seq(9505),
      "a stale sidecar (len mismatch) must not be trusted after a stale manifest entry")
  }

  test("IsNull skips every file whose stats prove the column exists (SCBF has no nulls)") {
    val dir = java.nio.file.Files.createTempDirectory("scbf-skip-isnull").toString
    writeRanged(dir)
    import org.apache.spark.sql.sources.{IsNull, IsNotNull}
    // columns proven present (numeric AND utf8 stats) → zero files plan
    assert(plannedIn(dir, IsNull("id")) == 0)
    assert(plannedIn(dir, IsNull("tag")) == 0)
    // an unknown column might simply not carry stats — keep everything
    assert(plannedIn(dir, IsNull("no_such_col")) == 4)
    // IsNotNull can never exclude (and must not trip stats reads alone)
    assert(!ScbfStats.usable(IsNotNull("id")))
    // e2e: the filter still row-evaluates to the same (empty) answer
    assert(spark.read.format("scbf").load(dir)
      .filter(col("id").isNull).count() == 0)
  }

  test("a streaming-sink-written directory file-skips like a batch-written one") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("scbf-skip-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("scbf-skip-sink-ck").toString
    val input = MemoryStream[Int]
    // three restarts → three epochs → three files with disjoint ranges
    def run(lo: Int, hi: Int): Unit = {
      val q = input.toDF()
        .select(col("value").cast("int").as("id"),
          concat(lit("e"), (col("value") / 1000).cast("int")).as("tag"))
        .coalesce(1)
        .writeStream.format("scbf").option("checkpointLocation", ckpt).start(out)
      try { input.addData(lo until hi: _*); q.processAllAvailable() } finally q.stop()
    }
    run(0, 100); run(1000, 1100); run(2000, 2100)
    val p = new Path(out)
    val fs = p.getFileSystem(new Configuration())
    assert(scbfFiles(out).size == 3)
    scbfFiles(out).foreach { f =>
      assert(fs.exists(ScbfStats.sidecarPath(f)),
        s"streaming commit must publish a sidecar for $f")
    }
    assert(fs.exists(ScbfStats.manifestPath(p)),
      "streaming epoch commit must maintain the directory manifest")
    ScbfStats.manifestReads.set(0); ScbfStats.sidecarReads.set(0)
    assert(plannedIn(out, EqualTo("id", 1050)) == 1,
      "a backfill batch read over streaming output plans 1-of-3 files")
    // manifest merges are throttled (ManifestEpochInterval): epoch 0's
    // file is in the manifest, epochs 1-2 ride their sidecars until
    // the next merge epoch — one manifest read + at most two sidecars
    assert(ScbfStats.manifestReads.get == 1 && ScbfStats.sidecarReads.get <= 2,
      s"${ScbfStats.manifestReads.get} manifest / ${ScbfStats.sidecarReads.get} sidecar reads")
    assert(plannedIn(out, EqualTo("tag", "e2")) == 1, "utf8 stats too")
    val got = spark.read.format("scbf").load(out)
      .filter(col("id") >= 2000).count()
    assert(got == 100)
  }

  test("overwrite replaces stale sidecars with the new files' stats") {
    val dir = java.nio.file.Files.createTempDirectory("scbf-skip-ow").toString
    writeRanged(dir)
    // overwrite with a different id range: stale sidecars must not
    // survive to mis-skip the new data
    spark.range(5000, 5100)
      .select(col("id").cast("int").as("id"),
        (col("id") * 2.5).as("score"),
        concat(lit("row"), col("id")).as("tag"))
      .repartitionByRange(2, col("id"))
      .write.format("scbf").mode("overwrite").save(dir)
    val got = spark.read.format("scbf").load(dir)
      .filter(col("id") >= 5050).collect().map(_.getInt(0)).sorted
    assert(got.toSeq == (5050 until 5100).toSeq)
    val conf = new Configuration()
    scbfFiles(dir).foreach { f =>
      val st = ScbfStats.read(f, conf).getOrElse(fail(s"missing sidecar for $f"))
      assert(st.cols("id").min >= 5000.0, s"stale stats on $f")
    }
  }
}
