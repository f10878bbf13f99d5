package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** estimateStatistics: the numbers Catalyst's broadcast decisions, AQE
 * and join reorder read. Rows come from the stats manifest (ONE driver
 * read per directory at any file count); sizes reflect the files the
 * pushed filters actually keep, so a stats-pruned scan can become
 * broadcast-able. */
class ScanStatisticsSpec extends AnyFunSuite with SparkTestBase {

  private def writeRanged(dir: String, nFiles: Int = 4): Unit =
    spark.range(0, 1000)
      .select(col("id").cast("int").as("id"),
        (col("id") * 2.5).as("score"))
      .repartitionByRange(nFiles, col("id"))
      .write.format("scbf").mode("overwrite").save(dir)

  private def scbfFiles(dir: String): Seq[Path] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    fs.listStatus(p).toSeq.map(_.getPath)
      .filter(x => x.getName.endsWith(".scbf") && !x.getName.startsWith("."))
  }

  private def scanFor(dir: String, filters: Filter*): ScbfScan = {
    val conf = new Configuration()
    val files = ScbfDataSource.resolveFiles(Seq(dir), conf)
    val b = new ScbfScanBuilder(
      spark.read.format("scbf").load(dir).schema, files, conf)
    b.pushFilters(filters.toArray)
    b.build().asInstanceOf[ScbfScan]
  }

  test("numRows comes from ONE manifest read; size is the full listing") {
    val dir = tmpDir("scbf-stat")
    writeRanged(dir)
    val scan = scanFor(dir)
    ScbfStats.manifestReads.set(0); ScbfStats.sidecarReads.set(0)
    ScbfStats.summaryReads.set(0); ScbfUtil.dataFileOpens.set(0)
    val st = scan.estimateStatistics()
    assert(st.numRows.getAsLong == 1000L)
    assert(st.sizeInBytes.getAsLong ==
      scbfFiles(dir).map(f => f.getFileSystem(new Configuration()).getFileStatus(f).getLen).sum)
    // an unfiltered scan's row count needs only the dirsum head-read —
    // the manifest's per-file entries are never parsed
    assert(ScbfStats.summaryReads.get == 1 && ScbfStats.manifestReads.get == 0 &&
      ScbfStats.sidecarReads.get == 0,
      s"rows must come from ONE summary head-read, got " +
        s"summaries=${ScbfStats.summaryReads.get} manifests=${ScbfStats.manifestReads.get}")
    assert(ScbfUtil.dataFileOpens.get == 0, "statistics never open data files")
  }

  test("pushed filters shrink reported size and rows to the kept files") {
    val dir = tmpDir("scbf-stat-pruned")
    writeRanged(dir)
    val st = scanFor(dir, EqualTo("id", 500)).estimateStatistics()
    // one of four disjoint-range files survives: a quarter of the rows
    assert(st.numRows.getAsLong == 250L)
    val oneFile = scbfFiles(dir).map(
      f => f.getFileSystem(new Configuration()).getFileStatus(f).getLen)
    assert(st.sizeInBytes.getAsLong < oneFile.sum)
    assert(oneFile.contains(st.sizeInBytes.getAsLong))
  }

  test("missing stats fall back to headers while the missing set is small") {
    val dir = tmpDir("scbf-stat-nostats")
    writeRanged(dir)
    // wipe every stats artifact: manifest + sidecars (+ the discovery
    // log directory, hence recursive)
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    fs.listStatus(p).map(_.getPath).filter(_.getName.startsWith("."))
      .foreach(f => fs.delete(f, true))
    val st = scanFor(dir).estimateStatistics()
    assert(st.numRows.getAsLong == 1000L, "header fallback still reports rows")
    assert(st.sizeInBytes.isPresent)
  }

  test("columnStats reports folded min/max, HLL NDV and zero nulls") {
    val dir = tmpDir("scbf-colstats")
    writeRanged(dir) // 4 range files; manifest merges their NDV registers
    val cs = scanFor(dir).estimateStatistics().columnStats()
    val byName = cs.entrySet().iterator()
    var m = Map.empty[String, org.apache.spark.sql.connector.read.colstats.ColumnStatistics]
    while (byName.hasNext) { val e = byName.next(); m += e.getKey.describe() -> e.getValue }
    val id = m("id")
    assert(id.min.get() == Int.box(0) && id.max.get() == Int.box(999),
      s"id bounds ${id.min}..${id.max}")
    assert(id.nullCount.getAsLong == 0L)
    val ndv = id.distinctCount().getAsLong
    assert(math.abs(ndv - 1000L) <= 100L, s"HLL NDV $ndv should be ~1000 (±10%)")
    val score = m("score")
    assert(score.min.get() == Double.box(0.0) &&
      score.max.get() == Double.box(999 * 2.5), s"score bounds ${score.min}..${score.max}")
  }

  test("utf8 columns report avgLen/maxLen from the written length stats") {
    val dir = tmpDir("scbf-strlen")
    spark.range(0, 100)
      .select(col("id").cast("int").as("id"),
        // lengths 1..4 ("n0".."n99" → 2..3 chars plus one fixed): use
        // rpad for deterministic lengths: 90 rows of 10 bytes, 10 of 30
        when(col("id") < 90, rpad(lit("x"), 10, "x"))
          .otherwise(rpad(lit("y"), 30, "y")).as("s"))
      .repartitionByRange(2, col("id"))
      .write.format("scbf").mode("overwrite").save(dir)
    val cs = scanFor(dir).estimateStatistics().columnStats()
    val it = cs.entrySet().iterator()
    var m = Map.empty[String, org.apache.spark.sql.connector.read.colstats.ColumnStatistics]
    while (it.hasNext) { val e = it.next(); m += e.getKey.describe() -> e.getValue }
    val s = m("s")
    assert(s.avgLen.getAsLong == 12L, // (90*10 + 10*30)/100 = 12
      s"avgLen ${s.avgLen} should be 12")
    assert(s.maxLen.getAsLong == 30L, s"maxLen ${s.maxLen} should be 30")
    assert(!s.min().isPresent, "truncated utf8 bounds are not reported as min/max")
  }

  test("a file without stats withholds min/max but never breaks planning") {
    val dir = tmpDir("scbf-colstats-partial")
    writeRanged(dir)
    // wipe ONE file's manifest entry + sidecar by appending a file and
    // deleting every stats artifact, then rebuilding only some: simplest
    // honest shape — delete the manifest and one sidecar
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    fs.delete(ScbfStats.manifestPath(p), false)
    val victim = scbfFiles(dir).head
    fs.delete(ScbfStats.sidecarPath(victim), false)
    val cs = scanFor(dir).estimateStatistics().columnStats()
    val it = cs.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      assert(!e.getValue.min().isPresent,
        s"${e.getKey.describe()}: a stats-less kept file makes the min/max fold unsound")
    }
  }

  test("a streaming-ingested directory reports column stats too (NDV via epoch manifest merge)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val out = tmpDir("scbf-stream-colstats")
    val ckpt = tmpDir("scbf-stream-colstats-ckpt")
    val input = MemoryStream[(Int, Double)]
    val q = input.toDF().toDF("id", "score")
      .writeStream.format("scbf").option("checkpointLocation", ckpt).start(out)
    try {
      // epoch 0 merges the manifest immediately (ManifestEpochInterval
      // includes it), so sidecar NDV registers reach dirndv
      input.addData((0 until 500).map(i => (i, i * 1.5)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val cs = scanFor(out).estimateStatistics().columnStats()
    val it = cs.entrySet().iterator()
    var m = Map.empty[String, org.apache.spark.sql.connector.read.colstats.ColumnStatistics]
    while (it.hasNext) { val e = it.next(); m += e.getKey.describe() -> e.getValue }
    val id = m("id")
    assert(id.min.get() == Int.box(0) && id.max.get() == Int.box(499))
    val ndv = id.distinctCount()
    assert(ndv.isPresent && math.abs(ndv.getAsLong - 500L) <= 50,
      s"streaming-ingest NDV should be ~500, got $ndv")
  }

  test("CBO: column stats drive a selectivity-based broadcast flip") {
    val dimDir = tmpDir("scbf-cbo-dim")
    // UNCLUSTERED: every file spans the whole id range, so file pruning
    // cannot shrink the scan — only the CBO's filter-selectivity
    // estimate (from the reported min/max/NDV) can see that `id < 5`
    // keeps ~5 of 1000 rows
    // hash-valued score: zlib cannot flatten it, so the table's on-disk
    // size (what size-only estimation sees) stays honestly large
    // histogramBins=0: this test isolates the CBO path (min/max/NDV →
    // FilterEstimation). With a histogram present the SCAN's own
    // selectivity scaling would flip the join even with CBO off —
    // that stronger default-config behavior has its own test below.
    spark.range(0, 20000)
      .select(col("id").cast("int").as("id"),
        (abs(xxhash64(col("id"))) % 1000000 / 7.0).as("score"))
      .repartition(4)
      .write.format("scbf").option("histogramBins", "0")
      .mode("overwrite").save(dimDir)
    val factDir = tmpDir("scbf-cbo-fact")
    // histogram off here too: Catalyst PROPAGATES `id < 5` across the
    // equi-join as `fid < 5`, and a fact-side histogram would let the
    // scan-level estimator shrink (and broadcast) the fact side
    spark.range(0, 20000).select(col("id").cast("int").as("fid"))
      .repartition(2)
      .write.format("scbf").option("histogramBins", "0")
      .mode("overwrite").save(factDir)
    def totalSize(dir: String): Long = {
      val p = new Path(dir)
      val fs = p.getFileSystem(new Configuration())
      fs.listStatus(p).filter(f => f.getPath.getName.endsWith(".scbf") &&
        !f.getPath.getName.startsWith(".")).map(_.getLen).sum
    }
    // threshold well below either table's size: nothing broadcasts on
    // raw size, only a CBO selectivity estimate can get under it
    val dimTotal = math.min(totalSize(dimDir), totalSize(factDir)) / 2
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // below both tables' full sizes: nothing broadcasts on raw size
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (dimTotal - 1).toString)
      def plan(cbo: Boolean): String = {
        spark.conf.set("spark.sql.cbo.enabled", cbo.toString)
        val fact = spark.read.format("scbf").load(factDir)
        val dim = spark.read.format("scbf").load(dimDir).filter(col("id") < 5)
        fact.join(dim, fact("fid") === dim("id"))
          .queryExecution.sparkPlan.toString
      }
      assert(!plan(false).contains("BroadcastHashJoin"),
        "size-only estimation keeps the filtered dim at full size: no broadcast")
      assert(plan(true).contains("BroadcastHashJoin"),
        "CBO + reported column stats estimate ~5 surviving rows: broadcast")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
    }
  }

  test("CBO: the histogram flips a SKEWED-range broadcast decision min/max+NDV cannot") {
    // 99% of dim ids are 0..9; 1% spread over [10, ~1e6]. A filter
    // `id > 500000` truly keeps ~0.5% of the 1% tail, but WITHOUT a
    // histogram the estimator only has [min, max] + NDV and assumes
    // uniformity: (max−500000)/(max−min) ≈ 50% survive — three orders
    // of magnitude high, and NDV cannot correct a RANGE predicate.
    // The equi-height histogram puts ~31 of 32 bins at the hot values,
    // so the range holds well under one bin of mass → broadcast.
    def writeDim(dir: String, bins: Int): Unit =
      spark.range(0, 40000)
        .select(
          when(col("id") % 100 < 99, (col("id") % 10))
            .otherwise(col("id") * 25 % 1000000 + 10)
            .cast("int").as("id"),
          // hash-valued payload: zlib cannot flatten it, so on-disk
          // size (the size-only fallback) stays honestly large
          (abs(xxhash64(col("id"))) % 1000000 / 7.0).as("score"))
        .repartition(4) // UNCLUSTERED: file pruning cannot help
        .write.format("scbf").option("histogramBins", bins.toString)
        .mode("overwrite").save(dir)
    val histDir = tmpDir("scbf-cbo-hist")
    val noHistDir = tmpDir("scbf-cbo-nohist")
    writeDim(histDir, ScbfHistogram.DefaultBins)
    writeDim(noHistDir, 0) // same rows, histograms disabled at write
    val fact = spark.range(0, 40000).select(col("id").cast("int").as("fid"))
    val prev = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled", "spark.sql.cbo.enabled")
      .map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      // between the two estimates: uniform ≈ 20k rows × ~20 B ≈ 400 KB,
      // histogram ≈ ≤1 bin ≈ ≤625 rows ≈ ≤13 KB — and far below either
      // table's on-disk size, so raw size never broadcasts
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024).toString)
      def plan(dir: String): String = {
        val dim = spark.read.format("scbf").load(dir).filter(col("id") > 500000)
        fact.join(dim, fact("fid") === dim("id"))
          .queryExecution.sparkPlan.toString
      }
      assert(!plan(noHistDir).contains("BroadcastHashJoin"),
        "min/max+NDV alone assume uniformity over the skewed range: no broadcast")
      assert(plan(histDir).contains("BroadcastHashJoin"),
        "the equi-height histogram sees <1 bin of mass above the cut: broadcast")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("CBO: histograms correct a skewed JOIN-cardinality estimate NDV alone underestimates") {
    // both sides share a hot key (99% of rows = 0, tail spread over
    // ~1000 values). True join cardinality is dominated by the
    // hot×hot product (~0.99n × 0.99m); NDV-based estimation divides
    // n×m by max(ndv) — assuming uniform key frequency — and lands
    // orders of magnitude low. JoinEstimation's histogram path
    // (getOverlappedRanges) multiplies per-bin masses instead, so the
    // estimate recovers the hot-key product.
    def writeSide(dir: String, rows: Int, bins: Int): Unit =
      spark.range(0, rows)
        .select(when(col("id") % 100 < 99, 0)
          .otherwise(col("id") % 1000 + 1).cast("int").as("k"))
        .repartition(2)
        .write.format("scbf").option("histogramBins", bins.toString)
        .mode("overwrite").save(dir)
    val aH = tmpDir("scbf-jh-a"); val bH = tmpDir("scbf-jh-b")
    val aN = tmpDir("scbf-jn-a"); val bN = tmpDir("scbf-jn-b")
    writeSide(aH, 10000, ScbfHistogram.DefaultBins)
    writeSide(bH, 10000, ScbfHistogram.DefaultBins)
    writeSide(aN, 10000, 0)
    writeSide(bN, 10000, 0)
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      def estRows(da: String, db: String): BigInt = {
        val a = spark.read.format("scbf").load(da)
        val b = spark.read.format("scbf").load(db)
        a.join(b, a("k") === b("k")).queryExecution.optimizedPlan.stats
          .rowCount.getOrElse(BigInt(-1))
      }
      val withHist = estRows(aH, bH)
      val without = estRows(aN, bN)
      // truth ≈ 0.99² × 10k × 10k ≈ 9.8e7; NDV path ≈ 1e8/1001 ≈ 1e5
      assert(withHist > without * 5,
        s"histogram join estimate $withHist must exceed the uniform-NDV estimate $without by far")
      assert(withHist > BigInt(10000000L),
        s"histogram estimate $withHist should recover the hot-key product (~1e8)")
    } finally spark.conf.set("spark.sql.cbo.enabled", prevCbo)
  }

  test("a skewed STRING equality filter flips a join to broadcast that NDV+bounds cannot") {
    // lang is 95% 'en', ~4.9% mid-tail, 0.1% 'zzkw'. Catalyst has NO
    // string-histogram path: with CBO on, equality selectivity is
    // 1/NDV ≈ 1/7 — which leaves the filtered fact side far above the
    // broadcast threshold. The top-K summary knows 'zzkw' carries
    // ~0.1% of the mass, the scan's reported size shrinks accordingly,
    // and the join flips. File pruning can't do this either: every
    // file holds a few 'zzkw' rows, so nothing prunes.
    def writeFact(dir: String, topkK: Int): Unit =
      spark.range(0, 40000)
        .select(
          col("id").cast("int").as("fid"),
          when(col("id") % 1000 < 950, lit("en"))
            .when(col("id") % 1000 < 999,
              concat(lit("l"), (col("id") % 7).cast("string")))
            .otherwise(lit("zzkw")).as("lang"),
          // hash-valued payload: zlib cannot flatten it, so on-disk
          // size (the size-only fallback) stays honestly large
          abs(xxhash64(col("id"))).cast("string").as("payload"))
        .repartition(4) // UNCLUSTERED: every file holds every lang
        .write.format("scbf").option("topkK", topkK.toString)
        .mode("overwrite").save(dir)
    val topkDir = tmpDir("scbf-topk")
    val noTopkDir = tmpDir("scbf-notopk")
    writeFact(topkDir, ScbfStrTopK.DefaultK)
    writeFact(noTopkDir, 0) // same rows, summaries disabled at write
    val dim = spark.range(0, 40000).select(col("id").cast("int").as("did"))
    val prev = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled", "spark.sql.cbo.enabled")
      .map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      // NDV path estimates ~40000/7 ≈ 5700 rows ≈ hundreds of KB; the
      // summary path reports ~40 rows' worth of bytes — orders apart
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024).toString)
      def plan(dir: String, filter: org.apache.spark.sql.Column): String = {
        val fact = spark.read.format("scbf").load(dir).filter(filter)
        dim.join(fact, dim("did") === fact("fid"))
          .queryExecution.sparkPlan.toString
      }
      assert(!plan(noTopkDir, col("lang") === "zzkw").contains("BroadcastHashJoin"),
        "NDV+bounds alone say 1/ndv for every value: no broadcast")
      assert(plan(topkDir, col("lang") === "zzkw").contains("BroadcastHashJoin"),
        "the top-K summary knows 'zzkw' is 0.1% of the mass: broadcast")
      // the RANGE shape too: lang >= 'zz' keeps only the rare tail —
      // Catalyst makes no estimate at all for string ranges
      assert(!plan(noTopkDir, col("lang") >= "zz").contains("BroadcastHashJoin"),
        "string ranges have no Catalyst estimate: no broadcast")
      assert(plan(topkDir, col("lang") >= "zz").contains("BroadcastHashJoin"),
        "top-K mass above 'zz' is ~0.1%: broadcast")
      // and the hot value must NOT shrink: a 95% filter stays big
      assert(!plan(topkDir, col("lang") === "en").contains("BroadcastHashJoin"),
        "the hot value keeps 95% of the scan: must not broadcast")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("DEFAULT config (CBO off): a skewed numeric range flips to broadcast via scan-level selectivity") {
    // spark.sql.cbo.enabled is FALSE by default, so Catalyst's
    // FilterEstimation — the consumer of the DSv2 histogram — never
    // runs in a stock deployment and the r7 histogram flip needed CBO
    // on. The scan now folds the histogram's keep-fraction into its
    // OWN reported numRows/sizeInBytes, so the same skewed-range
    // filter flips the join with Spark untouched: 99% of ids are 0..9
    // (point bins), the 1% tail spreads to ~1e6, and `id > 500000`
    // truly keeps ~0.5% of the tail — the histogram sees <1 bin of
    // mass above the cut where size-only stats see the whole table.
    def writeDim(dir: String, bins: Int): Unit =
      spark.range(0, 40000)
        .select(
          when(col("id") % 100 < 99, (col("id") % 10))
            .otherwise(col("id") * 25 % 1000000 + 10)
            .cast("int").as("id"),
          (abs(xxhash64(col("id"))) % 1000000 / 7.0).as("score"))
        .repartition(4) // UNCLUSTERED: file pruning cannot help
        .write.format("scbf").option("histogramBins", bins.toString)
        .mode("overwrite").save(dir)
    val histDir = tmpDir("scbf-nocbo-hist")
    val noHistDir = tmpDir("scbf-nocbo-nohist")
    writeDim(histDir, ScbfHistogram.DefaultBins)
    writeDim(noHistDir, 0)
    val fact = spark.range(0, 40000).select(col("id").cast("int").as("fid"))
    val prev = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled", "spark.sql.cbo.enabled")
      .map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.cbo.enabled", "false") // THE DEFAULT
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024).toString)
      def plan(dir: String): String = {
        val dim = spark.read.format("scbf").load(dir).filter(col("id") > 500000)
        fact.join(dim, fact("fid") === dim("id"))
          .queryExecution.sparkPlan.toString
      }
      assert(!plan(noHistDir).contains("BroadcastHashJoin"),
        "without a histogram the scan reports full size: no broadcast")
      assert(plan(histDir).contains("BroadcastHashJoin"),
        "scan-level histogram selectivity must flip the join with CBO OFF")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("with CBO on, NON-top-K string equality defers to Catalyst (no squared selectivity)") {
    // the round-9 advice fix: for a value the top-K has exact
    // frequency evidence on, scan-level scaling beats Catalyst's
    // 1/NDV and stays on (the skew-flip test above). For a value
    // OUTSIDE the top-K our own estimate is itself ~1/NDV-shaped, so
    // scaling AND FilterEstimation's 1/NDV re-application would
    // compound to ~1/NDV² — the scan must defer those under
    // cbo.enabled and scale them with CBO off.
    val dir = tmpDir("scbf-stat-cbostr")
    // 32 hot values own the top-K deterministically; the probed value
    // 'v195' is a count-1 tail value, guaranteed outside the summary
    spark.range(0, 20000).select(
      col("id").cast("int").as("id"),
      when(col("id") % 100 < 90, concat(lit("hot"), (col("id") % 32).cast("string")))
        .otherwise(concat(lit("v"), col("id").cast("string"))).as("tag"))
      .repartition(4)
      // blooms off: they would (correctly) prune to the one file that
      // can hold 'v195' — sound FILE evidence, but this test isolates
      // the SELECTIVITY deferral, so remove the file-pruning signal
      .write.format("scbf").option("bloomMaxBytes", "0")
      .mode("overwrite").save(dir)
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    try {
      def rows(): Long = scanFor(dir, EqualTo("tag", "v195"))
        .estimateStatistics().numRows.getAsLong
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val off = rows()
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val on = rows()
      assert(off < 2000,
        s"CBO off: the scan's own residual/(ndv-K) estimate must shrink: $off")
      assert(on >= 19000,
        s"CBO on: a non-top-K equality must defer (unscaled rows), got $on")
    } finally spark.conf.set("spark.sql.cbo.enabled", prevCbo)
  }

  test("DEFAULT config: a utf8 date-band flips the join to broadcast; a whole-domain band does not") {
    // the scbf DATE-BAND shape at PLAN level: timestamps are utf8 in
    // the 3-type format, and `ts BETWEEN a AND b` desugars to a
    // same-column >=/< conjunction. The scan estimates it as ONE
    // prefix-key interval (exact top-K mass + histogram-interpolated
    // residual — ScbfStrTopK.selectivityInterval) and folds the
    // fraction into its reported size, so a 3-day band over a
    // year-long domain drops an UNPRUNABLE side (every file spans the
    // year) under the broadcast threshold with CBO OFF — the stock
    // deployment. Compact log-style `yyMMdd-HH` stamps: the whole
    // date sits inside the prefix key's ~6.5-byte effective
    // resolution (53-bit double mantissa), so daily bands resolve;
    // ISO `2024-01-10` spends the key on `2024-01-` and in-month
    // bands conservatively stay whole — pinned at estimate level in
    // ScbfStrTopKSpec.
    val dir = tmpDir("scbf-stat-dateband")
    spark.range(0, 40000).select(
      col("id").cast("int").as("fid"),
      concat(lit("24"),
        lpad(((col("id") % 360) / 30 + 1).cast("int").cast("string"), 2, "0"),
        lpad(((col("id") % 360) % 30 + 1).cast("int").cast("string"), 2, "0"),
        lit("-"), lpad((col("id") % 24).cast("string"), 2, "0")).as("ts"),
      // hash-valued payload: zlib cannot flatten it, so the size-only
      // fallback stays honestly large
      abs(xxhash64(col("id"))).cast("string").as("payload"))
      .repartition(4) // UNCLUSTERED: every file spans the whole year
      .write.format("scbf").mode("overwrite").save(dir)
    val other = spark.range(0, 40000).select(col("id").cast("int").as("oid"))
    val prev = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled", "spark.sql.cbo.enabled")
      .map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.cbo.enabled", "false") // THE DEFAULT
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024).toString)
      def plan(lo: String, hi: String): String = {
        val fact = spark.read.format("scbf").load(dir)
          .filter(col("ts") >= lo && col("ts") < hi)
        other.join(fact, other("oid") === fact("fid"))
          .queryExecution.sparkPlan.toString
      }
      assert(plan("240110", "240113").contains("BroadcastHashJoin"),
        "a 3-day band keeps ~0.8% of the year: the filtered side must broadcast")
      assert(!plan("240101", "250101").contains("BroadcastHashJoin"),
        "a whole-domain band keeps everything: must NOT broadcast")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("file pruning and histogram selectivity never double-count the same predicate") {
    // CLUSTERED table: `id >= 750` prunes to ~1 of 4 range files AND
    // the histogram estimates ~25% keep. Multiplying both (kept bytes
    // × keep-fraction) would report ~6% of the table for a filter that
    // truly keeps 25% — the broadcast-OOM direction. The two estimates
    // must combine by MIN against the pre-prune anchor, landing at
    // ~25% whichever is tighter.
    val dir = tmpDir("scbf-stat-nodouble")
    writeRanged(dir) // histograms on by default; 4 disjoint id ranges
    val st = scanFor(dir, GreaterThanOrEqual("id", 750)).estimateStatistics()
    val rows = st.numRows.getAsLong
    assert(rows >= 200 && rows <= 260,
      s"~250 of 1000 rows survive; double-counting would report ~63: $rows")
    val total = scbfFiles(dir).map(
      f => f.getFileSystem(new Configuration()).getFileStatus(f).getLen).sum
    val size = st.sizeInBytes.getAsLong
    assert(size >= (total * 0.18).toLong && size <= (total * 0.32).toLong,
      s"~a quarter of $total expected; double-counting would report ~6%: $size")
  }

  test("with CBO on, numeric predicates defer to FilterEstimation (no squared selectivity)") {
    // Catalyst's FilterEstimation re-applies residual-filter
    // selectivity from the reported column stats — for numerics it
    // consumes the very histogram the scan would use, so pre-scaling
    // the scan's own numRows/sizeInBytes too would SQUARE the
    // selectivity. Under cbo.enabled the scan must report unscaled
    // stats for numeric predicates (strings still scale: Catalyst has
    // no string-histogram path).
    val dir = tmpDir("scbf-stat-cbosq")
    spark.range(0, 40000) // tail values reach ~1e6: the filter keeps a sliver
      .select(
        when(col("id") % 100 < 99, (col("id") % 10))
          .otherwise(col("id") * 25 % 1000000 + 10)
          .cast("int").as("id"),
        (abs(xxhash64(col("id"))) % 1000000 / 7.0).as("score"))
      .repartition(4) // unclustered: no file pruning on id
      .write.format("scbf").mode("overwrite").save(dir)
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val off = scanFor(dir, GreaterThan("id", 500000))
        .estimateStatistics().numRows.getAsLong
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val on = scanFor(dir, GreaterThan("id", 500000))
        .estimateStatistics().numRows.getAsLong
      assert(off < 2000,
        s"CBO off: the scan's own histogram scaling must shrink the estimate: $off")
      assert(on == 40000,
        s"CBO on: the scan must report unscaled rows and let FilterEstimation scale: $on")
    } finally spark.conf.set("spark.sql.cbo.enabled", prevCbo)
  }

  test("a BETWEEN conjunction estimates one interval, not the product of its sides") {
    // uniform ids on an UNCLUSTERED layout (file pruning can't help):
    // 400k <= id < 600k truly keeps 20%; estimating each side at ~60%
    // and multiplying would report 36%, and a CONTRADICTORY band would
    // report 9% where the truth is zero
    val dir = tmpDir("scbf-stat-between")
    spark.range(0, 20000)
      .select((col("id") * 50).cast("int").as("id"), // 0..1e6
        (abs(xxhash64(col("id"))) % 1000000 / 7.0).as("score"))
      .repartition(4)
      .write.format("scbf").mode("overwrite").save(dir)
    val band = scanFor(dir,
      GreaterThanOrEqual("id", 400000), LessThan("id", 600000))
      .estimateStatistics().numRows.getAsLong
    assert(band >= 3200 && band <= 4800,
      s"~20% of 20000 expected; the per-side product would report ~36%: $band")
    val empty = scanFor(dir,
      GreaterThan("id", 700000), LessThan("id", 300000))
      .estimateStatistics().numRows.getAsLong
    assert(empty == 1,
      s"a contradictory band keeps nothing (floor 1); the product would report ~9%: $empty")
  }

  test("a STRING date-range conjunction estimates one interval too (utf8 timestamps)") {
    // SCBF's 3-type format stores timestamps as utf8, so the analytic
    // date band `day >= 'd040' AND day < 'd060'` is a STRING
    // conjunction — it must estimate ~20%, not the ~36% per-side
    // product, and its scan-reported rows shrink accordingly
    val dir = tmpDir("scbf-stat-strbetween")
    spark.range(0, 20000)
      .select(format_string("d%03d", col("id") % 100).as("day"),
        (abs(xxhash64(col("id"))) % 1000000 / 7.0).as("score"))
      .repartition(4)
      .write.format("scbf").option("topkK", "32")
      .mode("overwrite").save(dir)
    val band = scanFor(dir,
      GreaterThanOrEqual("day", "d040"), LessThan("day", "d060"))
      .estimateStatistics().numRows.getAsLong
    assert(band >= 2800 && band <= 5200,
      s"~20% of 20000 expected for the utf8 date band: $band")
    val empty = scanFor(dir,
      GreaterThan("day", "d070"), LessThan("day", "d030"))
      .estimateStatistics().numRows.getAsLong
    assert(empty <= 300,
      s"a contradictory utf8 band keeps ~nothing: $empty")
  }

  test("utf8 prefix-key histograms make skewed string RANGES bin-accurate (flat model can't)") {
    // high-cardinality strings (every value distinct — the top-K holds
    // 32 singletons and ~all mass is residual), 95% of them packed
    // into the 'b...' prefix and 5% spread uniformly over prefixes
    // c..z: a range filter src >= 'x' truly keeps 3/24 of the 5% tail
    // (~187 of 30000 rows, 0.6%). The FLAT residual model (min/max
    // interpolation) sees [b, z] as ONE uniform interval — the 95%
    // hot prefix inflates everything above 'x' to (z−x)/(z−b) ≈ 8% of
    // ALL rows (~13× over). The utf8 equi-height histogram
    // (prefix-key domain, the same dirhist machinery as numeric
    // columns) puts ~31 of 32 bins below the cut and lands within a
    // bin of truth.
    def write(dir: String, bins: Int): Unit =
      spark.range(0, 30000)
        .select(col("id").cast("int").as("id"),
          when(col("id") % 1000 < 950,
            concat(lit("b"), lpad(col("id").cast("string"), 8, "0")))
            .otherwise(concat(
              expr("char(99 + id % 24)"), // c..z, uniform
              col("id").cast("string"))).as("src"))
        .repartition(4)
        .write.format("scbf")
        .option("histogramBins", bins.toString)
        .mode("overwrite").save(dir)
    val histDir = tmpDir("scbf-strhist")
    val flatDir = tmpDir("scbf-strflat")
    write(histDir, ScbfHistogram.DefaultBins)
    write(flatDir, 0) // top-K still on; no histogram → flat bounds model
    val conf = new Configuration()
    def estimate(dir: String): Long = {
      val files = ScbfDataSource.resolveFiles(Seq(dir), conf)
      val b = new ScbfScanBuilder(
        spark.read.format("scbf").load(dir).schema, files, conf, Seq(dir))
      b.pushFilters(Array(org.apache.spark.sql.sources.GreaterThanOrEqual("src", "x")))
      b.build().asInstanceOf[ScbfScan].estimateStatistics().numRows.getAsLong
    }
    val truth = 30000L * 50 / 1000 * 3 / 24 // ~187 rows at prefixes x,y,z
    val flat = estimate(flatDir)
    val binned = estimate(histDir)
    assert(flat > 6 * truth,
      s"flat model must visibly over-keep the skewed range: $flat vs $truth")
    assert(binned < flat / 2,
      s"histogram must beat the flat model: $binned vs $flat")
    assert(binned >= truth / 4 && binned <= 8 * truth,
      s"histogram estimate must land within ~a bin of truth: $binned vs $truth")
  }

  test("histograms ride sidecar + manifest and histogramBins=0 disables them") {
    val dir = tmpDir("scbf-hist-plumbing")
    writeRanged(dir)
    val conf = new Configuration()
    val md = ScbfStats.readManifestFull(new Path(dir), conf)
    assert(md.hist.contains("id") && md.hist.contains("score"),
      s"manifest must carry merged dirhist lines, got ${md.hist.keySet}")
    val h = md.hist("id")
    assert(h.bins.head.lo == 0.0 && h.bins.last.hi == 999.0)
    assert(math.abs(h.rows - 1000.0) < 1.0, s"dirhist mass ${h.rows} ≠ 1000")
    // per-file sidecars carry their own exact histogram
    val side = ScbfStats.read(scbfFiles(dir).head, conf).get
    assert(side.hists.contains("id"), "sidecar must carry hist lines")
    // and the write option disables collection entirely
    val off = tmpDir("scbf-hist-off")
    spark.range(0, 100).select(col("id").cast("int").as("id"))
      .write.format("scbf").option("histogramBins", "0").mode("overwrite").save(off)
    val mdOff = ScbfStats.readManifestFull(new Path(off), conf)
    assert(mdOff.hist.isEmpty, "histogramBins=0 must write no histograms")
    assert(ScbfStats.read(scbfFiles(off).head, conf).get.hists.isEmpty)
  }

  test("a stats-pruned dimension becomes broadcast-able") {
    val dir = tmpDir("scbf-stat-bcast")
    writeRanged(dir)
    val total = scbfFiles(dir).map(
      f => f.getFileSystem(new Configuration()).getFileStatus(f).getLen).sum
    val fact = spark.range(0, 10000)
      .select(col("id").cast("int").as("fid"))
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // threshold below the full table but above one file: only the
      // PRUNED scan's reported size admits a broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (total - 1).toString)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val dim = spark.read.format("scbf").load(dir)
      def joinPlan(d: org.apache.spark.sql.DataFrame): String =
        fact.join(d, fact("fid") === d("id")).queryExecution.sparkPlan.toString
      assert(!joinPlan(dim).contains("BroadcastHashJoin"),
        "unfiltered dim reports full size: no broadcast")
      assert(joinPlan(dim.filter(col("id") < 250)).contains("BroadcastHashJoin"),
        "stats-pruned dim reports one file's size: broadcast")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
