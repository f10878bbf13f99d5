package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** ScbfMaintenance.cluster: the OPTIMIZE step — rewrite a directory
 * range-partitioned on given columns so stats-based pruning bites. */
class ScbfMaintenanceSpec extends AnyFunSuite with SparkTestBase {

  private def scbfFiles(dir: String): Seq[Path] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    fs.listStatus(p).toSeq.map(_.getPath)
      .filter(x => x.getName.endsWith(".scbf") && !x.getName.startsWith("."))
  }

  private def plannedIn(dir: String, filters: org.apache.spark.sql.sources.Filter*): Int = {
    val conf = new Configuration()
    val files = ScbfDataSource.resolveFiles(Seq(dir), conf)
    val b = new ScbfScanBuilder(
      spark.read.format("scbf").load(dir).schema, files, conf)
    b.pushFilters(filters.toArray)
    b.build().asInstanceOf[ScbfScan].planInputPartitions().length
  }

  test("clustering an unclustered directory compacts files and enables pruning") {
    val dir = tmpDir("scbf-maint")
    // 16 files, each spanning the WHOLE id range: nothing can prune
    spark.range(0, 1000)
      .select(col("id").cast("int").as("id"),
        concat(lit("src_"), (col("id") % 4).cast("int")).as("source"))
      .repartition(16) // round-robin: every file spans everything
      .write.format("scbf").mode("overwrite").save(dir)
    assert(scbfFiles(dir).size == 16)
    // drop the bloom sidecars for this assertion: blooms DO prune point
    // lookups on unclustered layouts now (BloomSkipSpec covers that);
    // here we pin that INTERVAL stats alone are powerless pre-cluster
    val p0 = new Path(dir)
    val fs0 = p0.getFileSystem(new Configuration())
    fs0.listStatus(p0).filter(_.getPath.getName.endsWith(".bloom"))
      .foreach(f => fs0.delete(f.getPath, false))
    assert(plannedIn(dir, EqualTo("id", 500)) == 16,
      "unclustered: no interval pruning")

    ScbfMaintenance.cluster(spark, dir, Seq("id"), 4)
    assert(scbfFiles(dir).size == 4, "compacted 16 → 4")
    assert(plannedIn(dir, EqualTo("id", 500)) == 1, "clustered: point lookup → 1 file")
    // contents byte-identical as a multiset
    val got = spark.read.format("scbf").load(dir)
      .collect().map(r => (r.getInt(0), r.getString(1))).sorted
    assert(got.toSeq == (0 until 1000).map(i => (i, s"src_${i % 4}")))
    // the rewrite's manifest is fresh: one stats read plans the scan
    ScbfStats.manifestReads.set(0); ScbfStats.sidecarReads.set(0)
    assert(plannedIn(dir, EqualTo("id", 999)) == 1)
    assert(ScbfStats.manifestReads.get == 1 && ScbfStats.sidecarReads.get == 0)
  }

  test("clustering on a string column serves the curation-filter layout") {
    val dir = tmpDir("scbf-maint-str")
    spark.range(0, 1000)
      .select(col("id").cast("int").as("id"),
        concat(lit("src_"), (col("id") % 4).cast("int")).as("source"))
      .repartition(8)
      .write.format("scbf").mode("overwrite").save(dir)
    assert(plannedIn(dir, EqualTo("source", "src_2")) == 8)
    ScbfMaintenance.cluster(spark, dir, Seq("source"), 4)
    assert(plannedIn(dir, EqualTo("source", "src_2")) == 1)
    assert(spark.read.format("scbf").load(dir)
      .filter(col("source") === "src_2").count() == 250)
  }

  test("clustering a streaming-ingest directory compacts epoch litter") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val out = tmpDir("scbf-maint-sink")
    val ckpt = tmpDir("scbf-maint-ck")
    val input = MemoryStream[Int]
    def run(lo: Int, hi: Int): Unit = {
      val q = input.toDF()
        .select(col("value").cast("int").as("id"))
        .coalesce(1)
        .writeStream.format("scbf").option("checkpointLocation", ckpt).start(out)
      try { input.addData(lo until hi: _*); q.processAllAvailable() } finally q.stop()
    }
    run(0, 100); run(100, 200); run(200, 300)
    assert(scbfFiles(out).size == 3, "three epochs → three files")
    ScbfMaintenance.cluster(spark, out, Seq("id"), 2)
    assert(scbfFiles(out).size == 2)
    assert(spark.read.format("scbf").load(out)
      .collect().map(_.getInt(0)).sorted.toSeq == (0 until 300))
    assert(plannedIn(out, EqualTo("id", 10)) == 1)
  }

  test("top-k and aggregate pushdown bite after clustering") {
    val dir = tmpDir("scbf-maint-topk")
    spark.range(0, 1000)
      .select(col("id").cast("int").as("id"))
      .repartition(8)
      .write.format("scbf").mode("overwrite").save(dir)
    ScbfMaintenance.cluster(spark, dir, Seq("id"), 4)
    val q = spark.read.format("scbf").load(dir).orderBy(col("id")).limit(3)
    ScbfUtil.dataFileOpens.set(0)
    assert(q.collect().map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    assert(ScbfUtil.dataFileOpens.get == 1)
    val agg = spark.read.format("scbf").load(dir)
      .agg(count(lit(1)), min(col("id")), max(col("id")), sum(col("id")))
    ScbfUtil.dataFileOpens.set(0)
    assert(agg.head() == org.apache.spark.sql.Row(1000L, 0, 999, 499500L))
    assert(ScbfUtil.dataFileOpens.get == 0, "rewritten stats answer the aggregate")
  }

  test("zorder makes EVERY listed dimension prunable; hierarchical cluster only the first") {
    // a 64×64 grid: x = id % 64, y = id / 64 — the two-dimensional
    // workload (e.g. (source, time) or (length, quality)) where
    // hierarchical range clustering serves only its leading column
    def writeGrid(dir: String): Unit =
      spark.range(0, 4096)
        .select(col("id").cast("int").as("id"),
          (col("id") % 64).cast("int").as("x"),
          (col("id") / 64).cast("int").as("y"))
        .repartition(16)
        .write.format("scbf").mode("overwrite").save(dir)

    // range-only planning: strip blooms so the assertion isolates the
    // interval-stats geometry the rewrite exists to shape (blooms
    // prune point lookups on ANY layout and would blur the contrast)
    def plannedRangeOnly(dir: String, f: org.apache.spark.sql.sources.Filter): Int = {
      val p = new Path(dir)
      val fs = p.getFileSystem(new Configuration())
      fs.listStatus(p).filter(_.getPath.getName.endsWith(".bloom"))
        .foreach(x => fs.delete(x.getPath, false))
      plannedIn(dir, f)
    }

    val hier = tmpDir("scbf-zorder-hier")
    writeGrid(hier)
    ScbfMaintenance.cluster(spark, hier, Seq("x", "y"), 16)
    // leading column prunes; the second column cannot (each file is a
    // narrow x-slab spanning ALL y)
    assert(plannedRangeOnly(hier, EqualTo("x", 32)) <= 2)
    assert(plannedRangeOnly(hier, EqualTo("y", 32)) == 16,
      "hierarchical clustering leaves the second dimension unprunable")

    val zdir = tmpDir("scbf-zorder")
    writeGrid(zdir)
    ScbfMaintenance.zorder(spark, zdir, Seq("x", "y"), 64)
    assert(scbfFiles(zdir).size == 64)
    // z-curve locality: an equality on EITHER dimension intersects
    // ~sqrt(64) = 8 of 64 files' bounding boxes in the ideal aligned
    // case; sampled range boundaries bleed boxes, so allow 2× ideal —
    // the contrast that matters is vs hierarchical's 100%
    val px = plannedRangeOnly(zdir, EqualTo("x", 32))
    val py = plannedRangeOnly(zdir, EqualTo("y", 32))
    assert(px <= 16 && py <= 16, s"z-order should prune both dims: x=$px y=$py of 64")
    // contents survive the rewrite exactly
    assert(spark.read.format("scbf").load(zdir)
      .collect().map(_.getInt(0)).sorted.toSeq == (0 until 4096))
    // and the planned subset returns the exact slice
    assert(spark.read.format("scbf").load(zdir).filter(col("y") === 32)
      .collect().map(_.getInt(1)).sorted.toSeq == (0 until 64))
  }

  test("zorderTable sweeps every partition directory; both dimensions prune per partition") {
    import spark.implicits._
    val dir = tmpDir("scbf-ztab")
    (0 until 2000).map(i => (i, i * 37 % 1000, s"g${i % 2}", i * 0.5))
      .toDF("x", "y", "grp", "v")
      .write.format("scbf").partitionBy("grp").mode("overwrite").save(dir)
    val before = spark.read.format("scbf").load(dir)
      .agg(sum("x"), count(lit(1))).head()
    val parts = ScbfMaintenance.zorderTable(spark, dir, Seq("x", "y"), 4)
    assert(parts.size == 2, s"got $parts")
    // every partition got its own z-ordered 4-file layout, and a point
    // predicate on EITHER dimension prunes within the partition
    Seq("grp=g0", "grp=g1").foreach { sub =>
      val p = s"$dir/$sub"
      assert(scbfFiles(p).size == 4, s"$sub: ${scbfFiles(p)}")
      assert(plannedIn(p, EqualTo("x", 3)) < 4, s"$sub: x did not prune")
      assert(plannedIn(p, EqualTo("y", 111)) < 4, s"$sub: y did not prune")
    }
    assert(spark.read.format("scbf").load(dir)
      .agg(sum("x"), count(lit(1))).head() == before)
  }

  test("cluster and zorder return exactly the folded-in file names") {
    // sweepPartitions' root-log rewrite marks are built from this
    // return value — it must be the rewrite's OWN snapshot (the files
    // it actually replaced), not a separate listing that could miss a
    // concurrent append
    import spark.implicits._
    val dir = tmpDir("scbf-maint-ret")
    (0 until 400).map(i => (i, i * 31 % 100, i * 0.5)).toDF("x", "y", "v")
      .repartition(5)
      .write.format("scbf").mode("overwrite").save(dir)
    val before = scbfFiles(dir).map(_.getName).toSet
    val replaced = ScbfMaintenance.cluster(spark, dir, Seq("x"), 2)
    assert(replaced.toSet == before, s"$replaced vs $before")
    val before2 = scbfFiles(dir).map(_.getName).toSet
    val replaced2 = ScbfMaintenance.zorder(spark, dir, Seq("x", "y"), 2, bits = 4)
    assert(replaced2.toSet == before2, s"$replaced2 vs $before2")
  }

  test("a failing partition surfaces its ORIGINAL error only after every parallel attempt finished") {
    // propagating mid-sweep would hand control back while queued
    // rewrites keep running in the background — an immediate retry
    // (the documented recovery) would race them. Every other
    // partition's attempt must have completed by the time the caller
    // sees the failure, and the cause arrives unwrapped.
    import spark.implicits._
    val dir = tmpDir("scbf-maint-fail")
    (0 until 800).map(i => (i, s"g${i % 4}", i * 0.5)).toDF("x", "grp", "v")
      .repartition(3)
      .write.format("scbf").partitionBy("grp").mode("overwrite").save(dir)
    val boom = new java.util.concurrent.atomic.AtomicInteger(0)
    ScbfMaintenance.raceHook = () =>
      if (boom.incrementAndGet() == 2) throw new IllegalStateException("boom")
    try {
      val e = intercept[IllegalStateException] {
        ScbfMaintenance.clusterTable(spark, dir, Seq("x"), 2, parallelism = 4)
      }
      assert(e.getMessage == "boom", "the cause must surface unwrapped")
      // all four attempts ran: three clustered to 2 files, one aborted
      // pre-rewrite and kept its ingest layout — and nothing is still
      // rewriting in the background (file counts are stable)
      val counts = Seq("g0", "g1", "g2", "g3")
        .map(g => scbfFiles(s"$dir/grp=$g").size)
      assert(counts.count(_ == 2) == 3 && counts.count(_ == 3) == 1,
        s"per-partition file counts after failed sweep: $counts")
      // the failed partition's data is intact; a re-run completes it
      assert(spark.read.format("scbf").load(dir).count() == 800)
      ScbfMaintenance.clusterTable(spark, dir, Seq("x"), 2, parallelism = 4)
      assert(Seq("g0", "g1", "g2", "g3")
        .forall(g => scbfFiles(s"$dir/grp=$g").size == 2))
      assert(spark.read.format("scbf").load(dir).count() == 800)
    } finally ScbfMaintenance.raceHook = () => ()
  }

  test("vacuum sweeps aged temps and orphan sidecars; live files untouched") {
    val dir = tmpDir("scbf-maint-vac")
    spark.range(0, 100)
      .select(col("id").cast("int").as("id"))
      .repartition(2)
      .write.format("scbf").mode("overwrite").save(dir)
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    // plant the litter a crashed attempt / out-of-band delete leaves:
    // a staged temp, an orphan stats sidecar, an orphan bloom
    def plant(name: String): Path = {
      val f = new Path(dir, name)
      val out = fs.create(f, true); out.write(1); out.close(); f
    }
    val temp = plant(".part-99999-0-dead-000.scbf.deadbeef.tmp")
    val orphanStats = plant(".gone-file.scbf.stats")
    val orphanBloom = plant(".gone-file.scbf.bloom")
    val before = scbfFiles(dir)
    assert(before.size == 2)
    // horizon in the future → everything aged; live data+sidecars stay
    val (temps, orphans) = ScbfMaintenance.vacuum(spark, dir, olderThanMs = -60000)
    assert(temps == 1, s"swept $temps temps")
    assert(orphans == 2, s"swept $orphans orphans")
    assert(!fs.exists(temp) && !fs.exists(orphanStats) && !fs.exists(orphanBloom))
    assert(scbfFiles(dir).toSet == before.toSet, "live data untouched")
    before.foreach { f =>
      assert(fs.exists(ScbfStats.sidecarPath(f)), "live sidecars untouched")
      assert(fs.exists(ScbfBloom.bloomPath(f)), "live blooms untouched")
    }
    assert(spark.read.format("scbf").load(dir)
      .collect().map(_.getInt(0)).sorted.toSeq == (0 until 100))
    // a fresh temp (younger than a sane horizon) survives
    val fresh = plant(".part-88888-0-live-000.scbf.cafebabe.tmp")
    val (t2, o2) = ScbfMaintenance.vacuum(spark, dir) // default 24 h horizon
    assert(t2 == 0 && o2 == 0)
    assert(fs.exists(fresh), "in-flight temp inside the horizon survives")
  }
}
