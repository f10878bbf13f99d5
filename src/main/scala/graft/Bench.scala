package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the full query surface on SPARK_GRAFT_SF_DIR and
 * prints one JSON line {"metric":...,"queries":{...}}. Each query is
 * materialized through the noop sink so every output column is computed
 * (count() would let Spark prune the work under measurement).
 *
 * Per-query times are the BEST OF `SPARK_GRAFT_BENCH_REPS` (default 3)
 * full passes over the surface, measured in-process: single-shot
 * driver runs under machine load produced ~1.8× inflated totals and
 * phantom per-query regressions two rounds straight, and the min is
 * the standard load-noise filter (the quiet-box 3× protocol, folded
 * into the binary). Whole ROUNDS alternate — never the same query
 * back-to-back — and the staged pair graphs are cleared between
 * rounds, so in every round the first consumer re-pays each graph's
 * materialization exactly once, the same cost profile as a single
 * pipeline run. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      // testdata parquet files are ~10-40MB; the 128MB default would scan
      // each table in one task on a 32-core machine
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM/codegen/file-listing paths outside the measurement —
    // every table family the queries read, so no query pays first-touch
    // footer/listing IO inside its measured window.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("lineitem", "nation", "documents", "embeddings", "events")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())

    // BOX-SPEED PROBE (VERDICT r12 item 7): a tiny FIXED workload —
    // CTAS-shaped 10⁵-row scbf write + full scan + aggregate — timed
    // with every sweep, so floor ratios can be box-normalized
    // mechanically (ratio × probe_ref/probe_now) instead of argued
    // from ratio-distribution uniformity. Runs after the warm-up
    // (JVM/codegen warm, like every measured query), best of 3.
    def boxProbe(): Double = {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-boxprobe")
        .toString
      val probe = (1 to 3).map { _ =>
        val sub = s"$dir/t${System.nanoTime()}"
        val t0 = System.nanoTime()
        spark.range(100000).select(
            org.apache.spark.sql.functions.col("id").cast("int").as("k"),
            (org.apache.spark.sql.functions.col("id") % 97).cast("double").as("v"),
            org.apache.spark.sql.functions.concat(
              org.apache.spark.sql.functions.lit("row-"),
              org.apache.spark.sql.functions.col("id")).as("s"))
          .write.format("scbf").mode("overwrite").save(sub)
        spark.read.format("scbf").load(sub)
          .agg(org.apache.spark.sql.functions.sum("v"),
            org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      try {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(dir)).deleteRecursively()
      } catch { case scala.util.control.NonFatal(_) => () }
      probe
    }
    val probeSec = boxProbe()
    System.err.println(f"[bench] box_probe $probeSec%.3f s")

    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // load guard (the round-6 ±15% lesson): record the 1-minute system
    // load at each rep boundary so a comparator can SEE whether a rep
    // ran on a contended box instead of inferring it from swing. The
    // floors protocol (BENCH_NOTES) only trusts reps whose starting
    // load is below the core count.
    def loadAvg(): Double =
      try {
        val src = scala.io.Source.fromFile("/proc/loadavg")
        try src.getLines().next().split(" ")(0).toDouble finally src.close()
      } catch { case scala.util.control.NonFatal(_) => -1.0 }
    val repLoads = scala.collection.mutable.ArrayBuffer.empty[Double]
    // quiet-box gate (VERDICT r7 item 7): the RECORDED artifact should
    // come from a load-checked run, not rely on the min-of-reps filter
    // alone — so before the first rep, wait (bounded) for the 1-minute
    // load to fall under the threshold. Transient contention (a CI
    // step draining, a concurrent build) rides out inside the budget;
    // a genuinely busy box proceeds after the cap with the elevated
    // rep_load values recording the fact.
    val quietBar = sys.env.getOrElse("SPARK_GRAFT_BENCH_QUIET_LOAD", "2.0").toDouble
    val quietCapS = sys.env.getOrElse("SPARK_GRAFT_BENCH_QUIET_WAIT_S", "120").toInt
    // invoked before EVERY rep, not just the first (the round-8 lesson:
    // rep 2 started at load 8.2 and contaminated the artifact despite a
    // clean first rep) — each rep's bounded wait is recorded so the
    // artifact shows whether the gate exhausted
    def waitQuiet(): Double = {
      val waitStart = System.nanoTime()
      while (loadAvg() > quietBar &&
          (System.nanoTime() - waitStart) / 1e9 < quietCapS) {
        System.err.println(f"[bench] waiting for quiet box: load=${loadAvg()}%.2f > $quietBar%.1f")
        Thread.sleep(5000)
      }
      (System.nanoTime() - waitStart) / 1e9
    }
    // pair-graph OWNERS run first in every round so each pair query is
    // attributed its own pipeline's materialization and the downstream
    // consumers (d13/d15/d18) show only their incremental cost — under
    // plain alphabetical order d15/d18 precede d2/d8 and would absorb
    // the upstream pair generation into their numbers
    // intersect with the live query surface: a renamed/removed owner
    // must not kill the whole bench with NoSuchElementException
    val owners = Seq("d2_minhash_lsh", "d10_simhash_neardup", "d8_embed_neardup",
      "d5_ann_bruteforce", "d6_ann_lsh", "d11_ann_ivf")
      .filter(SparkEntry.queries.contains)
    val names = owners ++
      SparkEntry.queries.keySet.toSeq.sorted.filterNot(owners.contains)
    val best = scala.collection.mutable.Map.empty[String, Double]
    // per-rep per-query wall times (null for a failed run): with these
    // in the artifact, a contaminated rep is discountable from the
    // file alone — recompute any filter (min, median, drop-rep-k)
    // without re-running the bench
    val perRep = scala.collection.mutable.Map.empty[String, Array[Option[Double]]]
    val repWaits = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (rep <- 1 to reps) {
      repWaits += waitQuiet()
      repLoads += loadAvg()
      // every round re-pays each staged pair graph once (first consumer)
      graft.operators.Ops.stagedClear()
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        val failed =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); false }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed (rep $rep): ${e.getMessage}")
            true
          }
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] rep $rep $name%-22s $sec%8.3f s${if (failed) "  FAILED" else ""}")
        val slot = perRep.getOrElseUpdate(name, Array.fill[Option[Double]](reps)(None))
        if (!failed) {
          slot(rep - 1) = Some(sec)
          best(name) = math.min(best.getOrElse(name, Double.MaxValue), sec)
        }
      }
    }
    // queries that never succeeded emit null, not a number: a numeric
    // value (even a negative sentinel) would silently poison per-query
    // min/sum tooling downstream — the "failed" list carries the signal
    val qs = names.map { k =>
      "\"" + k + "\":" + best.get(k).fold("null")(v => f"$v%.3f")
    }.mkString("{", ",", "}")
    val reptimes = names.map { k =>
      "\"" + k + "\":" + perRep.get(k).fold("[]")(
        _.map(_.fold("null")(v => f"$v%.3f")).mkString("[", ",", "]"))
    }.mkString("{", ",", "}")
    val failedNames = names.filterNot(best.contains).map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val total = best.values.sum
    val loads = repLoads.map(l => f"$l%.2f").mkString("[", ",", "]")
    val waits = repWaits.map(w => f"$w%.1f").mkString("[", ",", "]")
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","box_probe":$probeSec%.3f,"queries":$qs,"rep_times":$reptimes,"failed":$failedNames,"sf":"$sfDir","reps":$reps,"rep_load":$loads,"rep_quiet_wait_s":$waits,"quiet_wait_s":${repWaits.sum}%.1f}"""
    // TRUNCATION-PROOF artifact (VERDICT r12 item 6): the round driver
    // captures only a bounded TAIL of this process's output, and the
    // full line (109 queries × rep_times) overflows it — r12's
    // artifact carried `parsed: null` and cost a re-measurement to
    // adjudicate. Three mitigations: the complete line is written to
    // BENCH_SELF.json (committed per round; BENCH_NOTES points at
    // it), printed in full FIRST for any head-surviving capture, and
    // the LAST stdout line is a SHORT complete summary (metric,
    // total, box_probe, failures — no per-query map) sized to survive
    // a 2000-char tail capture intact.
    val selfPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_SELF", "BENCH_SELF.json")
    try {
      val w = new java.io.PrintWriter(selfPath, "UTF-8")
      try w.println(line) finally w.close()
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not write $selfPath: ${e.getMessage}")
    }
    println(line)
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","box_probe":$probeSec%.3f,"failed":$failedNames,"sf":"$sfDir","reps":$reps,"rep_load":$loads,"rep_quiet_wait_s":$waits,"full_results":"$selfPath"}""")
    spark.stop()
  }
}
