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
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"rep_times":$reptimes,"failed":$failedNames,"sf":"$sfDir","reps":$reps,"rep_load":$loads,"rep_quiet_wait_s":$waits,"quiet_wait_s":${repWaits.sum}%.1f}""")
    spark.stop()
  }
}
