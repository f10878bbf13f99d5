package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-time single-query timer: runs one SparkEntry query N times against
 * a chosen SF dir, printing per-iteration wall times — for isolating one
 * operator's cost/variance outside the full Bench sweep.
 * Usage: Test/runMain graft.tools.TimeQuery <name> [sfDir] [iters] [clear] [k=v ...]
 * A 4th arg `clear` drops the staged pair-graph cache between
 * iterations, so every iteration re-pays its pipeline's staging —
 * the Bench cost profile rather than the warm-consumer one.
 * Trailing `k=v` args become session-conf settings (e.g.
 * graft.span.hash=xxhash64 for knob A/Bs). */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 3
    val clearStaged = args.length > 3 && args(3) == "clear"
    val confs = args.drop(3).filter(_.contains("="))
      .map { a => val Array(k, v) = a.split("=", 2); (k, v) }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    confs.foreach { case (k, v) => spark.conf.set(k, v); println(s"[time] conf $k=$v") }
    spark.read.parquet(s"$sfDir/documents.parquet").count() // warm
    (1 to iters).foreach { i =>
      if (clearStaged) graft.operators.Ops.stagedClear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[time] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
