package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for every SparkEntry query (or a named
 * subset) to <outDir>/<query>_<tag>.txt — the optimization-round
 * evidence artifact (plans/r15 before/after files). Runs with
 * the Bench session config so the captured plans are the ones the
 * bench actually executes. Queries run in Bench order (staged pair
 * owners first) because some queries consume staged pipelines.
 * Usage: Test/runMain graft.tools.PlanDump <outDir> <tag> [sfDir] [q ...]
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args.drop(3).toSet) else None
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
    new java.io.File(outDir).mkdirs()
    val owners = Seq("d2_minhash_lsh", "d10_simhash_neardup", "d8_embed_neardup",
      "d5_ann_bruteforce", "d6_ann_lsh", "d11_ann_ivf")
      .filter(graft.SparkEntry.queries.contains)
    val names = owners ++
      graft.SparkEntry.queries.keySet.toSeq.sorted.filterNot(owners.contains)
    names.filter(n => only.forall(_.contains(n))).foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(s"$outDir/${name}_$tag.txt", "UTF-8")
        try w.println(plan) finally w.close()
        println(s"[plandump] $name -> $outDir/${name}_$tag.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
