package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the full query surface on SPARK_GRAFT_SF_DIR and
 * prints one JSON line {"metric":...,"queries":{...}}. Each query is
 * materialized through the noop sink so every output column is computed
 * (count() would let Spark prune the work under measurement). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
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

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val failed =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); false }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          true
        }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-22s $sec%8.3f s${if (failed) "  FAILED" else ""}")
      (name, sec, failed)
    }
    // failed queries emit null, not a number: a numeric value (even a
    // negative sentinel) would silently poison per-query min/sum tooling
    // downstream — the "failed" list carries the signal
    val qs = results.map { case (k, v, fl) =>
      "\"" + k + "\":" + (if (fl) "null" else f"$v%.3f")
    }.mkString("{", ",", "}")
    val failedNames = results.collect { case (k, _, true) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, false) => v }.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedNames,"sf":"$sfDir"}""")
    spark.stop()
  }
}
