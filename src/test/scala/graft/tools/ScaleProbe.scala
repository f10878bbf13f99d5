package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scaling probe for the heavy query set: measures each query
 * self-contained (staged relations cleared before every run, so every
 * run pays its own full pipeline) at the base SF and at a derived
 * FACTOR× corpus, and prints the per-query scaling ratio. The plan-
 * shape arguments (staged graphs, salted top-k, skew-proof aggregates,
 * bounded-fanout joins) predict ≲FACTOR× time at FACTOR× data; this is
 * the measurement behind that claim in BENCH_NOTES.md.
 *
 * The scaled fixture is DERIVED from the driver-generated sf0.1
 * parquet (never hand-synthesized distributions): each of FACTOR
 * copies shifts doc ids into a disjoint range and prefixes EVERY token
 * with a copy tag, so each copy keeps the original's internal
 * duplicate/near-duplicate structure while sharing zero shingles,
 * chunks, or spans across copies — corpus work scales linearly by
 * construction, which is exactly what the probe is supposed to verify
 * the PLANS do too. Orders (q34's input) scale by key-shifted plain
 * copies: window-frame work has no cross-row content coupling.
 *
 * Usage: Test/runMain graft.tools.ScaleProbe [baseSfDir] [factor] [reps]
 * Writes the fixture under /tmp/graft_scale<factor> once (reused).
 */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val reps = if (args.length > 2) args(2).toInt else 3
    val scaledDir = s"/tmp/graft_scale$factor"
    val heavy = Seq("d2_minhash_lsh", "d4_ngram_jaccard", "d13_dedup_clusters",
      "d16_dup_spans", "d17_span_dedup", "d22_winnowed_spans",
      "q34_scalable_frames", "t14_mixture_sample")

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!new java.io.File(s"$scaledDir/documents.parquet").exists()) {
      val docs = spark.read.parquet(s"$base/documents.parquet")
      (0 until factor).map { i =>
        docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          concat_ws(" ", transform(split(col("text"), " "),
            x => concat(lit(s"c${i}_"), x))).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite").parquet(s"$scaledDir/documents.parquet")
      val orders = spark.read.parquet(s"$base/orders.parquet")
      (0 until factor).map { i =>
        orders.withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L))
      }.reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite").parquet(s"$scaledDir/orders.parquet")
      println(s"[scale] fixture written to $scaledDir")
    }

    def bestOf(name: String, dir: String): Double =
      (1 to reps).map { _ =>
        graft.operators.Ops.stagedClear() // self-contained: pay the full pipeline
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min

    // warm both inputs outside measurement
    Seq(base, scaledDir).foreach { d =>
      spark.read.parquet(s"$d/documents.parquet").count()
      spark.read.parquet(s"$d/orders.parquet").count()
    }
    println(f"[scale] query,base_s,scaled_s,ratio (factor=$factor, best of $reps)")
    heavy.foreach { q =>
      val b = bestOf(q, base)
      val sc = bestOf(q, scaledDir)
      println(f"[scale] $q%-22s ${b}%8.3f ${sc}%8.3f ${sc / b}%6.2f")
    }
    spark.stop()
  }
}
