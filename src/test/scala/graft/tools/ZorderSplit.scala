package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off q42 cost attribution (VERDICT r5 item 8): time the zorder
 * rewrite's two jobs — the multi-column approxQuantile pass and the
 * bucket/interleave/range-partition rewrite — separately, on the same
 * fixture q42 builds at bench SF. Recorded in BENCH_NOTES.md. */
object ZorderSplit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/tmp/zorder_split_fixture"
    val t0 = System.nanoTime()
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("int").as("doc_id"), col("source"),
        col("n_chars").cast("int").as("n_chars"))
      .repartition(32)
      .write.format("scbf").mode("overwrite").save(dir)
    val tWrite = (System.nanoTime() - t0) / 1e9
    // phase 1: the (now single-job) multi-column quantile pass
    val df = spark.read.format("scbf").load(dir)
    val t1 = System.nanoTime()
    val probs = (1 until 256).map(_.toDouble / 256).toArray
    df.stat.approxQuantile(Array("doc_id", "n_chars"), probs, 0.001)
    val tQuant = (System.nanoTime() - t1) / 1e9
    // full zorder (includes its own quantile pass + rewrite)
    val t2 = System.nanoTime()
    graft.sources.ScbfMaintenance.zorder(spark, dir, Seq("doc_id", "n_chars"), 32)
    val tZorder = (System.nanoTime() - t2) / 1e9
    println(f"[zsplit] seed-write=$tWrite%.2f s  quantile-pass=$tQuant%.2f s  " +
      f"full-zorder=$tZorder%.2f s  (rewrite≈${tZorder - tQuant}%.2f s)")
    spark.stop()
  }
}
