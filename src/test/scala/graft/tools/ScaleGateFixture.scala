package graft.tools

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Fixture generator for the FACTOR× ORACLE gate (not just the bench):
 * derives documents/orders exactly like [[ScaleProbe]] (copy-tagged
 * tokens, disjoint id ranges — each copy keeps the original's internal
 * duplicate structure, zero cross-copy shingle overlap) but writes
 * SINGLE-FILE parquet matching the driver testdata layout, so
 * `graft.Verify` + `scripts/check.py` run the real correctness gate
 * (Spark vs DuckDB, hash compare) on the scaled corpus:
 *
 *   Test/runMain graft.tools.ScaleGateFixture /root/testdata/sf0.01 100
 *   SPARK_GRAFT_CPUS=32 runMain graft.Verify /tmp/graft_scale100_gate \
 *       /tmp/verify_scale100 <heavy query names>
 *   python3 scripts/check.py /tmp/verify_scale100 /tmp/graft_scale100_gate <same>
 */
object ScaleGateFixture {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.01")
    val factor = if (args.length > 1) args(1).toInt else 100
    val out = s"/tmp/graft_scale${factor}_gate"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def writeSingle(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$out/.tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .getOrElse(sys.error(s"no part file in $tmp"))
      val dst = new File(s"$out/$name.parquet")
      if (dst.exists()) dst.delete()
      require(part.renameTo(dst), s"rename ${part} -> $dst failed")
      org.apache.commons.io.FileUtils.deleteQuietly(new File(tmp))
    }

    new File(out).mkdirs()
    val docs = spark.read.parquet(s"$base/documents.parquet")
    writeSingle(
      (0 until factor).map { i =>
        docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          concat_ws(" ", transform(split(col("text"), " "),
            x => concat(lit(s"c${i}_"), x))).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _), "documents")
    val orders = spark.read.parquet(s"$base/orders.parquet")
    writeSingle(
      (0 until factor).map { i =>
        orders.withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L))
      }.reduce(_ unionByName _), "orders")
    println(s"[scalegate] fixture at $out (factor=$factor from $base)")
    spark.stop()
  }
}
