package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev-time: same 1M-row workload as the reference CPython run —
 * CSV -> SCBF conversion, full scan, pruned 1-column scan. In-session
 * timings (session startup excluded on both sides: CPython interpreter
 * startup was excluded too). */
object ThroughputVsReference {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.read.parquet("/root/testdata/sf0.001/nation.parquet").count() // warm
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    time("ours: csv -> scbf (single file, CLI semantics)") {
      graft.apps.CsvScbfApps.csvToScbf(s, "/tmp/huge.csv", "/tmp/huge_ours.scbf")
    }
    // scan OUR writer's output (also proves the write above is readable);
    // /tmp/huge_ref.scbf (reference-written) is the cross-interop variant
    val scanPath = if (new java.io.File("/tmp/huge_ref.scbf").exists())
      "/tmp/huge_ref.scbf" else "/tmp/huge_ours.scbf"
    time(s"ours: full scan of $scanPath") {
      s.read.format("scbf").load(scanPath)
        .write.format("noop").mode("overwrite").save()
    }
    time(s"ours: pruned 1-column aggregate over $scanPath") {
      s.read.format("scbf").load(scanPath)
        .agg(sum(col("score").cast("decimal(18,4)"))).collect()
    }
    time("ours: full scan of our own single-file output") {
      s.read.format("scbf").load("/tmp/huge_ours.scbf")
        .write.format("noop").mode("overwrite").save()
    }
    s.stop()
  }
}
