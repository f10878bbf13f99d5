package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev-time: same workload as the reference CPython run — CSV -> SCBF
 * conversion, full scan, pruned 1-column scan. In-session timings
 * (session startup excluded on both sides: CPython interpreter startup
 * was excluded too). args(0) = input csv (default /tmp/huge.csv, the
 * 1M-row fixture; pass /tmp/huge10m.csv for the 10M re-measure); our
 * single-file output lands next to it as <input>.ours.scbf, and a
 * reference-written <input stem>_ref.scbf is scanned when present. */
object ThroughputVsReference {
  def main(args: Array[String]): Unit = {
    val csv = args.headOption.getOrElse("/tmp/huge.csv")
    val ours = csv + ".ours.scbf"
    val ref = csv.stripSuffix(".csv") + "_ref.scbf"
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
      graft.apps.CsvScbfApps.csvToScbf(s, csv, ours)
    }
    // scan the reference writer's output when present (cross-interop
    // variant, and keeps the scan comparable file-for-file)
    val scanPath = if (new java.io.File(ref).exists()) ref else ours
    time(s"ours: full scan of $scanPath") {
      s.read.format("scbf").load(scanPath)
        .write.format("noop").mode("overwrite").save()
    }
    // read_columns parity: decode and materialize every value of one
    // column (noop sink), with no aggregate bolted on — the reference
    // side builds a Python list, nothing more
    time(s"ours: pruned 1-column read over $scanPath") {
      s.read.format("scbf").load(scanPath)
        .select(col("score")).write.format("noop").mode("overwrite").save()
    }
    time("ours: full scan of our own single-file output") {
      s.read.format("scbf").load(ours)
        .write.format("noop").mode("overwrite").save()
    }
    s.stop()
  }
}
