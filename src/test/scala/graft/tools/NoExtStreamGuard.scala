package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/**
 * Fail-closed probe for the `_file_path` streaming guard, run in its
 * OWN JVM so the SparkSession genuinely lacks GraftExtensions (the
 * shared test session bakes the extension into its SparkContext conf,
 * which every in-process sibling session inherits). Exercised by
 * MetadataColumnSpec via a forked java process.
 *
 * Exit 0 + "GUARD-OK" when: (1) a plain streaming read works, and
 * (2) a streaming read selecting `_file_path` fails with the
 * connector's OWN guidance error ("batch-only") instead of the opaque
 * codegen ArrayIndexOutOfBounds the unguarded shape produced.
 */
object NoExtStreamGuard {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("scbf-noext-guard")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the probe is vacuous if the extension sneaked in — prove absence
    // by the maintenance grammar NOT parsing
    val extAbsent =
      try { spark.sql("OPTIMIZE definitely_no_such_table"); false }
      catch {
        case e: Throwable =>
          val s = e.toString.toUpperCase(java.util.Locale.ROOT)
          s.contains("PARSE") || s.contains("SYNTAX")
      }
    require(extAbsent, "GraftExtensions unexpectedly active — probe is vacuous")

    def ckpt() = java.nio.file.Files.createTempDirectory("noext-ck").toString

    // 1) a plain streaming read (no metadata column) must work
    val ok = spark.readStream.format("scbf").schema("id INT, tag STRING")
      .load(dir).select(col("id"))
      .writeStream.format("noop").option("checkpointLocation", ckpt())
      .trigger(Trigger.Once()).start()
    ok.awaitTermination(120000)
    ok.stop()

    // 2) selecting _file_path must fail with the connector's guidance
    val q = spark.readStream.format("scbf").schema("id INT, tag STRING")
      .load(dir).select(col("_file_path"), col("id"))
      .writeStream.format("noop").option("checkpointLocation", ckpt())
      .trigger(Trigger.Once()).start()
    val msg =
      try { q.awaitTermination(120000); "NO-ERROR" }
      catch {
        case e: Throwable =>
          Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
            .map(t => s"${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("")}")
            .mkString(" | ")
      } finally q.stop()
    println(s"GUARD-RESULT: $msg")
    spark.stop()
    if (msg.contains("batch-only") && !msg.contains("ArrayIndexOutOfBounds")) {
      println("GUARD-OK")
    } else {
      println("GUARD-FAIL")
      sys.exit(2)
    }
  }
}
