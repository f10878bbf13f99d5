package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * `_file_path` metadata column (SupportsMetadataColumns): the absolute
 * path of the SCBF data file each row was read from, served as a
 * per-split constant (zero decode cost) and surfaced ONLY when
 * explicitly selected — the 100 TB lineage/incident primitive that
 * turns "a bad row exists somewhere" into one file a takedown can
 * target.
 */
class MetadataColumnSpec extends AnyFunSuite with SparkTestBase {

  private def mk(name: String, nFiles: Int = 4): String = {
    val dir = tmpDir(s"scbf-meta-$name")
    spark.range(0, 400)
      .select(col("id").cast("int").as("id"),
        concat(lit("v"), col("id")).as("tag"))
      .repartitionByRange(nFiles, col("id"))
      .write.format("scbf").mode("overwrite").save(dir)
    dir
  }

  test("_file_path is the real per-row source file, one value per split") {
    val dir = mk("basic")
    val df = spark.read.format("scbf").load(dir)
      .select(col("_file_path"), col("id"))
    val byFile = df.collect().groupBy(_.getString(0))
    val files = ScbfDataSource.resolveFiles(Seq(dir),
      spark.sessionState.newHadoopConf())
    assert(byFile.keySet == files.map(_.getPath.toString).toSet,
      s"paths must be the listed data files: ${byFile.keySet}")
    assert(byFile.values.map(_.length).sum == 400)
    // each row's path really holds that row: re-read one file directly
    val (path, rows) = byFile.head
    val direct = spark.read.format("scbf").load(path)
      .select(col("id")).collect().map(_.getInt(0)).toSet
    assert(rows.map(_.getInt(1)).toSet == direct)
  }

  test("SELECT * never includes the metadata column") {
    val dir = mk("star")
    spark.sql("DROP TABLE IF EXISTS meta_star")
    spark.sql(s"CREATE TABLE meta_star (id INT, tag STRING) USING scbf LOCATION '$dir'")
    assert(spark.sql("SELECT * FROM meta_star").columns.toSeq == Seq("id", "tag"))
    // but explicit selection works through SQL too
    val n = spark.sql("SELECT DISTINCT _file_path FROM meta_star").count()
    assert(n == 4L, s"expected 4 files, got $n")
  }

  test("filtering on _file_path isolates one file's rows (the incident flow)") {
    val dir = mk("filter")
    val one = spark.read.format("scbf").load(dir)
      .select(col("_file_path")).limit(1).collect().head.getString(0)
    val scoped = spark.read.format("scbf").load(dir)
      .select(col("id"), col("_file_path"))
      .where(col("_file_path") === one)
    val direct = spark.read.format("scbf").load(one).count()
    assert(scoped.count() == direct && direct > 0)
  }

  test("a DATA column literally named _file_path wins over the metadata column") {
    val dir = tmpDir("scbf-meta-shadow")
    spark.range(0, 10)
      .select(col("id").cast("int").as("id"),
        concat(lit("data-"), col("id")).as("_file_path"))
      .coalesce(1)
      .write.format("scbf").mode("overwrite").save(dir)
    val vals = spark.read.format("scbf").load(dir)
      .select(col("_file_path")).collect().map(_.getString(0)).toSet
    assert(vals.forall(_.startsWith("data-")),
      s"the file's own column must win: $vals")
  }

  test("a STREAMING read selecting _file_path fails fast at analysis (batch-only)") {
    val dir = mk("stream")
    // Spark's streaming column pruning never forwards metadata columns
    // to the scan (the analyzer binds the attribute, the reader is told
    // only the data columns), which would crash deep in codegen — the
    // GraftExtensions check rule fails the shape at ANALYSIS instead
    val e = intercept[Throwable] {
      val q = spark.readStream.format("scbf").schema("id INT, tag STRING")
        .load(dir)
        .select(col("_file_path"), col("id"))
        .writeStream.format("memory").queryName("meta_stream_probe")
        .trigger(org.apache.spark.sql.streaming.Trigger.Once()).start()
      try q.awaitTermination(30000) finally q.stop()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("batch-only"), s"wanted the guidance message, got: $msgs")
    // a plain streaming read (no metadata column) is untouched
    val ok = spark.readStream.format("scbf").schema("id INT, tag STRING")
      .load(dir).select(col("id"))
      .writeStream.format("memory").queryName("meta_stream_ok")
      .trigger(org.apache.spark.sql.streaming.Trigger.Once()).start()
    ok.awaitTermination(60000); ok.stop()
    assert(spark.sql("SELECT COUNT(*) FROM meta_stream_ok").head().getLong(0) == 400L)
  }

  test("the columnar (vectorized) path serves the constant too") {
    val dir = mk("columnar")
    // an aggregate over id + _file_path keeps the scan columnar
    val df = spark.read.format("scbf").load(dir)
      .groupBy(col("_file_path")).agg(count(lit(1)).as("cnt"), sum(col("id")).as("s"))
    val rows = df.collect()
    assert(rows.length == 4 && rows.map(_.getLong(1)).sum == 400L)
    assert(rows.map(_.getAs[Long]("s")).sum == (0 until 400).map(_.toLong).sum)
  }
}
