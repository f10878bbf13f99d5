package graft.apps

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.scbf.ScbfType

/**
 * CLI parity with the reference (reference: cli.py:33-43):
 *   CsvToScbf <in.csv> <out.scbf>              (csv_to_custom)
 *   ScbfToCsv <in.scbf> <out.csv> [--cols a,b] (custom_to_csv --cols)
 *
 * The reference emits exactly ONE file at the given path; Spark writes
 * directories of part files, so these apps write a temp directory with a
 * single partition and rename the part file into place.
 */
object CsvScbfApps {

  /** CSV → SCBF with the reference's inference semantics (SURVEY §1.3):
   * per column, the FIRST non-empty value decides int32/float64/utf8;
   * encoding failures on later rows abort, as the reference crashes. */
  def csvToScbf(spark: SparkSession, csvPath: String, outPath: String): Unit = {
    // All-string read; python's csv module doubles quotes (RFC4180), so
    // escape = quote. multiLine handles embedded newlines like csv does.
    val raw = spark.read
      .option("header", true).option("inferSchema", false)
      .option("quote", "\"").option("escape", "\"").option("multiLine", true)
      .csv(csvPath)
      .na.fill("") // Spark maps empty cells to null; reference sees ""
    val cols = raw.columns

    // One-pass inference: first non-empty value per column in file order.
    // Helper column name is randomized so a real CSV column named "_rid"
    // can't collide with it.
    val rid = "_rid_" + java.util.UUID.randomUUID().toString.take(8)
    val withId = raw.withColumn(rid, monotonically_increasing_id())
    val firstRow = withId.select(cols.map(c =>
      min_by(col(c), when(col(c) =!= "", col(rid))).as(c)).toIndexedSeq: _*).head()
    val types: Seq[ScbfType] = cols.indices.map { i =>
      Option(firstRow.getString(i)).filter(_.nonEmpty)
        .map(ScbfInference.inferType).getOrElse(ScbfType.Utf8)
    }

    val parseIntU = udf((c: String, v: String) => ScbfInference.encodeInt(c, v))
    val parseDblU = udf((c: String, v: String) => ScbfInference.encodeDouble(c, v))
    val casted = raw.select(cols.zip(types).map {
      case (c, ScbfType.Int32)   => parseIntU(lit(c), col(c)).as(c)
      case (c, ScbfType.Float64) => parseDblU(lit(c), col(c)).as(c)
      case (c, ScbfType.Utf8)    => col(c)
    }.toIndexedSeq: _*)

    writeSingleFile(spark, casted, outPath, "scbf", Map.empty)
  }

  /** SCBF → CSV, optionally projecting named columns — the projection
   * prunes at the scan (reference: cli.py:11-26). */
  def scbfToCsv(spark: SparkSession, inPath: String, outPath: String,
      cols: Seq[String] = Seq.empty): Unit = {
    val df0 = spark.read.format("scbf").load(inPath)
    val df = if (cols.nonEmpty) df0.select(cols.map(col).toIndexedSeq: _*) else df0
    writeSingleFile(spark, df, outPath, "csv",
      Map("header" -> "true", "quote" -> "\"", "escape" -> "\"", "emptyValue" -> ""))
  }

  private def writeSingleFile(spark: SparkSession, df: DataFrame, outPath: String,
      format: String, options: Map[String, String]): Unit = {
    val tmp = outPath + "_tmp_" + java.util.UUID.randomUUID().toString.take(8)
    // maxBufferedBytes=Long.MaxValue: the single-FILE output contract of
    // the reference CLI needs the one task to buffer everything (exactly
    // what the reference writer does); the connector's default would
    // roll to multiple part files and only one could be renamed below
    df.coalesce(1).write.format(format).options(options)
      .option("maxBufferedBytes", Long.MaxValue)
      .mode("overwrite").save(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val tmpPath = new Path(tmp)
    val fs = tmpPath.getFileSystem(conf)
    val parts = fs.listStatus(tmpPath)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    val part = parts.toSeq match {
      case Seq(one) => one
      case Seq() => throw new IllegalStateException(s"no part file written under $tmp")
      case many => throw new IllegalStateException(
        s"expected exactly one part file under $tmp, found ${many.size} — " +
          "refusing to publish a partial single-file output")
    }
    val out = new Path(outPath)
    fs.delete(out, false)
    // rename signals failure via its return value; proceeding would
    // delete the tmp dir holding the only copy of the output
    if (!fs.rename(part.getPath, out))
      throw new java.io.IOException(
        s"rename ${part.getPath} -> $out failed; output left in $tmp")
    fs.delete(tmpPath, true)
  }

  private[apps] def session(): SparkSession = {
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

object CsvToScbf {
  def main(args: Array[String]): Unit = args match {
    case Array(in, out) =>
      val spark = CsvScbfApps.session()
      try CsvScbfApps.csvToScbf(spark, in, out) finally spark.stop()
    case _ => System.err.println("usage: CsvToScbf <in.csv> <out.scbf>"); sys.exit(2)
  }
}

object ScbfToCsv {
  def main(args: Array[String]): Unit = args.toList match {
    case in :: out :: rest =>
      val cols = rest match {
        case "--cols" :: cs => cs.flatMap(_.split(',')).filter(_.nonEmpty)
        case Nil            => Seq.empty
        case other =>
          System.err.println(s"unknown args: $other"); sys.exit(2); Seq.empty
      }
      val spark = CsvScbfApps.session()
      try CsvScbfApps.scbfToCsv(spark, in, out, cols) finally spark.stop()
    case _ =>
      System.err.println("usage: ScbfToCsv <in.scbf> <out.csv> [--cols a,b]"); sys.exit(2)
  }
}

/** Preview an SCBF file/directory — parity with the reference reader's
 * __main__ demo (reference: reader.py:176-192): schema + first 10 rows. */
object ScbfShow {
  def main(args: Array[String]): Unit = args match {
    case Array(path) =>
      val spark = CsvScbfApps.session()
      try {
        val df = spark.read.format("scbf").load(path)
        df.printSchema()
        df.show(10, truncate = false)
      } finally spark.stop()
    case _ => System.err.println("usage: ScbfShow <path.scbf|dir>"); sys.exit(2)
  }
}
