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

  test("SELECT ... WHERE _file_path = '…' plans exactly ONE file (exact path pruning)") {
    val dir = mk("prune")
    val victim = spark.read.format("scbf").load(dir)
      .select(col("_file_path")).limit(1).collect().head.getString(0)
    val q = spark.read.format("scbf").load(dir)
      .where(col("_file_path") === victim).select(col("id"))
    ScbfUtil.dataFileOpens.set(0)
    val n = q.count()
    assert(ScbfUtil.dataFileOpens.get == 1,
      s"path-equality scan must open 1 file, opened ${ScbfUtil.dataFileOpens.get}")
    assert(n == spark.read.format("scbf").load(victim).count())
  }

  test("DELETE FROM t WHERE _file_path = '…' is the literal single-file takedown") {
    val dir = mk("takedown")
    spark.sql("DROP TABLE IF EXISTS meta_td")
    spark.sql(s"CREATE TABLE meta_td (id INT, tag STRING) USING scbf LOCATION '$dir'")
    val hconf = spark.sessionState.newHadoopConf()
    val files = ScbfDataSource.resolveFiles(Seq(dir), hconf)
    assert(files.size == 4)
    val victim = files.head.getPath
    val witness = files.last.getPath
    def bytes(p: org.apache.hadoop.fs.Path): Seq[Byte] = {
      val fs = p.getFileSystem(hconf)
      val in = fs.open(p)
      try Iterator.continually(in.read()).takeWhile(_ >= 0).map(_.toByte).toSeq
      finally in.close()
    }
    val victimRows = spark.read.format("scbf").load(victim.toString).count()
    val witnessBefore = bytes(witness)
    ScbfUtil.dataFileOpens.set(0)
    spark.sql(s"DELETE FROM meta_td WHERE _file_path = '$victim'")
    // the path predicate PROVES the whole file matches (the column IS
    // the path), so the metadata DELETE path drops it without reading
    // A BYTE — and every other file is untouched bytes, not just
    // untouched rows
    assert(ScbfUtil.dataFileOpens.get == 0,
      s"path takedown must be zero-read, opened ${ScbfUtil.dataFileOpens.get}")
    assert(!victim.getFileSystem(hconf).exists(victim), "victim must be gone")
    assert(bytes(witness) == witnessBefore, "untouched files must stay byte-identical")
    assert(spark.sql("SELECT COUNT(*) FROM meta_td").head().getLong(0) ==
      400L - victimRows)
    // a MIXED condition (path AND data predicate) scopes to the named
    // file and rewrites it exactly — the re-read resolves _file_path
    // as a metadata column
    val second = ScbfDataSource.resolveFiles(Seq(dir), hconf).head.getPath
    val secondRows = spark.read.format("scbf").load(second.toString)
      .where(col("id") % 2 === 0).count()
    ScbfUtil.dataFileOpens.set(0)
    spark.sql(s"DELETE FROM meta_td WHERE _file_path = '$second' AND id >= 0 AND id % 2 = 0")
    assert(spark.sql("SELECT COUNT(*) FROM meta_td").head().getLong(0) ==
      400L - victimRows - secondRows)
  }

  test("filePathTruth is three-valued: a NULL in an IN list never proves a NOT IN") {
    import org.apache.spark.sql.sources._
    val C = ScbfDataSource.FilePathCol
    // a null element can never MATCH, but it makes a non-match UNKNOWN:
    // SQL's `p NOT IN ('a', NULL)` is NULL (never true) for p != 'a'
    assert(ScbfPartitions.filePathTruth(In(C, Array[Any]("p", null)), "p") == Some(true))
    assert(ScbfPartitions.filePathTruth(In(C, Array[Any]("p", null)), "q").isEmpty)
    assert(ScbfPartitions.filePathTruth(Not(In(C, Array[Any]("p", null))), "q").isEmpty,
      "Not(unknown) must stay unknown — a Some(true) here would let the " +
        "zero-read DELETE fast path drop files SQL keeps")
    assert(ScbfPartitions.filePathTruth(In(C, Array[Any]("p")), "q") == Some(false))
    assert(ScbfPartitions.filePathTruth(Not(In(C, Array[Any]("p"))), "q") == Some(true))
    assert(ScbfPartitions.filePathTruth(EqualTo(C, null), "q").isEmpty,
      "`= NULL` is NULL in SQL, not false")
  }

  test("DELETE WHERE _file_path NOT IN (path, NULL) deletes nothing (SQL NULL semantics)") {
    val dir = mk("notin")
    spark.sql("DROP TABLE IF EXISTS meta_ni")
    spark.sql(s"CREATE TABLE meta_ni (id INT, tag STRING) USING scbf LOCATION '$dir'")
    val hconf = spark.sessionState.newHadoopConf()
    val keep = ScbfDataSource.resolveFiles(Seq(dir), hconf).head.getPath
    // `path NOT IN ('keep', NULL)` is NULL for every other path — never
    // TRUE — so SQL deletes no row and the whole-file proof must decline
    spark.sql(s"DELETE FROM meta_ni WHERE _file_path NOT IN ('$keep', NULL)")
    assert(spark.sql("SELECT COUNT(*) FROM meta_ni").head().getLong(0) == 400L,
      "a NULL in the NOT IN list makes the predicate never-true")
    // without the NULL the same shape is an exact takedown of the rest
    // (re-resolve: the never-true DELETE may have rewritten file names)
    val keep2 = ScbfDataSource.resolveFiles(Seq(dir), hconf).head.getPath
    val keepRows = spark.read.format("scbf").load(keep2.toString).count()
    spark.sql(s"DELETE FROM meta_ni WHERE _file_path NOT IN ('$keep2')")
    assert(spark.sql("SELECT COUNT(*) FROM meta_ni").head().getLong(0) == keepRows)
    spark.sql("DROP TABLE IF EXISTS meta_ni")
  }

  test("UPDATE ... WHERE _file_path = '…' redacts one file, partitioned tables included") {
    val dir = tmpDir("scbf-meta-upd")
    spark.sql("DROP TABLE IF EXISTS meta_upd")
    spark.sql("CREATE TABLE meta_upd (id INT, tag STRING, grp STRING) USING scbf " +
      s"PARTITIONED BY (grp) LOCATION '$dir'")
    spark.range(0, 200)
      .select(col("id").cast("int").as("id"),
        concat(lit("v"), col("id")).as("tag"),
        concat(lit("g"), (col("id") % 2).cast("int")).as("grp"))
      .createOrReplaceTempView("meta_upd_src")
    spark.sql("INSERT INTO meta_upd SELECT /*+ REPARTITION(2, grp) */ " +
      "id, tag, grp FROM meta_upd_src")
    val one = spark.table("meta_upd").select(col("_file_path"))
      .limit(1).collect().head.getString(0)
    val fileRows = spark.read.format("scbf").load(one).count()
    spark.sql(s"UPDATE meta_upd SET tag = 'redacted' WHERE _file_path = '$one'")
    assert(spark.sql("SELECT COUNT(*) FROM meta_upd WHERE tag = 'redacted'")
      .head().getLong(0) == fileRows)
    assert(spark.sql("SELECT COUNT(*) FROM meta_upd").head().getLong(0) == 200L)
  }

  test("MERGE references _file_path in clause conditions (not in ON)") {
    val dir = mk("merge")
    spark.sql("DROP TABLE IF EXISTS meta_mrg")
    spark.sql(s"CREATE TABLE meta_mrg (id INT, tag STRING) USING scbf LOCATION '$dir'")
    spark.table("meta_mrg").select(col("id")).createOrReplaceTempView("meta_mrg_src")
    val one = spark.table("meta_mrg").select(col("_file_path"))
      .limit(1).collect().head.getString(0)
    val fileRows = spark.read.format("scbf").load(one).count()
    // the supported spelling: per-clause condition (resolves against
    // the rewrite read relation, which carries the metadata column)
    spark.sql(s"""MERGE INTO meta_mrg t USING meta_mrg_src s
      ON t.id = s.id
      WHEN MATCHED AND t._file_path = '$one' THEN UPDATE SET t.tag = 'merged'""")
    assert(spark.sql("SELECT COUNT(*) FROM meta_mrg WHERE tag = 'merged'")
      .head().getLong(0) == fileRows)
    // the ON clause resolves against a subplan WITHOUT metadata output
    // (Spark-side shape) — the injected post-hoc rule turns the stock
    // generic UNRESOLVED_COLUMN into guidance naming the supported
    // per-clause spelling
    val e = intercept[Throwable] {
      spark.sql(s"""MERGE INTO meta_mrg t USING meta_mrg_src s
        ON t.id = s.id AND t._file_path = '$one'
        WHEN MATCHED THEN UPDATE SET t.tag = 'x'""")
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("ON clause") && msgs.contains("WHEN MATCHED"),
      s"wanted the guided per-clause spelling, got: $msgs")
  }

  test("without GraftExtensions the CONNECTOR fails the _file_path stream closed (own JVM)") {
    // the shared test session bakes the extension into its
    // SparkContext conf — every in-process session inherits it — so
    // the genuinely-bare session runs in a forked JVM
    // (graft.tools.NoExtStreamGuard: healthy stream works, _file_path
    // stream gets the connector's own guidance error, never the
    // opaque codegen crash)
    val dir = mk("noext")
    val java = System.getProperty("java.home") + "/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(java) ++ addOpens ++ Seq("-Xmx2g",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.NoExtStreamGuard", dir)
    val out = new StringBuilder
    import scala.sys.process._
    val logger = ProcessLogger(l => out.synchronized { out.append(l).append('\n'); () },
      l => out.synchronized { out.append(l).append('\n'); () })
    val code = Process(cmd).!(logger)
    assert(code == 0 && out.toString.contains("GUARD-OK"),
      s"no-extensions guard probe failed (exit $code):\n$out")
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
