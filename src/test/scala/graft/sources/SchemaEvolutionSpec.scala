package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * The schema-evolution CONTRACT (SURVEY §2.2 / README "Schema
 * evolution"): the SCBF format is frozen (reference-compatible files
 * carry their schema in the header; there is no column-mapping layer
 * to reinterpret them), so in-place ADD/DROP/RENAME COLUMN is
 * deliberately NOT supported — a mismatched append fails fast with a
 * per-column diff. Evolution is BY TABLE REWRITE, and this spec
 * exercises the documented recipe end-to-end:
 *
 *   1. CREATE the successor table at a NEW location with the new
 *      schema;
 *   2. INSERT INTO successor SELECT <old columns + defaults/casts>
 *      FROM old (one distributed pass — at 100 TB this is a full
 *      rewrite by design: pay it explicitly, not via a silent
 *      read-time mapping layer every future scan funds);
 *   3. atomically swap: re-point the catalog name (DROP + CREATE at
 *      the successor location — external metadata, so data is
 *      untouched), or rename directories for path-based readers.
 */
class SchemaEvolutionSpec extends AnyFunSuite with SparkTestBase {

  private def hconf = spark.sessionState.newHadoopConf()

  test("a mismatched append fails fast and names the difference (the contract's error side)") {
    val dir = tmpDir("scbf-evo-err")
    spark.range(0, 10).select(col("id").cast("int").as("id"),
      concat(lit("n"), col("id")).as("name"))
      .write.format("scbf").mode("overwrite").save(dir)
    val e = intercept[Exception] {
      spark.range(0, 5).select(col("id").cast("int").as("id"),
        concat(lit("n"), col("id")).as("name"),
        lit(1.5).as("score"))
        .write.format("scbf").mode("append").save(dir)
    }
    assert(e.getMessage.contains("schema mismatch") &&
      e.getMessage.contains("score"),
      s"the error must name the offending column: ${e.getMessage}")
  }

  test("ADD COLUMN by table rewrite: successor + INSERT SELECT + catalog swap") {
    val v1 = tmpDir("scbf-evo-v1")
    val v2 = tmpDir("scbf-evo-v2") + "-next" // must not pre-exist for CREATE
    spark.sql("DROP TABLE IF EXISTS evo_t")
    try {
      // the live v1 table
      spark.sql(s"CREATE TABLE evo_t (id INT, name STRING) USING scbf LOCATION '$v1'")
      spark.sql("INSERT INTO evo_t SELECT CAST(id AS INT), concat('n', id) FROM range(0, 100)")
      // 1-2. successor with the added column, one distributed pass
      spark.sql(s"CREATE TABLE evo_t_next (id INT, name STRING, score DOUBLE) " +
        s"USING scbf LOCATION '$v2'")
      spark.sql("INSERT INTO evo_t_next SELECT id, name, CAST(0.0 AS DOUBLE) FROM evo_t")
      // 3. swap the catalog name onto the successor location (external
      // metadata: DROP touches no data) — readers of `evo_t` see the
      // new schema from the next query on
      spark.sql("DROP TABLE evo_t")
      spark.sql("DROP TABLE evo_t_next")
      spark.sql(s"CREATE TABLE evo_t (id INT, name STRING, score DOUBLE) " +
        s"USING scbf LOCATION '$v2'")
      val r = spark.sql("SELECT COUNT(*), SUM(score), MIN(id), MAX(id) FROM evo_t").head()
      assert(r == org.apache.spark.sql.Row(100L, 0.0, 0, 99))
      // new-schema appends now succeed; old-schema appends now fail
      spark.sql("INSERT INTO evo_t VALUES (1000, 'x', 2.5)")
      assert(spark.sql("SELECT COUNT(*) FROM evo_t").head().getLong(0) == 101L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS evo_t")
      spark.sql("DROP TABLE IF EXISTS evo_t_next")
    }
  }

  test("ALTER TABLE ADD COLUMN ... DEFAULT is the managed one-statement rewrite") {
    val dir = tmpDir("scbf-evo-addcol")
    spark.sql("DROP TABLE IF EXISTS evo_ac")
    new Path(dir).getFileSystem(hconf).delete(new Path(dir), true)
    try {
      spark.sql(s"CREATE TABLE evo_ac (id INT, name STRING) USING scbf LOCATION '$dir'")
      spark.sql("INSERT INTO evo_ac SELECT CAST(id AS INT), concat('n', id) FROM range(0, 100)")
      val rewritten = spark.sql(
        "ALTER TABLE evo_ac ADD COLUMN score DOUBLE DEFAULT 1.5").head().getInt(0)
      assert(rewritten > 0, "the managed rewrite reports the files it rewrote")
      // catalog AND files agree on the new schema; every row got the default
      assert(spark.table("evo_ac").columns.toSeq == Seq("id", "name", "score"))
      val r = spark.sql("SELECT COUNT(*), SUM(score), MIN(id), MAX(id) FROM evo_ac").head()
      assert(r == org.apache.spark.sql.Row(100L, 150.0, 0, 99))
      // new-schema INSERTs work immediately (column order agrees)
      spark.sql("INSERT INTO evo_ac VALUES (1000, 'x', 2.5)")
      assert(spark.sql("SELECT COUNT(*) FROM evo_ac WHERE score = 2.5").head().getLong(0) == 1L)
      // multi-column parenthesized form, string + int defaults
      spark.sql("ALTER TABLE evo_ac ADD COLUMNS (lang STRING DEFAULT 'en', n INT DEFAULT 7)")
      val r2 = spark.sql("SELECT COUNT(*), SUM(n) FROM evo_ac WHERE lang = 'en'").head()
      assert(r2 == org.apache.spark.sql.Row(101L, 707L))
    } finally spark.sql("DROP TABLE IF EXISTS evo_ac")
  }

  test("ADD COLUMN on a PARTITIONED table preserves the layout, keepers included") {
    val dir = tmpDir("scbf-evo-acp")
    spark.sql("DROP TABLE IF EXISTS evo_acp")
    new Path(dir).getFileSystem(hconf).delete(new Path(dir), true)
    try {
      spark.sql("CREATE TABLE evo_acp (id INT, grp STRING) USING scbf " +
        s"PARTITIONED BY (grp) LOCATION '$dir'")
      spark.sql("INSERT INTO evo_acp SELECT CAST(id AS INT), concat('g', CAST(id % 3 AS INT)) " +
        "FROM range(0, 90)")
      // a keeper-only partition (ADD PARTITION) must survive the rewrite
      spark.sql("ALTER TABLE evo_acp ADD PARTITION (grp='gempty')")
      spark.sql("ALTER TABLE evo_acp ADD COLUMN flag STRING DEFAULT 'ok'")
      val subs = new java.io.File(dir).listFiles().filter(_.isDirectory)
        .map(_.getName).filterNot(_.startsWith(".")).sorted
      assert(subs.toSeq == Seq("grp=g0", "grp=g1", "grp=g2", "grp=gempty"),
        s"partition layout must survive: ${subs.toSeq}")
      assert(spark.sql("SELECT COUNT(*) FROM evo_acp WHERE flag = 'ok'").head().getLong(0) == 90L)
      // the empty partition is still a readable standalone dir, NEW schema
      val keeper = spark.read.format("scbf").load(s"$dir/grp=gempty")
      assert(keeper.columns.toSeq.sorted == Seq("flag", "grp", "id"))
      assert(keeper.count() == 0L)
      // partition pruning still bites post-rewrite
      assert(spark.sql("SELECT COUNT(*) FROM evo_acp WHERE grp = 'g1'").head().getLong(0) == 30L)
    } finally spark.sql("DROP TABLE IF EXISTS evo_acp")
  }

  test("ADD COLUMN guards: DEFAULT required, duplicates refused, other ALTERs guided, foreign tables delegate") {
    val dir = tmpDir("scbf-evo-acg")
    spark.sql("DROP TABLE IF EXISTS evo_acg")
    new Path(dir).getFileSystem(hconf).delete(new Path(dir), true)
    try {
      spark.sql(s"CREATE TABLE evo_acg (id INT) USING scbf LOCATION '$dir'")
      spark.sql("INSERT INTO evo_acg VALUES (1)")
      // no DEFAULT: the format stores no nulls — loud, actionable
      val e1 = intercept[Exception] {
        spark.sql("ALTER TABLE evo_acg ADD COLUMN x INT") }
      assert(e1.getMessage.contains("DEFAULT"), e1.getMessage)
      // existing name refused
      val e2 = intercept[Exception] {
        spark.sql("ALTER TABLE evo_acg ADD COLUMN id INT DEFAULT 0") }
      assert(e2.getMessage.contains("already exists"), e2.getMessage)
      // NULL default refused (evaluates to null)
      val e3 = intercept[Exception] {
        spark.sql("ALTER TABLE evo_acg ADD COLUMN x DOUBLE DEFAULT CAST('zzz' AS DOUBLE)") }
      assert(e3.getMessage.toLowerCase.contains("null") ||
        e3.getMessage.contains("cannot parse"), e3.getMessage)
      // lossy retype (ALTER COLUMN TYPE) declines with the CAST-ownership
      // guidance — only the lossless INT → DOUBLE widening is managed
      val e4 = intercept[Exception] {
        spark.sql("ALTER TABLE evo_acg ALTER COLUMN id TYPE STRING") }
      assert(e4.getMessage.contains("CAST"), e4.getMessage)
      // dropping the ONLY column refused (that's DROP TABLE)
      val e5 = intercept[Exception] {
        spark.sql("ALTER TABLE evo_acg DROP COLUMN id") }
      assert(e5.getMessage.contains("no columns"), e5.getMessage)
      // a non-scbf table keeps its vanilla ALTER path untouched
      spark.sql("DROP TABLE IF EXISTS evo_foreign")
      spark.range(3).write.saveAsTable("evo_foreign") // parquet provider
      try {
        spark.sql("ALTER TABLE evo_foreign ADD COLUMNS (extra INT)")
        assert(spark.table("evo_foreign").columns.contains("extra"),
          "vanilla ADD COLUMNS must still reach parquet tables")
      } finally spark.sql("DROP TABLE IF EXISTS evo_foreign")
      // table unchanged by the failed attempts
      assert(spark.sql("SELECT COUNT(*) FROM evo_acg").head().getLong(0) == 1L)
    } finally spark.sql("DROP TABLE IF EXISTS evo_acg")
  }

  test("ALTER TABLE DROP COLUMN is the managed one-statement rewrite") {
    val dir = tmpDir("scbf-evo-dropcol")
    spark.sql("DROP TABLE IF EXISTS evo_dc")
    new Path(dir).getFileSystem(hconf).delete(new Path(dir), true)
    try {
      spark.sql("CREATE TABLE evo_dc (id INT, name STRING, score DOUBLE, n INT) " +
        s"USING scbf LOCATION '$dir'")
      spark.sql("INSERT INTO evo_dc SELECT CAST(id AS INT), concat('n', id), " +
        "CAST(id AS DOUBLE), CAST(id % 7 AS INT) FROM range(0, 100)")
      // multi-column parenthesized form
      val rewritten = spark.sql(
        "ALTER TABLE evo_dc DROP COLUMNS (score, n)").head().getInt(0)
      assert(rewritten > 0, "the managed rewrite reports the files it rewrote")
      // catalog AND files agree; surviving columns' data intact
      assert(spark.table("evo_dc").columns.toSeq == Seq("id", "name"))
      val files = spark.read.format("scbf").load(dir)
      assert(files.columns.toSeq == Seq("id", "name"),
        "the dropped column must be gone from the FILES, not just the catalog")
      val r = spark.sql("SELECT COUNT(*), MIN(id), MAX(id) FROM evo_dc").head()
      assert(r == org.apache.spark.sql.Row(100L, 0, 99))
      // narrow-schema INSERTs work immediately
      spark.sql("INSERT INTO evo_dc VALUES (1000, 'x')")
      assert(spark.sql("SELECT COUNT(*) FROM evo_dc").head().getLong(0) == 101L)
      // guards: unknown column; partition columns pinned in the
      // partitioned RENAME test below share the same code path
      val e = intercept[Exception] {
        spark.sql("ALTER TABLE evo_dc DROP COLUMN nope") }
      assert(e.getMessage.contains("no such column"), e.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS evo_dc")
  }

  test("ALTER TABLE RENAME COLUMN rewrites on a partitioned table, layout intact") {
    val dir = tmpDir("scbf-evo-rencol")
    spark.sql("DROP TABLE IF EXISTS evo_rc")
    new Path(dir).getFileSystem(hconf).delete(new Path(dir), true)
    try {
      spark.sql("CREATE TABLE evo_rc (id INT, val DOUBLE, grp STRING) USING scbf " +
        s"PARTITIONED BY (grp) LOCATION '$dir'")
      spark.sql("INSERT INTO evo_rc SELECT CAST(id AS INT), CAST(id AS DOUBLE), " +
        "concat('g', CAST(id % 3 AS INT)) FROM range(0, 90)")
      val rewritten = spark.sql(
        "ALTER TABLE evo_rc RENAME COLUMN val TO score").head().getInt(0)
      assert(rewritten > 0)
      assert(spark.table("evo_rc").columns.toSeq == Seq("id", "score", "grp"))
      // partition layout survives and pruning still bites
      val subs = new java.io.File(dir).listFiles().filter(_.isDirectory)
        .map(_.getName).filterNot(_.startsWith(".")).sorted
      assert(subs.toSeq == Seq("grp=g0", "grp=g1", "grp=g2"), subs.toSeq.toString)
      val r = spark.sql(
        "SELECT COUNT(*), SUM(score) FROM evo_rc WHERE grp = 'g1'").head()
      assert(r == org.apache.spark.sql.Row(30L, (1 until 90 by 3).sum.toDouble))
      // renamed-schema INSERT works; the OLD name is gone
      spark.sql("INSERT INTO evo_rc VALUES (1000, 5555.5, 'g0')")
      assert(spark.sql("SELECT COUNT(*) FROM evo_rc WHERE score = 5555.5")
        .head().getLong(0) == 1L)
      val eOld = intercept[Exception] {
        spark.sql("SELECT val FROM evo_rc").collect() }
      assert(eOld.getMessage.contains("val"), eOld.getMessage)
      // guards: target exists; partition column refused with CTAS guidance
      val e1 = intercept[Exception] {
        spark.sql("ALTER TABLE evo_rc RENAME COLUMN id TO score") }
      assert(e1.getMessage.contains("already exists"), e1.getMessage)
      val e2 = intercept[Exception] {
        spark.sql("ALTER TABLE evo_rc RENAME COLUMN grp TO category") }
      assert(e2.getMessage.contains("partition column"), e2.getMessage)
      val e3 = intercept[Exception] {
        spark.sql("ALTER TABLE evo_rc DROP COLUMN grp") }
      assert(e3.getMessage.contains("partition column"), e3.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS evo_rc")
  }

  test("ALTER COLUMN TYPE: the lossless INT→DOUBLE widening is managed, lossy retypes decline") {
    val dir = tmpDir("scbf-evo-retype")
    spark.sql("DROP TABLE IF EXISTS evo_rt")
    new Path(dir).getFileSystem(hconf).delete(new Path(dir), true)
    try {
      spark.sql("CREATE TABLE evo_rt (id INT, n INT, grp STRING) USING scbf " +
        s"PARTITIONED BY (grp) LOCATION '$dir'")
      spark.sql("INSERT INTO evo_rt SELECT CAST(id AS INT), CAST(id * 7 AS INT), " +
        "concat('g', CAST(id % 2 AS INT)) FROM range(0, 60)")
      val rewritten = spark.sql(
        "ALTER TABLE evo_rt ALTER COLUMN n TYPE DOUBLE").head().getInt(0)
      assert(rewritten > 0)
      // catalog AND files widened; every value exact (int32 ⊂ float64)
      assert(spark.table("evo_rt").schema("n").dataType ==
        org.apache.spark.sql.types.DoubleType)
      assert(spark.read.format("scbf").load(dir).schema("n").dataType ==
        org.apache.spark.sql.types.DoubleType,
        "the FILES must carry the widened type, not just the catalog")
      val r = spark.sql("SELECT SUM(n), MIN(n), MAX(n) FROM evo_rt").head()
      assert(r == org.apache.spark.sql.Row(
        (0 until 60).map(_ * 7L).sum.toDouble, 0.0, 59 * 7.0))
      // widened-schema INSERT works; partition pruning intact
      spark.sql("INSERT INTO evo_rt VALUES (1000, 2.5, 'g0')")
      assert(spark.sql("SELECT COUNT(*) FROM evo_rt WHERE grp = 'g0'")
        .head().getLong(0) == 31L)
      // lossy directions refuse: DOUBLE→INT, INT→STRING, partition column
      val e1 = intercept[Exception] {
        spark.sql("ALTER TABLE evo_rt ALTER COLUMN n TYPE INT") }
      assert(e1.getMessage.contains("CAST"), e1.getMessage)
      val e2 = intercept[Exception] {
        spark.sql("ALTER TABLE evo_rt ALTER COLUMN id TYPE STRING") }
      assert(e2.getMessage.contains("CAST"), e2.getMessage)
      val e3 = intercept[Exception] {
        spark.sql("ALTER TABLE evo_rt ALTER COLUMN grp TYPE DOUBLE") }
      assert(e3.getMessage.contains("partition column"), e3.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS evo_rt")
  }

  test("a checkpointed stream rides through DROP COLUMN of an unread column (no re-delivery)") {
    val dir = tmpDir("scbf-evo-dcs")
    spark.sql("DROP TABLE IF EXISTS evo_dcs")
    new Path(dir).getFileSystem(hconf).delete(new Path(dir), true)
    try {
      spark.sql(s"CREATE TABLE evo_dcs (id INT, extra DOUBLE) USING scbf LOCATION '$dir'")
      spark.sql("INSERT INTO evo_dcs SELECT CAST(id AS INT), CAST(0.0 AS DOUBLE) FROM range(0, 50)")
      val seen = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
      // the stream reads ONLY the surviving column — dropping `extra`
      // must look like a compaction (the dropped column's removal does
      // not change the rows of the columns the stream carries)
      val q = spark.readStream.format("scbf").schema("id INT").load(dir)
        .writeStream.foreachBatch {
          (df: org.apache.spark.sql.DataFrame, _: Long) =>
            val ids = df.select(col("id")).collect().map(_.getInt(0)).toSeq
            seen.synchronized { seen += ids }
            ()
        }.start()
      try {
        q.processAllAvailable()
        assert(seen.flatten.sorted == (0 until 50), s"baseline: $seen")
        spark.sql("ALTER TABLE evo_dcs DROP COLUMN extra")
        q.processAllAvailable()
        assert(seen.flatten.size == 50,
          s"DROP COLUMN must not re-deliver rows: ${seen.flatten.size}")
        spark.sql("INSERT INTO evo_dcs VALUES (1000)")
        q.processAllAvailable()
        assert(seen.flatten.sorted == ((0 until 50) :+ 1000),
          s"appended row must arrive: $seen")
      } finally q.stop()
    } finally spark.sql("DROP TABLE IF EXISTS evo_dcs")
  }

  test("a checkpointed stream rides through ADD COLUMN like a compaction (no re-delivery)") {
    val dir = tmpDir("scbf-evo-acs")
    spark.sql("DROP TABLE IF EXISTS evo_acs")
    new Path(dir).getFileSystem(hconf).delete(new Path(dir), true)
    try {
      spark.sql(s"CREATE TABLE evo_acs (id INT) USING scbf LOCATION '$dir'")
      spark.sql("INSERT INTO evo_acs SELECT CAST(id AS INT) FROM range(0, 50)")
      val seen = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
      val q = spark.readStream.format("scbf").schema("id INT").load(dir)
        .writeStream.foreachBatch {
          (df: org.apache.spark.sql.DataFrame, _: Long) =>
            val ids = df.select(col("id")).collect().map(_.getInt(0)).toSeq
            seen.synchronized { seen += ids }
            ()
        }.start()
      try {
        q.processAllAvailable()
        assert(seen.flatten.sorted == (0 until 50), s"baseline: $seen")
        spark.sql("ALTER TABLE evo_acs ADD COLUMN score DOUBLE DEFAULT 0.0")
        q.processAllAvailable()
        // rowsChanged=false rewrite: the caught-up stream skips it
        assert(seen.flatten.size == 50,
          s"ADD COLUMN must not re-deliver rows: ${seen.flatten.size}")
        // post-rewrite appends still flow (log continuity preserved)
        spark.sql("INSERT INTO evo_acs VALUES (1000, 9.0)")
        q.processAllAvailable()
        assert(seen.flatten.sorted == ((0 until 50) :+ 1000),
          s"appended row must arrive: $seen")
      } finally q.stop()
    } finally spark.sql("DROP TABLE IF EXISTS evo_acs")
  }

  test("path-based swap: directory rename completes the rewrite atomically for path readers") {
    val live = tmpDir("scbf-evo-live")
    val next = live + ".next"
    val retired = live + ".v1"
    spark.range(0, 50).select(col("id").cast("int").as("id"))
      .write.format("scbf").mode("overwrite").save(live)
    // successor rewrite with a widened schema (int id + new flag)
    spark.read.format("scbf").load(live)
      .select(col("id"), lit("ok").as("flag"))
      .write.format("scbf").mode("overwrite").save(next)
    val fs = new Path(live).getFileSystem(hconf)
    // the swap: two renames; readers between them see v1 then v2 —
    // single-directory rename is the atomic unit HDFS/posix give us
    assert(fs.rename(new Path(live), new Path(retired)))
    assert(fs.rename(new Path(next), new Path(live)))
    val df = spark.read.format("scbf").load(live)
    assert(df.columns.toSeq == Seq("id", "flag"))
    assert(df.count() == 50L)
  }
}
