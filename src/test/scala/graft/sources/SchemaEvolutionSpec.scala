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
