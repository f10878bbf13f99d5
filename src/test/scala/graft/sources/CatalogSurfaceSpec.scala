package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The session-catalog SQL surface over SCBF tables beyond q45's
 * CREATE/INSERT/DELETE/SELECT path: CTAS, INSERT OVERWRITE, SHOW/
 * DESCRIBE — what a SQL-only user reaches for next. */
class CatalogSurfaceSpec extends AnyFunSuite with SparkTestBase {

  test("CREATE TABLE ... USING scbf AS SELECT (CTAS) materializes and reads back") {
    val dir = tmpDir("scbf-ctas")
    spark.sql("DROP TABLE IF EXISTS scbf_ctas")
    try {
      spark.range(0, 100)
        .select(col("id").cast("int").as("id"),
          concat(lit("n"), col("id")).as("name"))
        .createOrReplaceTempView("ctas_src")
      spark.sql(s"CREATE TABLE scbf_ctas USING scbf LOCATION '$dir' AS SELECT * FROM ctas_src")
      assert(spark.sql("SELECT COUNT(*), MIN(id), MAX(id) FROM scbf_ctas").head()
        == org.apache.spark.sql.Row(100L, 0, 99))
      // written through the connector: stats manifest exists → agg pushdown
      ScbfUtil.dataFileOpens.set(0)
      assert(spark.sql("SELECT COUNT(*) FROM scbf_ctas").head().getLong(0) == 100L)
      assert(ScbfUtil.dataFileOpens.get == 0, "CTAS output must carry stats for pushdown")
    } finally spark.sql("DROP TABLE IF EXISTS scbf_ctas")
  }

  test("INSERT OVERWRITE replaces a catalog table's contents") {
    val dir = tmpDir("scbf-ins-over")
    spark.sql("DROP TABLE IF EXISTS scbf_over")
    try {
      spark.sql(s"CREATE TABLE scbf_over (id INT, name STRING) USING scbf LOCATION '$dir'")
      spark.sql("INSERT INTO scbf_over VALUES (1, 'a'), (2, 'b')")
      spark.sql("INSERT OVERWRITE scbf_over VALUES (10, 'x')")
      val rows = spark.sql("SELECT * FROM scbf_over").collect()
      assert(rows.toSeq.map(r => (r.getInt(0), r.getString(1))) == Seq((10, "x")))
    } finally spark.sql("DROP TABLE IF EXISTS scbf_over")
  }

  test("DESCRIBE and SHOW TABLES see the scbf table; mismatched INSERT fails loudly") {
    val dir = tmpDir("scbf-desc")
    spark.sql("DROP TABLE IF EXISTS scbf_desc")
    try {
      spark.sql(s"CREATE TABLE scbf_desc (id INT, name STRING) USING scbf LOCATION '$dir'")
      val cols = spark.sql("DESCRIBE TABLE scbf_desc").collect()
        .map(_.getString(0)).filterNot(_.startsWith("#"))
      assert(cols.contains("id") && cols.contains("name"))
      assert(spark.sql("SHOW TABLES").collect().exists(_.getString(1) == "scbf_desc"))
      // type-mismatched INSERT: analysis rejects (store assignment policy)
      intercept[Exception] {
        spark.sql("INSERT INTO scbf_desc VALUES ('not-an-int', 'a', 'extra')")
      }
    } finally spark.sql("DROP TABLE IF EXISTS scbf_desc")
  }
}
