package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.scbf.ScbfFormatException

/** Write-time schema validation on APPEND (ScbfWrite.validateAppendSchema):
 * a mismatched append must fail at write start with a named column/type
 * diff — never publish bytes that every later scan would reject. */
class AppendSchemaSpec extends AnyFunSuite with SparkTestBase {

  private def seed(dir: String): Unit =
    spark.range(0, 100)
      .select(col("id").cast("int").as("id"),
        concat(lit("v"), col("id")).as("tag"))
      .coalesce(1)
      .write.format("scbf").mode("overwrite").save(dir)

  private def appendFails(dir: String, df: org.apache.spark.sql.DataFrame): ScbfFormatException = {
    val e = intercept[Exception] {
      df.write.format("scbf").mode("append").save(dir)
    }
    // driver-side at write start; surfaces raw or Spark-wrapped
    var c: Throwable = e
    while (c != null && !c.isInstanceOf[ScbfFormatException]) c = c.getCause
    assert(c != null, s"expected ScbfFormatException in cause chain, got $e")
    c.asInstanceOf[ScbfFormatException]
  }

  test("mismatched append is rejected at write with a named column diff") {
    val dir = tmpDir("scbf-append-names")
    seed(dir)
    val bad = spark.range(0, 5)
      .select(col("id").cast("int").as("id"),
        lit("x").as("label")) // 'label' instead of 'tag'
    val ex = appendFails(dir, bad)
    assert(ex.getMessage.contains("missing column 'tag'"), ex.getMessage)
    assert(ex.getMessage.contains("unknown column 'label'"), ex.getMessage)
    // nothing was published: the table still reads exactly its 100 rows
    assert(spark.read.format("scbf").load(dir).count() == 100)
  }

  test("type-changed append is rejected with the old and new types named") {
    val dir = tmpDir("scbf-append-types")
    seed(dir)
    val bad = spark.range(0, 5)
      .select(col("id").cast("double").as("id"), lit("t").as("tag"))
    val ex = appendFails(dir, bad)
    assert(ex.getMessage.contains("column 'id' is int32 in the table but float64 in the append"),
      ex.getMessage)
  }

  test("column-order-only mismatch is rejected and says so") {
    val dir = tmpDir("scbf-append-order")
    seed(dir)
    val bad = spark.range(0, 5)
      .select(lit("t").as("tag"), col("id").cast("int").as("id"))
    val ex = appendFails(dir, bad)
    assert(ex.getMessage.contains("column order differs"), ex.getMessage)
  }

  test("matched append still works; overwrite may change the schema") {
    val dir = tmpDir("scbf-append-ok")
    seed(dir)
    spark.range(100, 150)
      .select(col("id").cast("int").as("id"),
        concat(lit("v"), col("id")).as("tag"))
      .coalesce(1)
      .write.format("scbf").mode("append").save(dir)
    assert(spark.read.format("scbf").load(dir).count() == 150)
    // overwrite replaces contents wholesale — new schema is fine
    spark.range(0, 10)
      .select(col("id").cast("double").as("x"))
      .coalesce(1)
      .write.format("scbf").mode("overwrite").save(dir)
    val df = spark.read.format("scbf").load(dir)
    assert(df.columns.toSeq == Seq("x") && df.count() == 10)
  }

  test("streaming sink into a mismatched directory fails the query at start") {
    val dir = tmpDir("scbf-append-stream")
    seed(dir)
    val ckpt = tmpDir("scbf-append-stream-ckpt")
    val src = tmpDir("scbf-append-stream-src")
    spark.range(0, 10)
      .select(col("id").cast("int").as("other"))
      .coalesce(1)
      .write.format("scbf").mode("overwrite").save(src)
    val q = spark.readStream.format("scbf").load(src)
      .writeStream.format("scbf")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start(dir)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    var c: Throwable = ex
    while (c != null && !c.isInstanceOf[ScbfFormatException]) c = c.getCause
    assert(c != null && c.getMessage.contains("schema mismatch"),
      s"expected schema-mismatch failure, got $ex")
    assert(spark.read.format("scbf").load(dir).count() == 100, "no rows published")
  }
}
