package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SimHashSketchSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("matches the 64-separate-sum-aggregates spelling bit-exactly") {
    val tok = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", explode(split($"text", " ")).as("t"))
      .withColumn("hv_hi", expr("CAST(conv(substr(md5(t), 1, 8), 16, 10) AS BIGINT)"))
      .withColumn("hv_lo", expr("CAST(conv(substr(md5(t), 9, 8), 16, 10) AS BIGINT)"))
    val sketch = tok.groupBy($"doc_id")
      .agg(GraftFunctions.simhashSketch($"hv_hi", $"hv_lo").as("simhash"))
      .as[(Long, Long)].collect().toMap
    val bitAggs = (0 until 32).map(j =>
      sum(when(expr(s"(hv_lo >> $j) & 1") === 1, 1).otherwise(-1)).as(s"b$j")) ++
      (32 until 64).map(j =>
        sum(when(expr(s"(hv_hi >> ${j - 32}) & 1") === 1, 1).otherwise(-1)).as(s"b$j"))
    val spelled = tok.groupBy($"doc_id").agg(bitAggs.head, bitAggs.tail: _*)
      .select($"doc_id",
        ((0 until 63).map(j =>
          when(col(s"b$j") > 0, lit(1L << j)).otherwise(0L)) :+
          when(col("b63") > 0, lit(Long.MinValue)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
      .as[(Long, Long)].collect().toMap
    assert(sketch == spelled)
  }

  test("simhash_sketch is registered on the SQL surface like its sibling") {
    GraftFunctions.register(spark)
    Seq((1L, 3L, 5L), (1L, 2L, 9L)).toDF("g", "hi", "lo")
      .createOrReplaceTempView("shs_t")
    val viaSql = spark.sql(
      "SELECT g, simhash_sketch(hi, lo) AS s FROM shs_t GROUP BY g")
      .as[(Long, Long)].collect().toMap
    val viaDsl = spark.table("shs_t").groupBy($"g")
      .agg(GraftFunctions.simhashSketch($"hi", $"lo").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(viaSql == viaDsl)
  }

  test("all-null and empty groups eval to null, like sum()") {
    val r = Seq((1L, Some(5L), Some(7L)), (2L, None, None))
      .toDF("g", "hi", "lo")
      .groupBy($"g").agg(GraftFunctions.simhashSketch($"hi", $"lo").as("s"))
      .collect().map(row => row.getLong(0) -> row.isNullAt(1)).toMap
    assert(r == Map(1L -> false, 2L -> true))
  }
}
