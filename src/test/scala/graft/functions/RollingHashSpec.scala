package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class RollingHashSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("matches the interpreted aggregate/transform HOF chain bit-exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("w", split($"text", " "))
    val native = docs.select(GraftFunctions.rollingHash($"w").as("h"))
      .as[Long].collect().toSeq
    val hof = docs.select(expr(
      """aggregate(
        |  transform(w, t -> CAST(conv(substr(md5(t), 1, 8), 16, 10) AS BIGINT)),
        |  CAST(0 AS BIGINT),
        |  (a, x) -> (a * 1000003 + x) % 2147483647)""".stripMargin).as("h"))
      .as[Long].collect().toSeq
    assert(native == hof)
  }

  test("empty array hashes to 0; null array to null") {
    val r = Seq((Some(Seq.empty[String])), (None: Option[Seq[String]]))
      .toDF("w")
      .select(GraftFunctions.rollingHash($"w").as("h"))
      .collect().map(row => if (row.isNullAt(0)) None else Some(row.getLong(0)))
    assert(r.toSeq == Seq(Some(0L), None))
  }

  test("two calls in one projection do not collide in codegen") {
    val r = Seq(Seq("a", "b", "c")).toDF("w")
      .select(GraftFunctions.rollingHash($"w").as("h1"),
        GraftFunctions.rollingHash(reverse($"w")).as("h2"))
      .as[(Long, Long)].collect().head
    assert(r._1 != r._2) // order-sensitive by construction
  }
}
