package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class MinHashSketchSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("sketch equals 48 separate min(xxhash64(i, x)) aggregates bit-for-bit") {
    val n = 48
    val rnd = new scala.util.Random(3)
    val rows = (0 until 2000).map(_ => (rnd.nextInt(20), rnd.nextLong()))
    val df = rows.toDF("g", "x").repartition(8) // partial+merge both exercised
    val viaSketch = df.groupBy($"g")
      .agg(GraftFunctions.minhashSketch($"x", n).as("mhs"))
      .as[(Int, Seq[Long])].collect().toMap
    val aggs = (0 until n).map(i => min(xxhash64(lit(i), $"x")).as(s"mh$i"))
    val viaExprs = df.groupBy($"g").agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getInt(0) -> (1 to n).map(r.getLong)).toMap
    assert(viaSketch.keySet == viaExprs.keySet)
    viaExprs.foreach { case (g, expect) =>
      assert(viaSketch(g) == expect, s"group $g")
    }
  }

  test("null inputs are ignored like min(); wrong input type fails analysis") {
    val df = Seq(Some(7L), None, Some(9L)).toDF("x")
    val got = df.agg(GraftFunctions.minhashSketch($"x", 4)).as[Seq[Long]].head()
    val expect = df.filter($"x".isNotNull)
      .agg(GraftFunctions.minhashSketch($"x", 4)).as[Seq[Long]].head()
    assert(got == expect)
    val e = intercept[Exception] {
      Seq("s").toDF("x").agg(GraftFunctions.minhashSketch($"x", 4)).collect()
    }
    assert(e.getMessage.contains("bigint"))
  }

  test("an all-null group evals to NULL like min(), not a shared sentinel sketch") {
    val df = Seq((0, Some(7L)), (1, None), (1, None)).toDF("g", "x")
    val rows = df.groupBy($"g").agg(GraftFunctions.minhashSketch($"x", 4).as("s"))
      .orderBy($"g").collect()
    assert(!rows(0).isNullAt(1))
    assert(rows(1).isNullAt(1), "all-null group must be NULL")
  }

  test("SQL surface supports FILTER (WHERE ...) on the aggregate") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT minhash_sketch(x, 4) FILTER (WHERE x > 0) AS s
        |FROM VALUES (CAST(-1 AS BIGINT)), (CAST(5 AS BIGINT)) AS t(x)""".stripMargin)
      .collect().head.getSeq[Long](0)
    val expect = spark.sql(
      "SELECT minhash_sketch(x, 4) AS s FROM VALUES (CAST(5 AS BIGINT)) AS t(x)")
      .collect().head.getSeq[Long](0)
    assert(r == expect)
  }
}
