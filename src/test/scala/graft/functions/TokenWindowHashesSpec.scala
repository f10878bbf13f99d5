package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** TokenWindowHashes: bit-identity with the interpreted
 * transform/xxhash64 HOF chain it replaces, and edge behavior. */
class TokenWindowHashesSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("bit-identical to the xxhash64 HOF chain on corpus text") {
    val L = 8
    val windowKey = (1 to L).map(k => s"element_at(th, i + $k)").mkString(", ")
    val docs = graft.operators.DedupQueries.corpus(spark, "/root/testdata/sf0.001")
      .limit(200)
      .select(split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= L)
    val viaHof = docs
      .select(expr("transform(w, t -> xxhash64(t))").as("th"))
      .select(expr(s"transform(sequence(0, size(th) - $L), i -> xxhash64($windowKey))"))
      .as[Seq[Long]].collect()
    val viaKernel = docs
      .select(GraftFunctions.tokenWindowHashes(col("w"), L))
      .as[Seq[Long]].collect()
    assert(viaHof.length == viaKernel.length && viaHof.length > 0)
    viaHof.zip(viaKernel).zipWithIndex.foreach { case ((h, k), i) =>
      assert(h == k, s"doc $i: HOF $h != kernel $k")
    }
  }

  test("both kernels are SQL-callable after registration") {
    GraftFunctions.register(spark)
    val twh = spark.sql(
      "SELECT token_window_hashes(array('a','b','c'), 2) AS h").as[Seq[Long]].head
    assert(twh.length == 2)
    val wf = spark.sql(
      "SELECT winnow_fingerprints(array('a','b','c','d'), 2, 2) AS f")
      .selectExpr("size(f)").as[Int].head
    assert(wf >= 1)
    val e = intercept[Exception] {
      spark.sql("SELECT token_window_hashes(array('a'), 1 + 1)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("short arrays yield empty; null token throws") {
    val short = Seq(Seq("a", "b")).toDF("w")
      .select(GraftFunctions.tokenWindowHashes(col("w"), 8))
      .as[Seq[Long]].head
    assert(short.isEmpty)
    val ex = intercept[Exception] {
      Seq(1).toDF("x")
        .select(GraftFunctions.tokenWindowHashes(
          array(lit("a"), lit(null).cast("string"), lit("c")), 2))
        .collect()
    }
    assert(ex.getMessage != null)
  }
}
