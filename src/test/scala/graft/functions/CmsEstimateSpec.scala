package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** CmsEstimate: the probe path must share hashing with the
 * count_min_sketch aggregate's add path (CMS's structural guarantees
 * only hold when add and estimate agree), codegen and interpreted
 * eval agree, and the never-undercount property holds pointwise. */
class CmsEstimateSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("estimates never undercount and respect the eps bound on skewed keys") {
    val n = 20000
    val df = spark.range(0, n)
      .select((col("id") % 997).cast("string").as("k")) // ~20 hits/key
      .cache()
    val sk = df.agg(expr("count_min_sketch(k, 0.001d, 0.99d, 42)"))
      .head.getAs[Array[Byte]](0)
    val exact = df.groupBy(col("k")).agg(count(lit(1)).as("c"))
    val checked = exact
      .withColumn("est", GraftFunctions.cmsEstimate(col("k"), sk))
      .select(
        sum(when(col("est") < col("c"), 1).otherwise(0)).as("under"),
        sum(when(col("est") > col("c") + math.ceil(0.002 * n).toLong, 1)
          .otherwise(0)).as("over"))
      .head
    assert(checked.getLong(0) == 0, "CMS must never undercount")
    assert(checked.getLong(1) == 0, "estimates beyond exact + 2*eps*N")
  }

  test("a key the sketch never saw estimates only collision mass") {
    val df = Seq.fill(1000)("present").toDF("k")
    val sk = df.agg(expr("count_min_sketch(k, 0.01d, 0.99d, 42)"))
      .head.getAs[Array[Byte]](0)
    val absent = Seq("absent").toDF("k")
      .select(GraftFunctions.cmsEstimate(col("k"), sk)).as[Long].head
    // one distinct present key: the absent key collides with it in a
    // row only with ~width^-depth probability — estimate must be far
    // below the present key's 1000
    assert(absent < 1000, s"absent-key estimate $absent")
    val present = Seq("present").toDF("k")
      .select(GraftFunctions.cmsEstimate(col("k"), sk)).as[Long].head
    assert(present >= 1000, s"present-key estimate $present must cover its count")
  }
}
