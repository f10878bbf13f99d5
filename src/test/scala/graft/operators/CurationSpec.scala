package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

/** t13 (corpus curation): the composed verdict must agree with the
 * individual signal operators it reuses, and the rule order must be
 * the deterministic first-failing-rule contract. */
class CurationSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val out = SparkEntry.queries("t13_curation")(spark, sf).cache()

  test("every verdict class occurs on the planted corpus") {
    val reasons = out.select("reason").distinct()
      .collect().map(_.getString(0)).toSet
    assert(reasons == Set("keep", "dup", "lang", "quality", "pii"), reasons)
  }

  test("keep is exactly the conjunction of the four gates") {
    val bad = out.filter(
      (col("keep") === 1) =!= (col("keeper") === 1 &&
        col("pred_lang") =!= "und" && col("quality") >= 0.6 &&
        col("n_pii") === 0)).count()
    assert(bad == 0)
  }

  test("quality agrees with t2 on the unmutated documents") {
    val t2 = SparkEntry.queries("t2_quality")(spark, sf)
      .select(col("doc_id"), col("quality").as("q2"))
    val diff = out.filter(col("doc_id") < 100000)
      .join(t2, "doc_id").filter(col("quality") =!= col("q2")).count()
    assert(diff == 0, "t13's quality drifted from t2's")
  }

  test("dup losers are exactly the non-min doc of each duplicate text") {
    val c = DedupQueries.corpus(spark, sf)
      .groupBy(md5(col("text"))).agg(min(col("doc_id")).as("kid"),
        count(lit(1)).as("n"))
    val expectedLosers = c.agg(sum(col("n") - 1)).head().getLong(0)
    val losers = out.filter(col("reason") === "dup").count()
    assert(losers == expectedLosers, s"$losers vs $expectedLosers")
  }
}
