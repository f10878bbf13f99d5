package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins q28's scale-adaptive value-at-rank gate: the simple per-rf
 * window plan (narrow sources) and the chunked range-partitioned plan
 * (wide sources) must read IDENTICAL boundary values — including on
 * tie-heavy data where range partitioning splits a run of equal values
 * across chunks, the case where a rank-order-dependent bug would show. */
class RankBoundsSpec extends AnyFunSuite with SparkTestBase {

  private def boundsOf(chunked: Boolean, df: org.apache.spark.sql.DataFrame) =
    AdvancedQueries.valueAtRankBounds(spark, df, chunked)
      .orderBy("rf").collect().map(_.toSeq).toSeq

  test("simple and chunked rank bounds agree, ties spanning chunks") {
    import spark.implicits._
    // three groups of co-prime sizes; v has heavy ties (v = i % 7) so
    // every chunk boundary lands inside a tie run at shuffle=4
    val rows = (0 until 997).map(i => ("A", (i % 7).toDouble)) ++
      (0 until 503).map(i => ("B", (i % 5).toDouble)) ++
      (0 until 101).map(i => ("C", (i % 3).toDouble))
    val df = rows.toDF("rf", "v").repartition(8)
    val simple = boundsOf(chunked = false, df)
    val chunkedB = boundsOf(chunked = true, df)
    assert(simple === chunkedB)
    assert(simple.size === 3)
  }

  test("unique values: both paths read the exact rank values") {
    import spark.implicits._
    // a known permutation with unique v per rf: rank r holds value r-1
    val rows = new scala.util.Random(42)
      .shuffle((0 until 1000).toList).map(i => ("X", i.toDouble))
    val df = rows.toDF("rf", "v").repartition(8)
    val simple = boundsOf(chunked = false, df)
    val chunkedB = boundsOf(chunked = true, df)
    assert(simple === chunkedB)
    // n=1000: mlo = floor(.49*999)+1 = 490 -> v=489; mhi = ceil(.51*999)+1 = 511 -> v=510
    // plo = floor(.94*999)+1 = 940 -> v=939; phi = ceil(.96*999)+1 = 961 -> v=960
    assert(simple.head === Seq("X", 489.0, 510.0, 939.0, 960.0))
  }
}
