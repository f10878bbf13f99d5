package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Property check for Ops.saltedTopK: on any input with a total order,
 * the two-pass salted ranking must equal the single-window ranking it
 * replaces — including groups smaller than k, duplicate sort values
 * (broken by the unique tiebreak), and k larger than any salt bucket. */
class SaltedTopKSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id".asc)
    df.withColumn("rank", row_number().over(w)).filter($"rank" <= k)
      .select("g", "rank", "id").as[(Int, Int, Long)].collect().toSet
  }

  test("salted top-k equals the naive window on skewed random data with ties") {
    val rnd = new scala.util.Random(7)
    // group 0 holds ~80% of rows (the skew the salt exists for); values
    // collide heavily so tie-breaking is actually exercised
    val rows = (0L until 5000L).map { id =>
      val g = if (rnd.nextDouble() < 0.8) 0 else 1 + rnd.nextInt(4)
      (id, g, rnd.nextInt(50).toDouble)
    }
    val df = rows.toDF("id", "g", "v").repartition(8)
    Seq(1, 3, 7, 40).foreach { k =>
      val salted = Ops.saltedTopK(df, Seq($"g"), Seq($"v".desc, $"id".asc), $"id", k, "rank")
        .select("g", "rank", "id").as[(Int, Int, Long)].collect().toSet
      assert(salted == naive(df, k), s"k=$k diverged")
    }
  }

  test("groups smaller than k return every row, exactly ranked") {
    val df = Seq((1L, 0, 9.0), (2L, 0, 5.0), (3L, 1, 1.0)).toDF("id", "g", "v")
    val got = Ops.saltedTopK(df, Seq($"g"), Seq($"v".desc, $"id".asc), $"id", 10, "rank")
      .select("g", "rank", "id").as[(Int, Int, Long)].collect().toSet
    assert(got == Set((0, 1, 1L), (0, 2, 2L), (1, 1, 3L)))
  }
}
