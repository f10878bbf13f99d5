package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins session_window's exact boundary rule, which q33's oracle must
 * mirror: two events EXACTLY one gap apart merge into one session
 * (new session only when the next start is strictly past the current
 * end); one microsecond more splits them. Discovered in review — the
 * oracle's original `diff >= gap` break disagreed with Spark on the
 * boundary and only passed because no fixture pair landed there. */
class SessionBoundarySpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("events exactly one gap apart merge; gap + 1 us splits") {
    val gapUs = 1800000000L
    val df = Seq((1L, 0L), (1L, gapUs), (2L, 0L), (2L, gapUs + 1))
      .toDF("user_id", "tsu")
      .withColumn("tsm", expr("timestamp_micros(tsu)"))
    val sessions = df
      .groupBy(col("user_id"), session_window(col("tsm"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), col("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(sessions(1L) == Seq(2L), s"boundary pair must merge: $sessions")
    assert(sessions(2L) == Seq(1L, 1L), s"gap+1us must split: $sessions")
  }

  test("the q33 oracle's break rule agrees with Spark on synthetic boundary data") {
    // replicate the oracle's gaps-and-islands in Spark SQL over the same
    // boundary fixture and require identical session counts
    val gapUs = 1800000000L
    val df = Seq((1L, 0L), (1L, gapUs), (1L, 2 * gapUs), (2L, 0L), (2L, gapUs + 1))
      .toDF("user_id", "tsu")
    df.createOrReplaceTempView("boundary_events")
    try {
      val islands = spark.sql(
        s"""WITH f AS (SELECT user_id, tsu,
           |  CASE WHEN lag(tsu) OVER w IS NULL
           |         OR tsu - lag(tsu) OVER w > $gapUs THEN 1 ELSE 0 END AS brk
           |  FROM boundary_events WINDOW w AS (PARTITION BY user_id ORDER BY tsu))
           |SELECT user_id, COUNT(DISTINCT sess) n FROM (
           |  SELECT user_id, SUM(brk) OVER (PARTITION BY user_id ORDER BY tsu) sess FROM f)
           |GROUP BY user_id""".stripMargin)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val sw = df.withColumn("tsm", expr("timestamp_micros(tsu)"))
        .groupBy(col("user_id"), session_window(col("tsm"), "30 minutes"))
        .count()
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(islands == sw, s"islands=$islands session_window=$sw")
    } finally spark.catalog.dropTempView("boundary_events")
  }
}
