package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Ops.tsAsNanos — the one-point normalization that absorbs the
 * fixture's two historical `ts` spellings (nanos long; timestamp[us]
 * read as TIMESTAMP_NTZ) into the nanos-since-epoch contract every
 * events consumer is written against. Pinned directly here because the
 * end-to-end gates (q17/q21/q33/t5 hashes) would fail far from the
 * cause if this drifted. */
class TsNormalizeSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("TIMESTAMP_NTZ normalizes to naive nanos, timezone-independent") {
    // 2024-01-01 00:09:58.778549 naive = 1704067798778549 µs since the
    // naive epoch — DuckDB's epoch_us on the same value agrees by
    // construction (both are pure wall-clock arithmetic)
    val df = Seq("2024-01-01 00:09:58.778549", "1970-01-01 00:00:00")
      .toDF("s")
      .select(col("s").cast("timestamp_ntz").as("ts"))
    val out = Ops.tsAsNanos(df).select("ts").as[Long].collect().sorted
    assert(out.toSeq == Seq(0L, 1704067798778549000L))
  }

  test("an already-long ts column passes through untouched") {
    val df = Seq(42L, 1704067798778549000L).toDF("ts")
    assert(Ops.tsAsNanos(df).as[Long].collect().sorted.toSeq ==
      Seq(42L, 1704067798778549000L))
  }

  test("an unexpected ts type fails loudly instead of mis-normalizing") {
    val df = Seq("x").toDF("ts")
    intercept[IllegalStateException](Ops.tsAsNanos(df))
  }

  test("the real events fixture lands on the nanos contract at every SF") {
    Seq("sf0.001", "sf0.01").foreach { sf =>
      val e = Ops.events(spark, s"/root/testdata/$sf")
      assert(e.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      val (mn, mx) = e.agg(min("ts"), max("ts")).as[(Long, Long)].head()
      // 2024-era nanos: ~1.70e18..1.74e18 — a micros or millis value
      // slipping through would be 3 or 6 orders of magnitude off
      assert(mn > 1_600_000_000_000_000_000L && mx < 1_800_000_000_000_000_000L,
        s"$sf ts range [$mn, $mx] is not 2024-era nanos")
    }
  }
}
