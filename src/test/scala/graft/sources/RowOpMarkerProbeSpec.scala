package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * PROBE, pinned: Spark 4.1.2's group-based ReplaceData hands the
 * writer TABLE-WIDTH rows on every COW path (subquery UPDATE, MERGE,
 * subquery DELETE) — the `__row_operation` marker column
 * (RowDeltaUtils: DELETE=1 UPDATE=2 INSERT=3 REINSERT=4 WRITE=5
 * WRITE_WITH_METADATA=6) is NOT present, so a marker-split row-exact
 * SQL CDC is not available on the group-based path and the
 * value-level multiset capture (ScbfRowLevelBatchWrite.commit) is
 * forced. The stripping factory's +1-width branch stays as defense
 * against plan-shape changes. Row-exact SQL CDC therefore requires
 * the delta-based route (SupportsDelta / WriteDelta), where Spark
 * hands per-row operations explicitly. If this pin ever FAILS with
 * markers present, revisit ScbfCdc's value-level residual — the
 * cheaper exact capture just became possible.
 */
class RowOpMarkerProbeSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def probe[T](body: => T): (T, Map[Int, Int]) = {
    val seen = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicInteger]()
    ScbfRowOpStrippingFactory.markerProbe = m =>
      seen.computeIfAbsent(m, _ => new java.util.concurrent.atomic.AtomicInteger()).incrementAndGet()
    ScbfRowOpStrippingFactory.probeEnabled = true
    try {
      val r = body
      import scala.jdk.CollectionConverters._
      (r, seen.asScala.map { case (k, v) => k -> v.get() }.toMap)
    } finally {
      ScbfRowOpStrippingFactory.probeEnabled = false
      ScbfRowOpStrippingFactory.markerProbe = _ => ()
    }
  }

  test("probe: marker distribution for SQL UPDATE / MERGE / subquery DELETE") {
    val dir = tmpDir("scbf-rowop-probe")
    spark.sql("DROP TABLE IF EXISTS rowop_probe")
    spark.sql(s"CREATE TABLE rowop_probe (id INT, v INT) USING scbf LOCATION '$dir'")
    (0 until 100).map(i => (i, i)).toDF("id", "v")
      .coalesce(1).write.format("scbf").mode("append").save(dir)

    // subquery-conditioned UPDATE routes to the COW path (plain WHERE
    // would take the ScbfDelete fast path)
    val (_, updMarks) = probe {
      spark.sql("""UPDATE rowop_probe SET v = v + 1000
        WHERE id IN (SELECT id FROM rowop_probe WHERE id < 30)""")
    }
    println(s"[marker-probe] UPDATE markers (value -> rows): $updMarks")

    val (_, mrgMarks) = probe {
      (200 until 220).map(i => (i, i)).toDF("id", "v").createOrReplaceTempView("rowop_src")
      spark.sql("""MERGE INTO rowop_probe t USING rowop_src s ON t.id = s.id - 190
        WHEN MATCHED THEN UPDATE SET t.v = s.v
        WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")
    }
    println(s"[marker-probe] MERGE markers (value -> rows): $mrgMarks")

    val (_, delMarks) = probe {
      spark.sql("""DELETE FROM rowop_probe
        WHERE id IN (SELECT id FROM rowop_probe WHERE v >= 1000 AND id < 5)""")
    }
    println(s"[marker-probe] DELETE markers (value -> rows): $delMarks")
    // Spark 4.1.2 pin: no +1-width rows on any group-based COW path —
    // see the class scaladoc for what a failure here would mean
    assert(updMarks.isEmpty && mrgMarks.isEmpty && delMarks.isEmpty,
      s"ReplaceData now emits __row_operation markers (upd=$updMarks " +
        s"mrg=$mrgMarks del=$delMarks) — row-exact group-based CDC became possible")
    // and the operations themselves behaved: UPDATE bumped ids 0..29,
    // MERGE re-set ids 10..29 to 200..219 (all matched, no inserts),
    // DELETE removed ids 0..4 — leaving ids 5..9 at v>=1000, 95 rows
    assert(spark.sql("SELECT COUNT(*) FROM rowop_probe WHERE v >= 1000").head().getLong(0) == 5L)
    assert(spark.sql("SELECT COUNT(*) FROM rowop_probe").head().getLong(0) == 95L)
  }
}
