package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

/** Every SparkEntry query must run end-to-end at sf0.001 — catches
 * wiring/analysis regressions without waiting for the driver's
 * sf0.01 verify. Correctness belongs to the DuckDB oracle gate
 * (scripts/check.py); this is execution-only. */
class QueriesSmokeSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query and vice versa — zero rows-only entries") {
    // d6/d11 graduated to exact oracles in round 3; q28 graduated in
    // round 7 (bounded-error verdict booleans the oracle asserts TRUE)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet,
      s"rows-only queries remain: ${SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet}")
    // the ++ of the four query maps must not silently drop a duplicate key
    val total = RelationalQueries.queries.size + AdvancedQueries.queries.size +
      DedupQueries.queries.size + TextQueries.queries.size
    assert(SparkEntry.queries.size == total, "duplicate query name across modules")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      df.collect() // must not throw
    }
  }
}
