package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** d19 classifies the increment (mutated half of the planted corpus)
 * against the ingested history (originals): statuses must match a naive
 * in-memory replay, and the plan must stay join/aggregate-shaped — the
 * membership probe is an equi-join on the text hash, the within-batch
 * winner a partial-combine aggregate, never a window or a cartesian. */
class IncrementalDedupSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def naive(): Map[Long, String] = {
    val cps = DedupQueries.corpus(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val history = cps.filter(_._1 < 100000).map(_._2).toSet
    val batch = cps.filter(_._1 >= 100000)
    val firstId = batch.groupBy(_._2).map { case (t, rs) => (t, rs.map(_._1).min) }
    batch.map { case (id, text) =>
      id -> (if (history.contains(text)) "dup_vs_history"
             else if (firstId(text) != id) "dup_in_batch"
             else "new")
    }.toMap
  }

  test("d19 == naive history/batch classification, doc for doc") {
    val got = DedupQueries.queries("d19_incremental_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val expected = naive()
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, st) => assert(st == expected(id), s"doc $id") }
    // the planted corpus must actually exercise the cross-batch path
    assert(got.values.count(_ == "dup_vs_history") > 0,
      "no planted history duplicates — the fixture lost its signal")
  }

  test("d20 flags == naive replay over the d2 pair graph") {
    val pairs = DedupQueries.queries("d2_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))) // doc_a < doc_b
    val batch = DedupQueries.corpus(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") >= 100000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = batch.map { d =>
      val partners = pairs.collect { case (a, b) if b == d => a }
      d -> ((if (partners.exists(_ < 100000)) 1 else 0,
             if (partners.exists(_ >= 100000)) 1 else 0))
    }.toMap
    val got = DedupQueries.queries("d20_incremental_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, (nh, nb, keep)) =>
      assert((nh, nb) == expected(id), s"doc $id")
      assert(keep == (if (nh == 0 && nb == 0) 1 else 0), s"doc $id keep")
    }
    // the planted near-dups must exercise the history edge
    assert(got.values.count(_._1 == 1) > 0, "no increment doc is near a history doc")
  }

  test("d19 plan: equi-joins + partial-combine aggregates, no window, no cartesian") {
    val p = DedupQueries.queries("d19_incremental_dedup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("windowspecdefinition"), p)
    assert("partial_min".r.findAllIn(p).nonEmpty, p)
  }
}
