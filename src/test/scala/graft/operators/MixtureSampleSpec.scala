package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** t14's per-source token-budget fill must equal the naive in-memory
 * greedy fill exactly (same order key, same budget arithmetic), and its
 * grouped prefix scan must keep the two-pass range-partitioned shape —
 * never a window partitioned on the raw group key over the corpus. */
class MixtureSampleSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("t14 == naive greedy per-source fill, row for row") {
    val got = TextQueries.queries("t14_mixture_sample")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .sortBy(x => (x._1, x._2))

    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).as("tokens"),
        md5(col("doc_id").cast("string")).as("k"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getString(3)))
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      val budget = 400L * (1 + src.drop(3).toInt % 3)
      var cum = 0L
      rows.sortBy(r => (r._4, r._2)).flatMap { case (s, id, tok, _) =>
        cum += tok
        if (cum <= budget) Some((s, id, tok, cum, budget)) else None
      }
    }.sortBy(x => (x._1, x._2))

    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g == e) }
  }

  test("t14 keeps at least one doc per source and stops exactly at the budget") {
    val rows = TextQueries.queries("t14_mixture_sample")(spark, sf).collect()
    val bySrc = rows.groupBy(_.getString(0))
    val sources = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source")).distinct().collect().map(_.getString(0)).toSet
    assert(bySrc.keySet == sources, "every source must contribute")
    rows.foreach(r => assert(r.getLong(3) <= r.getLong(4),
      s"cum_tokens over budget: $r"))
  }

  test("t14 pins its range-partitioned prefix stage; only the tiny offsets window remains in-plan") {
    val p = TextQueries.queries("t14_mixture_sample")(spark, sf)
      .queryExecution.executedPlan.toString
    // the corpus-heavy stage (range partition + per-(chunk, group)
    // local running sum) is pinned behind a localCheckpoint — visible
    // here only as an ExistingRDD scan; its range-partition +
    // per-chunk-window shape is locked on the groupedPrefixSumStage
    // seam in PrefixScanSpec
    assert(p.contains("Scan ExistingRDD"), p)
    // the per-group offsets join back is a broadcast
    assert(p.contains("BroadcastHashJoin"), p)
    // every window left in the final plan is the per-group offsets
    // window over the ≤(chunks×groups)-row aggregate — recognizable by
    // its chunk-id ordering; the corpus never rides a window keyed
    // only on source
    val specs = "windowspecdefinition\\(".r.findAllIn(p).size
    val offs = "windowspecdefinition\\([^)]*__pid".r.findAllIn(p).size
    assert(specs > 0 && specs == offs, p)
  }
}
