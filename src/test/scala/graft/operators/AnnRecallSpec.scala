package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Quantitative anchors for the two approximate ANN paths (d6
 * hyperplane LSH, d11 IVF), which are rows-only in the driver gate.
 *
 * Random synthetic embeddings have near-orthogonal "nearest" neighbors
 * (top-3 cosine ≈ 0.2-0.4), which candidate generation is *designed*
 * to discard — so recall against d5's exact top-3 on raw data is not
 * the right anchor (measured: LSH ≈ 0.07, IVF ≈ 0.33-0.6 across SFs).
 * The property the operators must deliver at 100 TB is: a true
 * near-duplicate (cosine ≈ 1) lands in the same bucket/cell as its
 * original and is returned. This spec plants one perturbed copy of
 * every query vector (d8's perturbation, sim ≈ 0.999) into the corpus
 * and requires each path to surface it as the #1 neighbor. */
class AnnRecallSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** embeddings ∪ a perturbed copy of each vector (vec_id + 100000). */
  private def plantedCorpus(): DataFrame = {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    emb.unionByName(emb.select((col("vec_id") + 100000).as("vec_id"),
      expr(DedupQueries.PerturbExpr).as("e")))
  }

  private def plantedHitRate(result: DataFrame): Double = {
    val top1 = result.filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(top1.keySet == Set(0L, 1L, 2L, 3L, 4L), s"missing queries: $top1")
    top1.count { case (q, v) => v == q + 100000 }.toDouble / top1.size
  }

  test("d6 LSH surfaces every planted near-duplicate as the #1 neighbor") {
    assert(plantedHitRate(DedupQueries.annLshTopK(plantedCorpus(), col("vec_id") < 5)) == 1.0)
  }

  test("d11 IVF surfaces every planted near-duplicate as the #1 neighbor") {
    assert(plantedHitRate(DedupQueries.annIvfTopK(plantedCorpus(), col("vec_id") < 5)) == 1.0)
  }

  test("d11 IVF returns exactly 3 ranked rows per query on raw data") {
    val rows = DedupQueries.queries("d11_ann_ivf")(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach(r => assert(r.map(_.getInt(1)).sorted.sameElements(Array(1, 2, 3))))
  }

  test("d11 IVF candidate generation prunes: beats 1/4 of the corpus, finds most exact neighbors") {
    // on raw data IVF still recovers a majority of d5's exact top-3 —
    // the honest floor for nprobe/kCells = 1/4 on near-random vectors
    val exact = DedupQueries.queries("d5_ann_bruteforce")(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (q, r) => q -> r.map(_.getLong(2)).toSet }
    val got = DedupQueries.queries("d11_ann_ivf")(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (q, r) => q -> r.map(_.getLong(2)).toSet }
    val hits = exact.map { case (q, s) => (got.getOrElse(q, Set.empty[Long]) & s).size }.sum
    assert(hits.toDouble / exact.values.map(_.size).sum >= 0.5)
  }
}
