package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

/** Semantic invariants of d15 (SemDeDup keeper selection) beyond the
 * hash oracle: full-corpus coverage, exactly one keeper per cluster,
 * min-id representatives, and planted-near-dup co-clustering. */
class SemanticDedupSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val out =
    SparkEntry.queries("d15_semantic_dedup")(spark, sf).cache()

  test("every corpus vector gets exactly one cluster assignment") {
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(out.count() == 2 * n) // originals + planted perturbed copies
    assert(out.select("vec_id").distinct().count() == 2 * n)
  }

  test("exactly one keeper per cluster, and it is the min vec_id") {
    val bad = out.groupBy(col("cluster_rep"))
      .agg(sum(col("keep")).as("keepers"), min(col("vec_id")).as("mn"))
      .filter(col("keepers") =!= 1 || col("mn") =!= col("cluster_rep"))
      .count()
    assert(bad == 0)
  }

  test("planted perturbed copies cluster with their originals") {
    // d8's perturbation is built to stay above the 0.8 cosine
    // threshold, so (v, v+100000) must share a cluster_rep
    val reps = out.select(col("vec_id"), col("cluster_rep"))
    val planted = reps.as("a").join(reps.as("b"),
        col("a.vec_id") + 100000 === col("b.vec_id"))
      .select(col("a.cluster_rep").as("ra"), col("b.cluster_rep").as("rb"))
    assert(planted.count() > 0)
    assert(planted.filter(col("ra") =!= col("rb")).count() == 0)
  }

  test("keep flags drop at least the planted copies") {
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val kept = out.agg(sum(col("keep"))).head().getLong(0)
    // every planted copy shares a cluster with its original, so at
    // most half the corpus survives
    assert(kept <= n)
    assert(kept > 0)
  }
}
