package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

/** Semantic invariants of d14 (paragraph-level exact dedup) that the
 * hash oracle alone doesn't spell out: global uniqueness of kept
 * chunks, order-preserving reassembly, and first-wins attribution. */
class ParagraphDedupSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val out =
    SparkEntry.queries("d14_paragraph_dedup")(spark, sf).cache()

  test("every chunk survives exactly once across the whole corpus") {
    // re-chunk the dedup_text outputs: the union of kept chunks must
    // contain each distinct chunk of the corpus exactly once
    val c = DedupQueries.ParagraphTokens
    val kept = out.filter(length(col("dedup_text")) > 0)
      .select(col("doc_id"), split(col("dedup_text"), " ").as("w"))
      .select(explode(expr(
        s"""transform(sequence(0, CAST(ceil(size(w) / $c.0) AS INT) - 1),
           |  i -> concat_ws(' ', slice(w, i * $c + 1, $c)))""".stripMargin))
        .as("chunk"))
    val dupCounts = kept.groupBy(col("chunk")).count()
      .filter(col("count") > 1).count()
    assert(dupCounts == 0, "a chunk survived dedup in more than one place")
  }

  test("n_kept sums to the number of distinct chunks; n_chunks to all") {
    val sums = out.agg(
      sum(col("n_kept")).as("kept"), sum(col("n_chunks")).as("all")).head()
    // the planted mutated copies guarantee shared chunks, so kept < all
    assert(sums.getLong(0) < sums.getLong(1), "corpus had no duplicate chunks")
    assert(sums.getLong(0) > 0)
  }

  test("first occurrence wins: doc 0 keeps all of its own chunks") {
    // (doc_id, idx) is the global order, so the minimum doc_id keeps
    // every one of its chunks (nothing precedes it)
    val first = out.orderBy(col("doc_id")).select("n_chunks", "n_kept").head()
    assert(first.getLong(0) == first.getLong(1))
  }

  test("reassembly preserves within-doc order") {
    // a doc's dedup_text must be a subsequence of its chunk sequence;
    // checking the full-survivor case (kept == all ⟹ text unchanged
    // modulo a possibly-short final chunk) covers the order property
    val c = 16
    val docs = DedupQueries.corpus(spark, sf)
      .join(out, "doc_id")
      .filter(col("n_kept") === col("n_chunks"))
    assert(docs.count() > 0)
    val mismatched = docs.filter(col("text") =!= col("dedup_text")).count()
    assert(mismatched == 0, "an all-kept doc was not reassembled verbatim")
  }
}
