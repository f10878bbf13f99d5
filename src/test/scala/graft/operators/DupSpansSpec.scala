package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

/** Semantic invariants of d16 (duplicated-span detection) beyond the
 * hash oracle: geometry, per-doc maximality/disjointness, and that
 * every flagged span really is corpus-duplicated. */
class DupSpansSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private val L = DedupQueries.DupSpanTokens

  private lazy val out =
    SparkEntry.queries("d16_dup_spans")(spark, sf).cache()

  test("the planted corpus produces spans, all with consistent geometry") {
    assert(out.count() > 0)
    val bad = out.filter(
      col("span_tokens") =!= col("span_end") - col("span_start") + 1 ||
        col("span_tokens") < L).count()
    assert(bad == 0)
  }

  test("spans within a doc are maximal and disjoint") {
    // islands merge consecutive duplicated window starts, so the next
    // span's first window must start >= 2 after this span's last
    // window (start = span_end - L + 1); touching or overlapping spans
    // mean the merge failed
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("span_start"))
    val bad = out
      .withColumn("prev_last_win", lag(col("span_end") - L + 1, 1).over(w))
      .filter(col("prev_last_win").isNotNull &&
        col("span_start") - col("prev_last_win") < 2)
      .count()
    assert(bad == 0)
  }

  test("every span's leading window text occurs at least twice corpus-wide") {
    val wins = DedupQueries.corpus(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= L)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(w) - $L), i -> md5(concat_ws(' ', slice(w, i + 1, $L))))")))
      .toDF("doc_id", "idx", "h")
    val counts = wins.groupBy(col("h")).count()
    val undup = out
      .join(wins, out("doc_id") === wins("doc_id") &&
        out("span_start") === wins("idx"))
      .join(counts, "h")
      .filter(col("count") < 2)
      .count()
    assert(undup == 0)
  }
}
