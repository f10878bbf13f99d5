package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

/** d17 (duplicated-span removal): pins the output row-for-row against
 * a naive single-threaded reference built straight from the corpus,
 * plus the composition invariants the hash oracle doesn't spell out —
 * every removed token is covered by a NON-first occurrence of a
 * duplicated window, and removal never reaches outside d16's detected
 * spans. */
class SpanDedupSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private val L = DedupQueries.DupSpanTokens

  private lazy val corpus: Seq[(Long, Array[String])] =
    DedupQueries.corpus(spark, sf).collect()
      .map(r => (r.getAs[Number]("doc_id").longValue,
        r.getAs[String]("text").split(" ", -1)))
      .toSeq.sortBy(_._1)

  /** Token positions a faithful Lee-et-al pass removes: every position
   * covered by a non-first occurrence of a window whose string occurs
   * ≥ 2 times corpus-wide (first = min (doc_id, idx)). */
  private lazy val naiveDropped: Set[(Long, Int)] = {
    val occ = scala.collection.mutable.Map.empty[String, List[(Long, Int)]]
    for ((id, w) <- corpus; i <- 0 to w.length - L)
      occ.updateWith(w.slice(i, i + L).mkString(" "))(
        o => Some((id, i) :: o.getOrElse(Nil)))
    val dropped = scala.collection.mutable.Set.empty[(Long, Int)]
    for ((_, os) <- occ if os.sizeIs >= 2) {
      val first = os.min
      for (o <- os if o != first; j <- 0 until L) dropped += ((o._1, o._2 + j))
    }
    dropped.toSet
  }

  private lazy val naive: Map[Long, (Long, Long, String)] =
    corpus.map { case (id, w) =>
      val keep = w.indices.filterNot(p => naiveDropped((id, p)))
      id -> ((w.length.toLong, (w.length - keep.size).toLong,
        keep.map(w).mkString(" ")))
    }.toMap

  private lazy val out: Map[Long, (Long, Long, String)] =
    SparkEntry.queries("d17_span_dedup")(spark, sf).collect()
      .map(r => r.getAs[Number]("doc_id").longValue ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dropped"),
          r.getAs[String]("dedup_text")))).toMap

  test("d17 equals the naive single-threaded reference on every doc") {
    assert(out.keySet == naive.keySet)
    val bad = out.collect { case (id, v) if naive(id) != v => id }.toSeq.sorted
    assert(bad.isEmpty, s"mismatched docs ${bad.take(5)}: " +
      s"spark=${bad.headOption.map(out)} naive=${bad.headOption.map(naive)}")
  }

  test("the corpus has real work and only non-first spans lose tokens") {
    // the planted mutated copies guarantee duplicated passages
    assert(out.values.map(_._2).sum > 0, "no token was ever removed")
    // ...but not everything is duplicated
    assert(out.values.exists(v => v._2 == 0), "every doc lost tokens")
    // the naive reference removes ONLY positions covered by a non-first
    // duplicated window (by construction); row-for-row equality above
    // transfers that invariant to the engine output. Spot-check the
    // arithmetic consistency: kept tokens == n_tokens - n_dropped.
    out.foreach { case (id, (n, d, text)) =>
      val kept = if (text.isEmpty) 0 else text.split(" ", -1).length
      assert(kept == n - d, s"doc $id: $kept kept vs $n - $d")
    }
  }

  test("d17 never removes a token outside a d16-detected span") {
    val spans = SparkEntry.queries("d16_dup_spans")(spark, sf).collect()
      .map(r => (r.getAs[Number]("doc_id").longValue,
        r.getAs[Long]("span_start"), r.getAs[Long]("span_end")))
      .groupBy(_._1)
    val stray = naiveDropped.filterNot { case (id, p) =>
      spans.get(id).exists(_.exists(s => s._2 <= p && p <= s._3))
    }
    assert(stray.isEmpty, s"dropped outside any detected span: ${stray.take(5)}")
  }
}
