package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Ops.connectedComponents: exact min-id components over an undirected
 * edge list, via relabel-and-contract rounds (d13's engine). */
class ComponentsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Ops.connectedComponents(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct.map(v => v -> find(v)).toMap
  }

  test("a chain collapses to its min id (the case plain propagation is slow on)") {
    val chain = (0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = components(chain)
    assert(got.keySet == (0L until 40L).toSet)
    assert(got.values.toSet == Set(0L))
  }

  test("cliques, reversed/duplicated edges, self-loops, and separate components") {
    val edges = Seq(
      (10L, 11L), (11L, 10L), (12L, 10L), (11L, 12L), // clique, dups both ways
      (5L, 5L),                                       // self-loop: ignored entirely
      (20L, 23L), (23L, 21L),                         // second component
      (30L, 31L))                                     // third
    val got = components(edges)
    // 5's only edge is a self-loop — it never enters the vertex set
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 23L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("releases every intermediate checkpoint block (only the result stays)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val result = Ops.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b"))
    result.collect() // materialized result is legitimately retained
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    // exactly one new persistent RDD may remain: the returned map's own
    // checkpoint — everything the rounds pinned must have been freed
    assert(leaked.size <= 1,
      s"connectedComponents leaked ${leaked.size} persistent RDDs: $leaked")
  }

  test("matches union-find on seeded random graphs") {
    val rnd = new scala.util.Random(424242)
    for (trial <- 1 to 3) {
      val n = 60 + trial * 30
      val edges = Seq.fill(n)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
        .filter { case (a, b) => a != b }
      assert(components(edges) == unionFind(edges), s"trial $trial diverged")
    }
  }
}
