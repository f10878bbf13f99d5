package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Ops.connectedComponents: exact min-id components over an undirected
 * edge list, via relabel-and-contract rounds (d13's engine). */
class ComponentsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  /** Both execution paths: localEdges=0 forces the fully distributed
   * rounds; the default threshold sends these tiny graphs through the
   * hybrid driver union-find tail. Every assertion pins both. */
  private val BothPaths = Seq(0, 200000)

  private def components(edges: Seq[(Long, Long)], localEdges: Int = 200000)
      : Map[Long, Long] = {
    spark.conf.set(graft.GraftConf.CcLocalEdges, localEdges.toString)
    try Ops.connectedComponents(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    finally spark.conf.unset(graft.GraftConf.CcLocalEdges)
  }

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
    for (le <- BothPaths) {
      val got = components(chain, le)
      assert(got.keySet == (0L until 40L).toSet, s"localEdges=$le")
      assert(got.values.toSet == Set(0L), s"localEdges=$le")
    }
  }

  test("cliques, reversed/duplicated edges, self-loops, and separate components") {
    val edges = Seq(
      (10L, 11L), (11L, 10L), (12L, 10L), (11L, 12L), // clique, dups both ways
      (5L, 5L),                                       // self-loop: ignored entirely
      (20L, 23L), (23L, 21L),                         // second component
      (30L, 31L))                                     // third
    for (le <- BothPaths) {
      val got = components(edges, le)
      // 5's only edge is a self-loop — it never enters the vertex set
      assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
        20L -> 20L, 21L -> 20L, 23L -> 20L, 30L -> 30L, 31L -> 30L),
        s"localEdges=$le")
    }
  }

  test("hybrid tail preserves INT vertex schema and values") {
    spark.conf.set(graft.GraftConf.CcLocalEdges, "200000")
    try {
      val df = Ops.connectedComponents(
        Seq((7, 3), (3, 9), (20, 21)).toDF("a", "b"))
      assert(df.schema("vertex").dataType ==
        org.apache.spark.sql.types.IntegerType)
      assert(df.schema("component").dataType ==
        org.apache.spark.sql.types.IntegerType)
      assert(df.as[(Int, Int)].collect().toMap ==
        Map(3 -> 3, 7 -> 3, 9 -> 3, 20 -> 20, 21 -> 20))
    } finally spark.conf.unset(graft.GraftConf.CcLocalEdges)
  }

  test("a mid-loop threshold crossing hands off mid-contraction (hybrid == distributed)") {
    // a path over a RANDOM permutation has ~n/3 local minima, so one
    // contraction round leaves a (still nonempty) smaller path — 199
    // edges > 120 forces at least one distributed round, after which
    // the count falls under 120 and the driver tail finishes the rest
    val rnd = new scala.util.Random(7)
    val perm = rnd.shuffle((0L until 200L).toVector)
    val edges = perm.sliding(2).map(s => (s(0), s(1))).toSeq
    val viaHandoff = components(edges, 120)
    val distributed = components(edges, 0)
    assert(viaHandoff == distributed)
    assert(viaHandoff.values.toSet == Set(0L))
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
