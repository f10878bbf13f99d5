package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The hand-rolled HyperLogLog (ScbfNdv): accuracy across the ranges
 * that matter for CBO estimates, merge = union semantics, and the
 * small-range linear-counting path. p=11 → standard error ≈1.04/√2048
 * ≈ 2.3%; asserts use 3× that (7%) to stay flake-free. */
class ScbfNdvSpec extends AnyFunSuite {

  private def estInts(n: Int, offset: Int = 0): Long = {
    val b = new ScbfNdv.Builder
    (0 until n).foreach(i => b.addInt(i + offset))
    ScbfNdv.estimate(b.regs)
  }

  test("accuracy within 7% from tiny to 1M distinct ints") {
    for (n <- Seq(1, 10, 100, 1000, 10000, 100000, 1000000)) {
      val e = estInts(n)
      assert(math.abs(e - n) <= math.max(1L, (n * 0.07).toLong),
        s"n=$n estimated $e")
    }
  }

  test("duplicates don't inflate: 1M inserts of 1000 values ≈ 1000") {
    val b = new ScbfNdv.Builder
    (0 until 1000000).foreach(i => b.addInt(i % 1000))
    val e = ScbfNdv.estimate(b.regs)
    assert(math.abs(e - 1000) <= 70, s"estimated $e")
  }

  test("merge estimates the union: disjoint adds, overlapping doesn't double") {
    val a = new ScbfNdv.Builder
    val b = new ScbfNdv.Builder
    (0 until 50000).foreach(a.addInt)
    (25000 until 75000).foreach(b.addInt) // 50% overlap → union 75000
    val e = ScbfNdv.estimate(ScbfNdv.merge(a.regs, b.regs))
    assert(math.abs(e - 75000) <= 75000 * 7 / 100, s"union estimated $e")
  }

  test("strings and doubles hash distinctly too") {
    val b = new ScbfNdv.Builder
    (0 until 20000).foreach(i => b.addBytes(s"doc-$i".getBytes("UTF-8")))
    val e = ScbfNdv.estimate(b.regs)
    assert(math.abs(e - 20000) <= 1400, s"strings estimated $e")
    val d = new ScbfNdv.Builder
    (0 until 20000).foreach(i => d.addDouble(i * 0.37))
    val ed = ScbfNdv.estimate(d.regs)
    assert(math.abs(ed - 20000) <= 1400, s"doubles estimated $ed")
  }

  test("empty sketch estimates zero") {
    assert(ScbfNdv.estimate(new ScbfNdv.Builder().regs) == 0L)
  }
}
