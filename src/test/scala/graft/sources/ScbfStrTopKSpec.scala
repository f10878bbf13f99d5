package graft.sources

import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

/** ScbfStrTopK: construction from values, weighted merge, render/parse
 * round-trip, and the selectivity estimates the planner consumes. */
class ScbfStrTopKSpec extends AnyFunSuite {

  private def bytes(s: String) = s.getBytes("UTF-8")

  test("fromValues captures hot values with exact-at-small-n counts") {
    // 950×en, 40×fr, 9×de, 1×kw
    val vals = Array.fill(950)("en") ++ Array.fill(40)("fr") ++
      Array.fill(9)("de") ++ Array("kw")
    val t = ScbfStrTopK.fromValues(vals.length, vals.length)(i => bytes(vals(i))).get
    assert(t.rows == 1000)
    assert(t.entries.take(3) == Vector("en" -> 950L, "fr" -> 40L, "de" -> 9L))
    assert(t.entries.toMap.get("kw").contains(1L))
    assert(t.otherRows == 0)
  }

  test("K caps the summary; displaced mass pools into otherRows") {
    val vals = (0 until 100).flatMap(i => Seq.fill(100 - i)(f"v$i%03d")).toArray
    val t = ScbfStrTopK.fromValues(vals.length, vals.length, k = 8)(
      i => bytes(vals(i))).get
    assert(t.entries.size == 8)
    assert(t.entries.head == ("v000" -> 100L))
    assert(t.otherRows == t.rows - t.entries.map(_._2).sum)
    assert(t.otherRows > 0)
  }

  test("values beyond MaxValBytes never enter; their mass is other") {
    val long = "x" * (ScbfStrTopK.MaxValBytes + 1)
    val vals = Array.fill(10)(long) ++ Array.fill(5)("hot")
    val t = ScbfStrTopK.fromValues(vals.length, vals.length)(i => bytes(vals(i))).get
    assert(t.entries == Vector("hot" -> 5L))
    assert(t.otherRows == 10)
  }

  test("merge sums matching values exactly and re-caps") {
    val a = ScbfStrTopK.TopK(100, Vector("en" -> 90L, "fr" -> 10L), 0)
    val b = ScbfStrTopK.TopK(50, Vector("en" -> 30L, "de" -> 20L), 0)
    val m = ScbfStrTopK.merge(Seq(a, b)).get
    assert(m.rows == 150)
    assert(m.entries == Vector("en" -> 120L, "de" -> 20L, "fr" -> 10L))
    assert(m.otherRows == 0)
    val capped = ScbfStrTopK.merge(Seq(a, b), k = 1).get
    assert(capped.entries == Vector("en" -> 120L) && capped.otherRows == 30)
  }

  test("render/parse round-trips exactly, separators and unicode included") {
    val t = ScbfStrTopK.TopK(1234,
      Vector("a|b;c:d" -> 600L, "héllo\tworld" -> 300L, "" -> 34L), 300)
    assert(ScbfStrTopK.parse(ScbfStrTopK.render(t)).contains(t))
    assert(ScbfStrTopK.parse("garbage").isEmpty)
    assert(ScbfStrTopK.parse("10|x:1").isEmpty)
  }

  test("equality selectivity: hot value true mass, rare value average-other, never zero") {
    val t = ScbfStrTopK.TopK(10000,
      Vector("en" -> 9500L, "fr" -> 400L, "kw" -> 10L), 90)
    val ndv = Some(12L) // 3 summarized + ~9 others
    def sel(f: Filter) = ScbfStrTopK.selectivity(t, ndv, None, f).get
    assert(sel(EqualTo("lang", "en")) == 0.95)
    assert(sel(EqualTo("lang", "kw")) == 0.001)
    // unseen value: otherRows / otherNdv = 90/9 = 10 rows
    assert(sel(EqualTo("lang", "xx")) == 0.001)
    // In sums its members
    assert(sel(In("lang", Array("fr", "kw"))) == 0.041)
    // NDV-based 1/ndv would say 1/12 ≈ 8.3% for EVERY value — wrong by
    // 11x for 'en' and 83x for 'kw'; that gap is the point
  }

  test("range selectivity: exact over top-K, bound-interpolated residual, conservative without bounds") {
    val t = ScbfStrTopK.TopK(10000,
      Vector("aa" -> 9000L, "mm" -> 500L, "zz" -> 100L), 400)
    val bounds = Some((bytes("aa"), Some(bytes("zz"))))
    def sel(f: Filter, b: Option[(Array[Byte], Option[Array[Byte]])]) =
      ScbfStrTopK.selectivity(t, Some(100L), b, f).get
    // >= "zz": only the zz mass plus ~0 interpolated residual
    val hi = sel(GreaterThanOrEqual("k", "zz"), bounds)
    assert(hi >= 0.01 && hi < 0.02, s"got $hi")
    // < "mm": the aa mass plus roughly half the residual
    val lo = sel(LessThan("k", "mm"), bounds)
    assert(lo > 0.9 && lo < 0.95, s"got $lo")
    // startsWith keeps matching top-K values
    val sw = sel(StringStartsWith("k", "m"), bounds)
    assert(sw >= 0.05 && sw < 0.08, s"got $sw")
    // without bounds the residual stays whole — shrink only on evidence
    val noB = sel(GreaterThanOrEqual("k", "zz"), None)
    assert(noB >= (100 + 400) / 10000.0, s"got $noB")
    // unsupported shapes estimate nothing
    assert(ScbfStrTopK.selectivity(t, None, None,
      StringContains("k", "a")).isEmpty)
  }
}
