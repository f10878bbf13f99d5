package graft.apps

import org.scalatest.funsuite.AnyFunSuite

import graft.scbf.ScbfType

/** Cases recorded from CPython 3 (`int()` / `float()` / reference
 * infer_type) — see SURVEY §1.3. */
class PyNumSpec extends AnyFunSuite {

  private val intCases = Seq(
    "1" -> Some(1), " 1 " -> Some(1), "007" -> Some(7), "1_000" -> Some(1000),
    "+5" -> Some(5), "-3" -> Some(-3), "1_0_0" -> Some(100), " +2_5 " -> Some(25),
    " 1 " -> Some(1), "\t2\n" -> Some(2), "１２３" -> Some(123),
    "\u0085123\u0085" -> Some(123), "\u00a07" -> Some(7), // NEL + NBSP: python strips both
    "2.5" -> None, "1e3" -> None, ".5" -> None, "True" -> None, "" -> None,
    "0x10" -> None, "_1" -> None, "1_" -> None, "1__0" -> None, "inf" -> None)

  test("parseInt matches python int()") {
    intCases.foreach { case (s, expect) =>
      assert(PyNum.parseInt(s).map(_.intValue()) == expect, s"int('$s')")
    }
  }

  test("parseInt is arbitrary precision") {
    assert(PyNum.parseInt("123456789012345678901234567890").get.toString ==
      "123456789012345678901234567890")
  }

  private val floatCases = Seq(
    "1" -> Some(1.0), "2.5" -> Some(2.5), "1e3" -> Some(1000.0),
    "1.5e3" -> Some(1500.0), ".5" -> Some(0.5), "5." -> Some(5.0),
    "inf" -> Some(Double.PositiveInfinity), "Infinity" -> Some(Double.PositiveInfinity),
    "-inf" -> Some(Double.NegativeInfinity), "1_000.5" -> Some(1000.5),
    " 91.5 " -> Some(91.5), "１２３" -> Some(123.0), "1E+2" -> Some(100.0),
    "\u00851.5\u0085" -> Some(1.5), "\u00a07.5" -> Some(7.5),
    "True" -> None, "" -> None, "0x10" -> None, "1f" -> None, "1d" -> None,
    "0x1p3" -> None, "1e" -> None, "e3" -> None, "." -> None, "1._5" -> None)

  test("parseFloat matches python float()") {
    floatCases.foreach { case (s, expect) =>
      assert(PyNum.parseFloat(s) == expect, s"float('$s')")
    }
    assert(PyNum.parseFloat("nan").get.isNaN)
  }

  test("inference precedence: int, then float, else utf8; empty is utf8") {
    assert(ScbfInference.inferType("1") == ScbfType.Int32)
    assert(ScbfInference.inferType("1e3") == ScbfType.Float64)
    assert(ScbfInference.inferType("True") == ScbfType.Utf8)
    assert(ScbfInference.inferType("") == ScbfType.Utf8)
    // one value decides: "1" then "2.5" means int32 column; encode of
    // "2.5" must then fail exactly like the reference's int("2.5")
    assert(ScbfInference.inferColumn(Iterator("", "1", "2.5")) == ScbfType.Int32)
    intercept[Exception](ScbfInference.encodeInt("c", "2.5"))
  }

  test("int32 overflow fails the encode (reference struct.error)") {
    intercept[Exception](ScbfInference.encodeInt("c", "2147483648"))
    assert(ScbfInference.encodeInt("c", "2147483647") == Int.MaxValue)
    assert(ScbfInference.encodeInt("c", "-2147483648") == Int.MinValue)
  }
}
