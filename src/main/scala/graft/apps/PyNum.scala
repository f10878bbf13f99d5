package graft.apps

import java.math.BigInteger

/**
 * Replicates CPython's `int(str)` / `float(str)` parsing — the exact
 * semantics the reference's schema inference and value encoding lean on
 * (reference: writer.py:12-26, 84, 98). Verified against CPython on the
 * recorded cases in SURVEY §1.3 (see PyNumSpec):
 *   int: unicode whitespace stripped (incl. NBSP), optional sign, single
 *        underscores BETWEEN digits ("1_000" ok, "1_" / "1__0" not),
 *        unicode decimal digits ("１２３" → 123), arbitrary precision.
 *   float: same stripping/underscore/digit rules, "inf"/"infinity"/"nan"
 *        case-insensitive, ".5" / "5." / "1e3" accepted; NO hex floats
 *        or "1f"-style suffixes (which Java's parseDouble would accept).
 */
object PyNum {

  /** The whitespace CPython's int()/float() strip. NOT str.isspace():
   * the numeric path maps non-ASCII Py_UNICODE_ISSPACE chars to ' '
   * (so NBSP, NEL \x85, Zs/Zl/Zp all strip) but parses ASCII with
   * Py_ISSPACE, which accepts only \t \n \v \f \r ' ' — int('\x1c1')
   * raises even though '\x1c'.isspace() is True. Java's isWhitespace
   * would wrongly accept \x1c-\x1f and wrongly reject NEL/NBSP, so the
   * set is spelled out (verified char-by-char against live CPython via
   * PyNumFuzz). */
  private def pyStrip(s: String): String = {
    def isSpace(c: Char) =
      if (c < 0x80) c == ' ' || (c >= '\t' && c <= '\r')
      else Character.isSpaceChar(c) || c == '\u0085'
    var a = 0
    var b = s.length
    while (a < b && isSpace(s.charAt(a))) a += 1
    while (b > a && isSpace(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }

  /** Digits with optional single underscores between them; unicode
   * decimal digits normalized to ASCII. Returns None if malformed. */
  private def normDigits(s: String): Option[String] = {
    if (s.isEmpty) return None
    val sb = new StringBuilder
    var prevWasDigit = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '_') {
        // underscore must be between digits
        if (!prevWasDigit || i + 1 >= s.length || Character.digit(s.charAt(i + 1), 10) < 0)
          return None
        prevWasDigit = false
      } else {
        val d = Character.digit(c, 10)
        if (d < 0) return None
        sb.append(('0' + d).toChar)
        prevWasDigit = true
      }
      i += 1
    }
    Some(sb.toString)
  }

  def parseInt(s: String): Option[BigInteger] = {
    val t = pyStrip(s)
    if (t.isEmpty) return None
    val (sign, rest) =
      if (t.charAt(0) == '+' || t.charAt(0) == '-') (t.charAt(0), t.substring(1)) else ('+', t)
    normDigits(rest).map { d =>
      val v = new BigInteger(d)
      if (sign == '-') v.negate() else v
    }
  }

  def parseFloat(s: String): Option[Double] = {
    val t = pyStrip(s)
    if (t.isEmpty) return None
    val (neg, rest0) =
      if (t.charAt(0) == '+' || t.charAt(0) == '-') (t.charAt(0) == '-', t.substring(1))
      else (false, t)
    val lower = rest0.toLowerCase
    if (lower == "inf" || lower == "infinity")
      return Some(if (neg) Double.NegativeInfinity else Double.PositiveInfinity)
    if (lower == "nan") return Some(if (neg) -Double.NaN else Double.NaN)
    // grammar: [int][.([frac])][(e|E)[sign]exp] with at least one mantissa digit
    val eIdx = rest0.indexWhere(c => c == 'e' || c == 'E')
    val (mantissa, expPart) =
      if (eIdx >= 0) (rest0.substring(0, eIdx), Some(rest0.substring(eIdx + 1))) else (rest0, None)
    val dotIdx = mantissa.indexOf('.')
    val (intPart, fracPart) =
      if (dotIdx >= 0) (mantissa.substring(0, dotIdx), mantissa.substring(dotIdx + 1))
      else (mantissa, "")
    if (mantissa.count(_ == '.') > 1) return None
    val intN = if (intPart.isEmpty) Some("") else normDigits(intPart)
    val fracN = if (fracPart.isEmpty) Some("") else normDigits(fracPart)
    val expN: Option[String] = expPart match {
      case None => Some("")
      case Some(e0) =>
        val (esign, e1) =
          if (e0.nonEmpty && (e0.charAt(0) == '+' || e0.charAt(0) == '-'))
            (e0.substring(0, 1), e0.substring(1))
          else ("", e0)
        normDigits(e1).map(d => "e" + esign + d) // exponent requires >=1 digit
    }
    (intN, fracN, expN) match {
      case (Some(i), Some(f), Some(e)) if i.nonEmpty || f.nonEmpty =>
        val str = (if (neg) "-" else "") + (if (i.isEmpty) "0" else i) + "." +
          (if (f.isEmpty) "0" else f) + e
        Some(java.lang.Double.parseDouble(str))
      case _ => None
    }
  }
}
