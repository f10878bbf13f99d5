package graft.tools
import com.fasterxml.jackson.databind.ObjectMapper
import graft.apps.PyNum
/** Dev-time fuzz: compare PyNum against a CPython-generated corpus
 * (/tmp/pynum_cases.json: [string, int_result|null, float_repr|null]). */
object PyNumFuzz {
  def main(args: Array[String]): Unit = {
    val root = new ObjectMapper().readTree(new java.io.File("/tmp/pynum_cases.json"))
    var intDiff, floatDiff, total = 0
    val samples = collection.mutable.ArrayBuffer[String]()
    (0 until root.size()).foreach { i =>
      val row = root.get(i)
      val s = row.get(0).asText()
      total += 1
      val expInt = if (row.get(1).isNull) None else Some(row.get(1).asText())
      val gotInt = PyNum.parseInt(s).map(_.toString)
      if (expInt != gotInt) {
        intDiff += 1
        if (intDiff <= 10) samples += s"INT ${escape(s)}: py=$expInt scala=$gotInt"
      }
      val expFloat = if (row.get(2).isNull) None else Some(row.get(2).asText())
      val gotFloat = PyNum.parseFloat(s)
      val matches = (expFloat, gotFloat) match {
        case (None, None) => true
        case (Some(e), Some(g)) =>
          val ev = e match {   // python inf/nan reprs aren't Java-parseable
            case "inf" => Double.PositiveInfinity
            case "-inf" => Double.NegativeInfinity
            case "nan" | "-nan" => Double.NaN
            case other => other.toDouble
          }
          (ev.isNaN && g.isNaN) || ev == g
        case _ => false
      }
      if (!matches) {
        floatDiff += 1
        if (floatDiff <= 10) samples += s"FLT ${escape(s)}: py=$expFloat scala=$gotFloat"
      }
    }
    println(s"total=$total intDiffs=$intDiff floatDiffs=$floatDiff")
    samples.foreach(println)
  }
  private def escape(s: String) = s.map(c => if (c < ' ' || c > '~') f"\\u${c.toInt}%04x" else c).mkString
}
