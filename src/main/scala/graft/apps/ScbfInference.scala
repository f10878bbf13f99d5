package graft.apps

import graft.scbf.{ScbfFormatException, ScbfType}

/**
 * The reference's write-time schema inference (reference: writer.py:12-26
 * applied at writer.py:41-54): for each column, scan rows top-down for
 * the FIRST non-empty value; try int, then float, else string. One value
 * decides the whole column — later rows that don't parse crash the
 * encode, exactly as the reference does (reference: writer.py:84).
 * An all-empty column is utf8 (the for…else fallback, writer.py:42-47).
 */
object ScbfInference {

  def inferType(value: String): ScbfType =
    if (value.isEmpty) ScbfType.Utf8
    else if (PyNum.parseInt(value).isDefined) ScbfType.Int32
    else if (PyNum.parseFloat(value).isDefined) ScbfType.Float64
    else ScbfType.Utf8

  /** Infer a column's type from its values in row order. */
  def inferColumn(values: Iterator[String]): ScbfType =
    values.find(_.nonEmpty).map(inferType).getOrElse(ScbfType.Utf8)

  /** Encode one cell per the inferred column type, with the reference's
   * failure modes: non-parsing value → error (ValueError at
   * writer.py:84), int32 overflow → error (struct.error), empty numeric
   * cell → error (int("") / float("")). */
  def encodeInt(column: String, value: String): Int = {
    val v = PyNum.parseInt(value).getOrElse(throw new ScbfFormatException(
      s"column '$column': invalid literal for int32: '$value'"))
    if (v.bitLength > 31) throw new ScbfFormatException(
      s"column '$column': value $value out of int32 range")
    v.intValueExact()
  }

  def encodeDouble(column: String, value: String): Double =
    PyNum.parseFloat(value).getOrElse(throw new ScbfFormatException(
      s"column '$column': could not convert string to float64: '$value'"))
}
