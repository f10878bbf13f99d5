package graft.apps

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.scbf.{DoubleColumnData, IntColumnData, ScbfReader, Utf8ColumnData}

class CsvScbfAppsSpec extends AnyFunSuite with SparkTestBase {

  test("reference examples/sample.csv converts with reference semantics") {
    // 'score ' keeps its trailing space; values '91.5 ' parse as float
    // despite trailing whitespace (python float() strips).
    val out = tmpDir("app") + "/sample.scbf"
    CsvScbfApps.csvToScbf(spark, "/root/reference/examples/sample.csv", out)
    val (names, cols) = ScbfReader.readAll(out)
    assert(names == Seq("id", "name", "score "))
    assert(cols(0).asInstanceOf[IntColumnData].values.toSeq == Seq(1, 2, 3))
    assert(cols(2).asInstanceOf[DoubleColumnData].values.toSeq == Seq(91.5, 88.0, 79.25))
    // and the reference reader's own fixture agrees value-for-value
    val (_, refCols) = ScbfReader.readAll("/root/reference/examples/sample.scbf")
    assert(refCols(1).asInstanceOf[Utf8ColumnData].values.map(new String(_, "UTF-8")).toSeq ==
      cols(1).asInstanceOf[Utf8ColumnData].values.map(new String(_, "UTF-8")).toSeq)
  }

  test("csv -> scbf -> csv round-trips textually (reference guarantee, SPEC §9)") {
    val dir = tmpDir("app-rt")
    val csvIn = s"$dir/in.csv"
    Files.writeString(Paths.get(csvIn),
      "id,name,score\n1,Alice,91.5\n2,Bob,88.0\n3,Charlie,79.25\n")
    val scbf = s"$dir/mid.scbf"
    val csvOut = s"$dir/out.csv"
    CsvScbfApps.csvToScbf(spark, csvIn, scbf)
    CsvScbfApps.scbfToCsv(spark, scbf, csvOut)
    assert(Files.readString(Paths.get(csvOut)).strip() ==
      Files.readString(Paths.get(csvIn)).strip())
  }

  test("--cols projection subset") {
    val dir = tmpDir("app-cols")
    val csvIn = s"$dir/in.csv"
    Files.writeString(Paths.get(csvIn), "a,b,c\n1,x,2.5\n2,y,3.5\n")
    val scbf = s"$dir/mid.scbf"
    val csvOut = s"$dir/out.csv"
    CsvScbfApps.csvToScbf(spark, csvIn, scbf)
    CsvScbfApps.scbfToCsv(spark, scbf, csvOut, Seq("c", "a"))
    assert(Files.readString(Paths.get(csvOut)).strip() == "c,a\n2.5,1\n3.5,2")
  }

  test("mixed int-then-float column crashes the write, like the reference") {
    val dir = tmpDir("app-mixed")
    val csvIn = s"$dir/in.csv"
    Files.writeString(Paths.get(csvIn), "v\n1\n2.5\n")
    val e = intercept[Exception] {
      CsvScbfApps.csvToScbf(spark, csvIn, s"$dir/out.scbf")
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("invalid literal for int32")))
  }

  test("empty cells: utf8 column keeps them; inference skips them") {
    val dir = tmpDir("app-empty")
    val csvIn = s"$dir/in.csv"
    // first non-empty in column v is '7' (row 2) -> int32
    Files.writeString(Paths.get(csvIn), "v,s\n,\n7,x\n8,\n")
    val out = s"$dir/out.scbf"
    val e = intercept[Exception] {
      // row 1 has empty v which cannot encode as int -> crash (reference
      // int('') ValueError)
      CsvScbfApps.csvToScbf(spark, csvIn, out)
    }
    assert(e != null)
    // all-empty numeric-free table works, empty strings round-trip
    Files.writeString(Paths.get(csvIn), "s,t\nx,\n,y\n")
    CsvScbfApps.csvToScbf(spark, csvIn, out)
    val (names, cols) = ScbfReader.readAll(out)
    assert(names == Seq("s", "t"))
    assert(cols(0).asInstanceOf[Utf8ColumnData].values.map(new String(_, "UTF-8")).toSeq ==
      Seq("x", ""))
  }
}
