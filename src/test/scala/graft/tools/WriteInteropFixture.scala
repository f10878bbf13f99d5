package graft.tools
import graft.scbf._
/** Dev-time helper: writes a file for cross-checking with the reference
 * Python reader. Run via `sbt "Test/runMain graft.tools.WriteInteropFixture"`. */
object WriteInteropFixture {
  def main(args: Array[String]): Unit = {
    val schema = ScbfSchema(Seq(
      ScbfColumn("id", ScbfType.Int32),
      ScbfColumn("name", ScbfType.Utf8),
      ScbfColumn("score", ScbfType.Float64)))
    ScbfWriter.write("/tmp/ours.scbf", schema, Seq(
      IntColumnData(Array(1, 2, 3, -7)),
      Utf8ColumnData(Array("Alice", "Bob", "日本語", "").map(_.getBytes("UTF-8"))),
      DoubleColumnData(Array(91.5, 88.0, 79.25, -1.5e10))))
    println("written /tmp/ours.scbf")
  }
}
