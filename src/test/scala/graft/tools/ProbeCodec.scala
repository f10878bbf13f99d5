package graft.tools
import graft.scbf._
object ProbeCodec {
  def main(args: Array[String]): Unit = {
    def probe(name: String)(f: => Any): Unit =
      try println(s"$name -> OK: " + f)
      catch { case e: Throwable => println(s"$name -> ${e.getClass.getSimpleName}: ${e.getMessage}") }
    probe("unknown column")(ScbfReader.readColumns("/tmp/ours.scbf", Seq("nope")))
    probe("truncated file") {
      val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("/tmp/ours.scbf"))
      java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/trunc.scbf"), b.take(b.length / 2))
      ScbfReader.readAll("/tmp/trunc.scbf")
    }
    probe("empty file") {
      java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/empty.scbf"), Array[Byte]())
      ScbfReader.readAll("/tmp/empty.scbf")
    }
    probe("ragged columns write")(ScbfWriter.write(new java.io.ByteArrayOutputStream(),
      ScbfSchema(Seq(ScbfColumn("a", ScbfType.Int32), ScbfColumn("b", ScbfType.Utf8))),
      Seq(IntColumnData(Array(1, 2)), Utf8ColumnData(Array(Array[Byte]())))))
    probe("type mismatch write")(ScbfWriter.write(new java.io.ByteArrayOutputStream(),
      ScbfSchema(Seq(ScbfColumn("a", ScbfType.Int32))), Seq(DoubleColumnData(Array(1.0)))))
  }
}
