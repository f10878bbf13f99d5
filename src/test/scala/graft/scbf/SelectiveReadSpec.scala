package graft.scbf

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/**
 * The format KPI from BASELINE.md: a pruned 1-of-N column read must
 * fetch only that column's blocks (plus header+metadata), mirroring the
 * reference's sole performance claim (reference: SPEC.md:101-108).
 * Verified with a byte-counting RandomInput, not timing.
 */
class SelectiveReadSpec extends AnyFunSuite {

  private class CountingInput(underlying: ScbfReader.RandomInput)
    extends ScbfReader.RandomInput {
    var bytesRead = 0L
    def readFully(offset: Long, length: Int): Array[Byte] = {
      bytesRead += length
      underlying.readFully(offset, length)
    }
    def close(): Unit = underlying.close()
  }

  test("pruned read fetches only the requested column's blocks") {
    // 3 columns; the string column dwarfs the int column.
    val n = 20000
    val rnd = new scala.util.Random(7)
    val schema = ScbfSchema(Seq(
      ScbfColumn("id", ScbfType.Int32),
      ScbfColumn("payload", ScbfType.Utf8),
      ScbfColumn("score", ScbfType.Float64)))
    val out = new java.io.ByteArrayOutputStream()
    ScbfWriter.write(out, schema, Seq(
      IntColumnData(Array.tabulate(n)(identity)),
      Utf8ColumnData(Array.fill(n)(
        rnd.alphanumeric.take(120).mkString.getBytes(StandardCharsets.UTF_8))),
      DoubleColumnData(Array.fill(n)(rnd.nextDouble()))))
    val bytes = out.toByteArray

    def bytesFor(cols: Seq[String]): Long = {
      val in = new CountingInput(new ScbfReader.ByteArrayInput(bytes))
      val header = ScbfReader.readHeader(in)
      val metas = ScbfReader.readMeta(in, header, bytes.length.toLong)
      val byName = metas.map(m => m.name -> m).toMap
      cols.foreach(c => ScbfReader.readColumn(in, byName(c)))
      in.bytesRead
    }

    val full = bytesFor(Seq("id", "payload", "score"))
    val intOnly = bytesFor(Seq("id"))
    val overhead = bytesFor(Seq())
    // the id column's compressed block is tiny vs the payload blocks
    assert(intOnly < full / 10,
      s"pruned read fetched $intOnly bytes of $full — pruning is not selective")
    // and the pruned read's data bytes are exactly the id block
    val idMeta = {
      val in = new ScbfReader.ByteArrayInput(bytes)
      val h = ScbfReader.readHeader(in)
      ScbfReader.readMeta(in, h, bytes.length.toLong).find(_.name == "id").get
    }
    assert(intOnly - overhead == idMeta.data.compSize,
      "pruned read fetched bytes beyond the requested column's block")
  }
}
