package graft.scbf

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

class ScbfCodecSpec extends AnyFunSuite {

  private val examplesFixture = "/root/reference/examples/sample.scbf"
  private val testsFixture = "/root/reference/tests/sample.scbf"

  test("reads the shipped examples/sample.scbf fixture byte-exactly") {
    val (names, cols) = ScbfReader.readAll(examplesFixture)
    // examples/sample.csv has a trailing space in the 'score ' header —
    // preserved verbatim by the reference writer (SURVEY §1.3).
    assert(names == Seq("id", "name", "score "))
    assert(cols(0).asInstanceOf[IntColumnData].values.toSeq == Seq(1, 2, 3))
    assert(cols(1).asInstanceOf[Utf8ColumnData].values.map(new String(_, "UTF-8")).toSeq ==
      Seq("Alice", "Bob", "Charlie"))
    assert(cols(2).asInstanceOf[DoubleColumnData].values.toSeq == Seq(91.5, 88.0, 79.25))
  }

  test("reads the shipped tests/sample.scbf fixture") {
    val (names, cols) = ScbfReader.readAll(testsFixture)
    assert(names == Seq("id", "name", "score"))
    assert(cols(2).asInstanceOf[DoubleColumnData].values.toSeq == Seq(91.5, 88.0, 79.25))
  }

  test("tolerates the reference writer's clobbered str_uncomp_size field") {
    // reference writer.py:208-209 writes a file offset over str_uncomp_size;
    // confirm the fixture really carries garbage there and that decode
    // ignores it (SURVEY §1.5).
    val in = ScbfReader.open(testsFixture)
    try {
      val header = ScbfReader.readHeader(in)
      val metas = ScbfReader.readMeta(in, header, Files.size(Paths.get(testsFixture)))
      val nameMeta = metas.find(_.name == "name").get
      val trueBlobLen = "AliceBobCharlie".length
      assert(nameMeta.strings.get.uncompSize != trueBlobLen,
        "fixture unexpectedly has a correct str_uncomp_size — bug assumption broken")
      val raw = ScbfReader.readUtf8Column(in, nameMeta)
      assert(raw.blob.length == trueBlobLen)
    } finally in.close()
  }

  test("selective column read returns only requested columns; unknown column throws") {
    val cols = ScbfReader.readColumns(examplesFixture, Seq("id"))
    assert(cols.keySet == Set("id"))
    val e = intercept[ScbfFormatException] {
      ScbfReader.readColumns(examplesFixture, Seq("nope"))
    }
    assert(e.getMessage.contains("Column not found: nope")) // reference reader.py:124-125
  }

  test("bad magic rejected") {
    val tmp = Files.createTempFile("notscbf", ".scbf")
    Files.write(tmp, "PARQUET1not-a-scbf-file-at-all".getBytes)
    val e = intercept[ScbfFormatException] {
      val in = ScbfReader.open(tmp.toString)
      try ScbfReader.readHeader(in) finally in.close()
    }
    assert(e.getMessage.contains("bad magic"))
  }

  test("our writer's output is structurally identical to the reference writer's") {
    // Same logical content as tests/sample.scbf. Compressed bytes are NOT
    // required to match (JDK Deflater emits a different — equally valid —
    // zlib stream than CPython's zlib, observed: 17 vs 20 bytes for the
    // same 12-byte input), so compare: (a) header bytes through
    // total_rows, (b) logical metadata (with correct str_uncomp where the
    // fixture carries the clobbered value), (c) decompressed blocks.
    val schema = ScbfSchema(Seq(
      ScbfColumn("id", ScbfType.Int32),
      ScbfColumn("name", ScbfType.Utf8),
      ScbfColumn("score", ScbfType.Float64)))
    val out = new java.io.ByteArrayOutputStream()
    ScbfWriter.write(out, schema, Seq(
      IntColumnData(Array(1, 2, 3)),
      Utf8ColumnData(Array("Alice", "Bob", "Charlie").map(_.getBytes(StandardCharsets.UTF_8))),
      DoubleColumnData(Array(91.5, 88.0, 79.25))))
    val ours = out.toByteArray
    val ref = Files.readAllBytes(Paths.get(testsFixture))
    // (a) header prefix: magic + schema_len + schema_json + num_cols +
    // total_rows + meta_table_offset — fully deterministic, must match.
    val inR = new ScbfReader.ByteArrayInput(ref)
    val refHeader = ScbfReader.readHeader(inR)
    val headerLen = refHeader.metaTableOffset.toInt
    assert(ours.slice(0, headerLen).toSeq == ref.slice(0, headerLen).toSeq,
      "header bytes differ")
    // (b) + (c) logical equality via both readers
    val inO = new ScbfReader.ByteArrayInput(ours)
    val ourHeader = ScbfReader.readHeader(inO)
    val refMetas = ScbfReader.readMeta(inR, refHeader, ref.length.toLong)
    val ourMetas = ScbfReader.readMeta(inO, ourHeader, ours.length.toLong)
    refMetas.zip(ourMetas).foreach { case (rm, om) =>
      assert(rm.name == om.name && rm.tpe == om.tpe && rm.count == om.count)
      assert(rm.data.uncompSize == om.data.uncompSize)
    }
    // our str_uncomp is the TRUE blob length; fixture's is clobbered
    assert(ourMetas(1).strings.get.uncompSize == "AliceBobCharlie".length)
    assert(ScbfReader.readIntColumn(inR, refMetas(0)).toSeq ==
      ScbfReader.readIntColumn(inO, ourMetas(0)).toSeq)
    val (rRaw, oRaw) = (ScbfReader.readUtf8Column(inR, refMetas(1)),
      ScbfReader.readUtf8Column(inO, ourMetas(1)))
    assert(rRaw.offsets.toSeq == oRaw.offsets.toSeq && rRaw.blob.toSeq == oRaw.blob.toSeq)
    assert(ScbfReader.readDoubleColumn(inR, refMetas(2)).toSeq ==
      ScbfReader.readDoubleColumn(inO, ourMetas(2)).toSeq)
  }

  test("property: arbitrary columns round-trip value-exactly (seeded)") {
    val rnd = new scala.util.Random(42)
    val weird = Seq("", "héllo wörld", "日本語テキスト", "emoji 🎉🚀", "tab\tand\nnewline", "a,b,\"c\"")
    for (_ <- 1 to 30) {
      val n = rnd.nextInt(200)
      val is = Array.fill(n)(rnd.nextInt())
      val ds = Array.fill(n)(rnd.nextDouble() * 2e12 - 1e12)
      val ss = Array.fill(n) {
        if (rnd.nextInt(4) == 0) weird(rnd.nextInt(weird.length))
        else rnd.alphanumeric.take(rnd.nextInt(40)).mkString
      }
      val schema = ScbfSchema(Seq(
        ScbfColumn("i", ScbfType.Int32),
        ScbfColumn("d", ScbfType.Float64),
        ScbfColumn("s", ScbfType.Utf8)))
      val out = new java.io.ByteArrayOutputStream()
      ScbfWriter.write(out, schema, Seq(
        IntColumnData(is),
        DoubleColumnData(ds),
        Utf8ColumnData(ss.map(_.getBytes(StandardCharsets.UTF_8)))))
      val in = new ScbfReader.ByteArrayInput(out.toByteArray)
      val header = ScbfReader.readHeader(in)
      assert(header.totalRows == n)
      assert(header.schema == schema)
      val metas = ScbfReader.readMeta(in, header, out.toByteArray.length.toLong)
      assert(ScbfReader.readIntColumn(in, metas(0)).toSeq == is.toSeq)
      assert(ScbfReader.readDoubleColumn(in, metas(1)).toSeq == ds.toSeq)
      val raw = ScbfReader.readUtf8Column(in, metas(2))
      assert((0 until raw.count).map(raw.string) == ss.toSeq)
    }
  }

  test("unknown column type code rejected (reference reader.py:71-72)") {
    // corrupt the type byte of the first metadata entry of a valid file
    val bytes = Files.readAllBytes(Paths.get(examplesFixture))
    val in0 = new ScbfReader.ByteArrayInput(bytes)
    val header = ScbfReader.readHeader(in0)
    // first entry: u16 name_len ('id' = 2) + name bytes, then the type byte
    val typePos = header.metaTableOffset.toInt + 2 + 2
    assert(bytes(typePos) == 1) // int32
    bytes(typePos) = 99
    val e = intercept[ScbfFormatException] {
      val in = new ScbfReader.ByteArrayInput(bytes)
      ScbfReader.readMeta(in, ScbfReader.readHeader(in), bytes.length.toLong)
    }
    assert(e.getMessage.contains("Unknown column type code: 99"))
  }

  test("utf8 offsets ≥ 2 GiB or non-monotonic rejected, never sliced as garbage") {
    import java.nio.{ByteBuffer, ByteOrder}
    def utf8Meta(offsets: Array[Int]): (ScbfReader.ByteArrayInput, ColumnMeta) = {
      val raw = ByteBuffer.allocate(offsets.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      offsets.foreach(raw.putInt)
      val offComp = ScbfWriter.deflate(raw.array())
      val blobComp = ScbfWriter.deflate(Array[Byte]('A'))
      val meta = ColumnMeta("s", ScbfType.Utf8, offsets.length - 1L,
        BlockMeta(offsets.length * 4L, offComp.length.toLong, 0L),
        Some(BlockMeta(1L, blobComp.length.toLong, offComp.length.toLong)))
      (new ScbfReader.ByteArrayInput(offComp ++ blobComp), meta)
    }
    // u32 0x80000000 (2 GiB) wraps negative in a signed Int array
    val (in1, m1) = utf8Meta(Array(0, Int.MinValue))
    val e1 = intercept[ScbfFormatException] { ScbfReader.readUtf8Column(in1, m1) }
    assert(e1.getMessage.contains("2 GiB"))
    val (in2, m2) = utf8Meta(Array(0, 5, 2))
    val e2 = intercept[ScbfFormatException] { ScbfReader.readUtf8Column(in2, m2) }
    assert(e2.getMessage.contains("non-monotonic"))
  }

  test("truncated file reports a clear error") {
    val full = Files.readAllBytes(Paths.get(examplesFixture))
    val tmp = Files.createTempFile("trunc", ".scbf")
    Files.write(tmp, full.take(full.length / 2))
    val e = intercept[ScbfFormatException] { ScbfReader.readAll(tmp.toString) }
    assert(e.getMessage.contains("Truncated"))
  }

  test("unicode column names round-trip (u16 name length is bytes, not chars)") {
    val schema = ScbfSchema(Seq(
      ScbfColumn("列名", ScbfType.Int32),
      ScbfColumn("prix €", ScbfType.Float64)))
    val out = new java.io.ByteArrayOutputStream()
    ScbfWriter.write(out, schema, Seq(
      IntColumnData(Array(1, 2)), DoubleColumnData(Array(0.5, 1.5))))
    val in = new ScbfReader.ByteArrayInput(out.toByteArray)
    val header = ScbfReader.readHeader(in)
    assert(header.schema == schema)
    val metas = ScbfReader.readMeta(in, header, out.toByteArray.length.toLong)
    assert(metas.map(_.name) == Seq("列名", "prix €"))
    assert(ScbfReader.readIntColumn(in, metas.head).toSeq == Seq(1, 2))
  }

  test("empty table round-trips") {
    val schema = ScbfSchema(Seq(ScbfColumn("s", ScbfType.Utf8)))
    val out = new java.io.ByteArrayOutputStream()
    ScbfWriter.write(out, schema, Seq(Utf8ColumnData(Array.empty)))
    val in = new ScbfReader.ByteArrayInput(out.toByteArray)
    val header = ScbfReader.readHeader(in)
    assert(header.totalRows == 0)
    val metas = ScbfReader.readMeta(in, header, out.toByteArray.length.toLong)
    assert(ScbfReader.readUtf8Column(in, metas(0)).count == 0)
  }

  test("schema JSON matches python json.dumps formatting") {
    val s = ScbfSchema(Seq(
      ScbfColumn("id", ScbfType.Int32),
      ScbfColumn("score ", ScbfType.Float64)))
    assert(s.toJson ==
      """{"columns": [{"name": "id", "type": "int32"}, {"name": "score ", "type": "float64"}]}""")
    assert(ScbfSchema.fromJson(s.toJson) == s)
  }
}
