package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class WavCodecSpec extends AnyFunSuite {

  test("synthesize → decode roundtrip matches the generator arithmetic") {
    for (id <- Seq(0L, 1L, 2L, 3L, 7L, 36L, 100L, 12345L)) {
      val clip = WavCodec.decode(WavCodec.synthesize(id))
      assert(clip.channels == 1)
      assert(clip.sampleRate == 8000 + (id % 4) * 4000)
      assert(clip.samples.length == 64 + id % 37)
      clip.samples.zipWithIndex.foreach { case (s, i) =>
        assert(s == (((id * 131 + i * 17) % 65536) - 32768).toShort, s"id=$id i=$i")
      }
    }
  }

  test("decoder skips unknown chunks, including odd-size padded ones") {
    // hand-build: fmt, a 3-byte junk chunk (odd → 1 pad byte), data
    val fmtBody = Array[Int](1, 0, 1, 0, 0x40, 0x1f, 0, 0, 0x80, 0x3e, 0, 0, 2, 0, 16, 0)
      .map(_.toByte)
    def ch(tag: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      tag.getBytes("US-ASCII") ++ Array[Byte](
        (body.length & 0xff).toByte, ((body.length >> 8) & 0xff).toByte, 0, 0) ++ body ++ pad
    }
    val data = Array[Byte](1, 0, 2, 0) // samples 1, 2
    val body = "WAVE".getBytes("US-ASCII") ++ ch("fmt ", fmtBody) ++
      ch("junk", Array[Byte](9, 9, 9)) ++ ch("data", data)
    val payload = "RIFF".getBytes("US-ASCII") ++ Array[Byte](
      (body.length & 0xff).toByte, ((body.length >> 8) & 0xff).toByte, 0, 0) ++ body
    val clip = WavCodec.decode(payload)
    assert(clip.sampleRate == 8000 && clip.samples.toSeq == Seq(1, 2))
  }

  test("abs_sum and peak match a boxed reference computation") {
    val clip = WavCodec.decode(WavCodec.synthesize(42L))
    assert(clip.absSum == clip.samples.map(s => math.abs(s.toInt).toLong).sum)
    assert(clip.peak == clip.samples.map(s => math.abs(s.toInt)).max)
  }

  test("corruption fuzz: mutations of valid payloads never escape as non-format errors") {
    val rnd = new scala.util.Random(11)
    val base = WavCodec.synthesize(12L)
    (1 to 2000).foreach { i =>
      val bytes = base.clone()
      val pos = rnd.nextInt(bytes.length)
      bytes(pos) = (bytes(pos) ^ (1 << rnd.nextInt(8))).toByte
      try WavCodec.decode(bytes)
      catch {
        case _: WavCodec.WavFormatException => ()
        case e: Throwable =>
          fail(s"iteration $i (byte $pos): escaped ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    (0 until base.length).foreach { n =>
      try WavCodec.decode(base.take(n))
      catch {
        case _: WavCodec.WavFormatException => ()
        case e: Throwable =>
          fail(s"truncation to $n escaped ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("malformed inputs raise clear format errors") {
    val ok = WavCodec.synthesize(3L)
    def msg(bytes: Array[Byte]): String =
      intercept[WavCodec.WavFormatException](WavCodec.decode(bytes)).getMessage
    assert(msg("RIFX".getBytes("US-ASCII") ++ ok.drop(4)).contains("magic"))
    assert(msg(ok.take(30)).contains("escapes payload"))
    val notWave = ok.clone(); "LIST".getBytes("US-ASCII").copyToArray(notWave, 8)
    assert(msg(notWave).contains("not WAVE"))
    // flip fmt audioFormat to 2 (ADPCM)
    val badFmt = ok.clone(); badFmt(20) = 2
    assert(msg(badFmt).contains("audio format"))
  }

  test("duplicate fmt or data chunks are malformed, not last-wins") {
    // append a second copy of a chunk inside an enlarged RIFF body
    def withExtra(chunkTag: String): Array[Byte] = {
      val ok = WavCodec.synthesize(3L) // odd id: no LIST chunk
      // locate the chunk to duplicate by walking: fmt at 12, data after
      val fmtLen = 8 + 16
      val (start, len) =
        if (chunkTag == "fmt ") (12, fmtLen)
        else (12 + fmtLen, ok.length - 12 - fmtLen)
      val extra = ok.slice(start, start + len)
      val body = ok.drop(8) ++ extra
      val out = "RIFF".getBytes("US-ASCII") ++ Array[Byte](
        (body.length & 0xff).toByte, ((body.length >> 8) & 0xff).toByte, 0, 0) ++ body
      out
    }
    def msg(bytes: Array[Byte]): String =
      intercept[WavCodec.WavFormatException](WavCodec.decode(bytes)).getMessage
    assert(msg(withExtra("fmt ")).contains("duplicate fmt"))
    assert(msg(withExtra("data")).contains("duplicate data"))
  }
}
