package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class PpmCodecSpec extends AnyFunSuite {

  test("synthesize → decode roundtrip matches the generator arithmetic") {
    Seq(0L, 1L, 2L, 7L, 123L, 4999L, 100000L).foreach { id =>
      val bytes = PpmCodec.synthesize(id)
      val img = PpmCodec.decode(bytes)
      assert(img.width == (4 + id % 5).toInt, s"id=$id width")
      assert(img.height == (3 + id % 4).toInt, s"id=$id height")
      assert(img.maxVal == 255)
      assert(img.raster.length == img.width * img.height * 3)
      val expectSum = (0 until img.raster.length).map(i => (id * 31 + i * 7) % 256).sum
      assert(img.pixelSum == expectSum, s"id=$id pixelSum")
    }
  }

  test("decoder handles arbitrary header whitespace and comments (not just our generator)") {
    val raster = Array.tabulate[Byte](2 * 3 * 3)(i => i.toByte)
    val header = "P6 # trailing comment\n#another\n\t 2 \r\n# x\n3\t255\n"
    val img = PpmCodec.decode(header.getBytes("US-ASCII") ++ raster)
    assert(img.width == 2 && img.height == 3 && img.maxVal == 255)
    assert(img.raster.toSeq == raster.toSeq)
    // raster may begin with bytes that look like whitespace/comments —
    // only ONE separator byte after maxval may be consumed
    val tricky = "P6\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte]('#', ' ', '\n')
    assert(PpmCodec.decode(tricky).pixelSum == '#' + ' ' + '\n')
  }

  test("downsample2x floor-averages each 2x2 block and drops odd edges") {
    // 3x3 image whose red channel is the pixel index; green/blue zero
    val raster = new Array[Byte](3 * 3 * 3)
    (0 until 9).foreach(i => raster(3 * i) = (i * 10).toByte)
    val small = PpmCodec.downsample2x(PpmCodec.PpmImage(3, 3, 255, raster))
    assert(small.width == 1 && small.height == 1)
    // red = floor((0 + 10 + 30 + 40)/4) = 20; green = blue = 0
    assert((small.raster(0) & 0xff) == 20)
    assert(small.raster(1) == 0 && small.raster(2) == 0)
    assert(small.pixelSum == 20)
    // parity with the synthetic generator for a few ids
    Seq(1L, 8L, 4321L).foreach { id =>
      val img = PpmCodec.decode(PpmCodec.synthesize(id))
      val s2 = PpmCodec.downsample2x(img)
      val expect = (for {
        y2 <- 0 until img.height / 2; x2 <- 0 until img.width / 2; c <- 0 until 3
      } yield {
        def p(x: Int, y: Int) = (id * 31 + (3 * (y * img.width + x) + c) * 7) % 256
        (p(2 * x2, 2 * y2) + p(2 * x2 + 1, 2 * y2) +
          p(2 * x2, 2 * y2 + 1) + p(2 * x2 + 1, 2 * y2 + 1)) / 4
      }).sum
      assert(s2.pixelSum == expect, s"id=$id")
    }
  }

  test("decodeFrames walks a multi-frame payload and rejects trailing garbage") {
    Seq(0L, 1L, 2L, 77L).foreach { id =>
      val frames = PpmCodec.decodeFrames(PpmCodec.synthesizeFrames(id))
      assert(frames.length == 1 + (id % 3).toInt, s"id=$id")
      // frame f differs from frame 0 by the f*97 offset in every byte
      frames.zipWithIndex.foreach { case (f, idx) =>
        val expect = (0 until f.raster.length)
          .map(i => (id * 31 + idx * 97 + i * 7) % 256).sum
        assert(f.pixelSum == expect, s"id=$id frame=$idx")
      }
    }
    val garbage = PpmCodec.synthesizeFrames(5L) ++ "junk".getBytes("US-ASCII")
    intercept[PpmCodec.PpmFormatException](PpmCodec.decodeFrames(garbage))
  }

  test("corruption fuzz: mutations of valid payloads never escape as non-format errors") {
    val rnd = new scala.util.Random(7)
    val base = PpmCodec.synthesizeFrames(12L)
    (1 to 2000).foreach { i =>
      val bytes = base.clone()
      val pos = rnd.nextInt(bytes.length)
      bytes(pos) = (bytes(pos) ^ (1 << rnd.nextInt(8))).toByte
      try PpmCodec.decodeFrames(bytes)
      catch {
        case _: PpmCodec.PpmFormatException => ()
        case e: Throwable =>
          fail(s"iteration $i (byte $pos): escaped ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    (0 until base.length).foreach { n =>
      try PpmCodec.decodeFrames(base.take(n))
      catch {
        case _: PpmCodec.PpmFormatException => ()
        case e: Throwable =>
          fail(s"truncation to $n escaped ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("malformed inputs raise clear format errors") {
    val ok = PpmCodec.synthesize(3L)
    def msg(bytes: Array[Byte]): String =
      intercept[PpmCodec.PpmFormatException](PpmCodec.decode(bytes)).getMessage
    assert(msg("P5\n1 1\n255\n".getBytes("US-ASCII") ++ new Array[Byte](3)).contains("P6"))
    assert(msg(ok.dropRight(1)).contains("truncated raster"))
    assert(msg("P6\n1 1\n65535\n".getBytes("US-ASCII") ++ new Array[Byte](3))
      .contains("maxval"))
    assert(msg("P6\nx 1\n255\n".getBytes("US-ASCII")).contains("width"))
    assert(msg("P6\n0 1\n255\n".getBytes("US-ASCII")).contains("dimensions"))
    // digits glued to the magic are a corrupt header, not width=123
    assert(msg("P6123 4\n255\n".getBytes("US-ASCII") ++ new Array[Byte](123 * 4 * 3))
      .contains("separator after magic"))
  }
}
