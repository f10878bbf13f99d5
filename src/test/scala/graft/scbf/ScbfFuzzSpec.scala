package graft.scbf

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Deterministic corruption fuzz: mutated/truncated SCBF bytes must
 * either decode to a value or raise ScbfFormatException — never a raw
 * JVM error (NegativeArraySize, ArrayIndexOutOfBounds, OOM from a
 * garbage allocation size), which is what an attacker-controlled or
 * bit-rotted file would otherwise trigger on an executor. */
class ScbfFuzzSpec extends AnyFunSuite {

  private val fixture =
    Files.readAllBytes(Paths.get("/root/reference/examples/sample.scbf"))

  private def readAllBytes(bytes: Array[Byte]): Unit = {
    val in = new ScbfReader.ByteArrayInput(bytes)
    val header = ScbfReader.readHeader(in)
    val metas = ScbfReader.readMeta(in, header, bytes.length.toLong)
    metas.foreach(m => ScbfReader.readColumn(in, m))
  }

  test("single-byte mutations never escape as non-format errors") {
    val rnd = new scala.util.Random(20260812)
    var decoded = 0
    var rejected = 0
    (1 to 2000).foreach { i =>
      val bytes = fixture.clone()
      val pos = rnd.nextInt(bytes.length)
      bytes(pos) = (bytes(pos) ^ (1 << rnd.nextInt(8))).toByte
      try { readAllBytes(bytes); decoded += 1 }
      catch {
        case _: ScbfFormatException => rejected += 1
        case e: Throwable =>
          fail(s"iteration $i (byte $pos): escaped ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    // both outcomes must actually occur or the fuzz is vacuous
    assert(decoded > 0 && rejected > 0, s"decoded=$decoded rejected=$rejected")
  }

  test("truncations at every length never escape as non-format errors") {
    (0 until fixture.length).foreach { n =>
      try readAllBytes(fixture.take(n))
      catch {
        case _: ScbfFormatException => ()
        case e: Throwable =>
          fail(s"truncation to $n bytes escaped ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("random garbage never escapes as non-format errors") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { i =>
      val bytes = Array.fill(rnd.nextInt(200))(rnd.nextInt().toByte)
      try readAllBytes(bytes)
      catch {
        case _: ScbfFormatException => ()
        case e: Throwable =>
          fail(s"garbage case $i escaped ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }
}
