package graft.operators

/**
 * A real pure-JVM binary image codec for the multimodal pipeline (m1):
 * binary PPM (Netpbm "P6"), the simplest honest image container —
 * ASCII header (magic, optional comments, width, height, maxval) then a
 * raw RGB raster.
 *
 * `synthesize` plays the role of the upstream system that produced the
 * stored binary column (a camera/scraper): payload bytes are a
 * deterministic function of the document id, so the DuckDB oracle can
 * recompute the decoder's outputs arithmetically without being able to
 * parse PPM itself. `decode` is the part that would survive contact
 * with real data: a grammar-correct header scanner (arbitrary
 * whitespace, '#' comments anywhere between tokens) with bounds checks
 * and clear errors on malformed input. The decoder knows nothing about
 * the generator.
 */
object PpmCodec {

  final case class PpmImage(width: Int, height: Int, maxVal: Int, raster: Array[Byte]) {
    def pixelSum: Long = {
      var s = 0L
      var i = 0
      while (i < raster.length) { s += raster(i) & 0xff; i += 1 }
      s
    }
  }

  final class PpmFormatException(msg: String) extends RuntimeException(msg)

  /** Deterministic synthetic image for doc `id`: width 4-8 and height
   * 3-6 derived from the id, raster byte i = (id*31 + i*7) mod 256.
   * Even ids get a header comment line, so decoders must handle them. */
  def synthesize(id: Long): Array[Byte] = synthesizeFrame(id, 0)

  /** Frame `f` of doc `id`'s clip: same dims, raster byte i =
   * (id*31 + f*97 + i*7) mod 256 — frame 0 is exactly `synthesize`. */
  def synthesizeFrame(id: Long, f: Int): Array[Byte] = {
    val w = (4 + id % 5).toInt
    val h = (3 + id % 4).toInt
    val comment = if (id % 2 == 0) "# c\n" else ""
    val header = s"P6\n$comment$w $h\n255\n".getBytes("US-ASCII")
    val raster = new Array[Byte](w * h * 3)
    var i = 0
    while (i < raster.length) {
      raster(i) = ((id * 31 + f * 97 + i * 7) % 256).toByte
      i += 1
    }
    header ++ raster
  }

  /** A "video clip" for doc `id`: 1 + id%3 PPM frames back-to-back in
   * one payload — the multi-object container the frame-sampling path
   * parses as a stream. */
  def synthesizeFrames(id: Long): Array[Byte] = {
    val n = 1 + (id % 3).toInt
    (0 until n).toArray.flatMap(f => synthesizeFrame(id, f))
  }

  /** Frame content identity: md5 over dims + raster — ONE definition
   * shared by batch m5 (truncates to a 56-bit long key) and streaming
   * frameDedup (hex-encodes the full 128 bits), so the batch↔stream
   * parity contract cannot drift from a one-sided hash edit. */
  def frameDigest(img: PpmImage): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(s"${img.width}x${img.height}:".getBytes("US-ASCII"))
    md.update(img.raster)
    md.digest()
  }

  /** Clip generator with PLANTED cross-clip frame reuse (for the
   * frame-dedup operator): frame content is fully determined by
   * (w, h, phase) with w = 4 + id%2, h = 3, phase = (id + f) mod 8,
   * raster byte i = (phase*29 + i*7) mod 256 — so e.g. frame 2 of doc
   * id and frame 0 of doc id+2 are byte-identical at ANY corpus size
   * (sequential ids make the m3 generator's frames collision-free, and
   * a dedup operator with no duplicates to find proves nothing).
   * Within a clip the ≤3 phases are distinct, so reuse is strictly
   * cross-clip. Even ids keep the header-comment parser exercise. */
  def synthesizeClip(id: Long): Array[Byte] = {
    val n = 1 + (id % 3).toInt
    (0 until n).toArray.flatMap { f =>
      val w = (4 + id % 2).toInt
      val h = 3
      val phase = ((id + f) % 8).toInt
      val comment = if (id % 2 == 0) "# c\n" else ""
      val header = s"P6\n$comment$w $h\n255\n".getBytes("US-ASCII")
      val raster = new Array[Byte](w * h * 3)
      var i = 0
      while (i < raster.length) {
        raster(i) = ((phase * 29 + i * 7) % 256).toByte
        i += 1
      }
      header ++ raster
    }
  }

  /** Bit j of pattern p's bit-plan (the m6 near-dup generator's shared
   * shape): pixels 0 and 1 are pinned to 1 and 0 so every plan is
   * mixed — the margin proof in `synthesizeNoisy` needs at least one
   * bright and one dark pixel. Pure arithmetic, so the DuckDB oracle
   * can recompute it without parsing PPM. */
  def patternBit(p: Int, j: Int): Boolean =
    if (j == 0) true
    else if (j == 1) false
    else (p * (j + 3) + j * j) % 7 < 3

  /** Image generator with PLANTED perceptual near-duplicates (for the
   * m6 aHash operator): docs sharing `p = id mod 257` render the same
   * bit-plan (`patternBit`) on a (5 + p%2)×4 grid — bright pixels are
   * 240 + noise, dark pixels 0 + noise, noise per CHANNEL byte
   * `(id*7 + i*3) mod 9` — so same-pattern docs are noisy variants
   * (never byte-identical; exact-hash dedup finds nothing) that an
   * average-hash must still collide.
   *
   * Why noise can never flip an aHash bit: gray ∈ [base, base+8], and
   * with 1 ≤ bright-count ≤ n−1 pixels (pinned by `patternBit`) the
   * integer mean over n ∈ {20, 24} pixels is bounded by
   * floor(((n−1)·248 + 8)/n) ≤ 238 < 240 above and
   * floor(240/n) ≥ 10 > 8 below — strictly between the dark band
   * [0, 8] and the bright band [240, 248] at the worst extremes. Even
   * ids keep the header-comment parser exercise. */
  def synthesizeNoisy(id: Long): Array[Byte] = {
    val p = (id % 257).toInt
    val w = 5 + p % 2
    val h = 4
    val comment = if (id % 2 == 0) "# c\n" else ""
    val header = s"P6\n$comment$w $h\n255\n".getBytes("US-ASCII")
    val raster = new Array[Byte](w * h * 3)
    var i = 0
    while (i < raster.length) {
      val base = if (patternBit(p, i / 3)) 240 else 0
      raster(i) = (base + (id * 7 + i * 3) % 9).toByte
      i += 1
    }
    header ++ raster
  }

  /** Average-hash perceptual fingerprint: integer grayscale
   * (floor((r+g+b)/3)) per pixel, mean-threshold (>= floor-mean of ALL
   * pixels) over the first min(n, 64) pixels row-major, bit j = pixel
   * j. Generic — knows nothing about any generator; tiny inputs here
   * make the usual 8×8 downsample prelude unnecessary. */
  def aHash(img: PpmImage): Long = {
    val n = img.width * img.height
    val gray = new Array[Int](n)
    var sum = 0L
    var j = 0
    while (j < n) {
      gray(j) = ((img.raster(3 * j) & 0xff) + (img.raster(3 * j + 1) & 0xff) +
        (img.raster(3 * j + 2) & 0xff)) / 3
      sum += gray(j)
      j += 1
    }
    val mean = sum / n
    var hash = 0L
    var b = 0
    val bits = math.min(n, 64)
    while (b < bits) {
      if (gray(b) >= mean) hash |= 1L << b
      b += 1
    }
    hash
  }

  /** 2× box-filter downsample (the pipeline "resize" op): each output
   * pixel is the floor-average of its 2×2 source block, per channel; an
   * odd trailing row/column is dropped. Exact integer arithmetic, so
   * results are engine-reproducible. */
  def downsample2x(img: PpmImage): PpmImage = {
    val rw = img.width / 2
    val rh = img.height / 2
    val out = new Array[Byte](rw * rh * 3)
    val src = img.raster
    val w = img.width
    var y = 0
    while (y < rh) {
      var x = 0
      while (x < rw) {
        var c = 0
        while (c < 3) {
          val i00 = 3 * (2 * y * w + 2 * x) + c
          val i10 = 3 * ((2 * y + 1) * w + 2 * x) + c
          val avg = ((src(i00) & 0xff) + (src(i00 + 3) & 0xff) +
            (src(i10) & 0xff) + (src(i10 + 3) & 0xff)) / 4
          out(3 * (y * rw + x) + c) = avg.toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    PpmImage(rw, rh, img.maxVal, out)
  }

  /** Parse a binary PPM. Throws PpmFormatException on bad magic, header
   * syntax errors, out-of-range dimensions, or a truncated raster.
   * Trailing bytes after the raster are ignored (see decodeFrames). */
  def decode(bytes: Array[Byte]): PpmImage = decodeAt(bytes, 0)._1

  /** Parse every PPM in a multi-frame payload (frames stored
   * back-to-back) — the container walk of the frame-sampling path.
   * Throws if any frame is malformed or trailing garbage remains. */
  def decodeFrames(bytes: Array[Byte]): Seq[PpmImage] = {
    val out = Seq.newBuilder[PpmImage]
    var pos = 0
    while (pos < bytes.length) {
      val (img, next) = decodeAt(bytes, pos)
      out += img
      pos = next
    }
    out.result()
  }

  /** Parse one PPM starting at `start`; returns the image and the
   * offset of the first byte after its raster. */
  private def decodeAt(bytes: Array[Byte], start: Int): (PpmImage, Int) = {
    if (bytes.length < start + 2 || bytes(start) != 'P' || bytes(start + 1) != '6')
      throw new PpmFormatException(
        s"not a binary PPM at byte $start: expected magic 'P6', got " +
          new String(bytes.slice(start, start + 2), "US-ASCII"))
    var pos = start + 2

    def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b

    // the grammar requires a separator between the magic and the width:
    // "P6123" is a corrupt header, not width 123
    if (bytes.length <= pos || !(isWs(bytes(pos)) || bytes(pos) == '#'))
      throw new PpmFormatException("missing separator after magic")

    // whitespace and '#'-to-end-of-line comments may separate any tokens
    def skipSeparators(): Unit = {
      var moved = true
      while (moved) {
        moved = false
        while (pos < bytes.length && isWs(bytes(pos))) { pos += 1; moved = true }
        if (pos < bytes.length && bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          moved = true
        }
      }
    }

    def readInt(what: String): Int = {
      skipSeparators()
      val start = pos
      var v = 0L
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        if (v > Int.MaxValue) throw new PpmFormatException(s"$what out of range")
        pos += 1
      }
      if (pos == start) throw new PpmFormatException(
        s"expected $what digits at byte $pos")
      v.toInt
    }

    val width = readInt("width")
    val height = readInt("height")
    val maxVal = readInt("maxval")
    if (width <= 0 || height <= 0) throw new PpmFormatException(
      s"non-positive dimensions ${width}x$height")
    if (maxVal <= 0 || maxVal > 255) throw new PpmFormatException(
      s"unsupported maxval $maxVal (8-bit only)")
    // exactly ONE whitespace byte separates maxval from the raster
    if (pos >= bytes.length || !isWs(bytes(pos)))
      throw new PpmFormatException("missing raster separator after maxval")
    pos += 1
    val expect = width.toLong * height * 3
    if (bytes.length - pos < expect) throw new PpmFormatException(
      s"truncated raster: need $expect bytes, have ${bytes.length - pos}")
    (PpmImage(width, height, maxVal,
      java.util.Arrays.copyOfRange(bytes, pos, pos + expect.toInt)),
      pos + expect.toInt)
  }
}
