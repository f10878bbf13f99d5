package graft.operators

/**
 * A real pure-JVM binary audio codec for the multimodal pipeline (m4):
 * RIFF/WAVE with 16-bit little-endian PCM — the audio counterpart of
 * [[PpmCodec]]'s image path.
 *
 * `synthesize` plays the upstream system that stored the binary
 * column: payload bytes are a deterministic function of the document
 * id, so the DuckDB oracle can recompute the decoder's outputs
 * arithmetically without parsing RIFF. `decode` is a grammar-correct
 * chunk walker (magic checks, declared-size bounds checks, unknown
 * chunks skipped with odd-size padding, fmt validated before data) —
 * the part that would survive contact with real data. The decoder
 * knows nothing about the generator.
 */
object WavCodec {

  /** Decoded clip. `samples` holds the data chunk's PCM16 values in
   * stored order — for multi-channel audio that is frame-interleaved
   * (L R L R …), so `samples.length` is frames × channels and
   * absSum/peak aggregate over every channel's samples, matching how
   * the stream is laid out on disk. The m4 generator is mono, where
   * frames = samples. */
  final case class WavClip(sampleRate: Int, channels: Int, samples: Array[Short]) {
    def absSum: Long = {
      var s = 0L
      var i = 0
      while (i < samples.length) { s += math.abs(samples(i).toInt).toLong; i += 1 }
      s
    }
    def peak: Int = {
      var p = 0
      var i = 0
      while (i < samples.length) {
        val a = math.abs(samples(i).toInt)
        if (a > p) p = a
        i += 1
      }
      p
    }
  }

  final class WavFormatException(msg: String) extends RuntimeException(msg)

  /** Deterministic synthetic clip for doc `id`: mono PCM16, sample
   * rate 8000 + (id%4)*4000, 64 + id%37 samples, sample i =
   * ((id*131 + i*17) mod 65536) - 32768. Even ids get a junk LIST
   * chunk between fmt and data, so decoders must walk, not seek. */
  def synthesize(id: Long): Array[Byte] = {
    val rate = (8000 + (id % 4) * 4000).toInt
    val n = (64 + id % 37).toInt
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (((id * 131 + i * 17) % 65536) - 32768).toInt
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = chunk("fmt ", le16(1) ++ le16(1) ++ le32(rate) ++
      le32(rate * 2) ++ le16(2) ++ le16(16))
    val junk = if (id % 2 == 0) chunk("LIST", "INFOab".getBytes("US-ASCII")) else Array.empty[Byte]
    val body = "WAVE".getBytes("US-ASCII") ++ fmt ++ junk ++ chunk("data", data)
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  private def chunk(tag: String, payload: Array[Byte]): Array[Byte] = {
    val pad = if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    tag.getBytes("US-ASCII") ++ le32(payload.length) ++ payload ++ pad
  }
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Parse a RIFF/WAVE PCM16 payload. Throws WavFormatException on bad
   * magic, chunk sizes that escape the payload, a missing/invalid fmt
   * chunk, data arriving before fmt, or odd data length. Unknown
   * chunks are skipped (with the RIFF odd-size pad byte). */
  def decode(bytes: Array[Byte]): WavClip = {
    if (bytes.length < 12 || !tagAt(bytes, 0, "RIFF"))
      throw new WavFormatException("not a RIFF payload: bad magic")
    val riffSize = readLe32(bytes, 4)
    if (riffSize < 4 || 8L + riffSize > bytes.length) // long: no int overflow
      throw new WavFormatException(
        s"RIFF size $riffSize escapes payload of ${bytes.length} bytes")
    if (!tagAt(bytes, 8, "WAVE"))
      throw new WavFormatException("RIFF payload is not WAVE")
    val end = 8 + riffSize
    var pos = 12
    var rate = -1
    var channels = -1
    var samples: Array[Short] = null
    while (pos < end) {
      if (end - pos < 8)
        throw new WavFormatException(s"truncated chunk header at byte $pos")
      val tag = new String(bytes, pos, 4, "US-ASCII")
      val size = readLe32(bytes, pos + 4)
      val body = pos + 8
      if (size < 0 || body.toLong + size > end) // long: no int overflow
        throw new WavFormatException(s"chunk '$tag' size $size escapes RIFF body")
      tag match {
        case "fmt " =>
          // last-wins on duplicates would silently re-describe already-
          // decoded samples; a second fmt/data chunk is malformed, full stop
          if (rate >= 0) throw new WavFormatException("duplicate fmt chunk")
          if (size < 16) throw new WavFormatException(s"fmt chunk too short: $size")
          val audioFormat = readLe16(bytes, body)
          if (audioFormat != 1)
            throw new WavFormatException(s"unsupported audio format $audioFormat (PCM only)")
          channels = readLe16(bytes, body + 2)
          rate = readLe32(bytes, body + 4)
          val bits = readLe16(bytes, body + 14)
          if (bits != 16)
            throw new WavFormatException(s"unsupported bits-per-sample $bits (16 only)")
          if (channels <= 0 || rate <= 0)
            throw new WavFormatException(s"invalid fmt: channels=$channels rate=$rate")
        case "data" =>
          if (rate < 0)
            throw new WavFormatException("data chunk before fmt chunk")
          if (samples != null)
            throw new WavFormatException("duplicate data chunk")
          if (size % 2 != 0)
            throw new WavFormatException(s"odd PCM16 data length $size")
          val out = new Array[Short](size / 2)
          var i = 0
          while (i < out.length) {
            out(i) = ((bytes(body + 2 * i) & 0xff) |
              (bytes(body + 2 * i + 1) << 8)).toShort
            i += 1
          }
          samples = out
        case _ => // unknown chunk: skip
      }
      pos = body + size + (size % 2) // RIFF pads odd-size chunks
    }
    if (samples == null) throw new WavFormatException("missing data chunk")
    WavClip(rate, channels, samples)
  }

  private def tagAt(b: Array[Byte], off: Int, tag: String): Boolean =
    b.length >= off + 4 && new String(b, off, 4, "US-ASCII") == tag

  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
}
