package graft.enrich

import java.nio.charset.StandardCharsets.US_ASCII
import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM WAV (RIFF/WAVE, PCM16LE) codec — the audio member of the
  * real-decode family next to `VideoFrames` (MJPEG/AVI) and the ImageIO
  * PNG/JPEG paths. PCM WAV is the one mainstream audio container a bare
  * JVM can honestly decode end to end: the RIFF layout is the same
  * chunk walk `VideoFrames` does for AVI, `fmt ` is a fixed little-endian
  * struct, and `data` is raw interleaved samples. Compressed codecs
  * (MP3/AAC) stay out of reach without native libs — the same residual
  * constraint documented for H.264 video.
  *
  * The WRITER emits a minimal spec-compliant mono PCM16 file (RIFF →
  * fmt(16) → data); the PARSER walks chunks generically (word-aligned,
  * sizes clamped), validates the PCM16 header, and returns the samples.
  */
object WavCodec {

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, US_ASCII)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Cheap container sniff: RIFF magic + WAVE form type. */
  def isRiffWave(b: Array[Byte]): Boolean =
    b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "WAVE"

  /** (sampleRate, channels, bitsPerSample, samples) — a REAL parse of
    * the fmt/data chunks; throws on non-PCM16-mono payloads. */
  def decode(wav: Array[Byte]): (Int, Int, Int, Array[Short]) = {
    require(isRiffWave(wav), "not a RIFF WAVE container")
    var rate = -1; var channels = -1; var bits = -1
    var samples: Array[Short] = null
    var off = 12
    while (off + 8 <= wav.length) {
      val id = fourcc(wav, off)
      val size = math.min(u32(wav, off + 4), (wav.length - off - 8).toLong).toInt
      val body = off + 8
      if (id == "fmt " && size >= 16) {
        require(u16(wav, body) == 1, "not PCM")
        channels = u16(wav, body + 2)
        rate = u32(wav, body + 4).toInt
        bits = u16(wav, body + 14)
      } else if (id == "data") {
        require(bits == 16 && channels == 1,
          s"only mono PCM16 supported (got ch=$channels bits=$bits)")
        val n = size / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) {
          out(i) = ((wav(body + 2 * i) & 0xff)
            | (wav(body + 2 * i + 1) << 8)).toShort
          i += 1
        }
        samples = out
      }
      off = body + size + (size & 1)
    }
    require(samples != null, "no data chunk in WAV")
    (rate, channels, bits, samples)
  }

  /** Minimal spec-compliant mono PCM16LE WAV around the samples. */
  def writePcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen + (dataLen & 1))
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(US_ASCII)).putInt(36 + dataLen)
      .put("WAVE".getBytes(US_ASCII))
      .put("fmt ".getBytes(US_ASCII)).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits
      .put("data".getBytes(US_ASCII)).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }
}
