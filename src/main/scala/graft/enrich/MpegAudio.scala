package graft.enrich

import java.io.ByteArrayOutputStream

/** Pure-JVM MPEG audio CONTAINER codecs — the audio half of the qm7
  * honesty probe. The reference's media lake carries compressed audio
  * alongside its `.mp4` video (lambda/s3Posts-to-ES-lambda/
  * s3-to-es_aws.py:83 rewrites whole-object S3 URLs, format-agnostic);
  * PERCEPTUAL decode of MP3/AAC needs native codecs a bare JVM lacks,
  * but the FRAMING layer — ID3v2 tags, MPEG-1 Layer III frame headers,
  * ADTS headers — is plain bit-packed big-endian structure, the audio
  * analog of `Mp4Box`'s box tree. The engine therefore extracts
  * first-class stream metadata (bitrate, sample rate, frame count,
  * exact duration) from real MP3/ADTS bytes while payload decode stays
  * documented-out-of-reach.
  *
  * WRITER emits structurally-valid streams: MP3 = ID3v2.3 tag
  * (syncsafe size) + N Layer III frames with the spec's length formula
  * (`144·bitrate/rate + padding`, padding alternating per frame so the
  * padding bit is really exercised); ADTS = N frames of 7-byte
  * protection-absent headers with the 13-bit frame-length field split
  * across three bytes, as the spec packs it. PARSER is a REAL frame
  * walk: ID3 skip by syncsafe arithmetic, per-frame sync/version/layer
  * validation, bitrate/sample-rate table lookups, length-field
  * arithmetic to the next frame boundary; malformed input returns None
  * (the qm3/P12 corrupt-skip convention). */
object MpegAudio {

  /** MPEG-1 Layer III bitrate table (kbps), index 1–14. */
  private val BitrateKbps = Array(
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample-rate table, index 0–2. */
  private val SampleRate = Array(44100, 48000, 32000)

  /** ADTS (MPEG-4) sampling_frequency_index table, indices 0–12. */
  private val AdtsRate = Array(
    96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050, 16000,
    12000, 11025, 8000, 7350)

  private def syncsafe(v: Int): Array[Byte] = Array(
    ((v >>> 21) & 0x7f).toByte, ((v >>> 14) & 0x7f).toByte,
    ((v >>> 7) & 0x7f).toByte, (v & 0x7f).toByte)

  /** MPEG-1 Layer III frame byte length for one frame. */
  def mp3FrameLen(bitrateKbps: Int, sampleRate: Int, padding: Int): Int =
    144000 * bitrateKbps / sampleRate + padding

  /** ID3v2.3 tag + `nFrames` Layer III frames. Padding bit set on odd
    * frame indices so a walker that ignores it lands mid-frame and
    * fails the next sync check. Joint-stereo, no CRC. */
  def writeMp3(bitrateKbps: Int, sampleRate: Int, nFrames: Int,
               id3Payload: Array[Byte]): Array[Byte] = {
    val brIdx = BitrateKbps.indexOf(bitrateKbps)
    val srIdx = SampleRate.indexOf(sampleRate)
    require(brIdx >= 1, s"not an MPEG-1 L3 bitrate: $bitrateKbps")
    require(srIdx >= 0, s"not an MPEG-1 rate: $sampleRate")
    val o = new ByteArrayOutputStream()
    o.write('I'); o.write('D'); o.write('3')
    o.write(3); o.write(0)               // v2.3.0
    o.write(0)                           // flags
    o.write(syncsafe(id3Payload.length))
    o.write(id3Payload)
    for (f <- 0 until nFrames) {
      val pad = f % 2                    // exercise the padding bit
      o.write(0xff)                      // sync 11111111
      o.write(0xfb)                      // sync 111 | MPEG1 | L3 | no CRC
      o.write((brIdx << 4) | (srIdx << 2) | (pad << 1))
      o.write(0x40)                      // joint stereo
      val body = mp3FrameLen(bitrateKbps, sampleRate, pad) - 4
      o.write(new Array[Byte](body))
    }
    o.toByteArray
  }

  /** Stream metadata from a REAL frame walk:
    * (bitrateKbps, sampleRate, nFrames, durationMs, id3Bytes). CBR
    * asserted (the writer's contract): a mid-stream bitrate change,
    * broken sync, truncated frame, or non-MPEG1/L3 header → None.
    * Duration is exact integer math: frames × 1152 samples at the
    * stream rate. */
  def probeMp3(b: Array[Byte]): Option[(Int, Int, Long, Long, Int)] = {
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3')
      return None
    val tagSize = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
      ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
    val id3Bytes = 10 + tagSize
    if (id3Bytes > b.length) return None
    var off = id3Bytes
    var bitrate = -1; var rate = -1
    var nFrames = 0L
    while (off < b.length) {
      if (off + 4 > b.length) return None
      if ((b(off) & 0xff) != 0xff || (b(off + 1) & 0xff) != 0xfb)
        return None                      // sync / MPEG-1 / Layer III / no-CRC
      val brIdx = (b(off + 2) & 0xf0) >>> 4
      val srIdx = (b(off + 2) & 0x0c) >>> 2
      val pad = (b(off + 2) & 0x02) >>> 1
      if (brIdx < 1 || brIdx > 14 || srIdx > 2) return None
      val br = BitrateKbps(brIdx); val sr = SampleRate(srIdx)
      if (bitrate < 0) { bitrate = br; rate = sr }
      else if (br != bitrate || sr != rate) return None // CBR contract
      val len = mp3FrameLen(br, sr, pad)
      if (off + len > b.length) return None
      nFrames += 1
      off += len
    }
    if (nFrames == 0) None
    else Some((bitrate, rate, nFrames, nFrames * 1152L * 1000L / rate,
      id3Bytes))
  }

  /** `nFrames` ADTS frames — AAC-LC, protection-absent 7-byte headers,
    * `payloadLen` raw bytes per frame. The 13-bit aac_frame_length
    * (header + payload) straddles bytes 3–5 exactly as the spec packs
    * it. */
  def writeAdts(freqIdx: Int, channels: Int, nFrames: Int,
                payloadLen: Int): Array[Byte] = {
    require(freqIdx >= 0 && freqIdx < AdtsRate.length, s"freqIdx $freqIdx")
    require(channels >= 1 && channels <= 7, s"channels $channels")
    val o = new ByteArrayOutputStream()
    val frameLen = 7 + payloadLen
    for (_ <- 0 until nFrames) {
      o.write(0xff)                      // sync 11111111
      o.write(0xf1)                      // sync 1111 | MPEG-4 | layer 00 | no CRC
      // profile AAC-LC (01) | freq idx | private 0 | channel bit 2
      o.write((1 << 6) | (freqIdx << 2) | ((channels >>> 2) & 1))
      o.write(((channels & 3) << 6) | ((frameLen >>> 11) & 3))
      o.write((frameLen >>> 3) & 0xff)
      o.write(((frameLen & 7) << 5) | 0x1f) // + buffer fullness high bits
      o.write(0xfc)                      // fullness low | 1 raw block
      o.write(new Array[Byte](payloadLen))
    }
    o.toByteArray
  }

  /** Stream metadata from a REAL ADTS frame walk:
    * (profile, sampleRate, channels, nFrames, durationMs). Constant
    * header params asserted across frames; broken sync, a reserved
    * frequency index, or a frame-length field past the buffer → None.
    * Duration exact: frames × 1024 samples at the stream rate. */
  def probeAdts(b: Array[Byte]): Option[(Int, Int, Int, Long, Long)] = {
    var off = 0
    var profile = -1; var rate = -1; var channels = -1
    var nFrames = 0L
    while (off < b.length) {
      if (off + 7 > b.length) return None
      // sync + layer 00 + protection_absent (a CRC header would be 9
      // bytes; the walker's 7-byte stride is only valid without it)
      if ((b(off) & 0xff) != 0xff || (b(off + 1) & 0xf7) != 0xf1)
        return None
      val prof = ((b(off + 2) & 0xc0) >>> 6) + 1
      val freqIdx = (b(off + 2) & 0x3c) >>> 2
      val ch = ((b(off + 2) & 1) << 2) | ((b(off + 3) & 0xc0) >>> 6)
      if (freqIdx >= AdtsRate.length || ch == 0) return None
      val sr = AdtsRate(freqIdx)
      if (profile < 0) { profile = prof; rate = sr; channels = ch }
      else if (prof != profile || sr != rate || ch != channels) return None
      val frameLen = ((b(off + 3) & 3) << 11) |
        ((b(off + 4) & 0xff) << 3) | ((b(off + 5) & 0xe0) >>> 5)
      if (frameLen < 7 || off + frameLen > b.length) return None
      nFrames += 1
      off += frameLen
    }
    if (nFrames == 0) None
    else Some((profile, rate, channels, nFrames,
      nFrames * 1024L * 1000L / rate))
  }
}
