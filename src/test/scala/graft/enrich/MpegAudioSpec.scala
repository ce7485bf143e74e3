package graft.enrich

import org.scalatest.funsuite.AnyFunSuite

/** The MP3/ADTS writer/walker pairs under qm8: round-trip fidelity,
  * the padding-bit stride, the 13-bit ADTS length split, and the
  * malformed-input contract (None, never a throw). */
class MpegAudioSpec extends AnyFunSuite {

  test("mp3 round-trips bitrate/rate/frames/duration through real frames") {
    for (br <- Seq(64, 128, 320); sr <- Seq(44100, 48000, 32000)) {
      val mp3 = MpegAudio.writeMp3(br, sr, 7, "id3 payload".getBytes)
      val Some((gbr, gsr, n, durMs, id3)) = MpegAudio.probeMp3(mp3)
      assert(gbr == br && gsr == sr && n == 7L, s"$br/$sr")
      assert(durMs == 7L * 1152 * 1000 / sr)
      assert(id3 == 10 + 11)
    }
    // total length is the closed form qm8's oracle recomputes: N whole
    // frames + one padding byte per odd frame index
    val mp3 = MpegAudio.writeMp3(128, 44100, 5, Array.emptyByteArray)
    assert(mp3.length == 10 + 5 * MpegAudio.mp3FrameLen(128, 44100, 0) + 2)
  }

  test("mp3 walker strides by the padding bit, not a constant") {
    // 4 frames → paddings 0,1,0,1; zeroing the 2nd frame's padding bit
    // without shortening it leaves the walker mid-frame at frame 3
    val mp3 = MpegAudio.writeMp3(128, 44100, 4, Array.emptyByteArray)
    val f2 = 10 + MpegAudio.mp3FrameLen(128, 44100, 0)
    val broken = mp3.clone()
    broken(f2 + 2) = (broken(f2 + 2) & ~0x02).toByte
    assert(MpegAudio.probeMp3(broken).isEmpty)
  }

  test("adts round-trips the 13-bit frame length split across 3 bytes") {
    for (freqIdx <- Seq(3, 4, 5); ch <- Seq(1, 2, 6); len <- Seq(0, 5, 300)) {
      val adts = MpegAudio.writeAdts(freqIdx, ch, 4, len)
      assert(adts.length == 4 * (7 + len))
      val Some((prof, sr, gch, n, durMs)) = MpegAudio.probeAdts(adts)
      assert(prof == 2 && gch == ch && n == 4L, s"$freqIdx/$ch/$len")
      assert(sr == Seq(48000, 44100, 32000)(freqIdx - 3))
      assert(durMs == 4L * 1024 * 1000 / sr)
    }
  }

  test("malformed input returns None, never throws") {
    assert(MpegAudio.probeMp3(Array.emptyByteArray).isEmpty)
    assert(MpegAudio.probeMp3("no tag here".getBytes).isEmpty)
    val good = MpegAudio.writeMp3(128, 44100, 3, "x".getBytes)
    assert(MpegAudio.probeMp3(good.take(good.length - 9)).isEmpty)
    // mid-stream bitrate change breaks the CBR contract
    val vbr = good.clone()
    val f1 = 11 + MpegAudio.mp3FrameLen(128, 44100, 0)
    vbr(f1 + 2) = ((vbr(f1 + 2) & 0x0f) | (12 << 4)).toByte
    assert(MpegAudio.probeMp3(vbr).isEmpty)

    assert(MpegAudio.probeAdts(Array.emptyByteArray).isEmpty)
    assert(MpegAudio.probeAdts("not adts".getBytes).isEmpty)
    val a = MpegAudio.writeAdts(4, 2, 3, 10)
    assert(MpegAudio.probeAdts(a.take(a.length - 3)).isEmpty)
    // reserved frequency index rejected
    val badFreq = a.clone()
    badFreq(2) = ((badFreq(2) & 0xc3) | (13 << 2)).toByte
    assert(MpegAudio.probeAdts(badFreq).isEmpty)
  }
}
