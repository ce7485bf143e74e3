package graft.enrich

import org.scalatest.funsuite.AnyFunSuite

/** The ISO-BMFF writer/walker pair under qm7: round-trip fidelity for
  * both mvhd versions, opaque-box stepping, and the malformed-input
  * contract (None, never a throw — the P12 corrupt-skip convention). */
class Mp4BoxSpec extends AnyFunSuite {

  test("round-trips both mvhd versions and multi-track stsd chains") {
    for (ver <- Seq(0, 1)) {
      val mp4 = Mp4Box.write(90000L, 123456L, Seq("avc1", "mp4a"),
        "opaque payload".getBytes, mvhdVersion = ver)
      val Some((brand, ts, dur, n, codecs)) = Mp4Box.probe(mp4)
      assert(brand == "isom" && ts == 90000L && dur == 123456L)
      assert(n == 2 && codecs == Seq("avc1", "mp4a"), s"v$ver")
    }
    // v1 carries a 64-bit duration the v0 layout cannot represent
    val big = Mp4Box.write(90000L, 0x1_0000_0000L, Seq("hvc1"),
      Array.emptyByteArray, mvhdVersion = 1)
    assert(Mp4Box.probe(big).exists(_._3 == 0x1_0000_0000L))
  }

  test("walker steps over opaque boxes by size, not content") {
    // a skip payload that ITSELF looks like a box header must not be
    // parsed — if the walker read content instead of sizes, the fake
    // moov inside would corrupt the track count
    val trap = new java.io.ByteArrayOutputStream()
    trap.write(Array[Byte](0, 0, 0, 16))
    trap.write("moov".getBytes)
    trap.write(new Array[Byte](8))
    val mp4 = Mp4Box.write(1000L, 42L, Seq("avc1"), trap.toByteArray)
    val Some((_, _, dur, n, codecs)) = Mp4Box.probe(mp4)
    assert(dur == 42L && n == 1 && codecs == Seq("avc1"))
  }

  test("avcC-bearing avc1 entries round-trip the SPS; plain probe unchanged") {
    val sps = H264Sps.write(100, 31, 8, 6, cropRightUnits = 2)
    val mp4 = Mp4Box.write(90000L, 9000L, Seq("avc1", "mp4a"),
      "payload".getBytes, mvhdVersion = 0, avcSps = Some(sps))
    // the container walk still reads the same metadata around the
    // now-78-byte visual entry + its extension box
    val Some((brand, ts, dur, n, codecs)) = Mp4Box.probe(mp4)
    assert(brand == "isom" && ts == 90000L && dur == 9000L)
    assert(n == 2 && codecs == Seq("avc1", "mp4a"))
    // and the avcC scan surfaces the SPS byte-for-byte
    assert(Mp4Box.probeAvcSps(mp4).exists(_.sameElements(sps)))
    // no decoder config → None, not a crash
    val bare = Mp4Box.write(90000L, 9000L, Seq("avc1"), Array.emptyByteArray)
    assert(Mp4Box.probe(bare).isDefined && Mp4Box.probeAvcSps(bare).isEmpty)
  }

  test("sample tables round-trip and enforce the stts/stsz consistency rule") {
    val st = Mp4Box.SampleTable(
      sttsRuns = Seq((3L, 1000L), (2L, 2000L)),
      sizes = Seq(10L, 20L, 30L, 40L, 50L),
      syncs = Some(Seq(1L, 4L)))
    val mp4 = Mp4Box.write(90000L, 9000L, Seq("avc1", "mp4a"),
      "p".getBytes, sampleTable = Some(st))
    assert(Mp4Box.probeSampleStats(mp4).contains((5L, 7000L, 2L, 150L, 50L)))
    // container metadata unchanged around the enlarged stbl
    assert(Mp4Box.probe(mp4).exists(_._5 == Seq("avc1", "mp4a")))
    // no stss box → every sample is sync (§8.6.2.1), not malformed
    val allSync = Mp4Box.write(90000L, 9000L, Seq("avc1"), "p".getBytes,
      sampleTable = Some(st.copy(syncs = None)))
    assert(Mp4Box.probeSampleStats(allSync).contains((5L, 7000L, 5L, 150L, 50L)))
    // a table-less container has no sample stats, not a crash
    val bare = Mp4Box.write(90000L, 9000L, Seq("avc1"), Array.emptyByteArray)
    assert(Mp4Box.probe(bare).isDefined && Mp4Box.probeSampleStats(bare).isEmpty)
    // corrupting the stsz count violates §8.6.1.2 → the whole probe
    // rejects (the walker cross-checks, it doesn't trust one table)
    val idx = {
      // locate the stsz box and its sample_count field
      def find(b: Array[Byte], t: String): Int =
        (0 until b.length - 4).find(i => new String(b, i, 4, "US-ASCII") == t).get
      find(mp4, "stsz") + 4 + 4 + 4
    }
    val broken = mp4.clone()
    broken(idx + 3) = (broken(idx + 3) + 1).toByte
    assert(Mp4Box.probe(broken).isEmpty &&
      Mp4Box.probeSampleStats(broken).isEmpty)
  }

  test("keyframe ranges follow the stsc/stco chunk mapping exactly") {
    // 7 samples, chunk 1 holds 2, later chunks 3 each → chunks are
    // {1,2} {3,4,5} {6,7}; keyframes 1,3,6 land at each chunk's head or
    // mid-chunk, exercising the intra-chunk predecessor sum
    val st = Mp4Box.SampleTable(
      sttsRuns = Seq((7L, 1000L)),
      sizes = Seq(10L, 11L, 12L, 13L, 14L, 15L, 16L),
      syncs = Some(Seq(1L, 4L, 6L)),
      stscRuns = Seq((1L, 2L), (2L, 3L)),
      chunkOffsets = Seq(100L, 200L, 300L))
    val mp4 = Mp4Box.write(90000L, 7000L, Seq("avc1"), "p".getBytes,
      sampleTable = Some(st))
    // sample 1: chunk 1 head → 100; sample 4: chunk 2, after sample 3
    // (12 bytes) → 212; sample 6: chunk 3 head → 300, 15 bytes
    assert(Mp4Box.probeKeyframeRanges(mp4).contains(Seq(
      (1L, 100L, 10L), (4L, 212L, 13L), (6L, 300L, 15L))))
    // no stss → EVERY sample is a seek point (§8.6.2.1)
    val all = Mp4Box.write(90000L, 7000L, Seq("avc1"), "p".getBytes,
      sampleTable = Some(st.copy(syncs = None)))
    assert(Mp4Box.probeKeyframeRanges(all).exists(_.map(_._1) ==
      (1L to 7L).toSeq))
    // declaring fewer chunk slots than samples rejects the container
    val tight = st.copy(chunkOffsets = Seq(100L, 200L))
    val short = Mp4Box.write(90000L, 7000L, Seq("avc1"), "p".getBytes,
      sampleTable = Some(tight))
    assert(Mp4Box.probe(short).isEmpty &&
      Mp4Box.probeKeyframeRanges(short).isEmpty)
    // chunk tables absent → no seek plan, container still fine
    val noChunks = Mp4Box.write(90000L, 7000L, Seq("avc1"), "p".getBytes,
      sampleTable = Some(st.copy(stscRuns = Nil, chunkOffsets = Nil)))
    assert(Mp4Box.probe(noChunks).isDefined &&
      Mp4Box.probeKeyframeRanges(noChunks).isEmpty)
  }

  test("esds-bearing mp4a entries round-trip the AAC config in both " +
       "descriptor-length layouts") {
    for (padded <- Seq(false, true)) {
      val cfg = Mp4Box.AacConfig(audioObjectType = 2, freqIndex = 4,
        channelConfig = 2, avgBitrate = 128000L, paddedLengths = padded)
      val m4a = Mp4Box.write(90000L, 9000L, Seq("mp4a"), "doc".getBytes,
        aacConfig = Some(cfg))
      // the container walk still reads the movie metadata around the
      // now-full AudioSampleEntry + its esds child
      val Some((brand, ts, dur, n, codecs)) = Mp4Box.probe(m4a)
      assert(brand == "isom" && ts == 90000L && dur == 9000L)
      assert(n == 1 && codecs == Seq("mp4a"), s"padded=$padded")
      // and the descriptor walk surfaces every ASC field
      assert(Mp4Box.probeAacConfig(m4a)
        .contains((0x40, 2, 4, 44100, 2, 128000L)), s"padded=$padded")
      // the padded form costs exactly 3 bytes per descriptor (4 of them)
      if (padded) {
        val plain = Mp4Box.write(90000L, 9000L, Seq("mp4a"), "doc".getBytes,
          aacConfig = Some(cfg.copy(paddedLengths = false)))
        assert(m4a.length == plain.length + 12)
      }
    }
    // a video track alongside: both probes coexist on one container
    val sps = H264Sps.write(66, 30, 4, 3)
    val both = Mp4Box.write(90000L, 9000L, Seq("avc1", "mp4a"),
      "p".getBytes, avcSps = Some(sps),
      aacConfig = Some(Mp4Box.AacConfig(1, 11, 1, 8000L)))
    assert(Mp4Box.probeAvcSps(both).exists(_.sameElements(sps)))
    assert(Mp4Box.probeAacConfig(both).contains((0x40, 1, 11, 8000, 1, 8000L)))
    // minimal mp4a (no config) → None, not a crash — and the plain
    // probe's byte layout is unchanged (qm7's closed-form oracle)
    val bare = Mp4Box.write(90000L, 9000L, Seq("mp4a"), Array.emptyByteArray)
    assert(Mp4Box.probe(bare).isDefined && Mp4Box.probeAacConfig(bare).isEmpty)
  }

  test("esds parser rejects non-audio streams and ASC escape forms") {
    // hand-build the container so fields the WRITER refuses (escape
    // AOT, reserved freq index, non-audio streamType) still reach the
    // parser
    def boxOf(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      val sz = 8L + payload.length
      b.write(((sz >>> 24) & 0xff).toInt); b.write(((sz >>> 16) & 0xff).toInt)
      b.write(((sz >>> 8) & 0xff).toInt); b.write((sz & 0xff).toInt)
      b.write(tpe.getBytes); b.write(payload); b.toByteArray
    }
    def withAsc(asc0: Int, asc1: Int, streamType: Int = 0x15): Array[Byte] = {
      val es = Array(
        0x03, 25, 0, 1, 0,                          // ES_Descriptor
        0x04, 17, 0x40, streamType, 0, 0x18, 0,     // DecoderConfig
        0, 0, 0, 0, 0, 0, 0, 0,                     // max/avg bitrate 0
        0x05, 2, asc0, asc1,                        // DecoderSpecificInfo
        0x06, 1, 0x02).map(_.toByte)                // SLConfig
      val esds = boxOf("esds", new Array[Byte](4) ++ es)
      val entry = boxOf("mp4a", new Array[Byte](28) ++ esds)
      val stsd = boxOf("stsd",
        new Array[Byte](4) ++ Array[Byte](0, 0, 0, 1) ++ entry)
      val mvhd = boxOf("mvhd", new Array[Byte](12) ++
        Array[Byte](0, 0, 3, 0xe8.toByte) ++        // timescale 1000
        Array[Byte](0, 0, 0, 42) ++ new Array[Byte](8))
      val trak = boxOf("trak", boxOf("mdia", boxOf("minf",
        boxOf("stbl", stsd))))
      val ftyp = boxOf("ftyp", "isom".getBytes ++ new Array[Byte](4) ++
        "isomiso2".getBytes)
      ftyp ++ boxOf("moov", mvhd ++ trak)
    }
    // AAC-LC 44.1 kHz stereo through the hand-built path = the baseline
    assert(Mp4Box.probeAacConfig(withAsc(0x12, 0x10))
      .contains((0x40, 2, 4, 44100, 2, 0L)))
    // AOT escape 31 (11111xxx) → None
    assert(Mp4Box.probeAacConfig(withAsc(0xfa, 0x10)).isEmpty)
    // freq index 15 (explicit 24-bit form) → None
    assert(Mp4Box.probeAacConfig(withAsc(0x17, 0x90)).isEmpty)
    // streamType visual (4 << 2) → not audio → None
    assert(Mp4Box.probeAacConfig(withAsc(0x12, 0x10, streamType = 0x11)).isEmpty)
    // truncated descriptor chain → None, never a throw
    val good = Mp4Box.write(90000L, 9000L, Seq("mp4a"), Array.emptyByteArray,
      aacConfig = Some(Mp4Box.AacConfig(2, 4, 2, 128000L)))
    assert(Mp4Box.probeAacConfig(good.dropRight(6)).isEmpty)
  }

  test("malformed input returns None, never throws") {
    val good = Mp4Box.write(1000L, 42L, Seq("avc1"), Array.emptyByteArray)
    assert(Mp4Box.probe(Array.emptyByteArray).isEmpty)
    assert(Mp4Box.probe("not an mp4 at all".getBytes).isEmpty)
    assert(Mp4Box.probe(good.take(good.length - 3)).isEmpty) // truncated
    // a box size pointing past the buffer is rejected, not chased
    val oversize = good.clone()
    oversize(0) = 0x7f.toByte
    assert(Mp4Box.probe(oversize).isEmpty)
    // no moov (ftyp alone) → metadata incomplete → None
    assert(Mp4Box.probe(good.take(24)).isEmpty)
  }

  test("descriptor length forms enforce their bounds symmetrically") {
    // single-byte form: 7 usable bits — 127 fits, 128 must fail loudly
    val d127 = Mp4Box.descriptor(0x05, new Array[Byte](127), padded = false)
    assert(d127.length == 2 + 127 && (d127(1) & 0xFF) == 127)
    intercept[IllegalArgumentException] {
      Mp4Box.descriptor(0x05, new Array[Byte](128), padded = false)
    }
    // padded 4-byte form: 28 usable bits — >127 encodes with 0x80
    // continuations; 2^28 must fail loudly, not silently truncate
    // (ADVICE r12's bounds asymmetry)
    val d200 = Mp4Box.descriptor(0x05, new Array[Byte](200), padded = true)
    assert(d200.length == 5 + 200)
    assert((d200(1) & 0x80) == 0x80 && (d200(4) & 0xFF) == (200 & 0x7f))
    intercept[IllegalArgumentException] {
      Mp4Box.descriptor(0x05, new Array[Byte](1 << 28), padded = true)
    }
  }
}
