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
}
