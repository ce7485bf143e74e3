package graft.enrich

import org.scalatest.funsuite.AnyFunSuite

/** The SPS writer/parser pair under qm9: Exp-Golomb round-trips across
  * both profile families, crop-unit arithmetic, emulation prevention,
  * and the malformed-input contract. */
class H264SpsSpec extends AnyFunSuite {

  test("round-trips profile/level/dimensions across both families") {
    for (profile <- Seq(66, 77, 100, 110); level <- Seq(10, 31, 51);
         wm <- Seq(1, 8, 120); hm <- Seq(1, 6, 68)) {
      val sps = H264Sps.write(profile, level, wm, hm)
      val Some((p, l, w, h)) = H264Sps.parse(sps)
      assert(p == profile && l == level, s"$profile/$level")
      assert(w == wm * 16 && h == hm * 16, s"$wm x $hm")
    }
    // 1920x1080: the canonical crop case — 68 map units, 4 units cropped
    val hd = H264Sps.write(100, 40, 120, 68, cropRightUnits = 0,
      cropBottomUnits = 4)
    assert(H264Sps.parse(hd).contains((100, 40, 1920, 1080)))
    // asymmetric crop on a Baseline stream
    val crop = H264Sps.write(66, 30, 5, 4, cropRightUnits = 3,
      cropBottomUnits = 1)
    assert(H264Sps.parse(crop).contains((66, 30, 80 - 6, 64 - 2)))
  }

  test("emulation prevention inserts and strips 03 exactly per §7.4.1") {
    val raw = Array[Byte](0, 0, 0, 0, 1, 0x40, 0, 0, 3, 0, 0, 2, 5)
    val ep = H264Sps.insertEp(raw)
    // 00 00 00 → 00 00 03 00; 00 00 03 → 00 00 03 03; 00 00 02 → 00 00 03 02
    assert(ep.toSeq == Seq[Byte](0, 0, 3, 0, 0, 3, 1, 0x40, 0, 0, 3, 3, 0,
      0, 3, 2, 5).toSeq)
    assert(H264Sps.removeEp(ep).toSeq == raw.toSeq)
    // a level_idc of 0 after zeroed constraint flags forms 00 00 in the
    // RBSP; the next byte starts with ue(0) bits and exceeds 3, so a
    // SPELLED-OUT low byte must come from wide Exp-Golomb codes: a
    // 1023-mb-wide picture carries a 21-bit ue whose zero run crosses
    // byte boundaries — parse must still land bit-exact through EP
    val wide = H264Sps.write(66, 0, 1024, 1, cropRightUnits = 0,
      cropBottomUnits = 0)
    assert(H264Sps.parse(wide).contains((66, 0, 16384, 16)))
  }

  test("ep round-trip holds for adversarial zero-run payloads") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val raw = Array.fill(rnd.nextInt(40))(
        if (rnd.nextInt(3) == 0) rnd.nextInt(5).toByte
        else rnd.nextInt(256).toByte)
      assert(H264Sps.removeEp(H264Sps.insertEp(raw)).toSeq == raw.toSeq)
    }
  }

  test("malformed input returns None, never throws") {
    assert(H264Sps.parse(Array.emptyByteArray).isEmpty)
    assert(H264Sps.parse(Array[Byte](0x67, 0x42)).isEmpty)      // truncated
    assert(H264Sps.parse("not a nal unit".getBytes).isEmpty)    // wrong type
    val good = H264Sps.write(100, 31, 8, 6)
    assert(H264Sps.parse(good.take(5)).isEmpty)                 // cut mid-field
    // an all-zero RBSP runs the Exp-Golomb zero-run guard out, not the
    // heap (a >32-bit lead is bitstream garbage, never a field)
    val junk = Array[Byte](0x67) ++ Array.fill(12)(0.toByte)
    assert(H264Sps.parse(junk).isEmpty)
  }
}
