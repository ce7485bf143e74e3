package graft.enrich

import org.scalatest.funsuite.AnyFunSuite

/** The PPS + I_PCM slice codec under qm14: parameter-set round-trips,
  * bit-exact plane reconstruction (including the alignment padding and
  * emulation-prevention interactions a PCM payload forces), the
  * macroblock→raster tile placement, and the malformed-input
  * contract. */
class H264PcmSpec extends AnyFunSuite {

  private def sps(widthMbs: Int, heightMbs: Int, profile: Int = 66) =
    H264Sps.parseFull(H264Sps.write(profile, 30, widthMbs, heightMbs)).get

  private val pps = H264Pcm.parsePps(H264Pcm.writePps()).get

  private def planes(widthMbs: Int, heightMbs: Int, seed: Int) = {
    val n = widthMbs * heightMbs
    val rnd = new scala.util.Random(seed)
    (Array.fill(n * 256)(rnd.nextInt(256).toByte),
      Array.fill(n * 64)(rnd.nextInt(256).toByte),
      Array.fill(n * 64)(rnd.nextInt(256).toByte))
  }

  test("round-trips planes bit-exactly across geometries and idr ids") {
    for (wm <- 1 to 3; hm <- 1 to 3; idr <- Seq(0L, 5L, 15L)) {
      val (y, cb, cr) = planes(wm, hm, seed = (wm * 31 + hm * 7 + idr).toInt)
      val nal = H264Pcm.writeIdrPcmSlice(wm, hm, idr, y, cb, cr)
      val out = H264Pcm.parseIdrPcmSlice(sps(wm, hm), pps, nal).get
      assert(out.widthMbs == wm && out.heightMbs == hm)
      assert(out.idrPicId == idr)
      assert(out.y.toSeq == y.toSeq, s"luma $wm x $hm")
      assert(out.cb.toSeq == cb.toSeq && out.cr.toSeq == cr.toSeq)
    }
  }

  test("all-zero planes force heavy emulation prevention and survive") {
    // 256 zero luma bytes in a row = maximal 00 00 0x traffic: the EP
    // inserter must break every zero pair the payload forms
    val wm = 2; val hm = 1
    val y = new Array[Byte](wm * hm * 256)
    val cb = new Array[Byte](wm * hm * 64)
    val cr = new Array[Byte](wm * hm * 64)
    val nal = H264Pcm.writeIdrPcmSlice(wm, hm, 3L, y, cb, cr)
    // EP bytes really were needed: a zero run inserts one 03 per two
    // zero bytes, so the NAL far exceeds header + raw payload (768)
    assert(nal.length > 1 + wm * hm * 384 + 300,
      s"expected heavy EP traffic, got ${nal.length} bytes")
    val out = H264Pcm.parseIdrPcmSlice(sps(wm, hm), pps, nal).get
    assert(out.y.forall(_ == 0) && out.cb.forall(_ == 0) &&
      out.cr.forall(_ == 0))
  }

  test("tile placement is §6.4.1 raster: mb k paints tile (k%W, k/W)") {
    val wm = 3; val hm = 2
    val n = wm * hm
    // luma value = macroblock index, constant per tile
    val y = new Array[Byte](n * 256)
    for (mb <- 0 until n; j <- 0 until 256) {
      val x = (mb % wm) * 16 + j % 16
      val row = (mb / wm) * 16 + j / 16
      y(row * wm * 16 + x) = mb.toByte
    }
    val nal = H264Pcm.writeIdrPcmSlice(wm, hm, 0L, y,
      new Array[Byte](n * 64), new Array[Byte](n * 64))
    val out = H264Pcm.parseIdrPcmSlice(sps(wm, hm), pps, nal).get
    // spot-check: pixel (x, y) belongs to mb (y/16)*wm + x/16
    for (px <- Seq((0, 0), (17, 0), (40, 5), (0, 16), (47, 31)))
      assert(out.y(px._2 * wm * 16 + px._1) ==
        ((px._2 / 16) * wm + px._1 / 16).toByte, s"pixel $px")
  }

  test("pps round-trips its fields and rejects malformed input") {
    for (id <- Seq(0L, 3L, 255L); qp <- Seq(0, 26, 51)) {
      val p = H264Pcm.parsePps(H264Pcm.writePps(id, qp)).get
      assert(p.ppsId == id && p.picInitQp == qp)
      assert(!p.entropyCabac && p.numSliceGroups == 1)
    }
    assert(H264Pcm.parsePps(Array[Byte](0x67, 0)).isEmpty) // SPS, not PPS
    assert(H264Pcm.parsePps(Array[Byte](0x68)).isEmpty)    // truncated
    // out-of-range pic_init_qp: qp 52 encodes but must not parse
    val hot = H264Pcm.writePps(0L, 78)
    assert(H264Pcm.parsePps(hot).isEmpty)
  }

  test("slice decode rejects anything outside the I_PCM contract") {
    val (y, cb, cr) = planes(2, 2, seed = 9)
    val good = H264Pcm.writeIdrPcmSlice(2, 2, 1L, y, cb, cr)
    val s22 = sps(2, 2)
    assert(H264Pcm.parseIdrPcmSlice(s22, pps, good).isDefined)
    // wrong NAL type
    val wrongType = good.clone(); wrongType(0) = 0x61
    assert(H264Pcm.parseIdrPcmSlice(s22, pps, wrongType).isEmpty)
    // truncated mid-macroblock
    assert(H264Pcm.parseIdrPcmSlice(s22, pps, good.take(200)).isEmpty)
    // SPS/slice geometry mismatch: more MBs expected than present
    assert(H264Pcm.parseIdrPcmSlice(sps(3, 3), pps, good).isEmpty)
    // a CABAC PPS refuses the decode up front
    assert(H264Pcm.parseIdrPcmSlice(s22,
      pps.copy(entropyCabac = true), good).isEmpty)
    // High-profile SPS still decodes (chroma block parsed, 4:2:0 kept)
    assert(H264Pcm.parseIdrPcmSlice(sps(2, 2, profile = 100), pps, good)
      .isDefined)
  }

  test("qm14 container chain: avcC carries both sets, stco hits the mdat") {
    for (id <- 0L to 24L) {
      val mp4 = Multimodal.qm14Container(id * 3 + 1, s"doc ${id * 3 + 1}")
      val docId = id * 3 + 1
      val spsInfo = Mp4Box.probeAvcSps(mp4).flatMap(H264Sps.parseFull).get
      assert(spsInfo.widthMbs == 1 + (docId % 3).toInt)
      assert(spsInfo.heightUnits == 1 + (docId % 2).toInt)
      val ppsInfo = Mp4Box.probeAvcPps(mp4).flatMap(H264Pcm.parsePps).get
      assert(ppsInfo.picInitQp == 20 + (docId % 10).toInt)
      val Seq((sn, off, len)) = Mp4Box.probeKeyframeRanges(mp4).get
      assert(sn == 1L && off == Mp4Box.MdatPayloadOffset)
      // the planned range lands inside the file, on the length prefix
      assert(off + len <= mp4.length)
      val nalLen = ((mp4(off.toInt) & 0xff) << 24) |
        ((mp4(off.toInt + 1) & 0xff) << 16) |
        ((mp4(off.toInt + 2) & 0xff) << 8) | (mp4(off.toInt + 3) & 0xff)
      assert(nalLen == len - 4)
      val frame = H264Pcm.parseIdrPcmSlice(spsInfo, ppsInfo,
        java.util.Arrays.copyOfRange(mp4, off.toInt + 4,
          (off + len).toInt)).get
      assert(frame.idrPicId == docId % 16)
      // one plane byte against the sample model: raster (0,0) is
      // macroblock 0, payload index 0 → (id + 0) mod 256
      assert((frame.y(0) & 0xff) == (docId % 256).toInt)
    }
  }
}
