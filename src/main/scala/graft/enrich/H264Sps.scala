package graft.enrich

import java.io.ByteArrayOutputStream

/** Pure-JVM H.264 sequence-parameter-set codec — the deepest layer of
  * the qm7/qm9 honesty probe. Frame DECODE of the reference's
  * H.264-in-MP4 store (lambda/s3Posts-to-ES-lambda/s3-to-es_aws.py:83)
  * needs native codecs, but the SPS — the stream's self-description,
  * carried in the `avcC` box of every `.mp4` — is a few dozen
  * Exp-Golomb-coded bits, and parsing it yields what a catalog actually
  * wants from video: coded dimensions, crop window, profile, level.
  * So the engine reads REAL H.264 bitstream syntax (ITU-T H.264 §7.3.2.1
  * sequence order; §7.4.2.1.1 crop-unit semantics; §7.4.1 emulation
  * prevention) even though macroblock decode stays out of reach.
  *
  * WRITER serializes the spec's field order through an MSB-first bit
  * packer: fixed-width u(n) fields, ue(v) Exp-Golomb (leadingZeroBits =
  * floor(log2(v+1)); prefix zeros, marker one, suffix), the
  * profile-conditional chroma block for High-family profiles, the
  * conditional frame-cropping block, the rbsp stop bit + alignment, and
  * REAL emulation prevention (any 00 00 0x where x≤3 in the RBSP gets
  * an 03 interposed — §7.4.1). PARSER is the inverse walk: EP-byte
  * removal, bit-exact field consumption in spec order, SubWidthC/
  * SubHeightC crop-unit arithmetic per chroma format. Malformed input
  * returns None (the qm3/P12 corrupt-skip convention). */
object H264Sps {

  /** Profiles that carry the chroma/bit-depth block (§7.3.2.1.1). */
  private val HighFamily =
    Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)

  /** MSB-first RBSP bit packer, shared by the SPS writer and the
    * PPS/I_PCM-slice writers in [[H264Pcm]]. `se(v)` is the §9.1.1
    * signed Exp-Golomb map (v>0 → 2v−1, v≤0 → −2v); `alignZero` emits
    * pcm_alignment_zero_bit padding (§7.3.5: zero bits to the byte
    * boundary); `raw` appends byte-aligned sample bytes. */
  private[enrich] final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def u(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        nBits += 1
        if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
        i -= 1
      }
    }
    def ue(v: Long): Unit = {
      val lead = 63 - java.lang.Long.numberOfLeadingZeros(v + 1)
      u(0L, lead); u(1L, 1); u(v + 1 - (1L << lead), lead)
    }
    def se(v: Long): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
    def alignZero(): Unit = if (nBits > 0) u(0L, 8 - nBits)
    def raw(b: Array[Byte]): Unit = {
      require(nBits == 0, "raw bytes must start byte-aligned")
      out.write(b, 0, b.length)
    }
    /** rbsp_trailing_bits: stop bit + zero-fill to a byte boundary. */
    def trailing(): Array[Byte] = {
      u(1L, 1)
      if (nBits > 0) { cur <<= (8 - nBits); out.write(cur); nBits = 0 }
      out.toByteArray
    }
  }

  /** Bit-exact reader over a de-EP'd RBSP; the inverse of [[BitWriter]],
    * with the same §9.1.1 se(v) inverse and the byte-aligned fast path
    * the I_PCM sample walk uses. Any read past the end sets `bad`. */
  private[enrich] final class BitReader(b: Array[Byte]) {
    private var pos = 0
    var bad = false
    def u(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) {
        if (pos >= b.length * 8) { bad = true; return 0L }
        v = (v << 1) | ((b(pos >>> 3) >>> (7 - (pos & 7))) & 1)
        pos += 1; i += 1
      }
      v
    }
    def ue(): Long = {
      var lead = 0
      while (!bad && u(1) == 0) {
        lead += 1
        if (lead > 32) { bad = true; return 0L }
      }
      if (bad) 0L else (1L << lead) - 1 + u(lead)
    }
    def se(): Long = {
      val k = ue()
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
    }
    /** §7.3.5 pcm_alignment_zero_bit: consume zero bits to the byte
      * boundary; a nonzero pad bit marks the stream malformed. */
    def alignZero(): Unit =
      while (!bad && (pos & 7) != 0) if (u(1) != 0) bad = true
    /** n byte-aligned raw bytes (the I_PCM sample payload). */
    def raw(n: Int): Array[Byte] = {
      if ((pos & 7) != 0 || (pos >>> 3) + n > b.length) {
        bad = true; return Array.emptyByteArray
      }
      val out = java.util.Arrays.copyOfRange(b, pos >>> 3, (pos >>> 3) + n)
      pos += n * 8
      out
    }
  }

  /** §7.4.1: 00 00 {00,01,02,03} in the raw RBSP gets an emulation-
    * prevention 03 interposed after the zero pair. */
  private[enrich] def insertEp(rbsp: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    var zeros = 0
    for (byte <- rbsp) {
      if (zeros >= 2 && (byte & 0xff) <= 3) { o.write(3); zeros = 0 }
      o.write(byte)
      zeros = if (byte == 0) zeros + 1 else 0
    }
    o.toByteArray
  }

  /** Inverse of [[insertEp]]: 00 00 03 → drop the 03. */
  private[enrich] def removeEp(ebsp: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    var zeros = 0
    for (byte <- ebsp) {
      if (zeros >= 2 && byte == 3) zeros = 0 // EP byte: skip, reset
      else {
        o.write(byte)
        zeros = if (byte == 0) zeros + 1 else 0
      }
    }
    o.toByteArray
  }

  /** Serialize an SPS NAL (header byte 0x67 + EP-protected RBSP):
    * 4:2:0, frame_mbs_only, pic_order_cnt_type 2, cropping only when a
    * crop is requested. Crop values are in CROP UNITS (×2 pixels
    * horizontally and vertically at 4:2:0 frame coding). */
  def write(profileIdc: Int, levelIdc: Int, widthMbs: Int, heightMbs: Int,
            cropRightUnits: Int = 0, cropBottomUnits: Int = 0): Array[Byte] = {
    require(widthMbs >= 1 && heightMbs >= 1, "empty picture")
    val w = new BitWriter
    w.u(profileIdc, 8)
    w.u(0L, 8)                          // constraint flags + reserved
    w.u(levelIdc, 8)
    w.ue(0)                             // seq_parameter_set_id
    if (HighFamily.contains(profileIdc)) {
      w.ue(1)                           // chroma_format_idc 4:2:0
      w.ue(0); w.ue(0)                  // bit depths − 8
      w.u(0L, 1)                        // qpprime_y_zero_transform_bypass
      w.u(0L, 1)                        // seq_scaling_matrix_present
    }
    w.ue(0)                             // log2_max_frame_num_minus4
    w.ue(2)                             // pic_order_cnt_type (no extras)
    w.ue(1)                             // max_num_ref_frames
    w.u(0L, 1)                          // gaps_in_frame_num_allowed
    w.ue(widthMbs - 1)                  // pic_width_in_mbs_minus1
    w.ue(heightMbs - 1)                 // pic_height_in_map_units_minus1
    w.u(1L, 1)                          // frame_mbs_only_flag
    w.u(1L, 1)                          // direct_8x8_inference_flag
    val crop = cropRightUnits > 0 || cropBottomUnits > 0
    w.u(if (crop) 1L else 0L, 1)        // frame_cropping_flag
    if (crop) {
      w.ue(0); w.ue(cropRightUnits)
      w.ue(0); w.ue(cropBottomUnits)
    }
    w.u(0L, 1)                          // vui_parameters_present
    val rbsp = w.trailing()
    val o = new ByteArrayOutputStream()
    o.write(0x67)                       // nal_ref_idc 3, nal_unit_type 7
    o.write(insertEp(rbsp))
    o.toByteArray
  }

  /** Every §7.3.2.1 field a downstream slice parser needs: coded
    * geometry in macroblocks, the frame_num/poc bit widths the slice
    * header is sized by, and the §7.4.2.1.1 display crop result. */
  private[enrich] final case class SpsInfo(
    profileIdc: Int, levelIdc: Int, widthMbs: Int, heightUnits: Int,
    frameMbsOnly: Boolean, chromaArrayType: Int, log2MaxFrameNum: Int,
    pocType: Int, log2MaxPocLsb: Int, width: Int, height: Int)

  /** Parse an SPS NAL → (profileIdc, levelIdc, displayWidth,
    * displayHeight): EP removal, bit-exact §7.3.2.1 field walk
    * (including the conditional chroma and pic_order_cnt_type-0/1
    * blocks this writer never emits — real streams do), then the
    * §7.4.2.1.1 crop arithmetic with the SubWidthC/SubHeightC table.
    * None on malformed input. */
  def parse(nal: Array[Byte]): Option[(Int, Int, Int, Int)] =
    parseFull(nal).map(s => (s.profileIdc, s.levelIdc, s.width, s.height))

  /** The same walk, keeping the fields a slice decode consumes. */
  private[enrich] def parseFull(nal: Array[Byte]): Option[SpsInfo] = {
    if (nal.length < 4 || (nal(0) & 0x1f) != 7) return None
    val r = new BitReader(removeEp(nal.drop(1)))
    val profile = r.u(8).toInt
    r.u(8)                              // constraint flags + reserved
    val level = r.u(8).toInt
    r.ue()                              // seq_parameter_set_id
    var chromaIdc = 1L                  // inferred 4:2:0 when absent
    var separateColour = 0L
    if (HighFamily.contains(profile)) {
      chromaIdc = r.ue()
      if (chromaIdc == 3) separateColour = r.u(1)
      r.ue(); r.ue()                    // bit depths
      r.u(1)                            // qpprime bypass
      if (r.u(1) == 1) return None      // scaling matrices: out of scope
    }
    val log2MaxFrameNum = r.ue() + 4    // log2_max_frame_num_minus4
    val pocType = r.ue()                // pic_order_cnt_type
    var log2MaxPocLsb = 0L
    pocType match {
      case 0 => log2MaxPocLsb = r.ue() + 4 // log2_max_pic_order_cnt_lsb
      case 1 =>
        r.u(1); r.ue(); r.ue()          // delta flags/offsets
        val n = r.ue()
        var i = 0L
        while (i < n && !r.bad) { r.ue(); i += 1 }
      case _ =>
    }
    r.ue()                              // max_num_ref_frames
    r.u(1)                              // gaps allowed
    val widthMbs = r.ue() + 1
    val heightUnits = r.ue() + 1
    val frameMbsOnly = r.u(1)
    if (frameMbsOnly == 0) r.u(1)       // mb_adaptive_frame_field
    r.u(1)                              // direct_8x8_inference
    var cropL = 0L; var cropR = 0L; var cropT = 0L; var cropB = 0L
    if (r.u(1) == 1) {                  // frame_cropping_flag
      cropL = r.ue(); cropR = r.ue(); cropT = r.ue(); cropB = r.ue()
    }
    if (r.bad) return None
    // §7.4.2.1.1: crop units from the chroma format
    val chromaArrayType = if (separateColour == 1) 0L else chromaIdc
    val (subW, subH) = chromaArrayType match {
      case 1 => (2, 2)                  // 4:2:0
      case 2 => (2, 1)                  // 4:2:2
      case _ => (1, 1)                  // monochrome / 4:4:4
    }
    val cropUnitX = if (chromaArrayType == 0) 1L else subW.toLong
    val cropUnitY = (if (chromaArrayType == 0) 1L else subH.toLong) *
      (2 - frameMbsOnly)
    val width = widthMbs * 16 - cropUnitX * (cropL + cropR)
    val height = heightUnits * 16 * (2 - frameMbsOnly) -
      cropUnitY * (cropT + cropB)
    if (width <= 0 || height <= 0 || widthMbs > 1024 || heightUnits > 1024 ||
        log2MaxFrameNum > 16 || log2MaxPocLsb > 16)
      None
    else Some(SpsInfo(profile, level, widthMbs.toInt, heightUnits.toInt,
      frameMbsOnly == 1, chromaArrayType.toInt, log2MaxFrameNum.toInt,
      pocType.toInt, log2MaxPocLsb.toInt, width.toInt, height.toInt))
  }
}
