package graft.enrich

import java.io.ByteArrayOutputStream

import H264Sps.{BitReader, BitWriter, insertEp, removeEp}

/** Pure-JVM H.264 I_PCM frame codec — actual PIXEL access from the
  * reference's H.264-in-MP4 media store shape
  * (lambda/s3Posts-to-ES-lambda/s3-to-es_aws.py:83,116-122), one layer
  * below qm9's SPS probe. Full macroblock RECONSTRUCTION (inverse
  * transform + intra/inter prediction) needs native codecs, but the
  * I_PCM macroblock (ITU-T H.264 §7.3.5.1 / §8.3.5) is the spec's
  * mandated uncompressed escape — raw byte-aligned samples inside an
  * otherwise fully coded bitstream — and every conformant decoder must
  * handle it. Decoding an I_PCM IDR frame therefore exercises every
  * REAL layer short of the transform: PPS field walk (§7.3.2.2), slice
  * header in SPS/PPS-dependent field widths (§7.3.3 — frame_num sized
  * by log2_max_frame_num, the IDR dec_ref_pic_marking block, se(v)
  * slice_qp_delta), per-macroblock mb_type ue(v), the
  * pcm_alignment_zero_bit byte alignment, 256+64+64 sample bytes per
  * macroblock at 4:2:0, emulation prevention over the whole slice, and
  * the macroblock→plane raster placement (§6.4.1 16×16 luma / 8×8
  * chroma tiles in raster-scan macroblock order).
  *
  * WRITER emits a Baseline-decodable IDR slice NAL (nal_ref_idc 3,
  * nal_unit_type 5) whose every macroblock is I_PCM (mb_type 25 in I
  * slices, table 7-11); PARSER is the inverse bit-exact walk producing
  * the three sample planes. Malformed input — wrong NAL type, CABAC
  * PPS, non-I_PCM mb_type, truncation, nonzero alignment bits, a
  * missing rbsp stop bit — returns None (the qm3/P12 corrupt-skip
  * convention). */
object H264Pcm {

  /** The §7.3.2.2 fields a slice parse depends on. */
  private[enrich] final case class PpsInfo(
    ppsId: Long, spsId: Long, entropyCabac: Boolean,
    bottomFieldPocPresent: Boolean, numSliceGroups: Int,
    picInitQp: Int, deblockingControlPresent: Boolean,
    redundantPicCntPresent: Boolean)

  /** One decoded frame: 4:2:0 planes in picture raster order. */
  private[enrich] final case class PcmFrame(
    widthMbs: Int, heightMbs: Int, idrPicId: Long,
    y: Array[Byte], cb: Array[Byte], cr: Array[Byte]) {
    def width: Int = widthMbs * 16
    def height: Int = heightMbs * 16
  }

  /** Serialize a minimal CAVLC PPS NAL (header byte 0x68 + EP-protected
    * §7.3.2.2 RBSP): one slice group, no weighted prediction, no
    * deblocking-control override — the smallest PPS a Baseline I_PCM
    * stream needs, every field still written in spec order. */
  def writePps(ppsId: Long = 0L, picInitQp: Int = 26): Array[Byte] = {
    val w = new BitWriter
    w.ue(ppsId)                         // pic_parameter_set_id
    w.ue(0)                             // seq_parameter_set_id
    w.u(0L, 1)                          // entropy_coding_mode_flag: CAVLC
    w.u(0L, 1)                          // bottom_field_pic_order_in_frame
    w.ue(0)                             // num_slice_groups_minus1
    w.ue(0)                             // num_ref_idx_l0_default_active−1
    w.ue(0)                             // num_ref_idx_l1_default_active−1
    w.u(0L, 1)                          // weighted_pred_flag
    w.u(0L, 2)                          // weighted_bipred_idc
    w.se(picInitQp - 26L)               // pic_init_qp_minus26
    w.se(0L)                            // pic_init_qs_minus26
    w.se(0L)                            // chroma_qp_index_offset
    w.u(0L, 1)                          // deblocking_filter_control_present
    w.u(0L, 1)                          // constrained_intra_pred_flag
    w.u(0L, 1)                          // redundant_pic_cnt_present_flag
    val o = new ByteArrayOutputStream()
    o.write(0x68)                       // nal_ref_idc 3, nal_unit_type 8
    o.write(insertEp(w.trailing()))
    o.toByteArray
  }

  /** Parse a PPS NAL through the full §7.3.2.2 field walk (including
    * the slice-group map block this writer never emits — real streams
    * do). None on malformed input. */
  def parsePps(nal: Array[Byte]): Option[PpsInfo] = {
    if (nal.length < 2 || (nal(0) & 0x1f) != 8) return None
    val r = new BitReader(removeEp(nal.drop(1)))
    val ppsId = r.ue()
    val spsId = r.ue()
    val cabac = r.u(1) == 1
    val bottomPoc = r.u(1) == 1
    val nGroups = r.ue() + 1
    if (nGroups > 1) {
      // §7.3.2.2 slice_group_map walk (FMO) — parsed, not supported
      r.ue() match {
        case 0 => var i = 0L; while (i < nGroups && !r.bad) { r.ue(); i += 1 }
        case 2 =>
          var i = 0L
          while (i < nGroups - 1 && !r.bad) { r.ue(); r.ue(); i += 1 }
        case 3 | 4 | 5 => r.u(1); r.ue()
        case 6 =>
          val n = r.ue() + 1
          val bits = 32 - Integer.numberOfLeadingZeros(nGroups.toInt - 1)
          var i = 0L
          while (i < n && !r.bad) { r.u(bits); i += 1 }
        case _ =>
      }
    }
    r.ue(); r.ue()                      // num_ref_idx defaults
    r.u(1)                              // weighted_pred_flag
    r.u(2)                              // weighted_bipred_idc
    val qp = r.se() + 26
    r.se()                              // pic_init_qs_minus26
    r.se()                              // chroma_qp_index_offset
    val deblock = r.u(1) == 1
    r.u(1)                              // constrained_intra_pred_flag
    val redundant = r.u(1) == 1
    if (r.bad || ppsId > 255 || nGroups > 8 || qp < 0 || qp > 51) None
    else Some(PpsInfo(ppsId, spsId, cabac, bottomPoc, nGroups.toInt,
      qp.toInt, deblock, redundant))
  }

  /** Serialize an IDR slice NAL (header byte 0x65) whose macroblocks
    * are all I_PCM. Planes are picture-raster 4:2:0 (y: 256·nMbs
    * samples laid out W×H, cb/cr: 64·nMbs laid out W/2×H/2); the
    * writer re-tiles them into §6.4.1 macroblock order. */
  def writeIdrPcmSlice(widthMbs: Int, heightMbs: Int, idrPicId: Long,
                       y: Array[Byte], cb: Array[Byte],
                       cr: Array[Byte]): Array[Byte] = {
    val nMbs = widthMbs * heightMbs
    require(widthMbs >= 1 && heightMbs >= 1, "empty picture")
    require(y.length == nMbs * 256 && cb.length == nMbs * 64 &&
      cr.length == nMbs * 64, "plane sizes must match the mb grid")
    val w = new BitWriter
    // slice_header (§7.3.3) under this writer's SPS shape:
    // log2_max_frame_num 4, poc type 2, frame_mbs_only
    w.ue(0)                             // first_mb_in_slice
    w.ue(7)                             // slice_type: I (all slices I)
    w.ue(0)                             // pic_parameter_set_id
    w.u(0L, 4)                          // frame_num (IDR → 0)
    w.ue(idrPicId)                      // idr_pic_id
    // dec_ref_pic_marking, IdrPicFlag path (§7.3.3.3)
    w.u(0L, 1)                          // no_output_of_prior_pics_flag
    w.u(0L, 1)                          // long_term_reference_flag
    w.se(0L)                            // slice_qp_delta
    var mb = 0
    while (mb < nMbs) {
      w.ue(25)                          // mb_type: I_PCM (table 7-11)
      w.alignZero()                     // pcm_alignment_zero_bit
      w.raw(tileOut(y, widthMbs, mb, 16))
      w.raw(tileOut(cb, widthMbs, mb, 8))
      w.raw(tileOut(cr, widthMbs, mb, 8))
      mb += 1
    }
    val o = new ByteArrayOutputStream()
    o.write(0x65)                       // nal_ref_idc 3, nal_unit_type 5
    o.write(insertEp(w.trailing()))
    o.toByteArray
  }

  /** Decode an IDR I_PCM slice NAL against its SPS/PPS: EP removal,
    * bit-exact §7.3.3 slice-header walk in the parameter-set-dependent
    * field widths, then the §7.3.5.1 macroblock walk — mb_type must be
    * I_PCM (25), alignment bits must be zero, samples are byte-aligned
    * raw reads — ending at the rbsp stop bit. None on anything
    * malformed or outside the I_PCM profile (a coded macroblock means
    * transform machinery this engine honestly does not have). */
  def parseIdrPcmSlice(sps: H264Sps.SpsInfo, pps: PpsInfo,
                       nal: Array[Byte]): Option[PcmFrame] = {
    if (nal.length < 2 || (nal(0) & 0x1f) != 5) return None
    if (pps.entropyCabac || pps.numSliceGroups != 1) return None
    if (!sps.frameMbsOnly || sps.chromaArrayType != 1) return None
    val widthMbs = sps.widthMbs
    val heightMbs = sps.heightUnits
    val nMbs = widthMbs * heightMbs
    val r = new BitReader(removeEp(nal.drop(1)))
    if (r.ue() != 0) return None        // first_mb_in_slice: single slice
    val sliceType = r.ue()
    if (sliceType != 2 && sliceType != 7) return None // I slice only
    if (r.ue() != pps.ppsId) return None // pic_parameter_set_id
    r.u(sps.log2MaxFrameNum)            // frame_num
    val idrPicId = r.ue()               // IDR NAL → idr_pic_id present
    if (sps.pocType == 0) {
      r.u(sps.log2MaxPocLsb)            // pic_order_cnt_lsb
      // §7.3.3: the PPS bottom-field-POC flag adds an se(v) here —
      // skipping it would bit-shift every later field into garbage
      if (pps.bottomFieldPocPresent) r.se()
    }
    // pocType 1 slices carry delta_pic_order_cnt fields whose presence
    // depends on SPS bits this parser does not retain — reject, never
    // misparse (the module contract)
    if (sps.pocType == 1) return None
    if (pps.redundantPicCntPresent) r.ue()
    r.u(1); r.u(1)                      // dec_ref_pic_marking (IDR)
    r.se()                              // slice_qp_delta
    if (pps.deblockingControlPresent) {
      val idc = r.ue()                  // disable_deblocking_filter_idc
      if (idc != 1) { r.se(); r.se() }  // alpha/beta offsets
    }
    val y = new Array[Byte](nMbs * 256)
    val cb = new Array[Byte](nMbs * 64)
    val cr = new Array[Byte](nMbs * 64)
    var mb = 0
    while (mb < nMbs && !r.bad) {
      if (r.ue() != 25) return None     // I_PCM or out of scope
      r.alignZero()
      tileIn(r.raw(256), y, widthMbs, mb, 16)
      tileIn(r.raw(64), cb, widthMbs, mb, 8)
      tileIn(r.raw(64), cr, widthMbs, mb, 8)
      mb += 1
    }
    // rbsp_slice_trailing_bits: the stop bit must be next
    if (r.bad || r.u(1) != 1) None
    else Some(PcmFrame(widthMbs, heightMbs, idrPicId, y, cb, cr))
  }

  /** §6.4.1 inverse raster: lift macroblock `mb`'s t×t tile out of a
    * picture-raster plane (t = 16 luma, 8 chroma at 4:2:0). */
  private def tileOut(plane: Array[Byte], widthMbs: Int, mb: Int,
                      t: Int): Array[Byte] = {
    val w = widthMbs * t
    val x0 = (mb % widthMbs) * t
    val y0 = (mb / widthMbs) * t
    val out = new Array[Byte](t * t)
    var row = 0
    while (row < t) {
      System.arraycopy(plane, (y0 + row) * w + x0, out, row * t, t)
      row += 1
    }
    out
  }

  /** §6.4.1 raster placement: write macroblock `mb`'s t×t samples into
    * the picture-raster plane. */
  private def tileIn(samples: Array[Byte], plane: Array[Byte],
                     widthMbs: Int, mb: Int, t: Int): Unit = {
    if (samples.length != t * t) return // reader already flagged bad
    val w = widthMbs * t
    val x0 = (mb % widthMbs) * t
    val y0 = (mb / widthMbs) * t
    var row = 0
    while (row < t) {
      System.arraycopy(samples, row * t, plane, (y0 + row) * w + x0, t)
      row += 1
    }
  }
}
