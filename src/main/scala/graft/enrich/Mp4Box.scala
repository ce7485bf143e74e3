package graft.enrich

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

/** Pure-JVM ISO-BMFF (`.mp4`) CONTAINER codec — the honesty probe for
  * the reference's actual video store (the reference rewrites `.mp4`
  * S3 URLs into its search documents — lambda/s3Posts-to-ES-lambda/
  * s3-to-es_aws.py:83,116-122 — so its media lake is H.264-in-MP4).
  * Frame DECODE of H.264/AAC needs native codecs a bare JVM lacks (the
  * constraint documented at the `Multimodal` call sites, shared with
  * MP3/AAC audio); the CONTAINER, however, is a plain big-endian
  * length-prefixed box tree, and a box walk is pure JVM — exactly the
  * chunk walk `WavCodec`/`VideoFrames` do for RIFF, in the other byte
  * order. So the engine extracts first-class container metadata —
  * brand, movie timescale/duration, track count, per-track codec
  * fourccs — from real `.mp4` bytes even though frame decode stays out
  * of reach.
  *
  * The WRITER emits a minimal structurally-valid file: `ftyp` →
  * `skip` (opaque payload the walker must step over by size) → `moov`
  * ( `mvhd` version 0 OR 1 — both header layouts real — followed by
  * one `trak`(`mdia`(`minf`(`stbl`(`stsd`(sample entry))))) per track
  * and a trailing non-container `udta`). The PARSER is a REAL
  * recursive walk: (u32 size, fourcc) at every level, recursion only
  * into the container types, version-aware mvhd field offsets, stsd
  * entry-count + entry fourccs, sizes clamped and validated; malformed
  * input returns None rather than throwing (the qm3/P12 corrupt-skip
  * convention). */
object Mp4Box {

  /** Box types the walker recurses INTO (pure containers whose payload
    * is a box list). `stsd` is special-cased: 8 bytes of fullbox
    * header + entry count precede its child sample entries. */
  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl")

  /** A track's sample-table triple (ISO 14496-12 §8.6.1/§8.7.3/§8.6.2):
    * `sttsRuns` = run-length (sample_count, sample_delta) decoding
    * times, `sizes` = per-sample byte sizes (stsz with sample_size 0),
    * `syncs` = 1-based keyframe sample numbers (stss); `syncs = None`
    * omits the box, which per §8.6.2.1 declares EVERY sample sync. The
    * writer requires the §8.6.1.2 consistency rule — stts sample counts
    * must total the stsz sample count — and the parser re-checks it. */
  final case class SampleTable(sttsRuns: Seq[(Long, Long)],
                               sizes: Seq[Long],
                               syncs: Option[Seq[Long]],
                               stscRuns: Seq[(Long, Long)] = Nil,
                               chunkOffsets: Seq[Long] = Nil) {
    require(sttsRuns.map(_._1).sum == sizes.length.toLong,
      "stts total != stsz count")
    require(syncs.forall(_.forall(s => s >= 1 && s <= sizes.length)),
      "stss sample number out of range")
    require(stscRuns.isEmpty == chunkOffsets.isEmpty,
      "stsc and stco come together")
    require(stscRuns.map(_._1) == stscRuns.map(_._1).sorted.distinct,
      "stsc first_chunk strictly increasing")
  }

  /** ISO 14496-3 §1.6.3 sampling-frequency-index table (indices 13/14
    * reserved, 15 = explicit 24-bit escape the minimal writer never
    * emits and the parser rejects). */
  private[graft] val AacSampleRates: Array[Int] = Array(
    96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350)

  /** An `mp4a` AudioSampleEntry's decoder configuration — the audio
    * twin of the `avcC`-carried SPS (qm9): audioObjectType (5 bits;
    * 1 = Main, 2 = LC), samplingFrequencyIndex (4 bits into
    * [[AacSampleRates]]), channelConfiguration (4 bits), and the
    * DecoderConfigDescriptor's avgBitrate. `paddedLengths` selects the
    * 4-byte 0x80-continued expandable-length form some real muxers emit
    * for every descriptor, so the parser's base-128 walk is exercised
    * against both layouts. */
  final case class AacConfig(audioObjectType: Int, freqIndex: Int,
                             channelConfig: Int, avgBitrate: Long,
                             paddedLengths: Boolean = false) {
    require(audioObjectType >= 1 && audioObjectType <= 30,
      s"audioObjectType $audioObjectType (escape form unsupported)")
    require(freqIndex >= 0 && freqIndex <= 12, s"freqIndex $freqIndex")
    // the 16.16 fixed-point samplerate field caps the writable rate
    require(AacSampleRates(freqIndex) <= 0xffff,
      s"rate ${AacSampleRates(freqIndex)} overflows the 16.16 field")
    require(channelConfig >= 1 && channelConfig <= 7,
      s"channelConfig $channelConfig")
    require(avgBitrate >= 0 && avgBitrate <= 0xffffffffL,
      s"avgBitrate $avgBitrate")
  }

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, US_ASCII)

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def u64(b: Array[Byte], off: Int): Long =
    (u32(b, off) << 32) | u32(b, off + 4)

  private def putU32(o: ByteArrayOutputStream, v: Long): Unit = {
    o.write(((v >>> 24) & 0xff).toInt); o.write(((v >>> 16) & 0xff).toInt)
    o.write(((v >>> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
  }

  private def putU64(o: ByteArrayOutputStream, v: Long): Unit = {
    putU32(o, v >>> 32); putU32(o, v & 0xffffffffL)
  }

  private def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    putU32(o, 8L + payload.length)
    o.write(tpe.getBytes(US_ASCII))
    o.write(payload)
    o.toByteArray
  }

  private def bytes(f: ByteArrayOutputStream => Unit): Array[Byte] = {
    val o = new ByteArrayOutputStream(); f(o); o.toByteArray
  }

  /** Minimal structurally-valid `.mp4`: brand `isom`, one opaque `skip`
    * box (arbitrary payload), `moov` with an mvhd of the requested
    * version, one stsd sample-entry chain per codec fourcc, and a
    * trailing opaque `udta`. Every size is computed, so a parser that
    * mis-walks any level lands off a box boundary. */
  /** One ISO 14496-1 §8.3.3 descriptor: tag byte, expandable length
    * (single-byte, or the 4-byte 0x80-continued form when `padded`),
    * payload. */
  private[enrich] def descriptor(tag: Int, payload: Array[Byte],
                                 padded: Boolean): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(tag)
    if (padded) {
      // 4 × 7 usable bits — the same fail-loudly bound the single-byte
      // form gets below; without it a ≥2^28 payload would silently
      // truncate its expandable length and desync every following box
      require(payload.length < (1 << 28), "4-byte expandable descriptor length")
      o.write(0x80 | ((payload.length >>> 21) & 0x7f))
      o.write(0x80 | ((payload.length >>> 14) & 0x7f))
      o.write(0x80 | ((payload.length >>> 7) & 0x7f))
    } else require(payload.length < 128, "single-byte descriptor length")
    o.write(payload.length & 0x7f)
    o.write(payload)
    o.toByteArray
  }

  /** File offset of the first `mdat` payload byte when a media payload
    * is written: ftyp (24 bytes) + the mdat header (8). The mdat rides
    * directly after ftyp — the classic non-faststart muxer layout —
    * precisely so stco chunk offsets are knowable before moov is
    * sized (moov depends on stco; mdat-first breaks the cycle). */
  val MdatPayloadOffset: Long = 32L

  def write(timescale: Long, duration: Long, codecs: Seq[String],
            skipPayload: Array[Byte], mvhdVersion: Int = 0,
            avcSps: Option[Array[Byte]] = None,
            sampleTable: Option[SampleTable] = None,
            aacConfig: Option[AacConfig] = None,
            avcPps: Option[Array[Byte]] = None,
            mdatPayload: Option[Array[Byte]] = None): Array[Byte] = {
    require(mvhdVersion == 0 || mvhdVersion == 1, s"mvhd v$mvhdVersion")
    // mvhd v0 carries duration in 32 bits; silently truncating would desync
    // the written container from any closed-form mirror of its fields
    require(mvhdVersion == 1 || duration <= 0xffffffffL,
      s"mvhd v0 cannot hold duration $duration (use mvhdVersion = 1)")
    require(codecs.forall(_.length == 4), "codec fourccs must be 4 bytes")
    val ftyp = box("ftyp", bytes { o =>
      o.write("isom".getBytes(US_ASCII)) // major brand
      putU32(o, 512)                     // minor version
      o.write("isomiso2".getBytes(US_ASCII)) // compatible brands
    })
    val skip = box("skip", skipPayload)
    val mvhd = box("mvhd", bytes { o =>
      o.write(mvhdVersion); o.write(0); o.write(0); o.write(0) // ver+flags
      if (mvhdVersion == 1) {
        putU64(o, 0L); putU64(o, 0L)       // creation/modification
        putU32(o, timescale); putU64(o, duration)
      } else {
        putU32(o, 0L); putU32(o, 0L)
        putU32(o, timescale); putU32(o, duration)
      }
      putU32(o, 0x00010000L)               // rate 1.0
      putU32(o, 0x01000000L)               // volume 1.0 + reserved
    })
    val traks = codecs.map { cc =>
      val entry =
        if (cc == "avc1" && avcSps.isDefined) {
          // full ISO 14496-12 §12.1.3 VisualSampleEntry (78-byte body)
          // with an ISO 14496-15 §5.3.3 avcC child carrying the SPS —
          // the layout real muxers emit, so the prober's fixed 78-byte
          // step to the extension boxes is exercised against the spec
          val sps = avcSps.get
          val avcC = box("avcC", bytes { o =>
            o.write(1)                     // configurationVersion
            o.write(sps(1) & 0xff)         // AVCProfileIndication
            o.write(0)                     // profile_compatibility
            o.write(sps(3) & 0xff)         // AVCLevelIndication
            o.write(0xff)                  // reserved | lengthSizeMinusOne
            o.write(0xe1)                  // reserved | numOfSPS = 1
            o.write((sps.length >>> 8) & 0xff); o.write(sps.length & 0xff)
            o.write(sps)
            avcPps match {
              case Some(pps) =>
                o.write(1)                 // numOfPPS
                o.write((pps.length >>> 8) & 0xff)
                o.write(pps.length & 0xff)
                o.write(pps)
              case None => o.write(0)      // numOfPPS
            }
          })
          box(cc, bytes { o =>
            o.write(new Array[Byte](6))    // reserved
            o.write(0); o.write(1)         // data_reference_index
            o.write(new Array[Byte](16))   // pre_defined/reserved
            o.write(0); o.write(0)         // width (0: SPS governs)
            o.write(0); o.write(0)         // height
            putU32(o, 0x00480000L)         // 72 dpi horiz
            putU32(o, 0x00480000L)         // 72 dpi vert
            putU32(o, 0L)                  // reserved
            o.write(0); o.write(1)         // frame_count
            o.write(new Array[Byte](32))   // compressorname
            o.write(0); o.write(0x18)      // depth 24
            o.write(0xff); o.write(0xff)   // pre_defined −1
            o.write(avcC)
          })
        } else if (cc == "mp4a" && aacConfig.isDefined) {
          // full ISO 14496-12 §12.2.3 AudioSampleEntry (28-byte body)
          // with an ISO 14496-14 §5.6 esds child carrying the
          // ES_Descriptor → DecoderConfigDescriptor →
          // DecoderSpecificInfo(AudioSpecificConfig) chain — the layout
          // real AAC muxers emit (the reference's media store is
          // H.264+AAC in MP4)
          val cfg = aacConfig.get
          val asc = Array[Byte](
            ((cfg.audioObjectType << 3) | (cfg.freqIndex >>> 1)).toByte,
            (((cfg.freqIndex & 1) << 7) | (cfg.channelConfig << 3)).toByte)
          val dsi = descriptor(0x05, asc, cfg.paddedLengths)
          val dcd = descriptor(0x04, bytes { o =>
            o.write(0x40)                  // objectTypeIndication: MPEG-4 Audio
            o.write(0x15)                  // streamType 5 (audio) <<2 | reserved
            o.write(0); o.write(0x18); o.write(0) // bufferSizeDB 6144
            putU32(o, cfg.avgBitrate)      // maxBitrate
            putU32(o, cfg.avgBitrate)
            o.write(dsi)
          }, cfg.paddedLengths)
          val sl = descriptor(0x06, Array[Byte](0x02), cfg.paddedLengths)
          val es = descriptor(0x03, bytes { o =>
            o.write(0); o.write(1)         // ES_ID
            o.write(0)                     // no dependence/URL/OCR, priority 0
            o.write(dcd); o.write(sl)
          }, cfg.paddedLengths)
          val esds = box("esds", bytes { o => putU32(o, 0L); o.write(es) })
          box(cc, bytes { o =>
            o.write(new Array[Byte](6))    // reserved
            o.write(0); o.write(1)         // data_reference_index
            o.write(new Array[Byte](8))    // reserved
            o.write(0); o.write(cfg.channelConfig) // channelcount
            o.write(0); o.write(16)        // samplesize
            o.write(new Array[Byte](4))    // pre_defined + reserved
            putU32(o, AacSampleRates(cfg.freqIndex).toLong << 16) // 16.16
            o.write(esds)
          })
        } else box(cc, bytes { o =>
          o.write(new Array[Byte](6))      // reserved
          putU32(o, 0x00010000L)           // data_reference_index + pad
        })
      val stsd = box("stsd", bytes { o =>
        putU32(o, 0L)                      // version + flags
        putU32(o, 1L)                      // entry count
        o.write(entry)
      })
      // the sample table rides the FIRST (video) track's stbl
      val tables = sampleTable match {
        case Some(st) if cc == codecs.head =>
          val stts = box("stts", bytes { o =>
            putU32(o, 0L)
            putU32(o, st.sttsRuns.length)
            st.sttsRuns.foreach { case (c, d) => putU32(o, c); putU32(o, d) }
          })
          val stsz = box("stsz", bytes { o =>
            putU32(o, 0L)
            putU32(o, 0L)                  // sample_size 0: per-sample table
            putU32(o, st.sizes.length)
            st.sizes.foreach(putU32(o, _))
          })
          val stss = st.syncs.map(sy => box("stss", bytes { o =>
            putU32(o, 0L)
            putU32(o, sy.length)
            sy.foreach(putU32(o, _))
          }))
          val chunked =
            if (st.stscRuns.isEmpty) Array.emptyByteArray
            else {
              val stsc = box("stsc", bytes { o =>
                putU32(o, 0L)
                putU32(o, st.stscRuns.length)
                st.stscRuns.foreach { case (fc, spc) =>
                  putU32(o, fc); putU32(o, spc)
                  putU32(o, 1L)            // sample_description_index
                }
              })
              val stco = box("stco", bytes { o =>
                putU32(o, 0L)
                putU32(o, st.chunkOffsets.length)
                st.chunkOffsets.foreach(putU32(o, _))
              })
              bytes { o => o.write(stsc); o.write(stco) }
            }
          bytes { o =>
            o.write(stts); o.write(stsz); stss.foreach(o.write)
            o.write(chunked)
          }
        case _ => Array.emptyByteArray
      }
      box("trak", box("mdia", box("minf",
        box("stbl", bytes { o => o.write(stsd); o.write(tables) }))))
    }
    val udta = box("udta", "graft".getBytes(US_ASCII))
    val moov = box("moov", bytes { o =>
      o.write(mvhd); traks.foreach(o.write); o.write(udta)
    })
    bytes { o =>
      o.write(ftyp)
      // media payload first (§8.1.1 mdat): offsets known before moov
      mdatPayload.foreach(p => o.write(box("mdat", p)))
      o.write(skip); o.write(moov)
    }
  }

  /** Container metadata from a REAL box walk:
    * (majorBrand, timescale, duration, nTracks, codec fourccs in trak
    * order). None on anything malformed — truncated boxes, missing
    * ftyp/moov/mvhd, sizes past the buffer. */
  def probe(b: Array[Byte]): Option[(String, Long, Long, Int, Seq[String])] =
    walkAll(b).map { m => (m.brand, m.timescale, m.duration, m.nTracks,
      m.codecs) }

  /** The SPS NAL carried by the first `avc1` sample entry's `avcC`
    * box, if present — the full-fidelity path a VisualSampleEntry
    * layout exercises: fixed 78-byte entry body, then a child-box scan
    * for `avcC`, then the 14496-15 config layout (version, profile,
    * lengthSize, SPS count + u16-length-prefixed NAL). None when the
    * container is malformed OR the entry carries no decoder config. */
  def probeAvcSps(b: Array[Byte]): Option[Array[Byte]] =
    walkAll(b).flatMap(_.sps)

  /** The first PPS NAL in the same `avcC` config (the 14496-15 §5.3.3
    * PPS array follows the SPS array), if present — a slice decode
    * needs both parameter sets. */
  def probeAvcPps(b: Array[Byte]): Option[Array[Byte]] =
    walkAll(b).flatMap(_.pps)

  /** The AAC decoder configuration carried by the first `mp4a` sample
    * entry's `esds` box, if present: (objectTypeIndication,
    * audioObjectType, samplingFrequencyIndex, sampleRateHz,
    * channelConfiguration, avgBitrate) — the audio twin of
    * [[probeAvcSps]]. Parsed through the REAL ISO 14496-1 descriptor
    * walk: expandable base-128 lengths (single-byte and padded forms),
    * the ES_Descriptor's dependence/URL/OCR flag skips, the
    * DecoderConfigDescriptor fixed fields, then the AudioSpecificConfig
    * bit unpack (5-bit AOT, 4-bit freq index, 4-bit channel config).
    * None when malformed, when the stream is not audio, or on the
    * escape forms the minimal profile excludes (AOT 31, freq index
    * 13..15). */
  def probeAacConfig(b: Array[Byte])
      : Option[(Int, Int, Int, Int, Int, Long)] =
    walkAll(b).flatMap(_.aac)

  /** Per-track sample statistics from a REAL stts/stsz/stss walk
    * (§8.6.1/§8.7.3/§8.6.2): (nSamples, durationUnits = Σ count×delta
    * over the stts runs, nKeyframes, totalSampleBytes, maxSampleBytes).
    * The §8.6.1.2 consistency rule — stts counts must total the stsz
    * count — is re-checked; a violation (or any malformed table) → None
    * even when the container otherwise parses. */
  def probeSampleStats(b: Array[Byte]): Option[(Long, Long, Long, Long, Long)] =
    walkAll(b).flatMap(_.samples)

  /** One keyframe's seek plan: (sampleNumber, fileOffset, byteLength).
    * fileOffset is the §8.7.5 chunk offset plus the sizes of the
    * sample's predecessors WITHIN its chunk (§8.7.4) — the byte-range
    * GET a thumbnailing job issues. */
  type SeekEntry = (Long, Long, Long)

  /** Keyframe byte ranges from the REAL chunk-mapping walk: expand the
    * stsc run-length (first_chunk, samples_per_chunk) table, assign
    * samples to chunks greedily in order (the demuxer algorithm — the
    * last chunk may be partial), then for each stss keyframe return
    * chunk offset + intra-chunk predecessor sizes. None when the
    * container lacks chunk tables, declares fewer chunk slots than
    * samples, or is otherwise malformed. */
  def probeKeyframeRanges(b: Array[Byte]): Option[Seq[SeekEntry]] =
    walkAll(b).flatMap(_.seekPlan)

  private final case class WalkMeta(brand: String, timescale: Long,
    duration: Long, nTracks: Int, codecs: Seq[String],
    sps: Option[Array[Byte]], samples: Option[(Long, Long, Long, Long, Long)],
    seekPlan: Option[Seq[SeekEntry]],
    aac: Option[(Int, Int, Int, Int, Int, Long)],
    pps: Option[Array[Byte]])

  /** One ISO 14496-1 §8.3.3 descriptor header at `off`: (tag, bodyOff,
    * bodyLen). The expandable length is base-128, high bit = continue,
    * at most 4 bytes; None on truncation or a body past `limit`. */
  private def readDescriptor(b: Array[Byte], off: Int,
                             limit: Int): Option[(Int, Int, Int)] = {
    if (off + 2 > limit) return None
    val tag = b(off) & 0xff
    var p = off + 1
    var len = 0
    var i = 0
    var cont = true
    while (cont && i < 4 && p < limit) {
      val v = b(p) & 0xff
      len = (len << 7) | (v & 0x7f)
      cont = (v & 0x80) != 0
      p += 1; i += 1
    }
    if (cont || p + len > limit) None else Some((tag, p, len))
  }

  /** The esds descriptor chain (body starts at `cb`, box ends at
    * `end`): ES_Descriptor(3) → DecoderConfigDescriptor(4) →
    * DecoderSpecificInfo(5)=AudioSpecificConfig. */
  private def parseEsds(b: Array[Byte], cb: Int,
                        end: Int): Option[(Int, Int, Int, Int, Int, Long)] = {
    if (cb + 4 > end || u32(b, cb) != 0L) return None // fullbox ver+flags
    for {
      (esTag, esOff, esLen) <- readDescriptor(b, cb + 4, end)
      if esTag == 0x03 && esLen >= 3
      esEnd = esOff + esLen
      flags = b(esOff + 2) & 0xff
      // §7.2.6.5: optional dependsOn_ES_ID (u16), URL (len-prefixed),
      // OCR_ES_Id (u16) precede the embedded descriptors
      afterFlags = {
        var q = esOff + 3
        if ((flags & 0x80) != 0) q += 2
        if ((flags & 0x40) != 0 && q < esEnd) q += 1 + (b(q) & 0xff)
        if ((flags & 0x20) != 0) q += 2
        q
      }
      if afterFlags <= esEnd
      (dcTag, dcOff, dcLen) <- readDescriptor(b, afterFlags, esEnd)
      if dcTag == 0x04 && dcLen >= 13
      // streamType (6 bits) must be 5 = AudioStream
      if ((b(dcOff + 1) & 0xff) >>> 2) == 0x05
      (dsTag, dsOff, dsLen) <- readDescriptor(b, dcOff + 13, dcOff + dcLen)
      if dsTag == 0x05 && dsLen >= 2
      asc0 = b(dsOff) & 0xff
      asc1 = b(dsOff + 1) & 0xff
      aot = asc0 >>> 3
      if aot != 31 // escape form: 6 more bits, out of the minimal profile
      freqIdx = ((asc0 & 0x7) << 1) | (asc1 >>> 7)
      if freqIdx < AacSampleRates.length // 13/14 reserved, 15 explicit
      chan = (asc1 >>> 3) & 0xf
    } yield ((b(dcOff) & 0xff), aot, freqIdx, AacSampleRates(freqIdx),
      chan, u32(b, dcOff + 9))
  }

  private def walkAll(b: Array[Byte]): Option[WalkMeta] = {
    var brand: String = null
    var timescale = -1L; var duration = -1L
    var nTracks = 0
    val codecs = scala.collection.mutable.ArrayBuffer.empty[String]
    var sps: Option[Array[Byte]] = None
    var pps: Option[Array[Byte]] = None
    var aac: Option[(Int, Int, Int, Int, Int, Long)] = None
    // sample-table accumulators (first table wins; −1 = absent)
    var sttsTotal = -1L; var sttsDur = 0L
    var szCount = -1L; var szTot = 0L; var szMax = 0L
    var nKey = -1L
    var sizes: Array[Long] = null
    var syncNums: Array[Long] = null
    var stscRuns: Array[(Long, Long)] = null
    var chunkOffs: Array[Long] = null
    var bad = false
    def walk(from: Int, to: Int, inStsd: Boolean): Unit = {
      var off = from
      while (off < to && !bad) {
        if (off + 8 > to) { bad = true; return }
        val size = u32(b, off)
        val tpe = fourcc(b, off + 4)
        if (size < 8 || off + size > to) { bad = true; return }
        val body = off + 8
        val end = off + size.toInt
        tpe match {
          case "ftyp" =>
            if (size < 12) { bad = true; return }
            brand = fourcc(b, body)
          case "mvhd" =>
            val ver = b(body) & 0xff
            if (ver == 1) {
              if (size < 8 + 4 + 16 + 4 + 8) { bad = true; return }
              timescale = u32(b, body + 20); duration = u64(b, body + 24)
            } else {
              if (size < 8 + 4 + 8 + 4 + 4) { bad = true; return }
              timescale = u32(b, body + 12); duration = u32(b, body + 16)
            }
          case "trak" =>
            nTracks += 1
            walk(body, end, inStsd = false)
          case "stsd" =>
            if (size < 16) { bad = true; return }
            walk(body + 8, end, inStsd = true) // skip fullbox hdr + count
          case "stts" if sttsTotal < 0 =>
            if (size < 16) { bad = true; return }
            val n = u32(b, body + 4)
            if (size < 16 + n * 8) { bad = true; return }
            sttsTotal = 0L
            var i = 0L
            while (i < n) {
              val c = u32(b, (body + 8 + i * 8).toInt)
              val d = u32(b, (body + 12 + i * 8).toInt)
              sttsTotal += c; sttsDur += c * d
              i += 1
            }
          case "stsz" if szCount < 0 =>
            if (size < 20) { bad = true; return }
            if (u32(b, body + 4) != 0) { bad = true; return } // constant-size unsupported
            val n = u32(b, body + 8)
            if (size < 20 + n * 4) { bad = true; return }
            szCount = n; szTot = 0L; szMax = 0L
            sizes = new Array[Long](n.toInt)
            var i = 0L
            while (i < n) {
              val s = u32(b, (body + 12 + i * 4).toInt)
              szTot += s; if (s > szMax) szMax = s
              sizes(i.toInt) = s
              i += 1
            }
          case "stss" if nKey < 0 =>
            if (size < 16) { bad = true; return }
            val n = u32(b, body + 4)
            if (size < 16 + n * 4) { bad = true; return }
            nKey = n
            syncNums = Array.tabulate(n.toInt)(i => u32(b, body + 8 + i * 4))
          case "stsc" if stscRuns == null =>
            if (size < 16) { bad = true; return }
            val n = u32(b, body + 4)
            if (size < 16 + n * 12) { bad = true; return }
            stscRuns = Array.tabulate(n.toInt)(i =>
              (u32(b, body + 8 + i * 12), u32(b, body + 12 + i * 12)))
          case "stco" if chunkOffs == null =>
            if (size < 16) { bad = true; return }
            val n = u32(b, body + 4)
            if (size < 16 + n * 4) { bad = true; return }
            chunkOffs = Array.tabulate(n.toInt)(i => u32(b, body + 8 + i * 4))
          case t if Containers.contains(t) =>
            walk(body, end, inStsd = false)
          case _ if inStsd =>
            codecs += tpe // direct child of stsd = a sample entry
            // a VisualSampleEntry-sized avc1 may carry extension boxes
            // past its fixed 78-byte body; scan them for the avcC
            if (tpe == "avc1" && sps.isEmpty && size >= 8 + 78 + 8) {
              var coff = body + 78
              while (coff + 8 <= end && sps.isEmpty) {
                val csize = u32(b, coff)
                if (csize < 8 || coff + csize > end) { bad = true; return }
                if (fourcc(b, coff + 4) == "avcC") {
                  val cb = coff + 8
                  // version, profile, compat, level, lenSize, count
                  if (csize >= 8 + 6 + 2 &&
                      (b(cb) & 0xff) == 1 && (b(cb + 5) & 0x1f) >= 1) {
                    val spsLen = ((b(cb + 6) & 0xff) << 8) | (b(cb + 7) & 0xff)
                    if (cb + 8 + spsLen <= coff + csize) {
                      sps = Some(java.util.Arrays.copyOfRange(
                        b, cb + 8, cb + 8 + spsLen))
                      // 14496-15 §5.3.3: PPS array follows the SPS array
                      val pOff = cb + 8 + spsLen
                      if (pOff + 1 <= coff + csize &&
                          (b(pOff) & 0xff) >= 1 && pOff + 3 <= coff + csize) {
                        val ppsLen =
                          ((b(pOff + 1) & 0xff) << 8) | (b(pOff + 2) & 0xff)
                        if (pOff + 3 + ppsLen <= coff + csize)
                          pps = Some(java.util.Arrays.copyOfRange(
                            b, pOff + 3, pOff + 3 + ppsLen))
                      }
                    }
                  }
                }
                coff += csize.toInt
              }
            }
            // an AudioSampleEntry-sized mp4a may carry an esds past its
            // fixed 28-byte body; scan its children like avc1's avcC
            if (tpe == "mp4a" && aac.isEmpty && size >= 8 + 28 + 8) {
              var coff = body + 28
              while (coff + 8 <= end && aac.isEmpty) {
                val csize = u32(b, coff)
                if (csize < 8 || coff + csize > end) { bad = true; return }
                if (fourcc(b, coff + 4) == "esds")
                  aac = parseEsds(b, coff + 8, coff + csize.toInt)
                coff += csize.toInt
              }
            }
          case _ => // opaque box (skip/udta/mdat/...) — step over
        }
        off = end
      }
    }
    if (b.length < 8) return None
    walk(0, b.length, inStsd = false)
    if (bad || brand == null || timescale < 0 || duration < 0) None
    else {
      // §8.6.1.2 consistency: stts run totals must equal the stsz
      // count; a missing stss means EVERY sample is sync (§8.6.2.1),
      // not a malformed file
      val samples =
        if (sttsTotal < 0 && szCount < 0 && nKey < 0) None
        else if (sttsTotal < 0 || szCount < 0 || sttsTotal != szCount)
          return None
        else Some((szCount, sttsDur, if (nKey < 0) szCount else nKey,
          szTot, szMax))
      // §8.7.4/§8.7.5 chunk mapping: expand the stsc runs over the stco
      // chunk count, assign samples to chunks greedily in order, then
      // plan each keyframe's byte range. Present-but-inconsistent chunk
      // tables reject the container, like the stts/stsz rule.
      val seekPlan: Option[Seq[SeekEntry]] =
        if (stscRuns == null || chunkOffs == null || sizes == null) None
        else {
          val nc = chunkOffs.length
          if (stscRuns.isEmpty || stscRuns.head._1 != 1L ||
              stscRuns.exists(_._2 < 1) || stscRuns.last._1 > nc)
            return None
          // the run applies until the next run's first_chunk (§8.7.4)
          val capacity = new Array[Long](nc)
          var r = 0
          var c = 1
          while (c <= nc) {
            while (r + 1 < stscRuns.length && stscRuns(r + 1)._1 <= c) r += 1
            capacity(c - 1) = stscRuns(r)._2
            c += 1
          }
          val keys =
            if (syncNums != null) syncNums.toSet
            else sizes.indices.map(i => (i + 1).toLong).toSet
          val out = Seq.newBuilder[SeekEntry]
          var s = 1
          var chunk = 0
          while (s <= sizes.length) {
            if (chunk >= nc) return None // fewer chunk slots than samples
            var intra = 0L
            var taken = 0L
            while (taken < capacity(chunk) && s <= sizes.length) {
              if (keys.contains(s.toLong))
                out += ((s.toLong, chunkOffs(chunk) + intra, sizes(s - 1)))
              intra += sizes(s - 1)
              taken += 1; s += 1
            }
            chunk += 1
          }
          Some(out.result())
        }
      Some(WalkMeta(brand, timescale, duration, nTracks, codecs.toSeq, sps,
        samples, seekPlan, aac, pps))
    }
  }
}
