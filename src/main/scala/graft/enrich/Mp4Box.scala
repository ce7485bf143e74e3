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
  def write(timescale: Long, duration: Long, codecs: Seq[String],
            skipPayload: Array[Byte], mvhdVersion: Int = 0,
            avcSps: Option[Array[Byte]] = None): Array[Byte] = {
    require(mvhdVersion == 0 || mvhdVersion == 1, s"mvhd v$mvhdVersion")
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
            o.write(0)                     // numOfPPS
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
        } else box(cc, bytes { o =>
          o.write(new Array[Byte](6))      // reserved
          putU32(o, 0x00010000L)           // data_reference_index + pad
        })
      val stsd = box("stsd", bytes { o =>
        putU32(o, 0L)                      // version + flags
        putU32(o, 1L)                      // entry count
        o.write(entry)
      })
      box("trak", box("mdia", box("minf", box("stbl", stsd))))
    }
    val udta = box("udta", "graft".getBytes(US_ASCII))
    val moov = box("moov", bytes { o =>
      o.write(mvhd); traks.foreach(o.write); o.write(udta)
    })
    bytes { o => o.write(ftyp); o.write(skip); o.write(moov) }
  }

  /** Container metadata from a REAL box walk:
    * (majorBrand, timescale, duration, nTracks, codec fourccs in trak
    * order). None on anything malformed — truncated boxes, missing
    * ftyp/moov/mvhd, sizes past the buffer. */
  def probe(b: Array[Byte]): Option[(String, Long, Long, Int, Seq[String])] =
    walkAll(b).map { case (brand, ts, dur, n, codecs, _) =>
      (brand, ts, dur, n, codecs)
    }

  /** The SPS NAL carried by the first `avc1` sample entry's `avcC`
    * box, if present — the full-fidelity path a VisualSampleEntry
    * layout exercises: fixed 78-byte entry body, then a child-box scan
    * for `avcC`, then the 14496-15 config layout (version, profile,
    * lengthSize, SPS count + u16-length-prefixed NAL). None when the
    * container is malformed OR the entry carries no decoder config. */
  def probeAvcSps(b: Array[Byte]): Option[Array[Byte]] =
    walkAll(b).flatMap(_._6)

  private def walkAll(b: Array[Byte])
  : Option[(String, Long, Long, Int, Seq[String], Option[Array[Byte]])] = {
    var brand: String = null
    var timescale = -1L; var duration = -1L
    var nTracks = 0
    val codecs = scala.collection.mutable.ArrayBuffer.empty[String]
    var sps: Option[Array[Byte]] = None
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
                    if (cb + 8 + spsLen <= coff + csize)
                      sps = Some(java.util.Arrays.copyOfRange(
                        b, cb + 8, cb + 8 + spsLen))
                  }
                }
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
    else Some((brand, timescale, duration, nTracks, codecs.toSeq, sps))
  }
}
