package graft.enrich

import org.scalatest.funsuite.AnyFunSuite

class AdpcmCodecSpec extends AnyFunSuite {

  test("known vector: nibble quantization and state transitions") {
    // Hand-traced per IMA rec. §6 from (pred=0, index=0):
    //   targets  100 100  50 -200 -200 -200    0   0
    //   nibbles    7   7   1   15   15   10    6   0
    //   decoded   11  41  53   -3 -126 -214   -3  25
    val samples = Array[Short](0, 100, 100, 50, -200, -200, -200, 0, 0)
    val wav = AdpcmCodec.writeImaAdpcm(samples, 8000)
    val (rate, spb, dec) = AdpcmCodec.decode(wav)
    assert(rate == 8000 && spb == 65)
    assert(dec.toSeq == Seq[Short](0, 11, 41, 53, -3, -126, -214, -3, 25))
  }

  test("nibble packing is low-nibble-first within each byte") {
    val samples = Array[Short](0, 100, 100) // nibbles 7 then 7
    val wav = AdpcmCodec.writeImaAdpcm(samples, 8000)
    // chunks: 12 RIFF/WAVE + 8+20 fmt + 8+4 fact + 8 data hdr + 4 block hdr
    val blockBody = 12 + 28 + 12 + 8 + 4
    assert((wav(blockBody) & 0xff) == 0x77) // two 7-nibbles share one byte
  }

  test("block headers carry the first sample exactly; index resets") {
    // 70 samples: 65 in block 0, 5 in block 1 — block 1's header must
    // store samples(65) verbatim (int16 LE) with index byte 0
    val samples = Array.tabulate[Short](70)(i => ((i * 37) % 251 - 125).toShort)
    val wav = AdpcmCodec.writeImaAdpcm(samples, 8000)
    val (_, spb, dec) = AdpcmCodec.decode(wav)
    assert(spb == 65 && dec.length == 70)
    assert(dec(0) == samples(0) && dec(65) == samples(65))
    val dataBody = 12 + 28 + 12 + 8
    val h1 = dataBody + 36
    val p1 = ((wav(h1) & 0xff) | (wav(h1 + 1) << 8)).toShort
    assert(p1 == samples(65) && wav(h1 + 2) == 0)
  }

  test("slowly-varying signal reconstructs within the small-step bound") {
    // deltas ≤ 6 keep the quantizer in the fine-step regime: the
    // residual never overloads, so |err| stays ≤ a few LSBs of step 7
    val samples = Array.tabulate[Short](400)(i => (((i * 5) % 13) - 6).toShort)
    val wav = AdpcmCodec.writeImaAdpcm(samples, 8000)
    val (_, _, dec) = AdpcmCodec.decode(wav)
    assert(dec.length == samples.length)
    val maxErr = dec.zip(samples).map { case (d, s) => math.abs(d - s) }.max
    assert(maxErr <= 8, s"max reconstruction error $maxErr")
  }

  test("predictor tracks large swings without drift (bounded error after step-up)") {
    val rnd = new scala.util.Random(42)
    val samples = Array.tabulate[Short](1000)(_ => (rnd.nextInt(2000) - 1000).toShort)
    val wav = AdpcmCodec.writeImaAdpcm(samples, 16000)
    val (rate, _, dec) = AdpcmCodec.decode(wav)
    assert(rate == 16000 && dec.length == 1000)
    // closed-loop prediction: the mean error must stay well under the
    // signal amplitude (drift-free), even though per-sample error can
    // spike right after a step-size transition
    val meanErr = dec.zip(samples).map { case (d, s) => math.abs(d - s).toLong }.sum / 1000.0
    assert(meanErr < 200, s"mean |err| $meanErr — predictor drifting")
  }

  test("blocks decode independently: corrupting one block leaves others intact") {
    val samples = Array.tabulate[Short](195)(i => ((i * 91) % 401 - 200).toShort)
    val wav = AdpcmCodec.writeImaAdpcm(samples, 8000) // exactly 3 blocks
    val (_, _, clean) = AdpcmCodec.decode(wav)
    val dataBody = 12 + 28 + 12 + 8
    val mangled = wav.clone()
    var i = dataBody + 36 + 4 // block 1's nibble area
    while (i < dataBody + 72) { mangled(i) = 0x5a.toByte; i += 1 }
    val (_, _, dirty) = AdpcmCodec.decode(mangled)
    assert(dirty.slice(0, 65).toSeq == clean.slice(0, 65).toSeq)
    assert(dirty.slice(130, 195).toSeq == clean.slice(130, 195).toSeq)
    assert(dirty.slice(65, 130).toSeq != clean.slice(65, 130).toSeq)
  }

  test("parallel-seek splittability: a block range re-wrapped mid-stream decodes to the full decode's slice") {
    // the 100-TB claim in the scaladoc, executed: a reader that seeks
    // to block k's blockAlign boundary (no upstream state) and decodes
    // n blocks must reproduce exactly samples [k*spb, k*spb + n*spb)
    // of the whole-object decode
    val samples = Array.tabulate[Short](65 * 6)(i => ((i * 131) % 1201 - 600).toShort)
    val wav = AdpcmCodec.writeImaAdpcm(samples, 8000)
    val (_, spb, full) = AdpcmCodec.decode(wav)
    val dataBody = 12 + 28 + 12 + 8
    for (k <- Seq(1, 3, 4); n <- Seq(1, 2)) {
      val split = samples.slice(k * spb, (k + n) * spb).clone()
      val head = AdpcmCodec.writeImaAdpcm(new Array[Short](0), 8000)
        .slice(0, dataBody) // container prologue with zero-block data…
      // …rebuilt: splice the seeked blocks under a fresh fact/data pair
      val body = wav.slice(dataBody + k * 36, dataBody + (k + n) * 36)
      val bb = java.nio.ByteBuffer
        .allocate(dataBody + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(head)
      bb.putInt(dataBody - 12, split.length) // fact count for the range
      bb.putInt(dataBody - 4, body.length) // data size for the range
      bb.put(body)
      val (_, _, ranged) = AdpcmCodec.decode(bb.array())
      assert(ranged.toSeq == full.slice(k * spb, (k + n) * spb).toSeq,
        s"seek-decode at block $k x $n diverged from the full decode")
    }
  }

  test("fact-count trims zero-nibble padding in the final partial block") {
    val samples = Array.tabulate[Short](10)(i => (i * 100).toShort)
    val (_, _, dec) = AdpcmCodec.decode(AdpcmCodec.writeImaAdpcm(samples, 8000))
    assert(dec.length == 10)
  }

  test("malformed inputs are rejected, not misdecoded") {
    val pcm = WavCodec.writePcm16(Array[Short](1, 2, 3), 8000)
    assertThrows[IllegalArgumentException](AdpcmCodec.decode(pcm))
    assertThrows[IllegalArgumentException](AdpcmCodec.decode(Array[Byte](1, 2, 3)))
    val ok = AdpcmCodec.writeImaAdpcm(Array[Short](0, 100), 8000)
    // inconsistent samplesPerBlock vs blockAlign must fail the fmt law
    val bad = ok.clone()
    bad(12 + 8 + 18) = 99 // fmt body offset 18 = wSamplesPerBlock lo byte
    assertThrows[IllegalArgumentException](AdpcmCodec.decode(bad))
  }
}
