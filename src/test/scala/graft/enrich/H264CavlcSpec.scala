package graft.enrich

import org.scalatest.funsuite.AnyFunSuite

import H264Sps.{BitReader, BitWriter}

class H264CavlcSpec extends AnyFunSuite {

  private def prefixFree(codes: Seq[String]): Unit = {
    for (a <- codes; b <- codes if a != b)
      assert(!b.startsWith(a), s"$a prefixes $b")
  }
  private def kraft(codes: Seq[String]): Double =
    codes.map(c => math.pow(2.0, -c.length)).sum

  test("coeff_token nC<2 table is prefix-free with the spec Kraft sum") {
    val codes = H264Cavlc.CoeffTokenNc0.flatten.toSeq
    assert(codes.length == 62) // 17 totalCoeff rows × min(3,tc)+1 entries
    assert(codes.distinct.length == 62)
    prefixFree(codes)
    // the standard leaves exactly one 15-bit slot unused in this table
    assert(math.abs(kraft(codes) - (1.0 - math.pow(2.0, -15))) < 1e-12)
  }

  test("total_zeros tables are prefix-free, complete except the tc=1 row") {
    H264Cavlc.TotalZeros16.zipWithIndex.foreach { case (row, i) =>
      val tc = i + 1
      assert(row.length == 17 - tc, s"tc=$tc row arity")
      prefixFree(row.toSeq)
      val expected = if (tc == 1) 1.0 - math.pow(2.0, -9) else 1.0
      assert(math.abs(kraft(row.toSeq) - expected) < 1e-12, s"tc=$tc kraft")
    }
  }

  test("run_before tables are prefix-free; zl>6 carries the unary tail") {
    H264Cavlc.RunBefore.zipWithIndex.foreach { case (row, i) =>
      prefixFree(row.toSeq)
      val expected =
        if (i == 6) 1.0 - math.pow(2.0, -11) // open-ended unary, cut at 14
        else 1.0
      assert(math.abs(kraft(row.toSeq) - expected) < 1e-12, s"zl=${i + 1}")
    }
    // runs ≥ 7 in the zl>6 context: (run−4) zeros then the stop bit
    (7 to 14).foreach { run =>
      assert(H264Cavlc.RunBefore(6)(run) == "0" * (run - 4) + "1")
    }
  }

  test("known vector: the published worked example encodes bit-exactly") {
    // The classic CAVLC example block (zigzag order): 0,3,0,1,−1,−1,0,1 →
    // TotalCoeff 5, T1s 3, total_zeros 3 →
    // coeff_token 0000100 | signs 011 | +1 → 1 | +3 → 0010 |
    // total_zeros 111 | runs 10 1 1 01 = 000010001110010111101101
    val coeffs = Array(0, 3, 0, 1, -1, -1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0)
    val w = new BitWriter
    H264Cavlc.writeResidual(coeffs, 0, w)
    val bytes = w.trailing() // appends the rbsp stop bit + zero pad
    // 24 code bits + stop bit + 7 pad bits
    assert(bytes.length == 4)
    assert((bytes(0) & 0xff) == Integer.parseInt("00001000", 2))
    assert((bytes(1) & 0xff) == Integer.parseInt("11100101", 2))
    assert((bytes(2) & 0xff) == Integer.parseInt("11101101", 2))
    assert((bytes(3) & 0xff) == Integer.parseInt("10000000", 2))
  }

  private def roundTrip(coeffs: Array[Int], nC: Int = 0): Unit = {
    val w = new BitWriter
    H264Cavlc.writeResidual(coeffs, nC, w)
    w.u(1L, 1) // sentinel so the reader can't drift past the block
    val r = new BitReader(w.trailing())
    val back = H264Cavlc.readResidual(nC, coeffs.length, r)
    assert(back.isDefined, s"decode failed for ${coeffs.mkString(",")}")
    assert(back.get.toSeq == coeffs.toSeq)
    assert(r.u(1) == 1 && !r.bad, "reader misaligned after the block")
  }

  test("round trip: structured corner blocks") {
    roundTrip(Array.fill(16)(0)) // tc=0
    roundTrip(Array.tabulate(16)(i => if (i == 15) -1 else 0)) // max zeros
    roundTrip(Array.tabulate(16)(i => i - 8)) // tc=15, no total_zeros...
    roundTrip(Array.tabulate(16)(i => if (i == 0) 5 else 0)) // DC only
    roundTrip(Array(1, -1, 1, -1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1)) // T1 cap
    roundTrip(Array.fill(16)(1)) // tc=16: total_zeros must be skipped
    roundTrip(Array.fill(16)(-1))
  }

  test("round trip: adaptive suffixLength escalation and escapes") {
    roundTrip(Array(900, -300, 80, -20, 6, -2, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    roundTrip(Array(0, 0, 2000, 0, 0, -1500, 0, 0, 0, 7, 0, 0, 0, 0, 1, 0))
    roundTrip(Array.tabulate(16)(i => (i + 1) * 100 * (if (i % 2 == 0) 1 else -1)))
    // the suffixLength-0 prefix-14 window (levelCode 14..29 → |level| 8..15)
    roundTrip(Array(9, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    roundTrip(Array(-15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    // the suffixLength-0 prefix-15 escape (levelCode ≥ 30 → |level| ≥ 16)
    roundTrip(Array(16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    roundTrip(Array(-2000, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
  }

  test("round trip: randomized blocks across density regimes") {
    val rnd = new scala.util.Random(4711)
    for (trial <- 0 until 2000) {
      val density = 1 + trial % 15
      val amp = Seq(1, 3, 12, 400)(trial % 4)
      val coeffs = Array.tabulate(16) { _ =>
        if (rnd.nextInt(16) < density) rnd.nextInt(2 * amp + 1) - amp else 0
      }
      roundTrip(coeffs)
    }
  }

  test("chroma-DC tables are prefix-free and complete (Kraft exactly 1)") {
    val ct = H264Cavlc.CoeffTokenChromaDc.flatten.toSeq
    assert(ct.length == 14 && ct.distinct.length == 14)
    prefixFree(ct)
    assert(math.abs(kraft(ct) - 1.0) < 1e-12)
    H264Cavlc.TotalZerosChromaDc.zipWithIndex.foreach { case (row, i) =>
      assert(row.length == 4 - (i + 1) + 1)
      prefixFree(row.toSeq)
      assert(math.abs(kraft(row.toSeq) - 1.0) < 1e-12, s"tc=${i + 1}")
    }
  }

  test("round trip holds in the chroma-DC (nC = -1) context") {
    roundTrip(Array(0, 0, 0, 0), nC = -1)
    roundTrip(Array(3, 0, 0, 0), nC = -1)
    roundTrip(Array(0, 0, 0, -1), nC = -1)
    roundTrip(Array(1, -1, 1, -1), nC = -1) // tc=4: total_zeros skipped
    roundTrip(Array(-2, 0, 2, 0), nC = -1)
    roundTrip(Array(0, 40, 0, -40), nC = -1) // level escapes in chroma
    val rnd = new scala.util.Random(321)
    for (_ <- 0 until 500) {
      roundTrip(Array.tabulate(4)(_ =>
        if (rnd.nextInt(3) == 0) 0 else rnd.nextInt(13) - 6), nC = -1)
    }
    // the chroma context is ONLY the 4-coefficient block
    val w = new H264Sps.BitWriter
    assertThrows[IllegalArgumentException](
      H264Cavlc.writeResidual(Array.fill(16)(1), -1, w))
    val r = new H264Sps.BitReader(Array[Byte](0x55, 0x55))
    assert(H264Cavlc.readResidual(-1, 16, r).isEmpty)
  }

  test("round trip holds in the fixed 6-bit nC>=8 context") {
    val rnd = new scala.util.Random(99)
    for (_ <- 0 until 300) {
      val coeffs = Array.tabulate(16)(_ =>
        if (rnd.nextInt(3) == 0) rnd.nextInt(9) - 4 else 0)
      roundTrip(coeffs, nC = 8)
    }
  }

  test("out-of-scope contexts are rejected, not guessed") {
    val w = new BitWriter
    assertThrows[IllegalArgumentException](
      H264Cavlc.writeResidual(Array.fill(16)(1), 4, w))
    assertThrows[IllegalArgumentException](
      H264Cavlc.writeResidual(Array.fill(16)(1), -1, w))
    val r = new BitReader(Array[Byte](0x55, 0x55, 0x55))
    assert(H264Cavlc.readResidual(4, 16, r).isEmpty)
  }

  test("truncated streams surface as None, never a partial block") {
    val w = new BitWriter
    H264Cavlc.writeResidual(
      Array(0, 3, 0, 1, -1, -1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0), 0, w)
    val full = w.trailing()
    for (cut <- 0 until 3) { // the block needs 24 bits = 3 whole bytes
      val r = new BitReader(full.take(cut))
      assert(H264Cavlc.readResidual(0, 16, r).isEmpty, s"cut=$cut")
    }
  }
}
