package graft.enrich

import H264Sps.{BitReader, BitWriter}

/** Pure-JVM CAVLC residual-block coder (ITU-T H.264 §9.2) — the
  * entropy layer under [[H264Coded]]'s Intra_16x16 macroblock decode,
  * one layer below [[H264Pcm]]'s uncompressed escape. This is REAL
  * context-adaptive variable-length coding, both directions: the
  * coeff_token joint (TotalCoeff, TrailingOnes) code in the nC-selected
  * context (Table 9-5), trailing-one sign bits, the adaptive
  * suffixLength level code with its 14/15-prefix escapes (§9.2.2.1),
  * total_zeros (Table 9-7) and run_before (Table 9-10) zero placement.
  *
  * Context scope, stated not guessed: the 0 ≤ nC < 2 table is
  * implemented in full (the only luma table a stream whose per-block
  * AC TotalCoeff stays ≤ 1 can ever select), the nC == −1 ChromaDCLevel
  * context (2×2 chroma DC, audited complete — Kraft sum exactly 1),
  * and the fixed 6-bit nC ≥ 8 context, which is algorithmic in the
  * spec. The 2 ≤ nC < 8 tables are unreachable from [[H264Coded]]'s
  * writer; a stream that selects them is rejected (None), never
  * misdecoded — the same corrupt-skip contract as the rest of the
  * codec family (reference media store: lambda/s3Posts-to-ES-lambda/
  * s3-to-es_aws.py:83,116-122).
  *
  * DECISION BOUNDARY — this is the codec frontier, deliberately: the
  * 2 ≤ nC < 8 columns of Table 9-5 are ~124 empirical code strings
  * with no algorithmic derivation and no authoritative copy reachable
  * from this build environment. Unlike the implemented tables — whose
  * transcriptions are anchored by the published worked-example
  * bitstring (nC < 2), exact-completeness Kraft sums (chroma DC), or
  * the spec's algorithm (nC ≥ 8) — a from-memory transcription of
  * those columns could be wrong-but-self-consistent: every in-repo
  * audit (round trips use the same tables both directions; Kraft and
  * prefix checks prove consistency, not fidelity) would pass while a
  * REAL dense-residual stream misdecoded silently. Rejection preserves
  * the family's contract; extension requires an authoritative table
  * source, not more engineering. CABAC, inter prediction, and
  * perceptual audio filterbanks stay out for the same reason at larger
  * scale: each is a correctness surface with no oracle this
  * environment can host.
  *
  * Table transcriptions are audited in H264CavlcSpec: every VLC table
  * is checked prefix-free with its spec-known Kraft sum (coeff_token
  * 1−2⁻¹⁵, total_zeros tc=1 1−2⁻⁹, run_before zl>6 1−2⁻¹¹ — the three
  * tables the standard leaves incomplete), and the encoder reproduces
  * the widely-published worked example bitstring
  * "000010001110010111101101" for the block {0,3,0,1,−1,−1,0,1,0…}.
  */
object H264Cavlc {

  /** Table 9-5, 0 ≤ nC < 2: code strings indexed [totalCoeff][t1]
    * (t1 ≤ min(3, totalCoeff)). */
  private[enrich] val CoeffTokenNc0: Array[Array[String]] = Array(
    Array("1"),
    Array("000101", "01"),
    Array("00000111", "000100", "001"),
    Array("000000111", "00000110", "0000101", "00011"),
    Array("0000000111", "000000110", "00000101", "000011"),
    Array("00000000111", "0000000110", "000000101", "0000100"),
    Array("0000000001111", "00000000110", "0000000101", "00000100"),
    Array("0000000001011", "0000000001110", "00000000101", "000000100"),
    Array("0000000001000", "0000000001010", "0000000001101", "0000000100"),
    Array("00000000001111", "00000000001110", "0000000001001",
      "00000000100"),
    Array("00000000001011", "00000000001010", "00000000001101",
      "0000000001100"),
    Array("000000000001111", "000000000001110", "00000000001001",
      "00000000001100"),
    Array("000000000001011", "000000000001010", "000000000001101",
      "00000000001000"),
    Array("0000000000001111", "000000000000001", "000000000001001",
      "000000000001100"),
    Array("0000000000001011", "0000000000001110", "0000000000001101",
      "000000000001000"),
    Array("0000000000000111", "0000000000001010", "0000000000001001",
      "0000000000001100"),
    Array("0000000000000100", "0000000000000110", "0000000000000101",
      "0000000000001000"))

  /** Table 9-7 (maxNumCoeff 16): total_zeros code strings indexed
    * [totalCoeff−1][totalZeros]. */
  private[enrich] val TotalZeros16: Array[Array[String]] = Array(
    Array("1", "011", "010", "0011", "0010", "00011", "00010", "000011",
      "000010", "0000011", "0000010", "00000011", "00000010", "000000011",
      "000000010", "000000001"),
    Array("111", "110", "101", "100", "011", "0101", "0100", "0011",
      "0010", "00011", "00010", "000011", "000010", "000001", "000000"),
    Array("0101", "111", "110", "101", "0100", "0011", "100", "011",
      "0010", "00011", "00010", "000001", "00001", "000000"),
    Array("00011", "111", "0101", "0100", "110", "101", "100", "0011",
      "011", "0010", "00010", "00001", "00000"),
    Array("0101", "0100", "0011", "111", "110", "101", "100", "011",
      "0010", "00001", "0001", "00000"),
    Array("000001", "00001", "111", "110", "101", "100", "011", "010",
      "0001", "001", "000000"),
    Array("000001", "00001", "101", "100", "011", "11", "010", "0001",
      "001", "000000"),
    Array("000001", "0001", "00001", "011", "11", "10", "010", "001",
      "000000"),
    Array("000001", "000000", "0001", "11", "10", "001", "01", "00001"),
    Array("00001", "00000", "001", "11", "10", "01", "0001"),
    Array("0000", "0001", "001", "010", "1", "011"),
    Array("0000", "0001", "01", "1", "001"),
    Array("000", "001", "1", "01"),
    Array("00", "01", "1"),
    Array("0", "1"))

  /** Table 9-5, nC == −1 (ChromaDCLevel, 4:2:0): the 2×2 chroma-DC
    * coeff_token context, indexed [totalCoeff][t1]. Audited complete
    * (Kraft sum exactly 1) and prefix-free in H264CavlcSpec. */
  private[enrich] val CoeffTokenChromaDc: Array[Array[String]] = Array(
    Array("01"),
    Array("000111", "1"),
    Array("000100", "000110", "001"),
    Array("000011", "0000011", "0000010", "000101"),
    Array("000010", "00000011", "00000010", "0000000"))

  /** Table 9-9(a): total_zeros for chroma DC (maxNumCoeff 4), indexed
    * [totalCoeff−1][totalZeros]. */
  private[enrich] val TotalZerosChromaDc: Array[Array[String]] = Array(
    Array("1", "01", "001", "000"),
    Array("1", "01", "00"),
    Array("1", "0"))

  /** Table 9-10: run_before code strings indexed [min(zerosLeft,7)−1]
    * [run]; in the zerosLeft>6 context runs ≥7 continue unary
    * ((run−4) zeros then 1). */
  private[enrich] val RunBefore: Array[Array[String]] = Array(
    Array("1", "0"),
    Array("1", "01", "00"),
    Array("11", "10", "01", "00"),
    Array("11", "10", "01", "001", "000"),
    Array("11", "10", "011", "010", "001", "000"),
    Array("11", "000", "001", "011", "010", "101", "100"),
    Array("111", "110", "101", "100", "011", "010", "001", "0001",
      "00001", "000001", "0000001", "00000001", "000000001",
      "0000000001", "00000000001"))

  private def bitsOf(s: String): (Int, Int) = (s.length, Integer.parseInt(s, 2))

  private val CoeffTokenNc0Dec: Map[(Int, Int), (Int, Int)] = (for {
    tc <- CoeffTokenNc0.indices
    t1 <- CoeffTokenNc0(tc).indices
  } yield bitsOf(CoeffTokenNc0(tc)(t1)) -> ((tc, t1))).toMap

  private val CoeffTokenChromaDcDec: Map[(Int, Int), (Int, Int)] = (for {
    tc <- CoeffTokenChromaDc.indices
    t1 <- CoeffTokenChromaDc(tc).indices
  } yield bitsOf(CoeffTokenChromaDc(tc)(t1)) -> ((tc, t1))).toMap

  private val TotalZerosChromaDcDec: Array[Map[(Int, Int), Int]] =
    TotalZerosChromaDc.map(row =>
      row.indices.map(tz => bitsOf(row(tz)) -> tz).toMap)

  private val TotalZeros16Dec: Array[Map[(Int, Int), Int]] =
    TotalZeros16.map(row =>
      row.indices.map(tz => bitsOf(row(tz)) -> tz).toMap)

  private val RunBeforeDec: Array[Map[(Int, Int), Int]] =
    RunBefore.map(row =>
      row.indices.map(run => bitsOf(row(run)) -> run).toMap)

  /** Read one VLC symbol: extend the code bit by bit until it matches
    * a table entry (all tables are prefix-free, spec-audited). */
  private def readVlc[T](r: BitReader, m: Map[(Int, Int), T],
                         maxLen: Int): Option[T] = {
    var len = 0; var v = 0
    while (len < maxLen && !r.bad) {
      v = (v << 1) | r.u(1).toInt
      len += 1
      val hit = m.get((len, v))
      if (hit.isDefined) return hit
    }
    None
  }

  private def writeCode(w: BitWriter, s: String): Unit = {
    val (len, v) = bitsOf(s)
    w.u(v.toLong, len)
  }

  /** §9.2.2.1 level write: levelCode → level_prefix zeros, stop bit,
    * level_suffix. suffixLength 0 has the prefix-14 (4-bit-suffix) and
    * prefix-15 (12-bit) escapes; suffixLength > 0 escapes at prefix 15.
    * `u(1, n+1)` emits n zeros then the stop 1. */
  private def writeLevelCode(w: BitWriter, levelCode: Int, s: Int): Unit = {
    if (s == 0) {
      if (levelCode < 14) w.u(1L, levelCode + 1)
      else if (levelCode < 30) { w.u(1L, 15); w.u((levelCode - 14).toLong, 4) }
      else {
        require(levelCode - 30 < 4096, s"level code $levelCode out of range")
        w.u(1L, 16); w.u((levelCode - 30).toLong, 12)
      }
    } else {
      if (levelCode < (15 << s)) {
        w.u(1L, (levelCode >> s) + 1)
        w.u((levelCode & ((1 << s) - 1)).toLong, s)
      } else {
        require(levelCode - (15 << s) < 4096,
          s"level code $levelCode out of range at suffixLength $s")
        w.u(1L, 16); w.u((levelCode - (15 << s)).toLong, 12)
      }
    }
  }

  /** §9.2.2.1 level read for the current suffixLength. */
  private def readLevelCode(r: BitReader, s: Int): Int = {
    var prefix = 0
    while (!r.bad && r.u(1) == 0) {
      prefix += 1
      if (prefix > 30) { r.bad = true; return 0 }
    }
    if (r.bad) return 0
    val suffixSize =
      if (prefix >= 15) prefix - 3
      else if (prefix == 14 && s == 0) 4
      else s
    var levelCode = (math.min(15, prefix) << s) + r.u(suffixSize).toInt
    if (prefix >= 15 && s == 0) levelCode += 15
    if (prefix >= 16) levelCode += (1 << (prefix - 3)) - 4096
    levelCode
  }

  /** Encode `coeffs` (zigzag order, length = maxNumCoeff ≤ 16) as one
    * §9.2 residual block in the nC-selected context. Only the contexts
    * [[H264Coded]]'s streams can reach are writable (0 ≤ nC < 2 and
    * nC ≥ 8). */
  def writeResidual(coeffs: Array[Int], nC: Int, w: BitWriter): Unit = {
    require(coeffs.length >= 1 && coeffs.length <= 16, "block size")
    require(nC >= -1, "unknown coeff_token context")
    require(nC >= 0 || coeffs.length == 4,
      "the nC=-1 context is the 4-coefficient chroma-DC block")
    val nz = coeffs.indices.filter(coeffs(_) != 0)
    val tc = nz.length
    require(tc <= coeffs.length)
    var t1 = 0
    while (t1 < math.min(3, tc) &&
      math.abs(coeffs(nz(tc - 1 - t1))) == 1) t1 += 1
    // coeff_token
    if (nC == -1) writeCode(w, CoeffTokenChromaDc(tc)(t1))
    else if (nC < 2) writeCode(w, CoeffTokenNc0(tc)(t1))
    else if (nC >= 8) {
      if (tc == 0) w.u(3L, 6)
      else w.u((((tc - 1) << 2) | t1).toLong, 6)
    } else throw new IllegalArgumentException(
      s"coeff_token context 2<=nC<8 (nC=$nC) is outside this writer")
    if (tc == 0) return
    // trailing-one signs, highest frequency first
    var k = 0
    while (k < t1) {
      w.u(if (coeffs(nz(tc - 1 - k)) < 0) 1L else 0L, 1)
      k += 1
    }
    // remaining levels, highest frequency first, adaptive suffixLength
    var s = if (tc > 10 && t1 < 3) 1 else 0
    k = t1
    while (k < tc) {
      val level = coeffs(nz(tc - 1 - k))
      var levelCode = if (level > 0) 2 * level - 2 else -2 * level - 1
      if (k == t1 && t1 < 3) levelCode -= 2
      writeLevelCode(w, levelCode, s)
      if (s == 0) s = 1
      if (math.abs(level) > (3 << (s - 1)) && s < 6) s += 1
      k += 1
    }
    // total_zeros: zeros below the highest nonzero. Table 9-7 serves
    // both maxNumCoeff 16 (LumaLevel/DC) and 15 (Intra16x16ACLevel) —
    // the AC range is a prefix of each row.
    val totalZeros = nz.last + 1 - tc
    if (tc < coeffs.length) {
      if (nC == -1) writeCode(w, TotalZerosChromaDc(tc - 1)(totalZeros))
      else {
        require(coeffs.length >= 15,
          "only the 4x4 total_zeros table (maxNumCoeff 15/16) is implemented")
        writeCode(w, TotalZeros16(tc - 1)(totalZeros))
      }
    }
    // run_before, highest frequency first, while zeros remain
    var zerosLeft = totalZeros
    k = 0
    while (k < tc - 1 && zerosLeft > 0) {
      val run = nz(tc - 1 - k) - nz(tc - 2 - k) - 1
      writeCode(w, RunBefore(math.min(zerosLeft, 7) - 1)(run))
      zerosLeft -= run
      k += 1
    }
  }

  /** Decode one §9.2 residual block of `maxNumCoeff` zigzag-ordered
    * coefficients in the nC context. None on a malformed stream, an
    * inconsistent zero layout, or a context outside the implemented
    * scope — rejected, never guessed. */
  def readResidual(nC: Int, maxNumCoeff: Int,
                   r: BitReader): Option[Array[Int]] = {
    if (maxNumCoeff < 1 || maxNumCoeff > 16 || nC < -1) return None
    if (nC == -1 && maxNumCoeff != 4) return None
    val tokenOpt: Option[(Int, Int)] =
      if (nC == -1) readVlc(r, CoeffTokenChromaDcDec, 8)
      else if (nC < 2) readVlc(r, CoeffTokenNc0Dec, 16)
      else if (nC >= 8) {
        val v = r.u(6).toInt
        if (r.bad) None
        else if (v == 3) Some((0, 0))
        else {
          val tc = (v >> 2) + 1
          val t1 = v & 3
          if (t1 > math.min(3, tc)) None else Some((tc, t1))
        }
      } else None // 2 ≤ nC < 8: out of implemented scope
    val (tc, t1) = tokenOpt.getOrElse(return None)
    val out = new Array[Int](maxNumCoeff)
    if (tc == 0) return if (r.bad) None else Some(out)
    if (tc > maxNumCoeff) return None
    // levels, highest frequency first
    val levels = new Array[Int](tc)
    var k = 0
    while (k < t1) {
      levels(k) = if (r.u(1) == 1) -1 else 1
      k += 1
    }
    var s = if (tc > 10 && t1 < 3) 1 else 0
    while (k < tc) {
      var levelCode = readLevelCode(r, s)
      if (k == t1 && t1 < 3) levelCode += 2
      val level =
        if ((levelCode & 1) == 0) (levelCode + 2) >> 1
        else -((levelCode + 1) >> 1)
      levels(k) = level
      if (s == 0) s = 1
      if (math.abs(level) > (3 << (s - 1)) && s < 6) s += 1
      k += 1
    }
    // total_zeros (Table 9-7 serves maxNumCoeff 16 and the AC 15)
    val totalZeros =
      if (tc == maxNumCoeff) 0
      else if (nC == -1)
        readVlc(r, TotalZerosChromaDcDec(tc - 1), 3).getOrElse(return None)
      else {
        if (maxNumCoeff < 15) return None
        readVlc(r, TotalZeros16Dec(tc - 1), 9).getOrElse(return None)
      }
    if (totalZeros > maxNumCoeff - tc) return None
    // runs, highest frequency first; place levels from the top down
    var zerosLeft = totalZeros
    var idx = totalZeros + tc - 1
    k = 0
    while (k < tc) {
      if (idx < 0 || idx >= maxNumCoeff) return None
      out(idx) = levels(k)
      val run =
        if (k == tc - 1) zerosLeft // the zeros below the lowest nonzero
        else if (zerosLeft <= 0) 0
        else readVlc(r, RunBeforeDec(math.min(zerosLeft, 7) - 1), 11)
          .getOrElse(return None)
      if (run < 0 || run > zerosLeft) return None
      zerosLeft -= run
      idx -= 1 + run
      k += 1
    }
    if (r.bad) None else Some(out)
  }
}
