package graft.dedup

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
  private val nearDup = base.replace("lazy", "sleepy") // 1 token of 16 changed
  private val unrelated = "completely different content with nothing shared whatsoever here at all in any way shape or form"

  test("shingleSet produces distinct n-grams, empty under 3 tokens") {
    assert(MinHashLSH.shingleSet("a b c d").toSeq == Seq("a b c", "b c d"))
    assert(MinHashLSH.shingleSet("a b").isEmpty)
    assert(MinHashLSH.shingleSet("x x x x x").toSeq == Seq("x x x")) // distinct
  }

  test("minhash LSH finds planted near-dups and skips unrelated docs") {
    val docs = Seq(
      (0L, base), (1L, nearDup), (2L, unrelated),
      (3L, "totally other text about spark engines and query planning at scale today ok"),
      (4L, base + " extra")).toDF("doc_id", "text")
    val sigs = MinHashLSH.docSignatures(spark, docs)
      .toDF("doc_id", "txt_md5", "sh", "bands")
    val cands = MinHashLSH.candidatePairs(sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((0L, 1L)), s"missing planted pair in $cands")
    assert(cands.contains((0L, 4L)))
    assert(!cands.contains((0L, 2L)) && !cands.contains((1L, 2L)))
  }

  test("borderline planted pair at Jaccard exactly 0.8 survives the banded graph") {
    // Independence backstop for the qd17/qs1 pair surface: the qd17
    // oracle now rides the SAME MinHashLSH.nearDups graph as the engine,
    // so oracle parity can no longer catch a recall loss in that surface.
    // This pair sits ON the threshold — 11 distinct tokens, edit
    // distance 1 (last token "kilo" → "kilos"), so the two 9-shingle
    // sets share 8 of 10 distinct shingles: Jaccard = 8/10 = 0.8
    // exactly. Any banding-parameter change that shrinks recall near the
    // threshold, or any verify-phase drift to a strict `>`, trips this
    // spec rather than passing silently.
    val a11 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo"
    val b11 = a11.dropRight(4) + "kilos" // J = 0.8 exactly, edit dist 1
    // just-below control: 10 tokens, same last-token edit → 7/9 ≈ 0.778;
    // banding may still propose it, verification must reject it
    val a10 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val b10 = a10.dropRight(6) + "juliets"
    val sa = MinHashLSH.shingleSet(a11).toSet
    val sb = MinHashLSH.shingleSet(b11).toSet
    assert((sa & sb).size == 8 && (sa | sb).size == 10,
      s"planted geometry drifted: inter=${(sa & sb).size} union=${(sa | sb).size}")

    val docs = Seq((0L, a11), (1L, b11), (2L, a10), (3L, b10),
      (4L, unrelated)).toDF("doc_id", "text")
    val sigs = MinHashLSH.docSignatures(spark, docs)
      .toDF("doc_id", "txt_md5", "sh", "bands").localCheckpoint(true)
    val cands = MinHashLSH.candidatePairs(sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((0L, 1L)),
      s"banding lost the J=0.8 borderline pair: $cands")
    val pairs = MinHashLSH.pairsFromSigs(sigs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 0.8),
      s"verified graph lost the J=0.8 borderline pair: $pairs")
    assert(!pairs.exists(p => p._1 == 2L && p._2 == 3L),
      s"sub-threshold pair (J≈0.778) leaked through verification: $pairs")
  }

  test("exact-dup collapse bounds band buckets and preserves the pair set") {
    // a planted 150-copy exact-dup cluster (the web-boilerplate case that
    // makes naive banding quadratic), plus the usual near-dup/unrelated mix
    val copies = (100L until 250L).map(i => (i, base))
    val docs = (Seq((0L, nearDup), (1L, unrelated),
      (2L, base + " extra"), (3L, "short one")) ++ copies).toDF("doc_id", "text")
    val sigs = MinHashLSH.docSignatures(spark, docs)
      .toDF("doc_id", "txt_md5", "sh", "bands").localCheckpoint(true)

    // banding sees each distinct text once: candidate volume is bounded by
    // distinct-text pairs (≤ C(4,2) with ≥1 shared band), not C(153,2)
    val reps = sigs.groupBy("txt_md5").agg(min("doc_id").as("doc_id"))
    val repSigs = sigs.join(reps, Seq("txt_md5", "doc_id"))
    val candCount = MinHashLSH.candidatePairs(repSigs).count()
    assert(candCount <= 6, s"collapsed candidates not bounded: $candCount")

    val got = MinHashLSH.pairsFromSigs(sigs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // reference: exact all-pairs over the full (uncollapsed) corpus
    val kern = docs.as[(Long, String)].collect()
      .map { case (id, t) => (id, MinHashLSH.shingleSet(t).toSet) }
    val exact = (for {
      (ia, sa) <- kern; (ib, sb) <- kern
      if ia < ib && sa.nonEmpty && sb.nonEmpty
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= 0.8
    } yield (ia, ib, j)).toSet
    assert(got == exact,
      s"collapse changed the output: got=${got.size} exact=${exact.size}")
    // the 150-copy cluster's C(150,2) intra pairs are all present at 1.0
    assert(got.count(t => t._3 == 1.0) >= 150 * 149 / 2)
  }

  test("empty-shingle docs (< 3 tokens) never band, verify, or pair") {
    // two DISTINCT short texts and two IDENTICAL short texts: an empty
    // shingle signature is the constant all-MaxValue vector, so without
    // the size(sh) > 0 guard every short doc collides in every band and
    // "verifies" at 0/0 = NaN Jaccard (NaN >= t is true in Spark SQL).
    // The oracle requires both shingle sets non-empty: none of these docs
    // may produce a pair — not distinct-short pairs (NaN), not
    // identical-short pairs (0/0 is undefined, not 1.0).
    val docs = Seq(
      (0L, "hi there"), (1L, "bye now"), (2L, "same two"), (3L, "same two"),
      (4L, base), (5L, base + " extra")).toDF("doc_id", "text")
    val sigs = MinHashLSH.docSignatures(spark, docs)
      .toDF("doc_id", "txt_md5", "sh", "bands").localCheckpoint(true)
    val cands = MinHashLSH.candidatePairs(sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.forall { case (a, b) => a >= 4L && b >= 4L },
      s"short docs entered the band join: $cands")
    val pairs = MinHashLSH.pairsFromSigs(sigs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.forall(p => !p._3.isNaN), s"NaN jaccard emitted: ${pairs.toSeq}")
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((4L, 5L)),
      s"expected only the planted near-dup pair, got ${pairs.toSeq}")
  }

  test("minhash nearDups equals exact all-pairs shingle Jaccard at sf0.001") {
    val got = MinHashLSH.nearDups(spark, SparkTestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact all-pairs reference computed with the same kernels
    val docs = graft.Tables(spark, SparkTestSession.sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => (id, MinHashLSH.shingleSet(t).toSet) }
    val exact = (for {
      (ia, sa) <- docs; (ib, sb) <- docs
      if ia < ib && sa.nonEmpty && sb.nonEmpty
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= 0.8
    } yield (ia, ib)).toSet
    assert(got == exact, s"LSH=${got.size} exact=${exact.size}")
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
  }

  test("near-dup pair graph is memoized per session and corpus") {
    val a = MinHashLSH.nearDups(spark, SparkTestSession.sfDir)
    val b = MinHashLSH.nearDups(spark, SparkTestSession.sfDir)
    assert(a eq b, "same session+corpus+threshold must reuse the pair graph")
    val sig1 = MinHashLSH.signatures(spark, SparkTestSession.sfDir)
    val sig2 = MinHashLSH.signatures(spark, SparkTestSession.sfDir)
    assert(sig1 eq sig2, "signature pass must run once per session+corpus")
    // different threshold = different verified graph, same signatures
    val c = MinHashLSH.nearDups(spark, SparkTestSession.sfDir, threshold = 0.9)
    assert(!(a eq c))
    assert(c.collect().length <= a.collect().length)
    // test hygiene: nothing else reads the 0.9 graph — release its
    // persisted blocks instead of pinning them for the rest of the suite
    c.unpersist()
    ()
  }

  test("simhash kernel: identical → 0, near-dup → small, unrelated → large") {
    val a = SimHash.simhash64(base.split(" ").toSeq)
    val a2 = SimHash.simhash64(base.split(" ").toSeq)
    val b = SimHash.simhash64(nearDup.split(" ").toSeq)
    val c = SimHash.simhash64(unrelated.split(" ").toSeq)
    assert(SimHash.hamming(a, a2) == 0)
    assert(SimHash.hamming(a, b) <= 14, s"near-dup hamming ${SimHash.hamming(a, b)}")
    assert(SimHash.hamming(a, c) >= 16, s"unrelated hamming ${SimHash.hamming(a, c)}")
    assert(SimHash.hamming(a, b) < SimHash.hamming(a, c))
  }

  test("simhash captures the planted near-dups within a small radius") {
    // ground truth: strong shingle-level near-dups (order-sensitive).
    // SimHash is token-multiset (order-insensitive), so it must see all of
    // them at a modest Hamming radius, and its own tight-radius pairs must
    // be nonempty.
    val planted = MinHashLSH.nearDups(spark, SparkTestSession.sfDir, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fp = SimHash.fingerprints(spark, SparkTestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val within = planted.count { case (a, b) => SimHash.hamming(fp(a), fp(b)) <= 8 }
    assert(planted.nonEmpty)
    assert(within.toDouble / planted.size >= 0.8,
      s"only $within/${planted.size} planted pairs within hamming 8")
    val tight = SimHash.nearDups(spark, SparkTestSession.sfDir, maxDist = 3)
      .collect()
    assert(tight.nonEmpty, "expected at least one hamming<=3 pair")
  }
}
