package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class FingerprintSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("winnow selects window minima deterministically") {
    val toks = "a b c d e f g h i j".split(" ")
    val fp1 = Fingerprint.winnow(toks, k = 3, w = 4)
    val fp2 = Fingerprint.winnow(toks, k = 3, w = 4)
    assert(fp1.toSeq == fp2.toSeq)
    assert(fp1.nonEmpty)
    // every fingerprint is one of the k-gram hashes
    val grams = toks.sliding(3).map(g =>
      graft.dedup.SimHash.md5Lower64String(g.mkString(" "))).toSet
    assert(fp1.forall(grams.contains))
  }

  test("short documents yield zero or one fingerprint") {
    assert(Fingerprint.winnow(Array("a", "b"), 3, 4).isEmpty)
    assert(Fingerprint.winnow(Array("a", "b", "c", "d"), 3, 4).length == 1)
  }

  test("shared substrings guarantee shared fingerprints") {
    // two documents sharing a 20-token run must share >= 1 fingerprint
    val shared = (1 to 20).map(i => s"common$i").mkString(" ")
    val d1 = s"alpha beta gamma $shared delta".split(" ")
    val d2 = s"zeta eta $shared theta iota kappa".split(" ")
    val f1 = Fingerprint.winnow(d1, 3, 4).toSet
    val f2 = Fingerprint.winnow(d2, 3, 4).toSet
    assert(f1.intersect(f2).nonEmpty)
  }

  test("fingerprint candidates surface the corpus planted near-dups") {
    val cands = Fingerprint.fingerprintCandidates(spark, SparkTestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = graft.dedup.MinHashLSH.nearDups(spark, SparkTestSession.sfDir, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = planted.count(cands.contains).toDouble / planted.size
    assert(recall >= 0.9, s"fingerprint recall $recall over ${planted.size} planted pairs")
  }
}
