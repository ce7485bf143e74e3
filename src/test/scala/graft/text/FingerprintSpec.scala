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

  test("exact-dup collapse preserves candidates incl. df pruning (planted corpus)") {
    import spark.implicits._
    // 8-copy duplicate cluster + a near-dup + unrelated docs, written as a
    // corpus dir; compare the collapsed pipeline to a naive member-level
    // recompute of the same algorithm (winnow per copy, df over all
    // members, prune, all-pairs shared counts)
    val shared = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docsSeq: Seq[(Long, String)] =
      (0L until 8L).map(i => (i, shared)) ++ Seq(
        (100L, s"prefix words here $shared"),
        (200L, "totally different content with no overlap at all in any way whatsoever"),
        (300L, (1 to 30).map(i => s"other$i").mkString(" ")))
    val dir = java.nio.file.Files.createTempDirectory("fpcorpus").toString
    docsSeq.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Fingerprint.fingerprintCandidates(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // naive member-level reference
    val fps = docsSeq.map { case (id, t) =>
      (id, Fingerprint.winnow(t.trim.split("\\s+"), 3, 4).toSet) }
    val df = fps.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val kept = fps.map { case (id, s) => (id, s.filter(f => df(f) <= 20)) }
    val exact = (for {
      (ia, sa) <- kept; (ib, sb) <- kept
      if ia < ib
      n = (sa & sb).size
      if n >= 3
    } yield (ia, ib, n.toLong)).toSet
    assert(got == exact, s"got=${got.size} exact=${exact.size}")
    // the 8-copy cluster must be fully paired (C(8,2) intra pairs present)
    assert(got.count(p => p._1 < 8 && p._2 < 8) == 28)
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
