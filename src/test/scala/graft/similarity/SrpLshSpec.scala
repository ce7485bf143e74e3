package graft.similarity

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SrpLshSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Planted corpus: 60 random base vectors, 20 of them duplicated with
    * small noise (near-parallel pairs), plus the noise-free originals. */
  private def planted() = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 64
    val bases = IndexedSeq.fill(60)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = bases.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq, 0) } ++
      bases.take(20).zipWithIndex.map { case (v, i) =>
        ((100 + i).toLong, v.map(x => x + rnd.nextGaussian().toFloat * 0.05f).toSeq, 0)
      }
    (rows.toDF("vec_id", "embedding", "label"),
      (0 until 20).map(i => (i.toLong, (100 + i).toLong)).toSet)
  }

  test("SRP LSH finds planted near-parallel pairs with high recall") {
    val (df, expected) = planted()
    val got = SrpLsh.nearDups(df, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = expected.count(got.contains).toDouble / expected.size
    assert(recall >= 0.9, s"recall $recall, found ${got.size} pairs")
    // precision is exact-verified: every reported pair really has cos >= 0.95
    assert(got.intersect(expected).size == got.count(expected.contains))
  }

  test("qs9 finds exactly the planted perturbed pairs (oracle agreement)") {
    // corpus ∪ perturbed copy: expected output is the n−1 planted
    // (v_i, 0.95·v_i + 0.05·v_{i+1}) pairs and nothing else — the raw
    // isotropic corpus contributes no pairs at cosine ≥ 0.95
    val n = graft.Tables(spark, SparkTestSession.sfDir, "embeddings").count()
    val pairs = SrpLsh.qs9NearDups(spark, SparkTestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length.toLong == n - 1, s"got ${pairs.length}, want ${n - 1}")
    assert(pairs.forall { case (a, b) => b == a + 100000L },
      "found a non-planted pair at cosine >= 0.95")
  }

  test("bucket ids are deterministic across invocations") {
    val (df, _) = planted()
    val a = SrpLsh.nearDups(df, 0.95).collect().toSeq
    val b = SrpLsh.nearDups(df, 0.95).collect().toSeq
    assert(a == b)
  }
}
