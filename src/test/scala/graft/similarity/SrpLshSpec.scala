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

  test("exact-duplicate collapse bounds candidates and preserves the pair set") {
    import spark.implicits._
    // a planted 10-copy exact-dup cluster per base vector (mirrored media /
    // re-crawled pages): naive bucketing would see ~tables·B² candidates
    val rnd = new scala.util.Random(7)
    val dim = 64
    val bases = IndexedSeq.fill(30)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = for {
      (v, i) <- bases.zipWithIndex
      c <- 0 until 10
    } yield ((i * 100 + c).toLong, v.toSeq, 0)
    val df = rows.toDF("vec_id", "embedding", "label")

    // collapsed candidate volume is bounded by DISTINCT-vector pairs
    val reps = df.groupBy(org.apache.spark.sql.functions.col("embedding"))
      .agg(org.apache.spark.sql.functions.min("vec_id").as("vec_id"))
    val candCount = SrpLsh.candidatePairs(reps).count()
    assert(candCount <= 30L * 29 / 2,
      s"collapsed candidates not bounded by distinct pairs: $candCount")

    val got = SrpLsh.nearDups(df, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // reference: brute-force all-pairs exact cosine over the full corpus
    val kern = rows.map { case (id, v, _) => (id, v.toArray) }
    val exact = (for {
      (ia, va) <- kern; (ib, vb) <- kern
      if ia < ib
      dot = va.zip(vb).map { case (x, y) => x * y }.sum
      na = math.sqrt(va.map(x => x * x).sum); nb = math.sqrt(vb.map(x => x * x).sum)
      sim = BigDecimal(dot / (na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if sim >= 0.95
    } yield (ia, ib, sim)).toSet
    assert(got == exact,
      s"collapse changed the output: got=${got.size} exact=${exact.size}")
    // every intra-cluster pair is present: C(10,2) per base
    assert(got.count(_._3 == 1.0) >= 30 * 45)
  }

  test("bucket ids are deterministic across invocations") {
    val (df, _) = planted()
    val a = SrpLsh.nearDups(df, 0.95).collect().toSeq
    val b = SrpLsh.nearDups(df, 0.95).collect().toSeq
    assert(a == b)
  }
}
