package graft.operators

import graft.{SparkTestSession, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** qe17 DBSCAN and qe2's banded pair generator verified against an
  * independent JVM recompute: plain loops + union-find, sharing nothing
  * with the engine's join/CC machinery except the float→double widening
  * and 6dp HALF_UP rounding the family defines as its comparison
  * contract. The recompute reproduces the banded blocking (label ∧ any
  * sign-bit band collision at the adaptive width) directly from its
  * definition, not via the engine's bucket columns. */
class DbscanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def round6(x: Double): Double = {
    import scala.math.BigDecimal.RoundingMode
    BigDecimal(x).setScale(6, RoundingMode.HALF_UP).toDouble
  }
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private lazy val vecs = Tables(spark, SparkTestSession.sfDir, "embeddings")
    .select("vec_id", "label", "embedding").collect()
    .map(r => (r.getLong(0), r.getInt(1),
      r.getSeq[Float](2).map(_.toDouble).toArray))

  /** Band width and per-band sign-bit buckets, straight from the spec:
    * s = clamp(4, 16, ⌊log2 n⌋ − 7); band j covers coords [j·s, j·s+s).
    * Parameterized by the corpus row count so every test (the sf corpus
    * AND the planted-copy one) shares ONE transcription of the banding
    * contract. */
  private def bandWidthFor(n: Long): Int = {
    val lg = 63 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n))
    math.min(16, math.max(4, lg - 7))
  }
  private def bandsOf(v: Array[Double], w: Int): Array[Long] =
    Array.tabulate(VectorOps.NearDupBands) { j =>
      (0 until w).map(i =>
        if (v(j * w + i) >= 0) 1L << i else 0L).sum
    }
  private lazy val bandWidth: Int = bandWidthFor(vecs.length.toLong)

  /** Independent recompute of bandedLabelPairs at `threshold`. */
  private def expectedPairs(threshold: Double): Seq[(Long, Long, Int, Double)] = {
    val pairs = scala.collection.mutable.ArrayBuffer[(Long, Long, Int, Double)]()
    for {
      (_, vs) <- vecs.groupBy(_._2)
      i <- vs.indices
      j <- (i + 1) until vs.length
    } {
      val (ia, la, va) = vs(i); val (ib, _, vb) = vs(j)
      val collide = bandsOf(va, bandWidth).zip(bandsOf(vb, bandWidth))
        .exists { case (x, y) => x == y }
      if (collide) {
        val sim = round6(dot(va, vb) /
          (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb))))
        if (sim >= threshold)
          pairs += ((math.min(ia, ib), math.max(ia, ib), la, sim))
      }
    }
    pairs.toSeq
  }

  test("qe2 banded near-dup pairs match the independent recompute") {
    val expected = expectedPairs(0.35).sortBy(p => (p._1, p._2))
    val got = VectorOps.qe2NearDupPairs(spark, SparkTestSession.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.toSeq == expected)
    // non-vacuous: the banding leaves real survivors at this corpus size,
    // and it genuinely prunes (strict subset of the label-blocked set)
    assert(expected.nonEmpty)
    val unbanded = {
      val pairs = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      for {
        (_, vs) <- vecs.groupBy(_._2)
        i <- vs.indices
        j <- (i + 1) until vs.length
      } {
        val (ia, _, va) = vs(i); val (ib, _, vb) = vs(j)
        val sim = round6(dot(va, vb) /
          (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb))))
        if (sim >= 0.35) pairs += ((math.min(ia, ib), math.max(ia, ib)))
      }
      pairs.toSet
    }
    assert(expected.map(p => (p._1, p._2)).toSet.subsetOf(unbanded))
    assert(expected.size < unbanded.size)
  }

  test("banded pairs under copy-skew: collapsed path is row-identical to the definition") {
    // plant 8 byte-identical copies of each of the first 25 vectors
    // (distinct ids, same label + embedding): the collapse must band and
    // verify only representatives yet emit EXACTLY the pair set the
    // uncollapsed definition yields — cross pairs inherit the rep cosine,
    // intra pairs appear iff the self-cosine passes the threshold
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val base = Tables(spark, SparkTestSession.sfDir, "embeddings")
      .filter(col("vec_id") < 25)
    val planted = (0 until 8).map(k =>
      base.select((col("vec_id") + lit(k * 10000L)).as("vec_id"),
        col("label"), col("embedding"))).reduce(_ unionByName _)
    val got = VectorOps.bandedLabelPairs(planted, threshold = 0.35,
        corpusSize = planted.count())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .sortBy(p => (p._1, p._2)).toSeq

    // independent uncollapsed recompute over the planted rows; the band
    // width uses the PLANTED row count (8 x 25 = 200 -> s = 4)
    val rows = planted.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getSeq[Float](2).map(_.toDouble).toArray))
    val w = bandWidthFor(rows.length.toLong)
    val expected = (for {
      (la, vs) <- rows.groupBy(_._2).toSeq
      i <- vs.indices; j <- (i + 1) until vs.length
      (ia, _, va) = vs(i); (ib, _, vb) = vs(j)
      if bandsOf(va, w).zip(bandsOf(vb, w)).exists { case (x, y) => x == y }
      sim = round6(dot(va, vb) /
        (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb))))
      if sim >= 0.35
    } yield (math.min(ia, ib), math.max(ia, ib), la, sim))
      .sortBy(p => (p._1, p._2))
    assert(got == expected)
    // non-vacuous: the planted copies contribute intra pairs (self-cosine
    // 1.0) AND the collapse had multi-member groups to expand
    assert(expected.count(_._4 == 1.0) >= 25 * 8 * 7 / 2)
  }

  test("qe17 DBSCAN matches an independent union-find recompute") {
    val pairs = expectedPairs(VectorOps.DbscanEps).map(p => (p._1, p._2))
    val nbrs = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (id, ns) => id -> ns.map(_._2).toSet }
    val deg = nbrs.map { case (id, ns) => id -> ns.size.toLong }
    val core = deg.collect {
      case (id, d) if d + 1 >= VectorOps.DbscanMinPts => id
    }.toSet

    // union-find over core-core edges
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    core.foreach(c => parent.getOrElseUpdate(c, c))
    pairs.foreach { case (a, b) =>
      if (core(a) && core(b)) parent(find(a)) = find(b)
    }
    // cluster id = min member id of the component
    val clusterOf = core.groupBy(find).flatMap { case (_, members) =>
      val rep = members.min
      members.map(_ -> rep)
    }

    val expected = vecs.map { case (id, _, _) =>
      val d = deg.getOrElse(id, 0L)
      if (core(id)) (id, "core", Some(clusterOf(id)), d)
      else {
        val coreNbs = nbrs.getOrElse(id, Set.empty).filter(core)
        if (coreNbs.nonEmpty) (id, "border", Some(coreNbs.map(clusterOf).min), d)
        else (id, "noise", None, d)
      }
    }.sortBy(_._1)

    val got = VectorOps.qe17Dbscan(spark, SparkTestSession.sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(3)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"$g vs $e") }
    // the sf0.001 corpus exercises all three roles (non-vacuous)
    assert(Set("core", "border", "noise").subsetOf(got.map(_._2).toSet))
  }
}
