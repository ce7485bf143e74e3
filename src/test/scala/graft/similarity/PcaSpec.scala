package graft.similarity

import graft.{SparkTestSession, Tables}
import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Integer-micro quantization with the engines' HALF_UP (away from
    * zero) tie behavior — `math.round` rounds ties toward +∞ instead. */
  private def quant(v: Double): Long =
    BigDecimal(v * Pca.Micro)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong

  private def corpus(): Array[Array[Long]] =
    Tables(spark, SparkTestSession.sfDir, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0)
        .map(f => quant(f.toDouble)).toArray)

  private def secondMoment(vs: Array[Array[Long]]): Array[Long] = {
    val d = Pca.Dim
    val c = new Array[Long](d * d)
    vs.foreach { v =>
      for (i <- 0 until d; j <- 0 until d) c(i * d + j) += v(i) * v(j)
    }
    c
  }

  test("power iteration converges to an eigenvector of the second moment") {
    val c = secondMoment(corpus())
    val x = Pca.powerIterate(c, Pca.Dim, Pca.Iters)
    val d = Pca.Dim
    // Rayleigh quotient and eigen-residual ||Cx - λx|| / λ
    val cx = (0 until d).map { i =>
      (0 until d).map(j => c(i * d + j).toDouble * x(j)).sum
    }.toArray
    val lambda = (0 until d).map(i => x(i) * cx(i)).sum
    assert(lambda > 0.0)
    val resid = math.sqrt((0 until d).map(i => {
      val r = cx(i) - lambda * x(i); r * r
    }).sum) / lambda
    assert(resid < 5e-3, s"eigen-residual $resid")
    assert(math.abs((0 until d).map(i => x(i) * x(i)).sum - 1.0) < 1e-12)
  }

  test("dominant direction beats every coordinate axis on captured energy") {
    val c = secondMoment(corpus())
    val x = Pca.powerIterate(c, Pca.Dim, Pca.Iters)
    val d = Pca.Dim
    // energy along u is u^T C u; along axis k it is C_kk
    val cx = (0 until d).map { i =>
      (0 until d).map(j => c(i * d + j).toDouble * x(j)).sum
    }
    val along = (0 until d).map(i => x(i) * cx(i)).sum
    val maxAxis = (0 until d).map(k => c(k * d + k).toDouble).max
    assert(along >= maxAxis, s"pc energy $along < best axis $maxAxis")
  }

  test("embedding drift stays quiet on clean data, alarms on a planted shift") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    // clean corpus: no window's displacement crosses the bar
    val clean = Pca.qe21EmbeddingDrift(spark, SparkTestSession.sfDir).collect()
    assert(clean.nonEmpty)
    assert(clean.forall(!_.getBoolean(3)), "clean corpus alarmed")
    // independent recompute of one window's d2 from raw vectors
    val vs = graft.Tables(spark, SparkTestSession.sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(f => quant(f.toDouble)).toArray))
    def truncDiv(s: Long, n: Long): Long = s / n // JVM long division truncates
    val ls = Array.tabulate(Pca.Dim)(i => vs.map(_._2(i)).sum)
    val ln = vs.length.toLong
    val w0 = vs.filter(_._1 / Pca.DriftSpan == 0L)
    val d2 = (0 until Pca.Dim).map { i =>
      val dm = truncDiv(w0.map(_._2(i)).sum, w0.length.toLong) - truncDiv(ls(i), ln)
      dm * dm
    }.sum
    assert(clean.find(_.getLong(0) == 0L).get.getLong(2) == d2)
    // planted regression: shift every window-2 vector by +0.05/dim —
    // a small real embedding-model drift — and only that window alarms
    val planted = graft.Tables(spark, SparkTestSession.sfDir, "embeddings")
      .select(col("vec_id"), col("label"),
        when(expr(s"vec_id div ${Pca.DriftSpan}") === 2L,
          transform(col("embedding"), v => v + lit(0.05f)))
          .otherwise(col("embedding")).as("embedding"))
    val shifted = Pca.embDriftReport(
      Pca.embDriftSums(Pca.quantized(planted), Pca.DriftSpan),
      Pca.DriftD2Alarm).collect()
    assert(shifted.filter(_.getBoolean(3)).map(_.getLong(0)).toSeq == Seq(2L),
      s"expected exactly window 2 to alarm: ${shifted.mkString(",")}")
  }

  test("qe18 projections equal a direct recompute on the driver") {
    val vs = Tables(spark, SparkTestSession.sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(f => quant(f.toDouble)).toArray))
    val c = secondMoment(vs.map(_._2))
    val x = Pca.powerIterate(c, Pca.Dim, Pca.Iters)
    def round6(v: Double) =
      BigDecimal(v).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = vs.map { case (id, vi) =>
      var s = 0.0; var i = 0
      while (i < Pca.Dim) { s += vi(i).toDouble * x(i); i += 1 }
      id -> round6(s / Pca.Micro)
    }.toMap
    val got = Pca.qe18PcaPower(spark, SparkTestSession.sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.size == expected.size)
    got.foreach { case (id, p) =>
      assert(math.abs(p - expected(id)) < 1e-9, s"vec $id: $p vs ${expected(id)}")
    }
  }
}
