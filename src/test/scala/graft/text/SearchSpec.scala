package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SearchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bm25 ranks corpus docs and matches a hand-computed score") {
    val got = Search.bm25(spark, SparkTestSession.sfDir, Seq("spark"), topK = 5)
      .collect()
    assert(got.length == 5)
    // ranks are 1..5, scores non-increasing
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    val scores = got.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // hand-recompute the top doc's score from raw corpus statistics
    import org.apache.spark.sql.functions._
    val docs = graft.Tables(spark, SparkTestSession.sfDir, "documents")
    val n = docs.count().toDouble
    val toks = docs.select(col("doc_id"),
      split(trim(col("text")), "\\s+").as("toks"))
    val withTf = toks.select(col("doc_id"),
      size(filter(col("toks"), t => t === "spark")).cast("double").as("tf"),
      size(col("toks")).cast("double").as("dl"))
    val df = withTf.filter(col("tf") > 0).count().toDouble
    val avgdl = withTf.agg(avg("dl")).collect().head.getDouble(0)
    val topId = got.head.getLong(1)
    val row = withTf.filter(col("doc_id") === topId).collect().head
    val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    val expected = idf * (row.getDouble(1) * 2.2) /
      (row.getDouble(1) + 1.2 * (0.25 + 0.75 * row.getDouble(2) / avgdl))
    assert(math.abs(got.head.getDouble(2) - expected) < 1e-5,
      s"top score ${got.head.getDouble(2)} vs hand-computed $expected")
  }

  test("hybrid RRF matches an independent JVM recompute of dense + fusion") {
    import scala.math.BigDecimal.RoundingMode
    val q = Seq("spark", "query", "window")
    val got = Search.qd40HybridRrf(spark, SparkTestSession.sfDir).collect()
    assert(got.length == 10)
    assert(got.map(_.getLong(0)).toSeq == (1L to 10L))

    // dense side recomputed from raw text with MessageDigest (not the
    // engine's conv/substring expression chain)
    def bucket(t: String): Int =
      (graft.dedup.SimHash.md5Lower64String("htf:" + t) & (Search.HtfBuckets - 1L)).toInt
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, RoundingMode.HALF_UP).toDouble
    val qtf = q.groupBy(bucket).map { case (b, ts) => b -> ts.size.toDouble }
    val qnorm = math.sqrt(qtf.values.map(v => v * v).sum)
    val docs = graft.Tables(spark, SparkTestSession.sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val denseRanked = docs.flatMap { case (id, text) =>
      val tf = text.trim.split("\\s+").groupBy(bucket)
        .map { case (b, ts) => b -> ts.size.toDouble }
      val dot = qtf.map { case (b, qv) => tf.getOrElse(b, 0.0) * qv }.sum
      // inner join on bucket: docs with no query-bucket term never enter
      if (qtf.keys.exists(tf.contains))
        Some(id -> round6(dot / (math.sqrt(tf.values.map(v => v * v).sum) * qnorm)))
      else None
    }.sortBy { case (id, cos) => (-cos, id) }.take(Search.HybridCandK)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap

    // sparse side from the already-spec'd bm25 at candidate depth
    val sparseRanked = Search.bm25(spark, SparkTestSession.sfDir, q, Search.HybridCandK)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap

    val fused = (sparseRanked.keySet ++ denseRanked.keySet).toSeq.map { id =>
      val rrf = round6(
        sparseRanked.get(id).map(r => 1.0 / (Search.RrfK + r)).getOrElse(0.0) +
        denseRanked.get(id).map(r => 1.0 / (Search.RrfK + r)).getOrElse(0.0))
      (id, rrf)
    }.sortBy { case (id, rrf) => (-rrf, id) }.take(10)

    got.zip(fused).foreach { case (row, (id, rrf)) =>
      assert(row.getLong(1) == id, s"doc order: ${row.getLong(1)} vs $id")
      assert(math.abs(row.getDouble(2) - rrf) < 1e-9)
      assert(Option(row.get(3)).map(_.asInstanceOf[Long]) == sparseRanked.get(id))
      assert(Option(row.get(4)).map(_.asInstanceOf[Long]) == denseRanked.get(id))
    }
  }

  test("multi-term queries reward docs matching more terms") {
    val multi = Search.bm25(spark, SparkTestSession.sfDir,
      Seq("spark", "query", "window"), topK = 10).collect()
    assert(multi.nonEmpty)
    // the top result matches at least two of the three terms
    assert(multi.head.getAs[Long]("n_terms_matched") >= 2)
  }
}
