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

  test("multi-term queries reward docs matching more terms") {
    val multi = Search.bm25(spark, SparkTestSession.sfDir,
      Seq("spark", "query", "window"), topK = 10).collect()
    assert(multi.nonEmpty)
    // the top result matches at least two of the three terms
    assert(multi.head.getAs[Long]("n_terms_matched") >= 2)
  }
}
