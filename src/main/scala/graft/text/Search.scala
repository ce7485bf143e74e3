package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 ranked full-text search over the documents corpus — the engine
  * internalization of the search capability the reference delegates to
  * Elasticsearch (SURVEY §0: "query capability is delegated to
  * Elasticsearch (… full-text search)"). Standard Okapi BM25
  * (k1 = 1.2, b = 0.75):
  *
  *   score(d, Q) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
  *   idf(t) = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )
  *
  * Plan shape: one explode+groupBy pass builds (doc, term, tf) postings
  * and per-doc lengths; df/idf come from a term-level aggregate of the
  * postings restricted to the (broadcast) query terms, so the heavy
  * per-document side is scanned once and only query-term postings flow
  * into scoring. Scores are rounded to 6 decimals BEFORE ranking so
  * ordering is stable across engines (the per-doc term sum is a ≤|Q|
  * element float sum).
  */
object Search {
  val K1 = 1.2
  val B = 0.75

  def bm25(spark: SparkSession, dir: String, queryTerms: Seq[String],
           topK: Int = 10): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir, "documents")
    val postings = docs
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val docLen = docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("double").as("dl"))
    // corpus statistics (N, avgdl) as ONE broadcast scalar row joined
    // into the plan — the earlier docs.count() + docLen.agg().collect()
    // pair were two extra driver actions, i.e. two additional full
    // corpus scans before the real job even started
    val stats = docLen.agg(
      count(lit(1)).cast("double").as("n"), avg("dl").as("avgdl"))

    val query = queryTerms.toDF("term")
    val qPostings = postings.join(broadcast(query), "term")
    val idf = qPostings.groupBy("term")
      .agg(countDistinct("doc_id").cast("double").as("df"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))

    val scored = qPostings
      .join(broadcast(idf.select("term", "idf", "avgdl")), "term")
      .join(docLen, "doc_id")
      .withColumn("term_score",
        // 2.2/0.25 as literals, not K1+1.0 etc: compile-time double folds
        // can differ from the parsed literal by 1 ULP and break parity
        col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(K1) * (lit(0.25) + lit(B) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(round(sum("term_score"), 6).as("score"),
        count(lit(1)).as("n_terms_matched"))
    // orderBy().limit() compiles to TakeOrderedAndProject (distributed
    // partial top-k, no global sort); the rank window then runs over ≤K
    // rows — never a single-partition window across the corpus
    scored.orderBy(col("score").desc, col("doc_id")).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select("rank", "doc_id", "score", "n_terms_matched")
      .orderBy("rank")
  }

  /** Query entry: a fixed three-term query over the corpus. */
  def qd8Bm25(spark: SparkSession, dir: String): DataFrame =
    bm25(spark, dir, Seq("spark", "query", "window"), topK = 10)
}
