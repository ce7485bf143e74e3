package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    val query = queryTerms.toDF("term")
    // restrict to query terms BELOW the tf aggregate (guide §2.3:
    // aggregate/filter before you shuffle): per-(doc, term) counts are
    // independent, so filtering first computes the identical qPostings
    // while the exchange carries only query-term pairs instead of every
    // distinct (doc_id, term) pair in the corpus — Catalyst cannot push
    // a join through an aggregate on its own
    val qPostings = docs
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
      .join(broadcast(query), "term")
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
    bm25From(qPostings, docLen, stats, topK)
  }

  /** The BM25 scoring tail over pre-built inputs — shared by the batch
    * form above (which derives them from one corpus scan) and the
    * streaming form (`streaming.Replay.streamBm25`, which folds them
    * from per-batch deltas). `qPostings` is (doc_id, term, tf) already
    * restricted to the query terms; `docLen` is (doc_id, dl) covering
    * at least every posting doc; `stats` is one row (n, avgdl) over the
    * FULL corpus. */
  def bm25From(qPostings: DataFrame, docLen: DataFrame, stats: DataFrame,
               topK: Int): DataFrame = {
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

  /** RRF fusion constant (Cormack, Clarke & Buettcher, SIGIR 2009: 60
    * "was chosen during a pilot investigation" and has been the
    * de-facto default in Elasticsearch/OpenSearch hybrid search since). */
  val RrfK = 60.0
  /** Hashed-TF feature dimensionality (the hashing-trick bucket count;
    * same fixed-parameter-count rationale as qd26's DSIR B buckets). */
  val HtfBuckets = 64
  /** Per-side candidate depth fused by RRF. */
  val HybridCandK = 20

  /** Hybrid sparse+dense retrieval with Reciprocal Rank Fusion — the
    * modern two-tower search shape (BM25 lexical ranking fused with a
    * vector-similarity ranking), internalizing what the reference's
    * Elasticsearch tier would do with a `rank: {rrf: …}` query. The
    * dense side derives its vectors IN-QUERY with the hashing trick
    * (Weinberger et al., ICML 2009): each term hashes to one of
    * `HtfBuckets` buckets via the engine's cross-engine md5 hash, a
    * document's vector is its bucket-tf profile, and similarity is
    * cosine — so the operator is self-contained over `documents` and
    * exactly mirrorable in SQL (no trained embedding needed; swapping
    * in a real embedding column only changes the dense-side input).
    *
    *   rrf(d) = Σ_sides 1/(RrfK + rank_side(d)),  missing side → 0
    *
    * Determinism: the dense dot/norms are sums of small INTEGER tf
    * products (≤64 buckets, tf ≤ doc length), exact in double in any
    * order; cosine and the 1/(60+rank) fusion terms are then identical
    * double expressions on both engines; both rankings and the fused
    * ranking round to 6 decimals BEFORE ranking with doc_id
    * tie-breaks.
    *
    * Scale shape: one tokenize pass feeds both sides' per-doc
    * aggregates (Catalyst reuses the scan); the query's ≤|Q| bucket
    * profile broadcasts into the postings join (never a corpus-side
    * shuffle keyed by the query); each side's candidate cut is
    * orderBy().limit() → TakeOrderedAndProject (distributed partial
    * top-k); the fusion join touches 2×candK rows. At 100 TB the only
    * corpus-proportional work is the two skinny per-doc aggregates. */
  def hybridRrf(spark: SparkSession, dir: String, queryTerms: Seq[String],
                candK: Int = HybridCandK, topK: Int = 10): DataFrame = {
    val sparse = bm25(spark, dir, queryTerms, candK)
      .select(col("doc_id"), col("rank").as("sparse_rank"))
    val docs = Tables(spark, dir, "documents")
    // the md5 bucket hash costs ~1µs/token over every token in the
    // corpus; norm + dot would otherwise re-run that subtree, so pin
    // the AGGREGATED frame (≤ docs × buckets rows — tiny) once
    val docTf = docs
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
      .select(col("doc_id"), htfBucket(col("term")).as("bucket"))
      .groupBy("doc_id", "bucket")
      .agg(count(lit(1)).cast("double").as("tf"))
      .localCheckpoint(true)
    // per-doc l2 norm over ALL buckets (≤64 integer squares — exact)
    val docNorm = docTf.groupBy("doc_id")
      .agg(sqrt(sum(col("tf") * col("tf"))).as("dnorm"))
    rrfFuse(sparse,
      denseRanked(spark, docTf, docNorm, queryTerms, candK), topK)
  }

  /** Hashing-trick bucket of a term column (the qd25/qd26 cross-engine
    * md5 hash, domain-tagged). */
  private[graft] def htfBucket(termCol: Column): Column = pmod(
    graft.operators.TextOps.md5Lower64Decimal(concat(lit("htf:"), termCol)),
    lit(HtfBuckets)).cast("int")

  /** The dense-side ranking tail: cosine of the query's bucket profile
    * against per-doc bucket tfs. `docTf` may carry ALL buckets (batch)
    * or only query buckets (the streaming state) — the broadcast qTf
    * join restricts identically; `docNorm` must cover every doc in
    * `docTf`'s query buckets. */
  private[graft] def denseRanked(spark: SparkSession, docTf: DataFrame,
                                 docNorm: DataFrame, queryTerms: Seq[String],
                                 candK: Int): DataFrame = {
    import spark.implicits._
    val qTf = queryTerms.toDF("term")
      .select(htfBucket(col("term")).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).cast("double").as("qtf"))
    val qNorm = qTf.agg(sqrt(sum(col("qtf") * col("qtf"))).as("qnorm"))
    docTf.join(broadcast(qTf), "bucket")
      .groupBy("doc_id").agg(sum(col("tf") * col("qtf")).as("dot"))
      .join(docNorm, "doc_id")
      .crossJoin(broadcast(qNorm))
      .withColumn("cos", round(col("dot") / (col("dnorm") * col("qnorm")), 6))
      .orderBy(col("cos").desc, col("doc_id")).limit(candK)
      .withColumn("dense_rank", row_number().over(
        Window.orderBy(col("cos").desc, col("doc_id"))).cast("long"))
      .select("doc_id", "dense_rank")
  }

  /** Reciprocal-rank fusion of the two candidate rankings. */
  private[graft] def rrfFuse(sparse: DataFrame, dense: DataFrame,
                             topK: Int): DataFrame = {
    val side = (r: Column) =>
      when(r.isNotNull, lit(1.0) / (lit(RrfK) + r)).otherwise(lit(0.0))
    sparse.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf_score",
        round(side(col("sparse_rank")) + side(col("dense_rank")), 6))
      .orderBy(col("rrf_score").desc, col("doc_id")).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf_score").desc, col("doc_id"))).cast("long"))
      .select("rank", "doc_id", "rrf_score", "sparse_rank", "dense_rank")
      .orderBy("rank")
  }

  /** Query entry: the qd8 query fused with its hashed-TF dense twin. */
  def qd40HybridRrf(spark: SparkSession, dir: String): DataFrame =
    hybridRrf(spark, dir, Seq("spark", "query", "window"))

  /** Per-micro-batch BM25 index deltas for the streaming form:
    * (query-term postings, doc lengths of MATCHED docs only, a one-row
    * corpus-stats increment). Docs arrive exactly once, so postings and
    * lengths are append-only facts; the stats row is a sum monoid
    * (n_docs, sum_dl — dl sums are integer-valued doubles, exact in any
    * grouping, so the folded avgdl is bit-equal to the batch `avg`).
    * State stays O(matched docs) + O(1), never corpus-proportional in
    * the doc-length table. Tokenization is byte-identical to `bm25`. */
  def bm25BatchDeltas(batch: DataFrame, queryTerms: Seq[String])
      : (DataFrame, DataFrame, DataFrame) = {
    import batch.sparkSession.implicits._
    val toks = batch.select(col("doc_id"),
      split(trim(col("text")), "\\s+").as("toks"))
    val pt = toks
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .join(broadcast(queryTerms.toDF("term")), "term")
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
      .select("doc_id", "term", "tf")
    val dl = toks
      .select(col("doc_id"), size(col("toks")).cast("double").as("dl"))
      .join(pt.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
    val cs = toks.agg(count(lit(1)).as("n_docs"),
      sum(size(col("toks")).cast("double")).as("sum_dl"))
    (pt, dl, cs)
  }

  /** Per-micro-batch dense-side deltas for the streaming hybrid:
    * (query-bucket doc tfs, l2 norms of MATCHED docs). The norm is
    * over ALL of a doc's buckets, computed inside the batch the doc
    * arrives in (docs arrive whole and once), then only matched docs'
    * rows persist — state O(matched docs), like the sparse side. */
  def htfBatchDeltas(batch: DataFrame, queryTerms: Seq[String])
      : (DataFrame, DataFrame) = {
    import batch.sparkSession.implicits._
    // pinned for the same reason as the batch form: the md5-per-token
    // subtree feeds both the restriction and the norm
    val docTf = batch
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
      .select(col("doc_id"), htfBucket(col("term")).as("bucket"))
      .groupBy("doc_id", "bucket")
      .agg(count(lit(1)).cast("double").as("tf"))
      .localCheckpoint(true)
    val qBuckets = queryTerms.toDF("term")
      .select(htfBucket(col("term")).as("bucket")).distinct()
    val dtQ = docTf.join(broadcast(qBuckets), "bucket")
      .select("doc_id", "bucket", "tf")
    val dn = docTf.groupBy("doc_id")
      .agg(sqrt(sum(col("tf") * col("tf"))).as("dnorm"))
      .join(dtQ.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
    (dtQ, dn)
  }
}
