package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding / similarity-search operators over the `embeddings` table
  * (`vec_id bigint, embedding array<float>, label int`).
  *
  * All arithmetic is done in double after an exact float→double widening so
  * the DuckDB oracle (`embedding::DOUBLE[]`) computes bit-compatible values;
  * dot products are sequential left-to-right sums via `aggregate`, and
  * cosines are rounded to 6 decimals before any ranking so ordering is
  * stable across engines.
  *
  * Scale path: the brute-force form is the correctness baseline (its plan is
  * a broadcast of the small query side against a scan of the corpus — no
  * shuffle of the big side). The at-scale ANN variant (cluster-pruned IVF)
  * lives in graft.similarity.Ann and reuses these column builders.
  */
object VectorOps {

  /** embedding column widened to double. */
  def dvec(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential dot product — the codegen'd native expression
    * (graft.functions.DotProduct); bit-identical to the composable
    * `aggregate(zip_with(...))` form it replaced. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.dot(a, b)

  /** Cosine similarity = dot / (|a| * |b|), each norm sqrt'd separately. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosine(a, b)

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")

  /** Brute-force cosine top-k: every query vector (vec_id < 5) against the
    * full corpus. The query side is tiny by construction → broadcast it, so
    * the corpus scan streams once with no shuffle; ranking shuffles only
    * (n_queries × corpus) pre-filtered rows. */
  def qe1KnnBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val corpus = e.select(
      col("vec_id").as("cand_id"), col("label").as("cand_label"),
      col("embedding").as("c_vec"))
    val simCol = round(cosine(col("q_vec"), col("c_vec")), 6).as("sim")
    // deliberate BroadcastNestedLoopJoin: a pure-inequality condition has
    // no equi key, and all-pairs IS the brute-force baseline — the tiny
    // query side broadcasts and the corpus streams once with no shuffle.
    // The scale path with candidate pruning is similarity.Ann (qs4).
    val ranked = broadcast(queries).join(corpus, col("q_id") =!= col("cand_id"))
      .select(col("q_id"), col("cand_id"), col("cand_label"), simCol)
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("sim").desc, col("cand_id"))))
      .filter(col("rank") <= 5)
    ranked.select(col("q_id"), col("rank").cast("long").as("rank"),
        col("cand_id"), col("cand_label"), col("sim"))
      .orderBy("q_id", "rank")
  }

  /** Embedding-cosine near-duplicate pairs: label-blocked self-join (the
    * coarse quantizer — same idea as IVF cell restriction), exact cosine
    * above a high threshold. Threshold compares the *rounded* value so the
    * boundary is identical in the oracle. */
  def qe2NearDupPairs(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val a = e.select(col("vec_id").as("id_a"), col("label"),
      col("embedding").as("vec_a"))
    val b = e.select(col("vec_id").as("id_b"), col("label"),
      col("embedding").as("vec_b"))
    a.join(b, Seq("label"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("label"),
        round(cosine(col("vec_a"), col("vec_b")), 6).as("sim"))
      // threshold calibrated to this corpus: isotropic 64-dim vectors top
      // out near cosine 0.47, so 0.35 yields a real (non-empty) result for
      // the oracle; production near-dup thresholds (≥0.9) live in the
      // SRP-LSH path (qs9), which shares its oracle shape
      .filter(col("sim") >= 0.35)
      .orderBy("id_a", "id_b")
  }

  /** Per-label corpus stats: centroid first component + mean norm — the
    * bookkeeping an IVF index maintains per cell. */
  def qe3LabelStats(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val v = col("embedding")
    e.select(col("label"), element_at(v, 1).cast("double").as("dim1"),
        sqrt(dot(v, v)).as("norm"))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_vecs"),
        round(avg("dim1"), 6).as("dim1_avg"),
        round(avg("norm"), 6).as("norm_avg"))
      .orderBy("label")
  }
}
