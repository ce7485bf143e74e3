package graft.text

import graft.dedup.SimHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rolling-hash document fingerprinting (winnowing): the local-minimum
  * selection of shingle hashes that guarantees any sufficiently long
  * shared substring between two documents shares at least one selected
  * fingerprint — the standard plagiarism/near-dup sketch when MinHash's
  * whole-document granularity is too coarse.
  *
  * Kernel is pure Scala; gram hashing uses the lower 64 bits of MD5
  * (SimHash.md5Lower64String == DuckDB `md5_number_lower`), which makes
  * the full candidate set — window minima, posting-list pruning, shared
  * counts — reproducible in the SQL oracle. The operator is a narrow
  * per-row map followed by an explode + groupBy — one shuffle, same
  * shape as MinHashLSH's banding.
  */
object Fingerprint {

  /** Winnowing fingerprints of a token sequence: k-gram hashes, then the
    * minimum of each sliding window of w hashes (rightmost minimum on
    * ties), deduplicated by (position, hash). */
  def winnow(toks: Array[String], k: Int, w: Int): Array[Long] = {
    // UNSIGNED comparisons throughout: the hash is the bit pattern of
    // DuckDB's UBIGINT md5_number_lower, and the oracle's window min is
    // unsigned — a signed Long min would pick different fingerprints for
    // hashes with the top bit set.
    if (toks.length < k) return Array.empty
    val grams = Array.tabulate(toks.length - k + 1)(i =>
      SimHash.md5Lower64String(toks.slice(i, i + k).mkString(" ")))
    if (grams.length <= w)
      return Array(grams.reduce((a, b) =>
        if (java.lang.Long.compareUnsigned(a, b) <= 0) a else b))
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var start = 0
    while (start + w <= grams.length) {
      var minIdx = start
      var i = start + 1
      while (i < start + w) {
        // rightmost minimum
        if (java.lang.Long.compareUnsigned(grams(i), grams(minIdx)) <= 0) minIdx = i
        i += 1
      }
      out += grams(minIdx)
      start += 1
    }
    out.toArray
  }

  /** Per-document fingerprint sketch over the corpus: doc_id → selected
    * fingerprints; shared-fingerprint doc pairs are near-dup candidates.
    *
    * Fingerprints occurring in more than `maxDf` documents are dropped
    * before pairing (posting-list pruning): a corpus-common phrase makes
    * its fingerprint's pair list quadratic while carrying no near-dup
    * signal — the same reason search engines cap posting lists. At 100 TB
    * this bound is what keeps the candidate join linear-ish. */
  def fingerprintCandidates(spark: SparkSession, dir: String,
                            k: Int = 3, w: Int = 4, maxDf: Int = 20): DataFrame = {
    import spark.implicits._
    val fps = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) => (id, winnow(text.trim.split("\\s+"), k, w)) }
      .toDF("doc_id", "fps")
    // materialize the skinny (doc_id, fp) posting rows once: the df
    // aggregate, the pruning join, and the pair self-join all consume
    // this subtree, and each would re-run the winnow kernel otherwise
    val exploded = fps.select(col("doc_id"), explode(col("fps")).as("fp"))
      .localCheckpoint(true)
    val rare = exploded.groupBy("fp")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("fp")
    val pruned = exploded.join(rare, "fp")
    val a = pruned.as("a"); val b = pruned.as("b")
    val result = a.join(b,
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= 3)
    // size-gated sort (ScaleTechniques.sortedOutput): single-partition
    // presentation sort only while the candidate set is actually tiny
    graft.plans.ScaleTechniques.sortedOutput(result, Seq("doc_a", "doc_b"))
  }
}
