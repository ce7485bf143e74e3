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
  /** The winnowing face of the exact-duplicate collapse (same move as
    * MinHash/SimHash/SRP): byte-identical texts have identical fingerprint
    * sets, so a B-copy cluster contributes B rows to every shared posting
    * list and B² rows to the pair join. Winnow one REPRESENTATIVE per
    * distinct text; document frequency is the group-size-weighted sum
    * (each member counts), so pruning decisions are bit-identical to the
    * uncollapsed pipeline; expand after the rep-level join — cross pairs
    * inherit the rep pair's shared count (identical fingerprint sets),
    * and each multi-member group emits its intra pairs with its own
    * kept-fingerprint count, subject to the same ≥ 3 floor. */
  def fingerprintCandidates(spark: SparkSession, dir: String,
                            k: Int = 3, w: Int = 4, maxDf: Int = 20): DataFrame = {
    import graft.dedup.Collapse
    import spark.implicits._
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
    // one representative (min doc_id) per distinct text; winnow runs once
    // per distinct text, not once per copy — the shared dedup.Collapse
    // structure, with the text itself riding the group as a first()
    // payload (members are byte-identical) so a B-copy cluster ships one
    // text through the shuffle, not B
    val keyed = docs.map { case (id, text) =>
      (id, graft.dedup.MinHashLSH.textMd5(text), text)
    }.toDF("doc_id", "txt_md5", "text")
    val groups = Collapse.groups(keyed, Seq(col("txt_md5")), col("doc_id"),
      first(col("text")).as("text"))
    val repDocs = groups.select(col("rep").as("doc_id"), col("text"),
      size(col("members")).cast("long").as("gsize"))
    val fps = repDocs.as[(Long, String, Long)]
      .map { case (id, text, gsize) =>
        (id, gsize, winnow(text.trim.split("\\s+"), k, w))
      }
      .toDF("doc_id", "gsize", "fps")
    // materialize the skinny (rep, gsize, fp) posting rows once: the df
    // aggregate, the pruning join, and the pair self-join all consume
    // this subtree, and each would re-run the winnow kernel otherwise
    val exploded = fps.select(col("doc_id"), col("gsize"),
        explode(col("fps")).as("fp"))
      .localCheckpoint(true)
    // weighted df == member-level document frequency
    val rare = exploded.groupBy("fp")
      .agg(sum("gsize").as("df"))
      .filter(col("df") <= maxDf)
      .select("fp")
    val pruned = exploded.join(rare, "fp").select("doc_id", "fp")
    val a = pruned.as("a"); val b = pruned.as("b")
    val repPairs = a.join(b,
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= 3)
    val cross = Collapse.expand(repPairs, Collapse.memRep(groups), "doc_a", "doc_b")
    // intra pairs: identical texts share exactly the group's KEPT
    // fingerprints — emitted only when ≥ 3 survive pruning, same floor
    // as any other pair
    val keptPerRep = pruned.groupBy(col("doc_id").as("rep"))
      .agg(count(lit(1)).as("n_kept"))
      .filter(col("n_kept") >= 3)
    val intra = Collapse.intraPairs(
        groups.select(col("rep"), col("members")).join(keptPerRep, "rep"),
        "doc_a", "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_kept").as("shared_fps"))
    val result = cross.unionByName(intra)
    // size-gated sort (ScaleTechniques.sortedOutput): single-partition
    // presentation sort only while the candidate set is actually tiny
    graft.plans.ScaleTechniques.sortedOutput(result, Seq("doc_a", "doc_b"))
  }
}
