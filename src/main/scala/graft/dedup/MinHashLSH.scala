package graft.dedup

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection over the `documents` table —
  * the at-scale generalization of the banded exact-Jaccard join
  * (operators.TextOps.qd6NgramJaccard).
  *
  * Pipeline:
  *   1. one narrow pass per document computes 3-word shingles, their
  *      xxhash64 values folded into [0, P) (P = 2^31-1), the 64-permutation
  *      MinHash signature h_i(x) = (a_i·x + b_i) mod P, and 16 band hashes
  *      (4 rows per band). This runs as a typed `map` with a plain-Scala
  *      kernel: a pure-expression form re-inlines the tokenizer under each
  *      of the 64 permutations once Catalyst collapses projections —
  *      measured 40× slower. The kernel is O(tokens + 64·shingles) per doc
  *      and keeps the scan a single pass, which is what matters at 100 TB;
  *   2. explode the 16 band hashes → ONE shuffle on (band_idx, band_hash)
  *      to find colliding docs. Shuffle volume is 16 skinny rows per doc,
  *      independent of document length;
  *   3. verify candidates with *exact* shingle-set Jaccard (the quantity
  *      MinHash estimates): precision 1.0; recall follows the S-curve
  *      P(candidate | s) = 1-(1-s^4)^16 ≥ 0.9998 at s = 0.8, so at the 0.8
  *      threshold the output equals the exact all-pairs answer (which is
  *      the DuckDB oracle for qs1).
  */
object MinHashLSH {
  val Prime: Long = 2147483647L // 2^31 - 1
  val NumHashes = 64
  val BandSize = 4
  val NumBands: Int = NumHashes / BandSize
  val ShingleSize = 3

  /** Deterministic permutation parameters (seed fixed for reproducibility —
    * same philosophy as the reference pinning KMeans behavior, SURVEY §7). */
  val params: IndexedSeq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    IndexedSeq.fill(NumHashes)(
      (1L + rnd.nextInt(Int.MaxValue - 1).toLong, rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Pure kernel: distinct shingle set of a document, sorted so the
    * verify-phase Jaccard can use the allocation-free merge kernel
    * (functions.SortedOverlapCount).
    *
    * The sort MUST use UTF-8 byte order (`UTF8String` binary compare), not
    * Java's UTF-16 code-unit order: the merge walk compares `UTF8String`s,
    * and the two collations disagree for supplementary-plane characters
    * (emoji) vs U+E000–U+FFFF — a UTF-16 sort would silently undercount
    * the intersection on such text. */
  def shingleSet(text: String): Array[String] = {
    val toks = text.trim.split("\\s+")
    if (toks.length < ShingleSize) Array.empty
    else {
      Array.tabulate(toks.length - ShingleSize + 1)(i =>
        s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").distinct
        .map(org.apache.spark.unsafe.types.UTF8String.fromString)
        .sorted
        .map(_.toString)
    }
  }

  /** Pure kernel: 16 band hashes of the 64-element MinHash signature. */
  def bandHashes(sh: Array[String]): Array[Long] = {
    val hashes = sh.map(s => {
      val h = SimHash.xxhash64String(s) % Prime
      if (h < 0) h + Prime else h
    })
    val sig = Array.tabulate(NumHashes) { i =>
      val (a, b) = params(i)
      var m = Long.MaxValue
      var j = 0
      while (j < hashes.length) {
        val v = (a * hashes(j) + b) % Prime
        if (v < m) m = v
        j += 1
      }
      m
    }
    Array.tabulate(NumBands) { bnd =>
      // deterministic ordered mix of the band's 4 signature values
      var acc = 1125899906842597L
      var j = bnd * BandSize
      while (j < (bnd + 1) * BandSize) { acc = acc * 31 + sig(j); j += 1 }
      acc
    }
  }

  /** Pure kernel: lowercase-hex MD5 of the document text (exact-dup
    * group key — identical bytes, identical signature). */
  def textMd5(text: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xFF}%02x"))
    sb.toString
  }

  /** One narrow pass: doc_id → (text md5, shingle set, band hashes). */
  def docSignatures(spark: SparkSession, docs: DataFrame): Dataset[(Long, String, Array[String], Array[Long])] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val sh = shingleSet(text)
        (id, textMd5(text), sh, bandHashes(sh))
      }
  }

  // The O(tokens + 64·shingles) signature kernel is the expensive pass,
  // and three consumers reuse its output inside one query (band join +
  // two verify joins) while q33/qd10 re-derive the whole pair graph on
  // top of qs1's. Memoize BOTH per (session, corpus): the signature scan
  // runs once per corpus per session and the verified pair graph is
  // shared by qs1 / q33 / qd10 instead of being recomputed three times.
  // (At 100 TB the equivalent move is materializing the signature and
  // pair tables; a session-scoped persist is the single-job analog.)
  // Keyed on the session OBJECT (not an identity hash, which the JVM can
  // reuse after GC and hand a new session a dead-context DataFrame).
  // NOTE the retention contract: cached DataFrames reference their own
  // session, so an entry is NOT reclaimable while it exists (WeakHashMap
  // values must not strongly refer to their keys) — callers disposing a
  // session should clearCache(). Within the driver contract (one session
  // per Verify/Bench JVM) nothing accumulates.
  private val cache = new java.util.WeakHashMap[
    SparkSession, java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  private def perSession(spark: SparkSession) = cache.synchronized {
    var m = cache.get(spark)
    if (m == null) {
      m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
      cache.put(spark, m)
    }
    m
  }

  /** Memo key for a corpus dir: canonical path + contents fingerprint
    * (file list, sizes, mtimes — `Tables.contentKey`), so the same corpus
    * reached via different path spellings hits ONE entry and a corpus
    * rewritten IN PLACE mid-session misses the stale entry and rebuilds
    * (spec-asserted). The superseded entry stays persisted until
    * `clearCache()` — acceptable for the rewrite-mid-session edge; the
    * bench clears between passes. */
  private def canonDir(dir: String): String = graft.Tables.contentKey(dir)

  /** Memoized, persisted signature table for a corpus. */
  def signatures(spark: SparkSession, dir: String): DataFrame =
    perSession(spark).computeIfAbsent(s"sig|${canonDir(dir)}", _ =>
      docSignatures(spark, Tables(spark, dir, "documents"))
        .toDF("doc_id", "txt_md5", "sh", "bands")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Drop all memoized signature/pair state (test hygiene). */
  def clearCache(): Unit = cache.synchronized {
    cache.values.forEach { m =>
      m.values.forEach(df => { df.unpersist(); () })
      m.clear()
    }
    cache.clear()
  }

  /** Candidate pairs (doc_a < doc_b) via band-bucket collision.
    *
    * Docs with an EMPTY shingle set (< 3 tokens) never band: `bands` is
    * always 16 elements, and for an empty signature every slot is the
    * constant mix of Long.MaxValue — all such docs would collide in every
    * band and then "verify" at 0/0 = NaN Jaccard, which passes any
    * threshold under Spark's NaN-is-greatest comparison. The oracle (and
    * the exact all-pairs reference) requires both shingle sets non-empty,
    * so they are excluded at the source. */
  def candidatePairs(sigs: DataFrame): DataFrame = {
    val exploded = sigs
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    val a = exploded.as("a"); val b = exploded.as("b")
    a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Verified near-dup pairs from a signature table, with the exact-dup
    * collapse that bounds LSH hot buckets (VERDICT r2 "What's wrong" #2):
    * identical texts share ALL 16 band hashes, so a B-document exact-dup
    * cluster would contribute ~16·B² rows to the band self-join — the
    * classic LSH failure mode on web boilerplate. Instead:
    *
    *   1. collapse docs to one REPRESENTATIVE per distinct text
    *      (min doc_id per text-md5 group) and band only representatives —
    *      band buckets now see each text once (B² → B);
    *   2. verify representative candidates with exact shingle-set Jaccard
    *      (integer-count ratio → bit-exact vs the oracle);
    *   3. expand back: members of two matched groups inherit the
    *      representative pair's jaccard (their texts are byte-identical to
    *      the representatives'), and each multi-member group emits its
    *      intra-group pairs directly with jaccard 1.0 (identical non-empty
    *      shingle sets) — exactly the rows the uncollapsed join produced.
    *
    * Output is row-identical to the naive pipeline: candidate collision,
    * verification threshold, and jaccard values are all preserved
    * (DedupSpec asserts equality, including on a planted 150-copy doc). */
  def pairsFromSigs(sigs: DataFrame, threshold: Double): DataFrame = {
    // empty shingle sets (< 3 tokens) are excluded BEFORE grouping: they
    // never band, never pair, and 0/0 Jaccard is undefined (NaN would pass
    // any >= threshold) — same exclusion the uncollapsed join applied
    val groups = Collapse.groups(sigs.filter(size(col("sh")) > 0),
      Seq(col("txt_md5")), col("doc_id"),
      first(col("sh")).as("sh"), first(col("bands")).as("bands"))
    val repSigs = groups.select(col("rep").as("doc_id"), col("sh"), col("bands"))
    val sh = repSigs.select(col("doc_id"), col("sh"))
    val overlap = graft.functions.SetFunctions
      .sortedOverlap(col("sh_a"), col("sh_b"))
    val verified = candidatePairs(repSigs)
      .join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
      .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (overlap.cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - overlap).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
    val cross = Collapse.expand(verified, Collapse.memRep(groups), "doc_a", "doc_b")
    // intra-group pairs: identical non-empty texts, jaccard exactly 1.0 —
    // which passes the threshold filter iff threshold ≤ 1
    val intra = Collapse.intraPairs(groups, "doc_a", "doc_b")
      .select(col("doc_a"), col("doc_b"), lit(1.0).as("jaccard"))
      .filter(lit(1.0) >= threshold)
    cross.unionByName(intra)
  }

  /** Full near-dup query: LSH candidates verified with exact shingle-set
    * Jaccard. Memoized per (session, canonical corpus dir, threshold) —
    * see the cache + staleness notes above. */
  def nearDups(spark: SparkSession, dir: String, threshold: Double = 0.8): DataFrame = {
    // resolve signatures BEFORE entering computeIfAbsent: a nested
    // computeIfAbsent on the same ConcurrentHashMap is a recursive-update
    // violation (IllegalStateException when the two keys share a bin)
    val sigs = signatures(spark, dir)
    perSession(spark).computeIfAbsent(s"pairs|${canonDir(dir)}|$threshold", _ =>
      pairsFromSigs(sigs, threshold)
        .orderBy("doc_a", "doc_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }
}
