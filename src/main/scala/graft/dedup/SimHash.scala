package graft.dedup

import graft.Tables
import graft.text.TextFeatures.tokens
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection: 64-bit per-document fingerprint whose
  * Hamming distance tracks document similarity.
  *
  * The fingerprint is computed in a typed `Dataset.map` with a pure Scala
  * kernel (tested independently); tokens are hashed with the lower 64 bits
  * of MD5 — bit-identical to DuckDB's `md5_number_lower` — so the ENTIRE
  * pipeline (token hash → bit votes → fingerprint → Hamming pairs) is
  * reproducible in the SQL oracle. The pigeonhole candidate step is exact
  * (every pair at distance ≤ 3 shares a whole chunk), so the output is
  * fully deterministic given the hash, and the hash is SQL-expressible:
  * that is what upgrades this operator from rows-only to oracle-checked.
  *
  * Pair search uses the pigeonhole banding trick: split 64 bits into 4
  * 16-bit chunks — any pair with Hamming distance ≤ 3 must agree on at
  * least one whole chunk. One shuffle on (chunk_idx, chunk_value), then
  * exact Hamming verification with bit_count(xor) — same
  * candidates-then-verify shape as MinHashLSH, same scale behavior.
  */
object SimHash {

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Lower 64 bits of MD5: digest bytes 8..15 little-endian — matches
    * DuckDB `md5_number_lower` bit-for-bit (verified against 1.0.0). */
  def md5Lower64String(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(d, 8, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
  }

  /** Pure kernel: 64-bit SimHash of a token sequence. */
  def simhash64(toks: Seq[String]): Long = {
    val acc = new Array[Int](64)
    toks.foreach { t =>
      val h = md5Lower64String(t)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) acc(k) += 1 else acc(k) -= 1
        k += 1
      }
    }
    var sig = 0L
    var k = 0
    while (k < 64) { if (acc(k) > 0) sig |= (1L << k); k += 1 }
    sig
  }

  /** Same xxhash64 (seed 42) as the SQL `xxhash64` function. */
  def xxhash64String(s: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType, 42L)

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** doc_id → simhash fingerprint. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .as[(Long, Seq[String])]
      .map { case (id, toks) => (id, simhash64(toks)) }
      .toDF("doc_id", "simhash")
  }

  /** Near-dup pairs with Hamming distance ≤ maxDist. The 4-chunk pigeonhole
    * only guarantees a whole-chunk agreement for distance ≤ 3 (d+1 chunks
    * cover distance d), so larger distances would silently lose recall —
    * rejected up front. */
  def nearDups(spark: SparkSession, dir: String, maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      s"4-chunk pigeonhole guarantees recall only for maxDist <= 3, got $maxDist")
    // Collapse identical FINGERPRINTS before the chunk join (the SimHash
    // face of the LSH hot-bucket failure mode, via the shared
    // dedup.Collapse skeleton): a B-copy boilerplate cluster shares all 4
    // chunks, contributing ~4·B² rows to the self-join. Chunk one
    // representative per distinct fingerprint (B² → B), then expand —
    // members inherit their representatives' Hamming distance exactly
    // (identical fingerprints ⇒ identical XOR), and intra-group pairs are
    // distance 0, always ≤ maxDist. Output is row-identical to the
    // uncollapsed join (10× soak: qs2 27 s → ~1 s).
    val groups = Collapse.groups(fingerprints(spark, dir),
      Seq(col("simhash")), col("doc_id"))
    val chunked = groups.select(col("rep").as("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(i =>
          shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
          .as(Seq("chunk_idx", "chunk_val")))
    val a = chunked.as("a"); val b = chunked.as("b")
    val verified = a.join(b,
        col("a.chunk_idx") === col("b.chunk_idx") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
    val cross = Collapse.expand(verified, Collapse.memRep(groups), "doc_a", "doc_b")
    val intra = Collapse.intraPairs(groups, "doc_a", "doc_b")
      .select(col("doc_a"), col("doc_b"), lit(0L).as("hamming"))
    cross.unionByName(intra)
      .orderBy("doc_a", "doc_b")
  }
}
