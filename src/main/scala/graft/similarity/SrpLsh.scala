package graft.similarity

import graft.Tables
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sign-random-projection (SRP) LSH for embedding near-duplicates — the
  * seeded-random-hyperplane path next to the coordinate-plane banded join
  * (operators.VectorOps.bandedLabelPairs, qe2) and IVF (similarity.Ann).
  *
  * Each of L tables hashes a vector to a b-bit bucket: bit i is the sign
  * of the dot product with a seeded random hyperplane. Collision
  * probability per bit is 1 − θ/π (θ = angle), so near-parallel vectors
  * collide in some table with probability ≥ 1 − (1 − (1−θ/π)^b)^L —
  * at cosine ≥ 0.95, b = 8, L = 8 that is ≈ 0.99 — while random pairs
  * (cos ≈ 0) collide at ≈ (1/2)^b per table, keeping candidates ~linear.
  * Candidates are verified with exact cosine (codegen dot product), so
  * precision is 1.0.
  *
  * All hashing is Catalyst expressions over broadcast literal
  * hyperplanes — the signature computation stays in whole-stage codegen;
  * the only shuffle is the (table, bucket) collision groupBy.
  */
object SrpLsh {

  /** Seeded random hyperplanes: L tables × b planes × dim components. */
  def hyperplanes(dim: Int, bits: Int, tables: Int, seed: Long = 42L): IndexedSeq[IndexedSeq[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    IndexedSeq.fill(tables)(IndexedSeq.fill(bits)(Array.fill(dim)(rnd.nextGaussian())))
  }

  /** Bucket width matched to the corpus size: b ≈ ⌊log2 n⌋ − 2, clamped
    * to [8, 20]. Random pairs (cos ≈ 0) collide per table with
    * probability 2^−b, so expected bucket-join candidates are
    * ~L·n²/2^b — with b ≈ log2(n) − 2 that is ~4·L·n, LINEAR in the
    * corpus; a fixed b is quadratic (the full-suite sf1 soak measured
    * qs9 at 178 s with b = 8 before this). The price is recall on
    * threshold-grazing pairs (per-bit collision 1 − θ/π): at the
    * planted-oracle cosine 0.9986, miss probability per pair is
    * (1 − 0.983^b)^8 — 7e−8 at b = 8 (the sf0.01 driver gate lands
    * there, keeping the correctness run deterministic in practice) and
    * ~6e−6 at b = 13 (sf1 bench scale); pairs exactly AT 0.95 see the
    * standard LSH S-curve decay, the documented approximation trade of
    * width-vs-recall every production SRP index makes. */
  def adaptiveBits(n: Long): Int = clampedLogWidth(n, offset = 2, lo = 8, hi = 20)

  /** Shared clamped-log bucket-width policy: ⌊log2 n⌋ − offset in [lo, hi].
    * Kept in one place so the SRP table width and SemDedup's sub-bucket
    * width (and their in-SQL mirror, length(bin(n)) − 1 − offset) cannot
    * drift apart. */
  private[similarity] def clampedLogWidth(n: Long, offset: Int, lo: Int, hi: Int): Int = {
    val lg = 63 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n))
    math.min(hi, math.max(lo, lg - offset))
  }

  /** b-bit bucket id of an embedding column for one table's planes
    * (reference form — the fused graft_srp_buckets expression computes
    * all tables at once and is bit-identical; spec-checked). */
  def bucket(vec: Column, planes: IndexedSeq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(VectorFunctions.dot(vec, typedlit(p.toSeq)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Candidate pairs (id_a < id_b, with both vectors carried) via
    * multi-table SRP bucket collisions. Bucket hashing runs in ONE
    * codegen'd pass over the vector per table set
    * (functions.SrpBucketHashes) instead of tables×bits separate dot
    * expressions per row.
    *
    * SHUFFLE SHAPE (r17): the bucket self-join and the pair dedup move
    * SKINNY (table, bucket, id) / (id_a, id_b) rows only; the vectors
    * are re-attached AFTER the distinct, so the wide rows are born in
    * the verify stage and never cross an exchange. The previous form
    * carried both 64-dim double vectors through the self-join AND the
    * dedup — ~2×520 bytes on every one of the ~4·L·n candidate rows
    * (≈20 GB of shuffle at sf10) where the ids cost 16 bytes; measured
    * isolated 3-pass medians moved 78.3 → 21.7 s at sf10 and 2.3 →
    * 1.8 s at sf0.1, turning a 23× decade ratio into ~5×. (sf1 pays
    * ~+1 s for the two extra join stages — the right trade: the saving
    * scales with candidate volume, the cost is fixed.) Same at-scale
    * rationale as MinHashLSH's skinny band join.
    *
    * `emb` is referenced three times (bucket explode + both re-attach
    * sides). On the nearDups path that is NOT a triple recompute of the
    * collapse: `Collapse.groups` is eagerly localCheckpointed, so the
    * extra references re-read materialized blocks through a cheap
    * projection. A DIRECT caller passing an expensive uncached frame
    * pays the recompute — persist upstream in that case; an
    * unconditional persist here would duplicate the collapse's
    * checkpoint storage (corpus × vector width) for the common path. */
  def candidatePairs(emb: DataFrame, bits: Int = 8, tables: Int = 8,
                     dim: Int = 64): DataFrame = {
    val planes = hyperplanes(dim, bits, tables)
    val buckets = emb.select(col("vec_id"),
      posexplode(graft.functions.SrpFunctions
          .srpBuckets(emb.sparkSession, col("embedding"), planes))
        .as(Seq("table_idx", "bucket")))
    val a = buckets.as("a"); val b = buckets.as("b")
    val pairs = a.join(b,
        col("a.table_idx") === col("b.table_idx") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    val va = emb.select(col("vec_id").as("id_a"), col("embedding").as("vec_a"))
    val vb = emb.select(col("vec_id").as("id_b"), col("embedding").as("vec_b"))
    pairs.join(va, "id_a").join(vb, "id_b")
      .select(col("id_a"), col("id_b"), col("vec_a"), col("vec_b"))
  }

  /** Near-dup pairs (id_a < id_b) with exact cosine ≥ threshold, found
    * via multi-table SRP bucket collisions — with the shared
    * exact-duplicate collapse (`dedup.Collapse`): byte-identical vectors
    * share every bucket in every table, so a B-copy embedding (mirrored
    * media, re-crawled pages) contributes ~tables·B² candidate rows to the
    * bucket self-join. Instead: collapse to one representative per
    * DISTINCT vector, bucket only representatives (B² → B), verify with
    * exact cosine, expand back — row-identical to the uncollapsed join
    * (spec-asserted on a planted 10-copy corpus).
    *
    * The collapse is keyed on a 128-bit DIGEST of the vector — two
    * independent xxhash64s (distinct constant-seed leading args) — not the
    * raw `array<double>`: the group shuffle and both expansion joins move
    * 16-byte keys and skinny (m, rep) rows instead of ~512-byte arrays,
    * ~8× fewer shuffle bytes; the vector itself rides the group only as a
    * `first()` payload (members are byte-identical), partial-aggregated
    * map-side so a B-copy cluster ships one vector, not B. */
  def nearDups(emb: DataFrame, threshold: Double,
               bits: Int = 8, tables: Int = 8, dim: Int = 64): DataFrame = {
    import graft.dedup.Collapse
    val keyed = emb.select(col("vec_id"), col("embedding"),
      xxhash64(lit(1), col("embedding")).as("k1"),
      xxhash64(lit(2), col("embedding")).as("k2"))
    val groups = Collapse.groups(keyed, Seq(col("k1"), col("k2")), col("vec_id"),
      first(col("embedding")).as("embedding"))
    val reps = groups.select(col("rep").as("vec_id"), col("embedding"))
    val verified = candidatePairs(reps, bits, tables, dim)
      .select(col("id_a"), col("id_b"),
        round(VectorFunctions.cosine(col("vec_a"), col("vec_b")), 6).as("sim"))
      .filter(col("sim") >= threshold)
    val cross = Collapse.expand(verified, Collapse.memRep(groups), "id_a", "id_b")
    // intra-group pairs: byte-identical vectors; compute the cosine rather
    // than assume 1.0 so degenerate inputs (zero vectors → NaN) behave
    // exactly as the uncollapsed join did
    val intra = Collapse.intraPairs(groups, "id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        round(VectorFunctions.cosine(col("embedding"), col("embedding")), 6)
          .as("sim"))
      .filter(col("sim") >= threshold)
    val result = cross.unionByName(intra)
    // size-gated sort: near-dup pair sets grow with the corpus — never
    // assume they stay one-partition small
    graft.plans.ScaleTechniques.sortedOutput(result, Seq("id_a", "id_b"))
  }

  /** Corpus entry point: embedding near-dups at cosine ≥ 0.95 over the
    * corpus UNION a derived perturbed copy. The raw isotropic corpus has
    * no pairs at this threshold (max pairwise cosine ≈ 0.7 at 64 dims),
    * which made the oracle vacuously empty — so the query plants its own
    * ground truth deterministically: each vector blended with its
    * successor, `w_i = 0.95·v_i + 0.05·v_{i+1}`, sits at cosine ≈ 0.9986
    * to `v_i` while every other pairing stays ≈ 0. The blend is pure
    * double arithmetic, so the DuckDB oracle reproduces it bit-exactly
    * and the expected output is exactly the n−1 planted pairs. Bucket
    * width is size-matched via `adaptiveBits` (see its scaladoc for the
    * width-vs-recall numbers): the sf0.01 oracle gate lands at b = 8,
    * where the per-pair miss probability (1−0.983^8)^8 ≈ 7e-8 keeps the
    * correctness run deterministic in practice; larger corpora trade a
    * little recall for linear candidates. */
  def qs9NearDups(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val successors = e.select((col("vec_id") - 1).as("vec_id"),
      col("embedding").as("next_emb"))
    val perturbed = e.join(successors, "vec_id")
      .select((col("vec_id") + 100000L).as("vec_id"),
        zip_with(col("embedding"), col("next_emb"),
          (x, y) => lit(0.95) * x + lit(0.05) * y).as("embedding"))
    // corpus ∪ perturbed copy has 2n − 1 vectors; one cheap count picks
    // the size-matched bucket width (see adaptiveBits)
    val n = 2L * e.count() - 1L
    nearDups(e.unionAll(perturbed), threshold = 0.95, bits = adaptiveBits(n))
  }
}
