package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared exact-duplicate collapse skeleton used by every LSH family
  * (MinHash `dedup.MinHashLSH`, SimHash `dedup.SimHash`, SRP
  * `similarity.SrpLsh`, winnowing `text.Fingerprint`, streaming near-dup
  * `streaming.Replay`, clustering `dedup.Clusters`).
  *
  * The failure mode it bounds: identical inputs (web boilerplate,
  * mirrored media) share EVERY LSH bucket, so a B-copy duplicate cluster
  * contributes O(B²) rows to the bucket self-join. The collapse makes
  * candidate generation linear in the cluster size:
  *
  *   1. `groups` — ONE shuffle keyed on an identity digest builds the
  *      whole structure: representative (min id), member list, and any
  *      carried payload (all members share the key, so `first(payload)`
  *      is deterministic);
  *   2. the caller's family-specific pipeline (band → verify) runs over
  *      REPRESENTATIVES only (B² → B);
  *   3. `expand` maps verified rep pairs back to member pairs (members
  *      inherit their representatives' metric — their inputs are
  *      byte-identical to the reps'), and `intraPairs` emits each
  *      multi-member group's internal pairs, whose metric the caller
  *      computes from the group's carried payload.
  *
  * Invariants that live here so every family gets them for free:
  *   - the representative is the group MINIMUM id (so component minima,
  *     least/greatest pair ordering, and cluster labels are unchanged by
  *     the collapse);
  *   - member pairs are emitted id-ordered (a < b), exactly once;
  *   - callers exclude empty/degenerate keys BEFORE grouping (empty
  *     shingle sets verify at 0/0 = NaN, which passes any >= threshold
  *     under NaN-is-greatest — each family applies its own guard).
  */
object Collapse {

  /** ONE shuffle builds the whole collapse structure: group key(s),
    * representative (min id), member id list (bounded by the duplicate
    * cluster size), plus caller-supplied `carry` aggregates (use
    * `first(payload)` — members are byte-identical, so it is
    * deterministic). Eagerly localCheckpointed: the rep pipeline, the
    * expansion, and the intra emission all consume this subtree, and
    * self-joins recompute their common subtree without it. */
  def groups(df: DataFrame, keys: Seq[Column], id: Column, carry: Column*): DataFrame =
    df.groupBy(keys: _*)
      .agg(min(id).as("rep"), collect_list(id).as("members") +: carry: _*)
      .localCheckpoint(true)

  /** Member → representative map from a `groups` frame: skinny (m, rep)
    * rows, one per input row. */
  def memRep(groups: DataFrame): DataFrame =
    groups.select(explode(col("members")).as("m"), col("rep"))

  /** Expand verified representative pairs through two member maps
    * ((m, rep) frames — asymmetric maps support the streaming form, where
    * one side is only the NEW members). `verified` must carry the rep
    * pair in columns `aName`/`bName`; every other column rides along.
    * Output: one id-ordered member pair per (member of a) × (member of b),
    * under the same column names. */
  def expand(verified: DataFrame, memA: DataFrame, memB: DataFrame,
             aName: String, bName: String): DataFrame = {
    val extras = verified.columns.filterNot(c => c == aName || c == bName).map(col)
    verified
      .join(memA.toDF("m_a", aName), aName)
      .join(memB.toDF("m_b", bName), bName)
      .select(least(col("m_a"), col("m_b")).as(aName) +:
        greatest(col("m_a"), col("m_b")).as(bName) +: extras: _*)
  }

  /** Symmetric expansion (the batch form). */
  def expand(verified: DataFrame, mem: DataFrame,
             aName: String, bName: String): DataFrame =
    expand(verified, mem, mem, aName, bName)

  /** Intra-group ordered member pairs of multi-member groups — no join,
    * no shuffle: two nested explodes of the member list (bounded by the
    * duplicate cluster size), keeping each unordered pair once (a < b).
    * Carries every `groups` column except `members` so the caller can
    * compute the pair's metric from the group's key/payload. */
  def intraPairs(groups: DataFrame, aName: String, bName: String): DataFrame = {
    val extras = groups.columns.filterNot(_ == "members").map(col)
    groups
      .filter(size(col("members")) > 1)
      .select(explode(col("members")).as(aName) +: col("members") +: extras: _*)
      .select(col(aName) +: explode(col("members")).as(bName) +: extras: _*)
      .filter(col(aName) < col(bName))
  }
}
