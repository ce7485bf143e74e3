package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column builders for tokenization, shingling, and hashing — the
  * building blocks of the dedup family. Everything here is a pure Catalyst
  * expression tree (codegen'd, no UDFs), so it stays inside whole-stage
  * codegen in the hot path of a 100 TB scan.
  */
object TextFeatures {

  /** Whitespace tokens of a trimmed text column. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct token set (for set-similarity measures). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Exact token-set Jaccard similarity of two token-set columns.
    * Integer-count ratio → bit-exact across engines. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** n-word shingles ("w1 w2 w3") of a text column. Empty array when the
    * document has fewer than n tokens (sequence() would otherwise count
    * *down* and produce garbage indices). */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val starts = when(size(toks) >= n, sequence(lit(0), size(toks) - n))
      .otherwise(array())
    transform(starts, i =>
      concat_ws(" ", (1 to n).map(k => element_at(toks, i + k)): _*))
  }

  /** Shingle hashes folded into [0, p): pmod(xxhash64(shingle), p). */
  def shingleHashes(text: Column, n: Int, p: Long): Column =
    transform(shingles(text, n), s => pmod(xxhash64(s), lit(p)))
}
