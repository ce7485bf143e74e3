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
    * Integer-count ratio → bit-exact across engines. For pre-sorted
    * arrays prefer the allocation-free functions.SetFunctions form. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  // NOTE: an expression-tree shingle builder used to live here; it was
  // removed after measurement — Catalyst's projection collapse re-inlines
  // the tokenizer under every consumer (40× slower than the typed-map
  // kernels in dedup.MinHashLSH / text.Fingerprint that replaced it).
}
