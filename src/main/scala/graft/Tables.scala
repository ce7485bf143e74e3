package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All engine operators read through here so that source-level concerns
  * (nanosecond-timestamp normalization, column pruning, partition sizing)
  * are handled in exactly one place.
  *
  * Scale note: at 100 TB these reads become distributed parquet scans;
  * nothing here collects to the driver. Filter/projection pushdown is
  * preserved because we return the raw `DataFrame` lazily.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    if (name == "events") readEvents(spark, path)
    else spark.read.parquet(path)
  }

  /** Contents fingerprint of a corpus dir for memo keys: the canonical
    * path PLUS a digest of the recursive (relative path, size, mtime)
    * listing. Session memos of derived state (MinHash signatures, the
    * materialized ANN / semantic-dedup indexes) key on this instead of
    * the bare path, so a corpus rewritten IN PLACE mid-session changes
    * the key and the memo rebuilds — it can no longer serve stale
    * results. The listing is driver-cheap: it is the same directory walk
    * Spark's own file index pays on every read of the corpus.
    *
    * Limitation (deliberate): this is a LISTING fingerprint, not a
    * content hash — an in-place rewrite that preserves every file name,
    * size, AND lands within the filesystem's mtime granularity keys
    * identically. Unreachable via any Spark write path (writers emit
    * fresh random part-file names), but hand-edited fixtures could hit
    * it; treat `contentKey` equality as "same corpus as Spark would see
    * it", not as cryptographic identity. */
  def contentKey(dir: String): String = {
    val canon =
      try java.nio.file.Paths.get(dir).toAbsolutePath.normalize.toString
      catch { case _: Exception => dir }
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .sortBy(_.getName).toSeq.flatMap(walk)
      else Seq(f)
    val files = walk(new java.io.File(canon)).filter(_.isFile)
    if (files.isEmpty) {
      // The walk is java.io — it sees NOTHING on a non-local store
      // (hdfs://, s3a://) or a not-yet-written path. A constant key here
      // would make every memo built on this fingerprint (rowCount,
      // MinHash pair graph, ANN indexes, stream models) serve stale
      // state forever after an in-place rewrite. Return a per-call
      // UNIQUE key instead: off the local FS the memos degrade to
      // always-miss (recount / rebuild — correct, just uncached) rather
      // than silently stale. A real deployment would fingerprint via the
      // store's own listing API; this keeps local-mode semantics honest.
      s"$canon#unlisted-${unlistedKeys.incrementAndGet()}"
    } else {
      val listing = files.map(f =>
        s"${f.getAbsolutePath.stripPrefix(canon)}:${f.length}:${f.lastModified}")
        .mkString("\n")
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(listing.getBytes("UTF-8")).map("%02x".format(_)).mkString
      s"$canon#$digest"
    }
  }

  /** Monotonic suffix for `contentKey` on paths java.io cannot list —
    * makes the "unlistable ⇒ unmemoizable" contract deterministic
    * without wall-clock or RNG. */
  private val unlistedKeys = new java.util.concurrent.atomic.AtomicLong(0)

  /** Corpus row counts, memoized per (session, corpus contents, table).
    *
    * The banded near-dup generator (`VectorOps.bandedLabelPairs`) sizes
    * its adaptive band width from the corpus cardinality; before this
    * memo each invocation paid a full `count()` scan of the embeddings
    * table (qe2 and qe17 each paid it — an extra corpus pass per query
    * that is not free at 100 TB). Keys carry the contents fingerprint
    * (`contentKey`: file list + sizes + mtimes), so a corpus rewritten
    * in place mid-session misses the stale entry and recounts instead of
    * serving a stale cardinality — the same staleness contract as the
    * MinHash/ANN memos. The cached value is exactly what `count()` on the
    * freshly-loaded table returns, so width decisions derived from it are
    * bit-identical to the un-memoized form (spec-asserted). */
  private val countCache = new java.util.WeakHashMap[
    SparkSession, java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]]()

  /** Number of real count jobs run (cache misses) — spec instrumentation
    * asserting "one count per session per table", not a public API. */
  private[graft] val countComputes = new java.util.concurrent.atomic.AtomicLong(0)

  private def countsFor(spark: SparkSession) = countCache.synchronized {
    var m = countCache.get(spark)
    if (m == null) {
      m = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
      countCache.put(spark, m)
    }
    m
  }

  /** Memoized `count()` of `dir/name.parquet` — one scan per (session,
    * corpus contents, table); every later caller reads the cached Long.
    *
    * Staleness contract: the fingerprint is a local-FS listing. On a
    * path java.io cannot list (hdfs://, s3a://, not yet written),
    * `contentKey` returns a per-call-unique key, so this memo degrades
    * to always-recount there — never a stale cardinality. */
  def rowCount(spark: SparkSession, dir: String, name: String): Long = {
    val m = countsFor(spark)
    // key on the TABLE's own contents, not the whole corpus dir (the
    // SemDedupStream/PqStream idiom): a whole-dir fingerprint walks and
    // hashes every table's files on each call — even cache hits — and a
    // rewrite of an UNRELATED table would needlessly invalidate this one
    val key = contentKey(s"$dir/$name.parquet")
    val hit = m.get(key)
    if (hit != null) hit.longValue
    else {
      // plain get/put, not computeIfAbsent: apply() + count() can touch
      // other session state, and a nested computeIfAbsent on the same
      // map is a recursive-update violation (see MinHashLSH.nearDups)
      val n = apply(spark, dir, name).count()
      countComputes.incrementAndGet()
      m.put(key, n)
      n
    }
  }

  /** `events.parquet` carries TIMESTAMP(NANOS) which vanilla Spark parquet
    * readers reject (parquet nanos have no Catalyst type). We read nanos as
    * Long via the legacy conf and convert to a microsecond timestamp by
    * truncation — the same truncation DuckDB applies when casting
    * TIMESTAMP_NS to TIMESTAMP, so oracle comparisons line up.
    *
    * Synthesized corpora (tools/make_sf.py, written by DuckDB) carry
    * TIMESTAMP_MICROS without timezone metadata instead, which Spark
    * surfaces as TIMESTAMP_NTZ — `unix_micros` and friends reject that
    * type. Under the engine's UTC session an NTZ wall-clock IS the UTC
    * instant, so it is normalized to a plain TIMESTAMP here; every
    * downstream operator sees one ts type regardless of lake flavor.
    */
  private def readEvents(spark: SparkSession, path: String): DataFrame = {
    val prev = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try {
      val raw = spark.read.parquet(path)
      raw.schema("ts").dataType match {
        // integral `div`, NOT `/`: ns-epoch longs exceed 2^53, so double
        // division (what `/` does on longs) loses the low microsecond bits.
        case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
        case None    => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
      }
    }
  }
}
