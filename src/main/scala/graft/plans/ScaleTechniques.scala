package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The partitioning/shuffle techniques the 100 TB deployment leans on —
  * SURVEY §4 ("partition-by-user data layout", "bucketing", "salting for
  * skew", "AQE"). Each is a small, testable building block; the specs
  * assert the *plan shape* (no exchange, partition filters present), not
  * just result equality.
  */
object ScaleTechniques {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Compute-bound per-row kernels partition by CORES, not input
    * bytes: a small corpus arrives as one file split and would
    * otherwise run the whole kernel on one thread (measured: qd43's
    * lattice 17.2 → 5.1 s at sf1, the qm14–qm18 codec family to ~1 s
    * warm medians — BENCH_scale.md round-12). At 100 TB the scan's own
    * thousands of splits dominate and this repartition is a
    * no-op-sized shuffle. One definition so the policy can't drift
    * between the codec and tokenizer call sites. */
  def spreadByCores(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Lineage truncation for ITERATIVE kernels (CC, PageRank, the MMR
    * greedy trace): every round must break the plan chain or planning
    * goes O(2^iters). `localCheckpoint(true)` is the right single-JVM
    * idiom but is EXECUTOR-STORAGE-ONLY — on a real cluster an executor
    * loss drops the blocks and the truncated lineage cannot recompute
    * them, killing a long iterative job near its end. When the session
    * sets `spark.graft.checkpointDir`, iterative kernels route through
    * RELIABLE-storage checkpoints there instead (HDFS/S3 on a cluster);
    * unset, the executor-local fast path is kept. The checkpoint is a
    * plan LEAF either way, so downstream plans are identical — asserted
    * by the CC spec that runs both modes to equal results.
    *
    * Storage lifecycle: a ONE-SHOT checkpoint's files live for the job
    * (acceptable — one generation's worth). Iterative loops must NOT call
    * this per round in reliable mode, or every superseded generation's
    * corpus-sized snapshot stays on disk for the life of the job
    * (`spark.cleaner.referenceTracking.cleanCheckpoints` defaults to
    * false, and enabling it post-hoc is ineffective — the SparkConf is
    * pinned at context creation). Loops use [[CheckpointChain]], which
    * reclaims the superseded generation as soon as its successor is
    * materialized. */
  /** True iff the context's pinned checkpoint dir (base/<uuid>) lives
    * under the configured base. Path equality over BOTH sides qualified:
    * string comparison false-alarmed on benign spelling differences
    * (trailing slash, implicit vs explicit scheme) of the same
    * directory. */
  private[plans] def checkpointDirMatches(
      active: org.apache.hadoop.fs.Path, configured: String,
      fs: org.apache.hadoop.fs.FileSystem): Boolean = {
    val wanted = fs.makeQualified(new org.apache.hadoop.fs.Path(configured))
    Option(active.getParent).map(fs.makeQualified).contains(wanted)
  }

  def iterCheckpoint(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption("spark.graft.checkpointDir").filter(_.nonEmpty) match {
      case Some(d) =>
        val sc = spark.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(d)
        else {
          // Spark pins the checkpoint dir (base/<uuid>) per context; a
          // LATER change to spark.graft.checkpointDir cannot take effect.
          // Warn instead of silently writing to the old location.
          val active = new org.apache.hadoop.fs.Path(sc.getCheckpointDir.get)
          val fs = active.getFileSystem(sc.hadoopConfiguration)
          if (!checkpointDirMatches(active, d, fs))
            log.warn(s"spark.graft.checkpointDir=$d ignored: this context " +
              s"already pinned its checkpoint dir to $active")
        }
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(true)
    }
  }

  /** Generation-bounded checkpointing for ITERATIVE loops: `next(df)`
    * checkpoints `df` (same mode selection as [[iterCheckpoint]]) and,
    * once the new generation is eagerly materialized, RECLAIMS the
    * previous generation this chain produced — deletes its reliable
    * checkpoint files (the ContextCleaner never would:
    * `cleanCheckpoints` defaults off) and unpersists its blocks. This
    * caps a loop's checkpoint footprint at ONE generation instead of
    * `iters` corpus-sized snapshots.
    *
    * CONTRACT — chain semantics: after `next(g_i+1)` returns, `g_i` is
    * unrecomputable (lineage was truncated AND its storage is gone).
    * Callers must therefore derive each generation only from the
    * PREVIOUS generation plus chain-external inputs, and must not hold
    * other references to superseded generations — exactly the shape of
    * the CC / PageRank / MMR loops. The FINAL generation is never
    * reclaimed; it stays live for downstream consumption. */
  final class CheckpointChain {
    private var prev: Option[org.apache.spark.rdd.RDD[_]] = None

    def next(df: DataFrame): DataFrame = {
      val out = iterCheckpoint(df) // eager: materialized before reclaim
      val rdd = out.queryExecution.analyzed.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }
      prev.foreach { r =>
        r.getCheckpointFile.foreach { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          val fs = p.getFileSystem(
            df.sparkSession.sparkContext.hadoopConfiguration)
          fs.delete(p, true); ()
        }
        r.unpersist(blocking = false)
      }
      prev = rdd
      out
    }
  }

  /** Size-gated presentation sort — safe at ANY output size. The naive
    * choices both fail at one end: `repartition(1).sortWithinPartitions`
    * funnels an unexpectedly large result through a single partition
    * (driver-adjacent OOM at 100×), while a bare `orderBy` re-executes
    * the whole upstream query once more just to sample range-partition
    * bounds. So: materialize the result once (localCheckpoint — the
    * count and the sort then read materialized blocks, not the plan),
    * gate on the actual row count, and fall back to a distributed range
    * sort only when the result is genuinely large.
    *
    * CONTRACT — this call EXECUTES the upstream plan eagerly:
    * `localCheckpoint(true)` + `count()` run the full job at
    * DataFrame-construction time, even if the result is never consumed.
    * Callers therefore use it only as the FINAL presentation step of a
    * query they are about to execute anyway (qd6/qs8/qs9/q33/qs3/qs11 all
    * sink the result immediately). The checkpoint blocks live until the
    * returned DataFrame is garbage-collected, when the ContextCleaner
    * reclaims them — repeated calls in one session pin nothing once their
    * results go out of scope. */
  def sortedOutput(df: DataFrame, sortCols: Seq[String],
                   smallThreshold: Long = 100000L): DataFrame = {
    val mat = df.localCheckpoint(true)
    if (mat.count() <= smallThreshold)
      mat.repartition(1).sortWithinPartitions(sortCols.map(col): _*)
    else mat.orderBy(sortCols.map(col): _*)
  }

  /** Write both sides bucketed by the join key so the join compiles to a
    * shuffle-free SortMergeJoin (co-located buckets). At 100 TB this is
    * the difference between re-shuffling the fact table per query and
    * reading co-partitioned buckets in place. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a previous JVM may have left the managed location behind while this
    // session's in-memory catalog has no entry for it — clear it
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = new java.io.File(warehouse, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(loc)
    }
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Salted join for a skewed build key: explode the small side into
    * `salt` replicas, scatter the big side's hot keys across replicas,
    * join on (key, salt). Result is identical to the plain join; the
    * shuffle is spread over `salt`× more partitions for the hot key. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(salt)))
    val replicas = small.withColumn("__salt",
      explode(array((0 until salt).map(lit(_)): _*)))
    saltedBig.join(replicas, Seq(key, "__salt")).drop("__salt")
  }

  /** Write date-partitioned parquet (the `date=` lake layout from
    * SURVEY §4's time-window pruning row). */
  def writeDatePartitioned(df: DataFrame, path: String, dateCol: String): Unit = {
    df.withColumn("__date", date_format(col(dateCol), "yyyy-MM-dd"))
      .write.mode("overwrite")
      .partitionBy("__date")
      .parquet(path)
  }

  /** Small-file compaction: rewrite a parquet directory into files of
    * roughly `targetMB` each (the lake hygiene op — a 100 TB lake fed by
    * streaming micro-batches accumulates millions of small files whose
    * per-file open cost dominates scans). Returns (filesBefore,
    * filesAfter). Writes to `path + ".compact"` then swaps atomically at
    * the directory level. */
  def compactParquet(spark: SparkSession, path: String, targetMB: Int = 128): (Int, Int) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    def parquetFiles(dir: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(dir).toSeq.filter(_.getPath.getName.endsWith(".parquet"))
    val before = parquetFiles(p)
    val totalBytes = before.map(_.getLen).sum
    val targetFiles = math.max(1, (totalBytes / (targetMB * 1024L * 1024L)).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact")
    spark.read.parquet(path).repartition(targetFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    val backup = new org.apache.hadoop.fs.Path(path + ".old")
    fs.rename(p, backup)
    fs.rename(tmp, p)
    fs.delete(backup, true)
    (before.size, parquetFiles(p).size)
  }

  /** Free the blocks of every locally-checkpointed RDD in the session.
    *
    * Why this exists: `localCheckpoint(true)` persists its blocks in the
    * block manager, and those blocks are only reclaimed when the driver
    * GCs the RDD reference AND the ContextCleaner processes it. On a
    * large driver heap, GC may not run for hundreds of queries, so a
    * long session (or a benchmark suite) accumulates every dead
    * checkpoint it ever made — storage fills, the block manager's
    * bookkeeping grows, and unrelated late queries slow down several-fold
    * even though their own plans are unchanged. Calling this between
    * queries caps the session's storage footprint at one query's worth.
    *
    * Safe to call at any QUERY BOUNDARY (after the previous result was
    * fully consumed): a local checkpoint is garbage once the query that
    * made it has sunk its result. It deliberately skips DataFrame-level
    * `.persist()` caches (session-scoped memos like the MinHash
    * signatures): those are cached through `InMemoryRelation`, whose
    * backing RDD is persisted but NOT checkpointed. Do NOT call
    * it mid-query — a plan that still references a checkpointed RDD
    * cannot recompute it (local checkpoints truncate lineage).
    *
    * Memo-lineage assumption: a surviving session memo may have a
    * localCheckpoint INSIDE its lineage (e.g. the MinHash pair memo is
    * built over an eagerly-checkpointed Collapse.groups). "Safe at any
    * query boundary" therefore also assumes memos are FULLY materialized
    * and durably cached before release — true here (every memo is an
    * eager MEMORY_AND_DISK persist, never evicted in a single-JVM
    * deployment), but a multi-executor deployment that can lose cached
    * partitions would need to exclude RDDs reachable from registered
    * memos, or rebuild the memo on recompute failure.
    *
    * Returns the number of RDDs released. */
  def releaseLocalCheckpoints(spark: SparkSession): Int = {
    // `isCheckpointed` (public) = checkpointed AND materialized; every
    // graft checkpoint is an eager localCheckpoint(true), so at a query
    // boundary this is exactly the dead-checkpoint set. InMemoryRelation
    // caches (DataFrame .persist memos) are persisted but never
    // checkpointed, so they survive.
    val doomed = spark.sparkContext.getPersistentRDDs.values
      .filter(_.isCheckpointed).toSeq
    doomed.foreach(_.unpersist(blocking = true))
    doomed.size
  }

  /** One-line storage summary (block-manager memory/disk in MB and the
    * persistent-RDD census) — the instrumentation that pinpointed the
    * checkpoint-accumulation bench inflation. */
  def storageSummary(spark: SparkSession): String = {
    val infos = spark.sparkContext.getRDDStorageInfo
    val mem = infos.map(_.memSize).sum / (1024 * 1024)
    val disk = infos.map(_.diskSize).sum / (1024 * 1024)
    val rdds = spark.sparkContext.getPersistentRDDs.values
    val ckpt = rdds.count(_.isCheckpointed)
    s"storage: ${infos.length} cached RDDs (${rdds.size} registered, " +
      s"$ckpt local-checkpointed), ${mem}MB mem, ${disk}MB disk"
  }

  /** Count exchanges (shuffles) in the executed plan of a DataFrame,
    * traversing into AQE's materialized query stages — a plain
    * `plan.collect` stops at stage boundaries and under-counts to zero. */
  def countExchanges(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def walk(p: SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeLike => 1
        case _ => 0
      }
      val inner = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _ => p.children.map(walk).sum
      }
      self + inner
    }
    walk(df.queryExecution.executedPlan)
  }
}
