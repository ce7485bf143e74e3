package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming variants of the batch operators — SURVEY §2.8: the
  * reference's per-PUT Lambda trigger becomes a file-source stream, and
  * `Trigger.AvailableNow` replay must equal the batch recompute exactly
  * (the driver checks qs5 against the same oracle as the batch
  * q8_latest_per_key).
  *
  * ALL durable state in this object rides `AppendOnlyState` generational
  * appends: each micro-batch writes only its own keyed DELTA (O(batch)
  * rows), the keyed fold (latest-wins / per-key (min, sum)) is applied at
  * compaction and at read time, and nothing ever rewrites the full
  * accumulated state per batch. (Rounds 4–6 used versioned full-snapshot
  * dirs for the upsert/corpus-dedup streams — correct, but O(state) I/O
  * per micro-batch, a scale-killer for a long-running ingest stream.) At
  * production scale the same fold would target a transactional keyed
  * table; the append-dir scheme keeps identical semantics with plain
  * parquet.
  */
object Replay {

  /** Best-effort JVM-exit cleanup for streaming work dirs (checkpoint +
    * versioned state): the final state stays readable for the returned
    * DataFrame's lifetime, but repeated runs must not accumulate /tmp
    * garbage on a shared machine. ONE shutdown hook drains a shared
    * queue — registering a hook thread per call would pin a thread per
    * streaming invocation for the process lifetime. */
  private val exitDirs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private lazy val exitHook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      exitDirs.forEach(d => deleteRecursively(new java.io.File(d)))))
  }
  private[graft] def cleanupAtExit(dir: String): Unit = {
    exitHook
    exitDirs.add(dir)
    ()
  }
  private[graft] def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }

  /** Per-batch band-explode row counts of the most recent `streamNearDup`
    * run — spec instrumentation proving per-batch band work is
    * proportional to the BATCH (16 bands × novel texts), not the
    * accumulated state. OFF by default: the count is one extra Spark job
    * per micro-batch, which production/bench runs must not pay — a spec
    * flips `recordBandRows` on around its invocation. Cleared at each
    * invocation; foreachBatch runs sequentially within a stream, and
    * concurrent streams would interleave (test-only surface). */
  private[graft] val bandRowsPerBatch = new scala.collection.mutable.ArrayBuffer[Long]()
  @volatile private[graft] var recordBandRows = false

  /** Test-only fault injection for the restart specs: when armed (>= 0),
    * the restartable streams throw AFTER completing the given batch's
    * state writes but BEFORE foreachBatch returns — i.e. inside the
    * at-least-once window between the state append and the streaming
    * checkpoint commit, the hardest crash point (the restarted stream
    * must REPLAY that batch against state that already contains it).
    * Disarms itself so the restart proceeds. */
  @volatile private[graft] var poisonAfterBatch: Long = -1L
  private[graft] def maybePoison(batchId: Long): Unit =
    if (poisonAfterBatch >= 0 && batchId >= poisonAfterBatch) {
      poisonAfterBatch = -1L
      throw new RuntimeException(s"test poison: crash after batch $batchId")
    }

  /** Resolve a caller-supplied durable work dir (restartable: state and
    * streaming checkpoint live side by side and reload together) or a
    * fresh temp dir cleaned at JVM exit (the one-shot form). */
  private def resolveWork(workDir: Option[String], prefix: String): String =
    workDir match {
      case Some(w) =>
        Files.createDirectories(java.nio.file.Paths.get(w)); w
      case None =>
        val t = Files.createTempDirectory(prefix).toString
        cleanupAtExit(t); t
    }

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // TIMESTAMP(NANOS) read as long (legacy conf)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def eventStream(spark: SparkSession, dir: String,
                          pathGlobFilter: String = "events.parquet",
                          maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The streaming file source requires a *directory*; select just the
    // events table out of the shared sfDir with a glob filter.
    //
    // The driver lake carries TIMESTAMP(NANOS) (long under the legacy
    // conf, `div 1000` to micros); synthesized corpora (tools/make_sf.py,
    // DuckDB-written) carry TIMESTAMP_MICROS without tz metadata (NTZ);
    // a Spark-written lake carries tz-adjusted TIMESTAMP. A long-typed
    // stream schema over a micros file would silently read micros AS
    // nanos — timestamps 1000× off — so probe the footer once (batch
    // read), build the stream schema with the PROBED ts type, and apply
    // the matching normalization; all three flavors land on the same
    // UTC-instant TIMESTAMP column (same three-way contract as
    // Tables.readEvents).
    val probed = spark.read.option("pathGlobFilter", pathGlobFilter)
      .parquet(dir).schema("ts").dataType
    val schema = StructType(eventsSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = probed) else f))
    val reader = spark.readStream.schema(schema)
      .option("pathGlobFilter", pathGlobFilter)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    val raw = reader.parquet(dir)
    probed match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Latest-wins per user, deterministic tie-break on event_id — the
    * keyed fold shared by `streamUpsert`'s per-batch reduction, its
    * compaction, and its final read. Order-insensitive and composable
    * (`fold(fold(a) ∪ b) == fold(a ∪ b)`), which is what lets the state
    * live as unordered generational appends. */
  private def latestWins(df: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** K2 streaming form: latest-wins keyed upsert via foreachBatch.
    * AvailableNow replay of the whole lake == batch q8_latest_per_key.
    *
    * Each micro-batch appends only its own within-batch winners — O(batch)
    * rows and I/O regardless of how much state has accumulated (the
    * reference's K2 semantics re-fire on EVERY S3 PUT, so a long-running
    * upsert stream is the case where an O(state) per-batch rewrite would
    * be the engine's scale-killer). `AppendOnlyState` applies the same
    * latest-wins fold at compaction, so durable state also stays
    * O(distinct users), and the final read folds the appended generations
    * once.
    *
    * Restart contract (shared by all foreachBatch state in this object):
    * every stream's state lives NEXT TO its streaming checkpoint under one
    * `work` dir and the two reload together — already-ingested files are
    * skipped AND their state is still there. A batch replayed from the
    * at-least-once window recomputes the same delta from the same input
    * batch and OVERWRITES its own batch-keyed subdir instead of appending
    * twice; a batch already folded by compaction is skipped wholesale.
    * Pass `workDir` for the durable/restartable form; the default is a
    * fresh temp dir per invocation (one-shot, cleaned at JVM exit). */
  def streamUpsert(spark: SparkSession, dir: String,
                   workDir: Option[String] = None,
                   pathGlobFilter: String = "events.parquet",
                   maxFilesPerTrigger: Option[Int] = None,
                   compactEvery: Int = 16): DataFrame = {
    val work = resolveWork(workDir, "graft_upsert")
    val stateSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("event_type", StringType), StructField("ts", TimestampType)))
    val state = new AppendOnlyState(work, Seq(("latest", stateSchema)),
      compactEvery, folds = Map("latest" -> (latestWins _)))

    val q = eventStream(spark, dir, pathGlobFilter, maxFilesPerTrigger)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!state.alreadyFolded(batchId)) {
          val delta = latestWins(
            batch.select("user_id", "event_id", "event_type", "ts"))
          state.endBatch(batch.sparkSession, batchId, "latest" -> delta)
        }
        maybePoison(batchId)
        ()
      }
      .start()
    q.awaitTermination()

    latestWins(state.read(spark, "latest"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .orderBy("user_id")
  }

  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming incremental corpus dedup — the arrival-time form of
    * qd1_dedup_exact: documents stream in, each micro-batch folds its
    * per-hash (min doc_id, count) aggregate into the accumulated state.
    * min/sum are order-insensitive monoids, so the converged state equals
    * the batch answer REGARDLESS of arrival order or batch boundaries —
    * which is exactly what lets the driver hash-check a streaming query
    * against the batch SQL oracle.
    *
    * Each micro-batch appends only its OWN per-hash aggregate — O(batch)
    * rows and I/O; the (min, sum) fold runs at compaction and at the
    * final read, so accumulated state is never rewritten per batch. At
    * 100 TB the state table would be a transactional keyed table; the
    * append-dir scheme keeps the semantics. Same restart contract as
    * `streamUpsert`: a replayed batch recomputes the same delta and
    * overwrites its own batch-keyed subdir — appending a second copy
    * would double-count `n_copies`, which the exact-count oracle would
    * catch. */
  def streamCorpusDedup(spark: SparkSession, dir: String,
                        maxFilesPerTrigger: Int = 1,
                        pathGlobFilter: String = "*.parquet",
                        workDir: Option[String] = None,
                        compactEvery: Int = 16): DataFrame = {
    val work = resolveWork(workDir, "graft_sdedup")
    val aggSchema = StructType(Seq(
      StructField("text_hash", StringType),
      StructField("keep_doc_id", LongType),
      StructField("n_copies", LongType)))
    def fold(df: DataFrame): DataFrame =
      df.groupBy("text_hash")
        .agg(min("keep_doc_id").as("keep_doc_id"),
          sum("n_copies").as("n_copies"))
    val state = new AppendOnlyState(work, Seq(("agg", aggSchema)),
      compactEvery, folds = Map("agg" -> (fold _)))
    val q = spark.readStream.schema(docsSchema)
      .option("pathGlobFilter", pathGlobFilter)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!state.alreadyFolded(batchId)) {
          val delta = batch
            .groupBy(md5(col("text")).as("text_hash"))
            .agg(min("doc_id").as("keep_doc_id"),
              count(lit(1)).as("n_copies"))
          state.endBatch(batch.sparkSession, batchId, "agg" -> delta)
        }
        maybePoison(batchId)
        ()
      }
      .start()
    q.awaitTermination()
    fold(state.read(spark, "agg"))
      .select("text_hash", "keep_doc_id", "n_copies")
      .orderBy("keep_doc_id")
  }

  /** qs10 entry: the documents table staged as TWO id-range files and
    * consumed one file per micro-batch, so the ORACLE-CHECKED run itself
    * exercises the cross-batch (min, sum) state fold — a single-batch
    * replay of the shared lake would check only the batch aggregate.
    * (Same minimal boundary-crossing shape as qs15; deeper splits,
    * shuffled arrival, and restart live in the specs.)
    *
    * The two-file staging copy is INPUT scaffolding, not computed state,
    * so it is memoized per source-corpus contents (`Tables.contentKey`)
    * for the session — a bench suite stages once across passes instead of
    * rewriting the full documents table per pass. The stream itself (and
    * its state fold) still runs in full on every invocation. */
  private[streaming] val stagedLakes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  def qs10StreamDedup(spark: SparkSession, dir: String): DataFrame = {
    val staged = stagedLakes.computeIfAbsent(
      graft.Tables.contentKey(s"$dir/documents.parquet"), _ => {
        val t = Files.createTempDirectory("graft_sdedup_lake").toString
        cleanupAtExit(t)
        graft.Tables(spark, dir, "documents")
          .repartitionByRange(2, col("doc_id"))
          .write.mode("overwrite").parquet(t)
        t
      })
    streamCorpusDedup(spark, staged, maxFilesPerTrigger = 1)
  }

  /** Streaming incremental duplicated-SPAN detection — the arrival-time
    * form of qd23_dup_spans (substring-level dedup): documents stream in,
    * each micro-batch computes only its own positional-shingle kernel and
    * probes the accumulated occurrence index; the final read merges the
    * accumulated duplicated-position marks into maximal spans.
    *
    * Per batch, with B = this batch's (shingle digest, doc, pos) rows
    * (digest = two independent xxhash64s, the qd23 key):
    *   - positions of shingles duplicated WITHIN B (count window) are
    *     marked;
    *   - B's distinct shingles BROADCAST-probe the persisted `occ` index
    *     (the qs13 band-probe shape: the state streams through a scan,
    *     no shuffle on state, nothing rewrites it). A hit marks the
    *     batch positions AND the prior occurrences — the retroactive
    *     mark for a first occurrence whose duplicate only just arrived;
    *   - appends: `occ` += B (append-only index), `marks` += this
    *     batch's marks. Both O(batch + probe hits); re-marking an
    *     already-marked position on a later hit is absorbed by the
    *     distinct fold (at-least-once-safe by construction).
    *
    * Mark-set equivalence to the batch operator: a position is marked iff
    * its window text occurs ≥ 2 times corpus-wide — each position pair
    * with equal text meets in SOME batch (the later one probes the
    * earlier's index entry, or the same batch's count window) — so the
    * folded marks equal qd23's count-window marks regardless of arrival
    * order or batch boundaries, and the driver hash-checks this stream
    * against the same SQL oracle. Span merge + text reconstruction are
    * literally shared code (`TextOps.spansFromMarks`).
    *
    * Same restart contract as the sibling streams: state and checkpoint
    * reload together under `workDir`; a replayed batch excludes its own
    * crashed writes from the probe and overwrites its batch-keyed dirs. */
  def streamDupSpans(spark: SparkSession, dir: String,
                     k: Int = 8,
                     maxFilesPerTrigger: Int = 1,
                     pathGlobFilter: String = "*.parquet",
                     workDir: Option[String] = None,
                     compactEvery: Int = 16): DataFrame = {
    val work = resolveWork(workDir, "graft_sspans")
    val occSchema = StructType(Seq(
      StructField("k1", LongType),
      StructField("k2", LongType),
      StructField("doc_id", LongType),
      StructField("pos", LongType)))
    val marksSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("pos", LongType)))
    val state = new AppendOnlyState(work,
      Seq(("occ", occSchema), ("marks", marksSchema)), compactEvery,
      folds = Map("marks" -> ((df: DataFrame) => df.distinct())))
    val q = spark.readStream.schema(docsSchema)
      .option("pathGlobFilter", pathGlobFilter)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!state.alreadyFolded(batchId)) {
          val ss = batch.sparkSession
          import ss.implicits._
          val b = batch.select("doc_id", "text").as[(Long, String)]
            .flatMap { case (id, text) =>
              graft.operators.TextOps.positionalShingles(text, k)
                .map { case (p, s) => (id, p, s) } }
            .toDF("doc_id", "pos", "shingle")
            // 128-bit digest key, the qd23/Collapse shape: the count
            // window, the state, and the probes all move 16-byte keys
            // instead of window text (see qd23DupSpans' collision note)
            .select(xxhash64(lit(1), col("shingle")).as("k1"),
              xxhash64(lit(2), col("shingle")).as("k2"),
              col("doc_id"), col("pos"))
            .persist() // consumed by 3 jobs below; O(batch) rows
          try {
            // count window, NOT the qd23 aggregate+join form: inside
            // foreachBatch AQE is off and `b` is cache-backed — the
            // join form scans and shuffles the cached batch twice,
            // measured 15.1 → 18.0 s at sf1; the window's single
            // shuffle+sort of the batch wins here
            val wOcc = org.apache.spark.sql.expressions.Window.partitionBy("k1", "k2")
            val dupB = b.withColumn("n", count(lit(1)).over(wOcc))
              .filter(col("n") >= 2).select("doc_id", "pos")
            val prior = state.read(ss, "occ", excludeBatch = Some(batchId))
            val bSh = b.select("k1", "k2").distinct()
            // state scans through; only skinny batch shingles broadcast
            val hitPrior = prior.join(broadcast(bSh), Seq("k1", "k2"))
            val hitSh = hitPrior.select("k1", "k2").distinct()
            val batchHitPos = b.join(broadcast(hitSh), Seq("k1", "k2"))
            val marks = dupB
              .union(batchHitPos.select("doc_id", "pos"))
              .union(hitPrior.select("doc_id", "pos"))
              .distinct()
            state.endBatch(ss, batchId,
              "occ" -> b.select("k1", "k2", "doc_id", "pos"),
              "marks" -> marks)
          } finally { b.unpersist(); () }
        }
        maybePoison(batchId)
        ()
      }
      .start()
    q.awaitTermination()
    val marked = state.read(spark, "marks").distinct()
    val tokArr = spark.read.schema(docsSchema)
      .option("pathGlobFilter", pathGlobFilter).parquet(dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
    graft.operators.TextOps.spansFromMarks(marked, tokArr, k)
  }

  /** qs16 entry: the same two-id-range-file staging as qs10 (shared
    * memo — a bench suite stages the lake once for both), so the
    * oracle-checked run itself crosses a batch boundary and exercises
    * the retroactive probe-mark path, not just the within-batch count. */
  def qs16StreamDupSpans(spark: SparkSession, dir: String): DataFrame = {
    val staged = stagedLakes.computeIfAbsent(
      graft.Tables.contentKey(s"$dir/documents.parquet"), _ => {
        val t = Files.createTempDirectory("graft_sdedup_lake").toString
        cleanupAtExit(t)
        graft.Tables(spark, dir, "documents")
          .repartitionByRange(2, col("doc_id"))
          .write.mode("overwrite").parquet(t)
        t
      })
    streamDupSpans(spark, staged, k = 8)
  }

  /** Streaming incremental DSIR data selection — the arrival-time form
    * of qd26_dsir_weights (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", NeurIPS 2023): documents stream
    * in, each micro-batch pays ONE hashed-bigram kernel pass over its
    * own rows, and the converged state scores every raw document exactly
    * as the batch operator would, regardless of arrival order or batch
    * boundaries.
    *
    * The key observation is that BOTH halves of DSIR are sufficient-
    * statistic monoids, so nothing about the model needs to be frozen
    * up-front (contrast qs15, whose k-means quantizer is genuinely
    * order-sensitive and therefore trained once on the base corpus):
    *   - `cnt(bucket, ct)` — the model's per-bucket TARGET feature
    *     counts. Target membership is a pure function of the id
    *     (`TextOps.dsirIsTarget`), so the batch splits BEFORE the
    *     kernel and only the ~5% target side pays this tokenization;
    *     the delta partial-aggregates map-side to ≤ B rows (B = 1024)
    *     and folds by per-bucket sum.
    *   - `feat(doc_id, bucket, n)` — each RAW document's hashed-bigram
    *     bucket histogram, appended in the micro-batch where the doc
    *     arrives (a doc never spans batches, so appends are disjoint by
    *     key). The append is written MAP-SIDE as instance rows (n = 1)
    *     straight off the kernel — no per-batch shuffle at all: short
    *     docs rarely repeat a bucket, so pre-grouping would shrink
    *     nothing and cost a full-width exchange (the same measurement
    *     that shapes qd26, `TextOps.scala` qd26 scaladoc); the per-key
    *     sum fold (compaction + read) produces the histogram instead.
    *     The raw side of the model is NOT stored: `cr(bucket)` is, by
    *     construction, the per-bucket sum of `feat.n`, so the read
    *     derives it from the folded features — one fewer state table
    *     and nothing double-counted.
    * A snapshot read folds `feat`, derives `cr` from it, full-outer
    * joins the folded target counts (a bucket seen on only one side
    * keeps the other at 0, exactly the batch groupBy's shape), derives
    * the add-one-smoothed model (`TextOps.dsirModel` — bit-identical to
    * qd26's: same totals, same smoothing), and joins `feat` against the
    * ≤ B-row BROADCAST model folding Σ n·logratio / Σ n per doc
    * (`TextOps.dsirScoreWeighted`) — feature statistics never shuffle
    * with the corpus, exactly the qd26 scale shape, and per-batch I/O
    * is O(batch bigram rows) no matter how much state has accumulated.
    *
    * This is the streaming-curation primitive the batch form can't give
    * you: the model keeps LEARNING from every arriving shard (target and
    * raw counts both accumulate), and any snapshot read scores the docs
    * seen so far under the model of everything seen so far — rescoring
    * under tomorrow's model is a read, not a re-ingest.
    *
    * Same restart contract as the sibling streams: state and checkpoint
    * reload together under `workDir`; a batch replayed from the
    * at-least-once window overwrites its own batch-keyed subdirs, which
    * the exact-count oracle would catch if it double-appended (`n` and
    * `ct` would inflate, dragging `cr` and every 6-dp score along). */
  def streamDsir(spark: SparkSession, dir: String,
                 buckets: Int = 1024,
                 maxFilesPerTrigger: Int = 1,
                 pathGlobFilter: String = "*.parquet",
                 workDir: Option[String] = None,
                 compactEvery: Int = 16): DataFrame = {
    val work = resolveWork(workDir, "graft_sdsir")
    val cntSchema = StructType(Seq(
      StructField("bucket", IntegerType),
      StructField("ct", LongType)))
    val featSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("bucket", IntegerType),
      StructField("n", LongType)))
    val state = new AppendOnlyState(work,
      Seq(("cnt", cntSchema), ("feat", featSchema)), compactEvery,
      folds = Map(
        "cnt" -> ((df: DataFrame) => df.groupBy("bucket")
          .agg(sum("ct").as("ct"))),
        "feat" -> ((df: DataFrame) => df.groupBy("doc_id", "bucket")
          .agg(sum("n").as("n")))))
    val q = spark.readStream.schema(docsSchema)
      .option("pathGlobFilter", pathGlobFilter)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!state.alreadyFolded(batchId)) {
          val ss = batch.sparkSession
          // split on the id BEFORE the kernel: the ~5% target side is
          // the only input the model delta needs, and the raw side's
          // instance rows are the state append itself — neither delta
          // shuffles full-width and nothing is persisted (the two
          // state writes run concurrently inside endBatch, each
          // consuming its own one-pass plan)
          val isT = graft.operators.TextOps.dsirIsTarget(col("doc_id"))
          val cntDelta = graft.operators.TextOps
            .dsirBucketed(batch.filter(isT), buckets)
            .groupBy("bucket").agg(count(lit(1)).as("ct"))
          val featDelta = graft.operators.TextOps
            .dsirBucketed(batch.filter(!isT), buckets)
            .select(col("doc_id"), col("bucket"), lit(1L).as("n"))
          state.endBatch(ss, batchId,
            "cnt" -> cntDelta, "feat" -> featDelta)
        }
        maybePoison(batchId)
        ()
      }
      .start()
    q.awaitTermination()
    val feat = state.read(spark, "feat")
      .groupBy("doc_id", "bucket").agg(sum("n").as("n"))
    val ct = state.read(spark, "cnt")
      .groupBy("bucket").agg(sum("ct").as("ct"))
    val cr = feat.groupBy("bucket").agg(sum("n").as("cr"))
    val cnt = ct.join(cr, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    graft.operators.TextOps
      .dsirScoreWeighted(feat, graft.operators.TextOps.dsirModel(cnt, buckets))
      .orderBy("doc_id")
  }

  /** qs17 entry: the same two-id-range-file staging as qs10/qs16 (shared
    * per-contents memo), so the oracle-checked run crosses a batch
    * boundary and the scored result folds model counts from BOTH batches
    * — a single-batch replay would never separate the model delta from
    * the model. */
  def qs17StreamDsir(spark: SparkSession, dir: String): DataFrame = {
    val staged = stagedLakes.computeIfAbsent(
      graft.Tables.contentKey(s"$dir/documents.parquet"), _ => {
        val t = Files.createTempDirectory("graft_sdedup_lake").toString
        cleanupAtExit(t)
        graft.Tables(spark, dir, "documents")
          .repartitionByRange(2, col("doc_id"))
          .write.mode("overwrite").parquet(t)
        t
      })
    streamDsir(spark, staged)
  }

  /** Streaming incremental domain-drift monitoring — the arrival-time
    * form of qd30_domain_drift, and the configuration the report is
    * actually FOR: a continuous ingest pipeline watching whether any
    * source's distribution is drifting from the corpus as shards land.
    * The (source, bucket) hashed-unigram counts are sum monoids, so the
    * qs17 pattern applies verbatim: each micro-batch appends its own
    * O(B × sources) count delta (map-side partial aggregate — the only
    * corpus-width work is the batch's own tokenization), the registered
    * fold keeps compacted state at O(B × sources) rows, and any
    * snapshot read folds the counts and derives the exact batch report
    * (`TextOps.driftReport` — integer nano-nat contributions, so not
    * even summation order can diverge). Restart contract as siblings:
    * batch-keyed overwrites, `alreadyFolded` skip, kill-tested. */
  def streamDrift(spark: SparkSession, dir: String,
                  buckets: Int = 1024,
                  maxFilesPerTrigger: Int = 1,
                  pathGlobFilter: String = "*.parquet",
                  workDir: Option[String] = None,
                  compactEvery: Int = 16): DataFrame = {
    val work = resolveWork(workDir, "graft_sdrift")
    val sbSchema = StructType(Seq(
      StructField("source", StringType),
      StructField("bucket", IntegerType),
      StructField("c", LongType)))
    val state = new AppendOnlyState(work, Seq(("sb", sbSchema)), compactEvery,
      folds = Map("sb" -> ((df: DataFrame) => df.groupBy("source", "bucket")
        .agg(sum("c").as("c")))))
    val q = spark.readStream.schema(docsSchema)
      .option("pathGlobFilter", pathGlobFilter)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!state.alreadyFolded(batchId)) {
          state.endBatch(batch.sparkSession, batchId,
            "sb" -> graft.operators.TextOps.driftBucketed(batch, buckets))
        }
        maybePoison(batchId)
        ()
      }
      .start()
    q.awaitTermination()
    graft.operators.TextOps.driftReport(
      state.read(spark, "sb").groupBy("source", "bucket").agg(sum("c").as("c")),
      buckets)
  }

  /** qs19 entry: the same two-id-range-file staging as qs10/qs16/qs17
    * (shared per-contents memo), so the oracle-checked run folds count
    * deltas from BOTH batches. Shares qd30's oracle SQL verbatim. */
  def qs19StreamDrift(spark: SparkSession, dir: String): DataFrame =
    streamDrift(spark, stagedDocsLake(spark, dir))

  private def stagedDocsLake(spark: SparkSession, dir: String): String =
    stagedLakes.computeIfAbsent(
      graft.Tables.contentKey(s"$dir/documents.parquet"), _ => {
        val t = Files.createTempDirectory("graft_sdedup_lake").toString
        cleanupAtExit(t)
        graft.Tables(spark, dir, "documents")
          .repartitionByRange(2, col("doc_id"))
          .write.mode("overwrite").parquet(t)
        t
      })

  /** Streaming WINDOWED drift alarms — qs21, the arrival-time form of
    * qd31: per-batch (source, window, bucket) count deltas (window =
    * doc_id div span, deterministic under replay where a wall-clock
    * window would not be) fold into O(B × sources × windows) state;
    * any snapshot read derives the exact per-(source, window)
    * window-vs-lifetime JS report. Restart contract as the siblings:
    * batch-keyed overwrites, `alreadyFolded` skip, kill-tested. */
  def streamWindowedDrift(spark: SparkSession, dir: String,
                          buckets: Int = 1024,
                          span: Long = 250L,
                          maxFilesPerTrigger: Int = 1,
                          pathGlobFilter: String = "*.parquet",
                          workDir: Option[String] = None,
                          compactEvery: Int = 16): DataFrame = {
    val work = resolveWork(workDir, "graft_swdrift")
    val swbSchema = StructType(Seq(
      StructField("source", StringType),
      StructField("w", LongType),
      StructField("bucket", IntegerType),
      StructField("c", LongType)))
    val state = new AppendOnlyState(work, Seq(("swb", swbSchema)), compactEvery,
      folds = Map("swb" -> ((df: DataFrame) => df.groupBy("source", "w", "bucket")
        .agg(sum("c").as("c")))))
    val q = spark.readStream.schema(docsSchema)
      .option("pathGlobFilter", pathGlobFilter)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!state.alreadyFolded(batchId)) {
          state.endBatch(batch.sparkSession, batchId,
            "swb" -> graft.operators.TextOps.windowedDriftBucketed(
              batch, buckets, span))
        }
        maybePoison(batchId)
        ()
      }
      .start()
    q.awaitTermination()
    graft.operators.TextOps.windowedDriftReport(
      state.read(spark, "swb").groupBy("source", "w", "bucket")
        .agg(sum("c").as("c")),
      buckets)
  }

  /** qs21 entry: windowed drift over the shared staged docs lake;
    * shares qd31's oracle SQL verbatim across the batch boundary. */
  def qs21StreamWindowedDrift(spark: SparkSession, dir: String): DataFrame =
    streamWindowedDrift(spark, stagedDocsLake(spark, dir))

  /** Streaming count-min-sketch monitoring — qs22, qd33's arrival-time
    * form. The production artifact is the `sk` state table: a D × W
    * counter grid whose size NEVER depends on corpus or vocabulary —
    * the sublinear promise CMS exists for — folded as a pure sum monoid
    * from per-batch deltas (each micro-batch pays only its own
    * tokenize + vocab-bounded aggregates). The `tc` exact term counts
    * ride beside it for the estimate-vs-exact quality report (the q25
    * HLL / q36 GK pattern — hash-checked, not tolerance-checked); a
    * deployment that trusted the sketch would drop `tc` and keep state
    * at exactly D × W longs. Restart contract as the drift siblings:
    * batch-keyed overwrites, `alreadyFolded` skip, kill-tested. */
  def streamCms(spark: SparkSession, dir: String,
                width: Int = 16, depth: Int = 4,
                maxFilesPerTrigger: Int = 1,
                pathGlobFilter: String = "*.parquet",
                workDir: Option[String] = None,
                compactEvery: Int = 16): DataFrame = {
    val work = resolveWork(workDir, "graft_scms")
    val skSchema = StructType(Seq(
      StructField("j", IntegerType),
      StructField("bucket", IntegerType),
      StructField("c", LongType)))
    val tcSchema = StructType(Seq(
      StructField("term", StringType),
      StructField("c", LongType)))
    val state = new AppendOnlyState(work,
      Seq(("sk", skSchema), ("tc", tcSchema)), compactEvery,
      folds = Map(
        "sk" -> ((df: DataFrame) => df.groupBy("j", "bucket")
          .agg(sum("c").as("c"))),
        "tc" -> ((df: DataFrame) => df.groupBy("term")
          .agg(sum("c").as("c")))))
    val q = spark.readStream.schema(docsSchema)
      .option("pathGlobFilter", pathGlobFilter)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!state.alreadyFolded(batchId)) {
          val tcDelta = graft.operators.TextOps.cmsTermCounts(batch)
          state.endBatch(batch.sparkSession, batchId,
            "sk" -> graft.operators.TextOps.cmsSketch(tcDelta, width, depth),
            "tc" -> tcDelta)
        }
        maybePoison(batchId)
        ()
      }
      .start()
    q.awaitTermination()
    graft.operators.TextOps.cmsReport(
      state.read(spark, "sk").groupBy("j", "bucket").agg(sum("c").as("c")),
      state.read(spark, "tc").groupBy("term").agg(sum("c").as("c")),
      width, depth)
  }

  /** qs22 entry: CMS over the shared staged docs lake; shares qd33's
    * oracle SQL verbatim across the batch boundary. */
  def qs22StreamCms(spark: SparkSession, dir: String): DataFrame =
    streamCms(spark, stagedDocsLake(spark, dir))

  /** Streaming BM25 — qd8's arrival-time form: the inverted-index
    * STATISTICS a search tier serves from are maintained incrementally
    * (the reference's per-PUT Lambda → Elasticsearch indexing loop,
    * internalized). Each micro-batch pays only its own tokenize +
    * query-term aggregates and appends three monotone facts:
    * query-term postings (doc_id, term, tf), doc lengths of MATCHED
    * docs only, and a ONE-ROW (n_docs, sum_dl) corpus-stats increment
    * — so durable state is O(matched docs) + O(1), never
    * corpus-proportional (the full per-doc length table never leaves
    * the batch). Docs arrive exactly once, making postings/lengths
    * append-only; the stats row is a sum monoid whose terms are
    * integer-valued doubles, so the folded avgdl is bit-equal to the
    * batch `avg` and the final ranking folds to exactly qd8 across any
    * batch boundary (shared oracle SQL). Restart contract as the
    * sketch siblings: batch-keyed overwrites, `alreadyFolded` skip,
    * kill-tested. */
  def streamBm25(spark: SparkSession, dir: String,
                 queryTerms: Seq[String] = Seq("spark", "query", "window"),
                 topK: Int = 10,
                 maxFilesPerTrigger: Int = 1,
                 pathGlobFilter: String = "*.parquet",
                 workDir: Option[String] = None,
                 compactEvery: Int = 16): DataFrame = {
    val work = resolveWork(workDir, "graft_sbm25")
    val ptSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("term", StringType),
      StructField("tf", LongType)))
    val dlSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("dl", DoubleType)))
    val csSchema = StructType(Seq(
      StructField("n_docs", LongType),
      StructField("sum_dl", DoubleType)))
    val state = new AppendOnlyState(work,
      Seq(("pt", ptSchema), ("dl", dlSchema), ("cs", csSchema)), compactEvery,
      folds = Map(
        "cs" -> ((df: DataFrame) => df.agg(
          sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl")))))
    val q = spark.readStream.schema(docsSchema)
      .option("pathGlobFilter", pathGlobFilter)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!state.alreadyFolded(batchId)) {
          val (pt, dl, cs) =
            graft.text.Search.bm25BatchDeltas(batch, queryTerms)
          state.endBatch(batch.sparkSession, batchId,
            "pt" -> pt, "dl" -> dl, "cs" -> cs)
        }
        maybePoison(batchId)
        ()
      }
      .start()
    q.awaitTermination()
    val stats = state.read(spark, "cs")
      .agg(sum("n_docs").as("nl"), sum("sum_dl").as("sdl"))
      .select(col("nl").cast("double").as("n"),
        (col("sdl") / col("nl")).as("avgdl"))
    graft.text.Search.bm25From(
      state.read(spark, "pt"), state.read(spark, "dl"), stats, topK)
  }

  /** qs27 entry: BM25 over the shared staged docs lake; shares qd8's
    * oracle SQL verbatim across the batch boundary. */
  def qs27StreamBm25(spark: SparkSession, dir: String): DataFrame =
    streamBm25(spark, stagedDocsLake(spark, dir))

  /** Streaming hybrid retrieval — qd40's arrival-time form: ONE stream
    * maintains BOTH retrieval indices per micro-batch (the qs26
    * both-indices-in-one-endBatch shape): the qs27 sparse state
    * (query-term postings + matched lengths + the one-row corpus-stats
    * monoid) and the dense state (query-bucket hashed-TF rows + l2
    * norms of matched docs — the norm computed inside the arrival
    * batch over ALL the doc's buckets, then only matched docs kept).
    * Every fact is append-only and O(matched batch docs) + O(1); the
    * report rebuilds both rankings from state with the SAME factored
    * tails the batch form uses (bm25From / denseRanked / rrfFuse), so
    * the fused ranking folds to exactly qd40 across any batch boundary
    * and the oracle SQL is shared verbatim. Restart contract as the
    * family: batch-keyed overwrites, `alreadyFolded` skip,
    * kill-tested. */
  def streamHybridRrf(spark: SparkSession, dir: String,
                      queryTerms: Seq[String] = Seq("spark", "query", "window"),
                      candK: Int = graft.text.Search.HybridCandK,
                      topK: Int = 10,
                      maxFilesPerTrigger: Int = 1,
                      pathGlobFilter: String = "*.parquet",
                      workDir: Option[String] = None,
                      compactEvery: Int = 16): DataFrame = {
    val work = resolveWork(workDir, "graft_shybrid")
    val ptSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("term", StringType),
      StructField("tf", LongType)))
    val dlSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("dl", DoubleType)))
    val csSchema = StructType(Seq(
      StructField("n_docs", LongType),
      StructField("sum_dl", DoubleType)))
    val dtSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("bucket", IntegerType),
      StructField("tf", DoubleType)))
    val dnSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("dnorm", DoubleType)))
    val state = new AppendOnlyState(work,
      Seq(("pt", ptSchema), ("dl", dlSchema), ("cs", csSchema),
        ("dt", dtSchema), ("dn", dnSchema)), compactEvery,
      folds = Map(
        "cs" -> ((df: DataFrame) => df.agg(
          sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl")))))
    val q = spark.readStream.schema(docsSchema)
      .option("pathGlobFilter", pathGlobFilter)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!state.alreadyFolded(batchId)) {
          val (pt, dl, cs) =
            graft.text.Search.bm25BatchDeltas(batch, queryTerms)
          val (dt, dn) =
            graft.text.Search.htfBatchDeltas(batch, queryTerms)
          state.endBatch(batch.sparkSession, batchId,
            "pt" -> pt, "dl" -> dl, "cs" -> cs, "dt" -> dt, "dn" -> dn)
        }
        maybePoison(batchId)
        ()
      }
      .start()
    q.awaitTermination()
    val stats = state.read(spark, "cs")
      .agg(sum("n_docs").as("nl"), sum("sum_dl").as("sdl"))
      .select(col("nl").cast("double").as("n"),
        (col("sdl") / col("nl")).as("avgdl"))
    val sparse = graft.text.Search.bm25From(
        state.read(spark, "pt"), state.read(spark, "dl"), stats, candK)
      .select(col("doc_id"), col("rank").as("sparse_rank"))
    val dense = graft.text.Search.denseRanked(spark,
      state.read(spark, "dt"), state.read(spark, "dn"), queryTerms, candK)
    graft.text.Search.rrfFuse(sparse, dense, topK)
  }

  /** qs28 entry: hybrid RRF over the shared staged docs lake; shares
    * qd40's oracle SQL verbatim across the batch boundary. */
  def qs28StreamHybridRrf(spark: SparkSession, dir: String): DataFrame =
    streamHybridRrf(spark, stagedDocsLake(spark, dir))

  /** Streaming perceptual image dedup — qm4's arrival-time form and
    * the multimodal member of the streaming-dedup family (qs10 exact
    * text, qs13 near-dup text, qs15 semantic, this one images): media
    * rows stream in, each micro-batch pays its OWN codec pass (the
    * real PNG encode→decode→grayscale→box-average dHash kernel over
    * batch rows only — per-batch cost O(batch), embarrassingly
    * per-row), and appends its (media_id, dhash) rows to the
    * append-only hash index. Hashes are immutable facts, so the
    * snapshot read's dup-group window over the accumulated index folds
    * to exactly the batch report — a dup pair whose members arrived in
    * different batches is found the moment the later member lands.
    * Restart contract as the codes-index siblings: batch-keyed
    * overwrites, `alreadyFolded` skip — a double-appended batch would
    * duplicate (media_id, dhash) rows and break the report's
    * one-row-per-image shape, which the shared qm4 oracle catches. */
  def streamPhashDedup(spark: SparkSession, dir: String,
                       maxFilesPerTrigger: Int = 1,
                       pathGlobFilter: String = "*.parquet",
                       workDir: Option[String] = None,
                       compactEvery: Int = 16): DataFrame = {
    val work = resolveWork(workDir, "graft_sphash")
    val hSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("dhash", StringType)))
    val state = new AppendOnlyState(work, Seq(("h", hSchema)), compactEvery)
    val q = spark.readStream.schema(docsSchema)
      .option("pathGlobFilter", pathGlobFilter)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!state.alreadyFolded(batchId)) {
          state.endBatch(batch.sparkSession, batchId,
            "h" -> graft.enrich.Multimodal.phashFrame(batch))
        }
        maybePoison(batchId)
        ()
      }
      .start()
    q.awaitTermination()
    graft.enrich.Multimodal.phashReport(state.read(spark, "h"))
  }

  /** Streaming audio features — qm5's arrival-time form, completing the
    * multimodal streaming symmetry next to qs24 (images): audio rows
    * stream in, each micro-batch pays its OWN codec pass (the real
    * RIFF/WAVE synthesize→decode→integer-features kernel over batch
    * rows only — per-batch cost O(batch), embarrassingly per-row) and
    * appends its feature rows to the append-only table. Features are
    * immutable integer facts, so the snapshot read IS the report — no
    * fold — and equals qm5 over the same corpus (shared oracle SQL).
    * Restart contract as the family: batch-keyed overwrites,
    * `alreadyFolded` skip; a double-appended batch would duplicate
    * media rows and break the one-row-per-clip shape, which the shared
    * oracle's row count catches. */
  def streamAudioFeatures(spark: SparkSession, dir: String,
                          maxFilesPerTrigger: Int = 1,
                          pathGlobFilter: String = "*.parquet",
                          workDir: Option[String] = None,
                          compactEvery: Int = 16): DataFrame = {
    val work = resolveWork(workDir, "graft_saudio")
    val afSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("sample_rate", LongType),
      StructField("n_samples", LongType),
      StructField("peak", LongType),
      StructField("sum_abs", LongType),
      StructField("zero_crossings", LongType)))
    val state = new AppendOnlyState(work, Seq(("af", afSchema)), compactEvery)
    val q = spark.readStream.schema(docsSchema)
      .option("pathGlobFilter", pathGlobFilter)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!state.alreadyFolded(batchId)) {
          state.endBatch(batch.sparkSession, batchId,
            "af" -> graft.enrich.Multimodal.audioFrame(batch))
        }
        maybePoison(batchId)
        ()
      }
      .start()
    q.awaitTermination()
    state.read(spark, "af").orderBy("media_id")
  }

  /** qs30 entry: audio features over the shared staged docs lake;
    * shares qm5's oracle SQL verbatim across the batch boundary. */
  def qs30StreamAudio(spark: SparkSession, dir: String): DataFrame =
    streamAudioFeatures(spark, stagedDocsLake(spark, dir))

  /** Streaming Kneser-Ney — qd42's arrival-time form, extending the
    * streaming LM family (qs17 DSIR, qs19/qs21 drift, qs22 CMS): each
    * micro-batch tokenizes ONLY its own rows and appends its hashed
    * bigram type-count delta — a Heaps'-bounded count monoid, the same
    * sublinear-state argument as the batch table. The report folds the
    * types and scores a snapshot of the arrived corpus with the batch
    * form's factored tail (`knReport`), so every model quantity
    * (context totals, continuation counts, the type total) derives
    * from the folded monoid and the result equals qd42 exactly —
    * shared oracle SQL. Restart contract as the family: batch-keyed
    * overwrites, `alreadyFolded` skip; a double-folded batch inflates
    * its bigrams' counts AND every derived quantity, which exact
    * equality catches. */
  def streamKneserNey(spark: SparkSession, dir: String,
                      maxFilesPerTrigger: Int = 1,
                      pathGlobFilter: String = "*.parquet",
                      workDir: Option[String] = None,
                      compactEvery: Int = 16): DataFrame = {
    val work = resolveWork(workDir, "graft_skn")
    val tySchema = StructType(Seq(
      StructField("hu1", LongType), StructField("hu2", LongType),
      StructField("hw1", LongType), StructField("hw2", LongType),
      StructField("c", LongType)))
    val state = new AppendOnlyState(work, Seq(("ty", tySchema)), compactEvery,
      folds = Map("ty" -> ((df: DataFrame) =>
        df.groupBy("hu1", "hu2", "hw1", "hw2").agg(sum("c").as("c")))))
    val q = spark.readStream.schema(docsSchema)
      .option("pathGlobFilter", pathGlobFilter)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!state.alreadyFolded(batchId)) {
          state.endBatch(batch.sparkSession, batchId,
            "ty" -> graft.operators.TextOps.knPositions(batch)
              .groupBy("hu1", "hu2", "hw1", "hw2")
              .agg(count(lit(1)).as("c")))
        }
        maybePoison(batchId)
        ()
      }
      .start()
    q.awaitTermination()
    val snapshot = spark.read.schema(docsSchema)
      .option("pathGlobFilter", pathGlobFilter).parquet(dir)
    graft.operators.TextOps.knReport(
      graft.operators.TextOps.knPositions(snapshot),
      state.read(spark, "ty").groupBy("hu1", "hu2", "hw1", "hw2")
        .agg(sum("c").as("c")))
  }

  /** qs32 entry: Kneser-Ney over the shared staged docs lake; shares
    * qd42's oracle SQL verbatim across the batch boundary. */
  def qs32StreamKneserNey(spark: SparkSession, dir: String): DataFrame =
    streamKneserNey(spark, stagedDocsLake(spark, dir))

  /** Streaming `.mp4` container metadata — qm7's arrival-time form,
    * extending the streaming media family (qs24 pHash, qs30 audio):
    * media arrives, each micro-batch runs ONLY its own rows through the
    * real ISO-BMFF box walk (`Multimodal.mp4Frame`) and appends the
    * per-clip metadata facts. Append-only with no fold — one row per
    * clip, O(batch) per trigger — so the converged state equals the
    * batch answer regardless of arrival order and the driver can
    * hash-check it against qm7's SQL oracle verbatim. Restart contract
    * as the family: batch-keyed overwrites, `alreadyFolded` skip; a
    * double-appended batch duplicates clip rows and breaks the
    * one-row-per-clip shape, which the shared oracle's row count
    * catches. */
  def streamMp4Metadata(spark: SparkSession, dir: String,
                        maxFilesPerTrigger: Int = 1,
                        pathGlobFilter: String = "*.parquet",
                        workDir: Option[String] = None,
                        compactEvery: Int = 16): DataFrame = {
    val work = resolveWork(workDir, "graft_smp4")
    val mmSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("brand", StringType),
      StructField("timescale", LongType),
      StructField("duration_units", LongType),
      StructField("duration_ms", LongType),
      StructField("n_tracks", LongType),
      StructField("codecs", StringType),
      StructField("container_bytes", LongType)))
    val state = new AppendOnlyState(work, Seq(("mm", mmSchema)), compactEvery)
    val q = spark.readStream.schema(docsSchema)
      .option("pathGlobFilter", pathGlobFilter)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!state.alreadyFolded(batchId)) {
          state.endBatch(batch.sparkSession, batchId,
            "mm" -> graft.enrich.Multimodal.mp4Frame(batch))
        }
        maybePoison(batchId)
        ()
      }
      .start()
    q.awaitTermination()
    state.read(spark, "mm").orderBy("media_id")
  }

  /** qs34 entry: `.mp4` metadata over the shared staged docs lake;
    * shares qm7's oracle SQL verbatim across the batch boundary. */
  def qs34StreamMp4(spark: SparkSession, dir: String): DataFrame =
    streamMp4Metadata(spark, stagedDocsLake(spark, dir))

  /** Streaming MP3/ADTS metadata — qm8's arrival-time form, completing
    * the media streaming symmetry (qs24 images, qs30 audio features,
    * qs34 video containers, qs35 audio containers): per-batch frame
    * walks (`Multimodal.mpegAudioFrame`) into an append-only per-stream
    * metadata index. Same append-only/no-fold convergence and restart
    * contract as qs34. (qm9/qm10/qm12/qm14 probe DEEPER layers of the
    * same `.mp4` object qs34 already streams, and qm13 drives qm10's
    * plan through a transport — their arrival-time shape would be this
    * same kernel swap, so they deliberately get no separate streaming
    * entries.) */
  def streamMpegAudioMetadata(spark: SparkSession, dir: String,
                              maxFilesPerTrigger: Int = 1,
                              pathGlobFilter: String = "*.parquet",
                              workDir: Option[String] = None,
                              compactEvery: Int = 16): DataFrame = {
    val work = resolveWork(workDir, "graft_smpeg")
    val maSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("container", StringType),
      StructField("sample_rate", LongType),
      StructField("bitrate_kbps", LongType),
      StructField("n_frames", LongType),
      StructField("duration_ms", LongType),
      StructField("stream_bytes", LongType)))
    val state = new AppendOnlyState(work, Seq(("ma", maSchema)), compactEvery)
    val q = spark.readStream.schema(docsSchema)
      .option("pathGlobFilter", pathGlobFilter)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!state.alreadyFolded(batchId)) {
          state.endBatch(batch.sparkSession, batchId,
            "ma" -> graft.enrich.Multimodal.mpegAudioFrame(batch))
        }
        maybePoison(batchId)
        ()
      }
      .start()
    q.awaitTermination()
    state.read(spark, "ma").orderBy("media_id")
  }

  /** qs35 entry: MP3/ADTS metadata over the shared staged docs lake;
    * shares qm8's oracle SQL verbatim across the batch boundary. */
  def qs35StreamMpegAudio(spark: SparkSession, dir: String): DataFrame =
    streamMpegAudioMetadata(spark, stagedDocsLake(spark, dir))

  /** Streaming unigram segmentation — qd43's arrival-time form, the
    * tokenize step of a streaming ingest pipeline: the capped piece
    * vocabulary is induced ONCE from the staged corpus (a model build —
    * the qs18/qs20 frozen-codebook shape; the vocabulary is a pure
    * deterministic function of the corpus, so freezing it is exact, not
    * approximate) and each micro-batch pays only its own per-document
    * Viterbi DP against the broadcast set — O(batch) — appending its
    * segment rows. Append-only with no fold: one row per doc, so the
    * converged state equals the batch answer regardless of arrival
    * order and the driver hash-checks it against qd43's SQL oracle
    * verbatim. Restart contract as the family: batch-keyed overwrites,
    * `alreadyFolded` skip; a double-appended batch duplicates doc rows,
    * which the shared oracle's row count catches. */
  def streamUnigramSegment(spark: SparkSession, dir: String,
                           maxFilesPerTrigger: Int = 1,
                           pathGlobFilter: String = "*.parquet",
                           workDir: Option[String] = None,
                           compactEvery: Int = 16,
                           piecesMemoKey: Option[String] = None): DataFrame = {
    val work = resolveWork(workDir, "graft_suniseg")
    val segSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_chars", LongType),
      StructField("vocab_hits", LongType),
      StructField("best_score", LongType),
      StructField("best_pieces", LongType)))
    val state = new AppendOnlyState(work, Seq(("seg", segSchema)), compactEvery)
    // frozen model: the deterministic capped vocabulary of the corpus
    val pieces = graft.text.Unigram.inducedPieces(
      spark.read.schema(docsSchema).parquet(dir), piecesMemoKey)
    val q = spark.readStream.schema(docsSchema)
      .option("pathGlobFilter", pathGlobFilter)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!state.alreadyFolded(batchId)) {
          state.endBatch(batch.sparkSession, batchId,
            "seg" -> graft.text.Unigram.segmentWith(batch, pieces))
        }
        maybePoison(batchId)
        ()
      }
      .start()
    q.awaitTermination()
    state.read(spark, "seg").orderBy("doc_id")
  }

  /** qs36 entry: unigram segmentation over the shared staged docs
    * lake; shares qd43's oracle SQL verbatim across the batch
    * boundary. */
  def qs36StreamSegment(spark: SparkSession, dir: String): DataFrame =
    // the staged lake is the SAME document set as the source corpus and
    // the piece vocabulary is order-independent, so qs36 shares qd43's
    // memo entry (the qs25/qs26 ticketed-signature-share precedent)
    streamUnigramSegment(spark, stagedDocsLake(spark, dir),
      piecesMemoKey = Some(graft.Tables.contentKey(s"$dir/documents.parquet")))

  /** Streaming LEAKAGE-SAFE split — qd35's arrival-time form: documents
    * stream in, every micro-batch pays only its own near-dup kernel +
    * band probe (the `streamNearDup` machinery and its append-only
    * mem/reps/pairs/bands state, restart contract included), and the
    * split map is the DERIVED view over the accumulated pair state:
    * components resolved over the total emitted pair set, every doc
    * bucketed by its cluster REP's hash (own id when unclustered) —
    * exactly qd35, so the result folds to the batch split across any
    * batch boundary or restart.
    *
    * The split is a derived view rather than a per-batch emission BY
    * DESIGN: a batch-time bucket for a new doc could be invalidated by
    * a LATER batch merging its cluster (rep changes → bucket changes),
    * so eagerly emitted assignments are provisional by nature. The
    * monotone facts are the pairs; the split map is a deterministic
    * function of them — the qs22/qs24 report-over-state shape, which is
    * what makes the oracle shareable with qd35 verbatim. */
  def streamLeakSplit(spark: SparkSession, dir: String,
                      maxFilesPerTrigger: Int = 1,
                      pathGlobFilter: String = "*.parquet",
                      workDir: Option[String] = None,
                      precomputedSigs: Option[DataFrame] = None): DataFrame = {
    import graft.dedup.MinHashLSH
    val pairs = streamNearDup(spark, dir,
      maxFilesPerTrigger = maxFilesPerTrigger,
      pathGlobFilter = pathGlobFilter, workDir = workDir,
      precomputedSigs = precomputedSigs)
    val docsDf = spark.read.schema(docsSchema)
      .option("pathGlobFilter", pathGlobFilter).parquet(dir)
    val sigs = precomputedSigs.getOrElse(
      MinHashLSH.docSignatures(spark, docsDf)
        .toDF("doc_id", "txt_md5", "sh", "bands"))
    val clusters = graft.dedup.Clusters.repClusters(sigs, pairs)
    graft.operators.TextOps.leakSafeSplitFrom(docsDf, clusters)
  }

  /** qs25 entry: streaming leakage-safe split over the shared staged
    * docs lake (two range-partitioned batches); shares qd35's oracle
    * SQL verbatim across the batch boundary. The lake IS the corpus,
    * so the per-batch kernel reuses the session-memoized signature
    * table (the qs13 ticketed share). */
  def qs25StreamLeakSplit(spark: SparkSession, dir: String): DataFrame =
    streamLeakSplit(spark, stagedDocsLake(spark, dir),
      precomputedSigs = Some(graft.dedup.MinHashLSH.signatures(spark, dir)))

  /** Streaming MULTIMODAL curation — qm6's arrival-time form, and the
    * production ingest shape: ONE stream over the post+media lake
    * maintains BOTH curation indices per micro-batch — the near-dup
    * fold's mem/reps/pairs/bands state (O(batch) kernel + band probe,
    * `nearDupBatchDelta`) and the image perceptual-hash index
    * (O(batch) codec pass, the qs24 fold) — committed in a single
    * `endBatch`, so a replayed batch re-lands BOTH gates' deltas
    * idempotently and the restart contract covers the composite. The
    * keep-list is the DERIVED view over the accumulated state (the
    * qs25 rationale: later batches can merge clusters or reveal image
    * dups, so batch-time keeps are provisional by nature): clusters
    * from the total pair set, image dups from the folded hash index,
    * text flags pure per-row — assembled by qm6's own
    * `curationAssembly`, so the result folds to the batch keep-list
    * across any boundary and shares qm6's oracle verbatim. */
  def streamMultimodalCuration(spark: SparkSession, dir: String,
                               threshold: Double = 0.8,
                               maxFilesPerTrigger: Int = 1,
                               pathGlobFilter: String = "*.parquet",
                               compactEvery: Int = 16,
                               workDir: Option[String] = None,
                               precomputedSigs: Option[DataFrame] = None): DataFrame = {
    import graft.dedup.MinHashLSH
    val work = resolveWork(workDir, "graft_smmcur")
    val outDir = s"$work/pairs_out"
    val hSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("dhash", StringType)))
    val state = new AppendOnlyState(work,
      nearDupStateSchemas :+ ("h" -> hSchema), compactEvery)
    bandRowsPerBatch.clear()
    val q = spark.readStream.schema(docsSchema)
      .option("pathGlobFilter", pathGlobFilter)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ss = batch.sparkSession
        if (state.alreadyFolded(batchId)) { maybePoison(batchId) }
        else {
          val ndDeltas = nearDupBatchDelta(state, ss, batch, batchId,
            threshold, precomputedSigs, outDir)
          state.endBatch(ss, batchId,
            (ndDeltas :+ ("h" -> graft.enrich.Multimodal.phashFrame(batch))): _*)
          maybePoison(batchId)
        }
        ()
      }
      .start()
    q.awaitTermination()
    val pairs = nearDupEmissions(spark, outDir)
    val docsDf = spark.read.schema(docsSchema)
      .option("pathGlobFilter", pathGlobFilter).parquet(dir)
    val sigs = precomputedSigs.getOrElse(
      MinHashLSH.docSignatures(spark, docsDf)
        .toDF("doc_id", "txt_md5", "sh", "bands"))
    val clusters = graft.dedup.Clusters.repClusters(sigs, pairs)
    val phashed = graft.enrich.Multimodal.phashReport(state.read(spark, "h"))
    graft.enrich.Multimodal.curationAssembly(docsDf, clusters, phashed)
  }

  /** qs26 entry: streaming multimodal curation over the shared staged
    * docs lake; shares qm6's oracle SQL verbatim across the batch
    * boundary. The lake IS the corpus, so the per-batch near-dup
    * kernel reuses the session-memoized signature table. */
  def qs26StreamCuration(spark: SparkSession, dir: String): DataFrame =
    streamMultimodalCuration(spark, stagedDocsLake(spark, dir),
      precomputedSigs = Some(graft.dedup.MinHashLSH.signatures(spark, dir)))

  /** qs24 entry: streaming image dedup over the shared staged docs
    * lake; shares qm4's oracle SQL verbatim across the batch boundary. */
  def qs24StreamPhash(spark: SparkSession, dir: String): DataFrame =
    streamPhashDedup(spark, stagedDocsLake(spark, dir))

  /** Streaming incremental NEAR-duplicate detection — the arrival-time
    * form of qs1_minhash_neardup: documents stream in, each micro-batch
    * pays only its own signature kernel plus a band probe against the
    * accumulated state, and the union of per-batch emissions equals the
    * batch pair set exactly, regardless of arrival order or batch
    * boundaries.
    *
    * State is APPEND-ONLY parquet (near-dup state is purely additive —
    * members, representatives, band postings, and verified rep pairs are
    * only ever added), one logical table each:
    *   - mem(txt_md5, doc_id): every non-empty-shingle doc seen;
    *   - reps(txt_md5, rep, sh, bands): one representative per DISTINCT
    *     text — the exact-dup collapse carried into streaming, so band
    *     buckets stay linear under boilerplate floods;
    *   - pairs(rep_a, rep_b, jaccard): verified rep-level pairs;
    *   - bands(rep, band_idx, band_hash): the exploded band INDEX of all
    *     representatives, written once per rep when it first arrives.
    *
    * Per batch: (1) kernel over the batch only; (2) NOVEL texts explode
    * their bands (O(batch) band rows — `bandRowsPerBatch` records this,
    * spec-asserted proportional to the batch, not the state) and probe
    * the persisted band index; accumulated reps are never re-exploded.
    * The probe broadcasts the new batch's skinny band rows, so the state
    * index streams through without a shuffle; (3) emit the pairs
    * involving at least one new member: intra-group (identical texts,
    * Jaccard 1.0), expansions of newly verified rep pairs, and new
    * members inheriting their group's previously verified rep pairs.
    * Each pair is emitted exactly once — in the batch where its later
    * member arrives. Per-batch writes are O(batch); every `compactEvery`
    * batches the per-batch parquet files are compacted into a fresh
    * generation dir and the superseded generation is deleted.
    *
    * Restart contract: the dedup state lives NEXT TO the streaming
    * checkpoint under one `work` dir and the two reload TOGETHER — pass
    * `workDir` and a restarted invocation resumes where the crash left
    * off: the checkpoint skips already-ingested files, `AppendOnlyState`
    * reconstructs its generation clock from the directory layout, and a
    * batch replayed from the at-least-once window (crash between the
    * state append and the checkpoint commit) overwrites its own
    * batch-keyed state/output subdirs instead of appending twice. Emitted
    * pairs accumulate under batch-keyed subdirs across restarts, so the
    * final read returns the COMPLETE pair set. The default (no `workDir`)
    * is a fresh temp dir per invocation, cleaned at JVM exit. */
  /** The near-dup fold's four append-only state tables — shared by
    * `streamNearDup` and the composite curation stream (qs26). */
  private val nearDupStateSchemas: Seq[(String, StructType)] = Seq(
    "mem" -> StructType(Seq(StructField("txt_md5", StringType),
      StructField("doc_id", LongType))),
    "reps" -> StructType(Seq(StructField("txt_md5", StringType),
      StructField("rep", LongType),
      StructField("sh", ArrayType(StringType)),
      StructField("bands", ArrayType(LongType)))),
    "pairs" -> StructType(Seq(StructField("rep_a", LongType),
      StructField("rep_b", LongType), StructField("jaccard", DoubleType))),
    "bands" -> StructType(Seq(StructField("rep", LongType),
      StructField("band_idx", IntegerType), StructField("band_hash", LongType))))

  def streamNearDup(spark: SparkSession, dir: String,
                    threshold: Double = 0.8,
                    maxFilesPerTrigger: Int = 1,
                    pathGlobFilter: String = "*.parquet",
                    compactEvery: Int = 16,
                    workDir: Option[String] = None,
                    precomputedSigs: Option[DataFrame] = None): DataFrame = {
    import graft.dedup.MinHashLSH
    val work = resolveWork(workDir, "graft_sneardup")
    val outDir = s"$work/pairs_out"
    val state = new AppendOnlyState(work, nearDupStateSchemas, compactEvery)
    bandRowsPerBatch.clear()
    val q = spark.readStream.schema(docsSchema)
      .option("pathGlobFilter", pathGlobFilter)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ss = batch.sparkSession
        // a replayed batch that compaction already folded in cannot be
        // excluded from state reads — and its writes all completed
        // (compaction runs inside its endBatch) — so skip it wholesale
        if (state.alreadyFolded(batchId)) { maybePoison(batchId) }
        else {
          val deltas = nearDupBatchDelta(state, ss, batch, batchId,
            threshold, precomputedSigs, outDir)
          state.endBatch(ss, batchId, deltas: _*)
          maybePoison(batchId)
        }
        ()
      }
      .start()
    q.awaitTermination()
    nearDupEmissions(spark, outDir)
  }

  /** One micro-batch of the incremental near-dup fold, WITHOUT the
    * state commit: computes this batch's mem/reps/pairs/bands deltas
    * against the accumulated state (reads exclude the batch's own
    * possibly-crashed writes), writes the batch's pair emissions to
    * `outDir/b$batchId` (batch-keyed overwrite — replay-idempotent),
    * and returns the four deltas for the caller's single
    * `state.endBatch`. Factored so composite streams (qs26) can fold
    * several gates' states in ONE pass over each batch with ONE
    * atomic-enough commit point, instead of one stream per gate. */
  private def nearDupBatchDelta(state: AppendOnlyState,
                                ss: SparkSession, batch: DataFrame,
                                batchId: Long, threshold: Double,
                                precomputedSigs: Option[DataFrame],
                                outDir: String): Seq[(String, DataFrame)] = {
        import graft.dedup.MinHashLSH
        // (1) batch kernel; empty shingle sets never band or pair (0/0
        // Jaccard — same exclusion as the batch pipeline and the oracle).
        // When the stream's source IS a lake whose signature table is
        // already maintained (`precomputedSigs` — the production pattern:
        // signatures as a materialized derived table; here the session
        // memo the batch queries share), the per-batch kernel is a keyed
        // LOOKUP of the batch's ids, not a recompute.
        val bSigs = precomputedSigs.fold(
            MinHashLSH.docSignatures(ss, batch)
              .toDF("doc_id", "txt_md5", "sh", "bands"))(sigs =>
            batch.select("doc_id").join(sigs, "doc_id")
              .select(col("doc_id"), col("txt_md5"), col("sh"), col("bands")))
          .filter(size(col("sh")) > 0)
          .localCheckpoint(true)
        // all state reads exclude this batch's own (possibly crashed)
        // writes, so a replay computes from exactly the state the original
        // attempt saw; reads are consumed (via the eager newRepPairs/
        // emitted checkpoints) BEFORE this batch's endBatch appends — the
        // read-before-append contract documented on AppendOnlyState
        val prevMem = state.read(ss, "mem", excludeBatch = Some(batchId))
        val prevReps = state.read(ss, "reps", excludeBatch = Some(batchId))
        val prevPairs = state.read(ss, "pairs", excludeBatch = Some(batchId))
        val prevBandIdx = state.read(ss, "bands", excludeBatch = Some(batchId))
        val bGroups = bSigs.groupBy("txt_md5")
          .agg(min("doc_id").as("cand_rep"))
        val newMem = bSigs.select(col("txt_md5"), col("doc_id"))
        // (2) novel texts: their first-arrival minimum becomes the rep
        val novelReps = bGroups
          .join(prevReps.select("txt_md5"), Seq("txt_md5"), "left_anti")
          .withColumnRenamed("cand_rep", "rep")
          .join(bSigs.select(col("txt_md5"), col("doc_id").as("rep"),
            col("sh"), col("bands")), Seq("txt_md5", "rep"))
          .localCheckpoint(true)
        val repsAfter = prevReps.unionByName(novelReps)
        // band explode of the NEW reps only — O(batch), never O(state)
        val newBands = novelReps.select(col("rep"),
          posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
          .localCheckpoint(true)
        if (recordBandRows) bandRowsPerBatch += newBands.count()
        val cands = broadcast(newBands).as("a")
          .join(prevBandIdx.unionByName(newBands).as("b"),
            col("a.band_idx") === col("b.band_idx") &&
            col("a.band_hash") === col("b.band_hash") &&
            col("a.rep") =!= col("b.rep"))
          .select(least(col("a.rep"), col("b.rep")).as("rep_a"),
            greatest(col("a.rep"), col("b.rep")).as("rep_b"))
          .distinct()
        val sh = repsAfter.select(col("rep"), col("sh"))
        val overlap = graft.functions.SetFunctions
          .sortedOverlap(col("sh_a"), col("sh_b"))
        val newRepPairs = cands
          .join(sh.withColumnRenamed("rep", "rep_a").withColumnRenamed("sh", "sh_a"), "rep_a")
          .join(sh.withColumnRenamed("rep", "rep_b").withColumnRenamed("sh", "sh_b"), "rep_b")
          .select(col("rep_a"), col("rep_b"),
            (overlap.cast("double") /
              (size(col("sh_a")) + size(col("sh_b")) - overlap).cast("double"))
              .as("jaccard"))
          .filter(col("jaccard") >= threshold)
          .localCheckpoint(true)
        // (3) member-level emissions — every pair involves a new member.
        // These unions/joins read the state dirs LAZILY and are fully
        // consumed when `emitted` materializes below (before this batch
        // appends) — materializing them per batch would be O(state) work;
        // only the joins that genuinely need all members pay that read
        val memAfter = prevMem.unionByName(newMem)
        val groupRep = repsAfter.select(col("txt_md5"), col("rep"))
        val memRepAfter = memAfter.join(groupRep, "txt_md5")
          .select(col("doc_id"), col("rep"))
        val newMemRep = newMem.join(groupRep, "txt_md5")
          .select(col("doc_id"), col("rep"))
        val intra = newMem.as("a").join(memAfter.as("b"),
            col("a.txt_md5") === col("b.txt_md5") &&
            col("a.doc_id") =!= col("b.doc_id"))
          .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
            greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
            lit(1.0).as("jaccard"))
          .filter(lit(1.0) >= threshold)
        // shared collapse expansion (dedup.Collapse): member maps are
        // (doc_id, rep) — positionally (m, rep); asymmetric left/right
        // lets the incremental form expand old rep pairs against only the
        // NEW members on one side
        def expand(pairs: DataFrame, left: DataFrame, right: DataFrame) =
          graft.dedup.Collapse.expand(pairs.toDF("doc_a", "doc_b", "jaccard"),
            left, right, "doc_a", "doc_b")
        val eNew = expand(newRepPairs, memRepAfter, memRepAfter)
        val eOld = expand(prevPairs, newMemRep, memRepAfter)
          .unionByName(expand(prevPairs, memRepAfter, newMemRep))
        val emitted = intra.unionByName(eNew).unionByName(eOld).distinct()
          .localCheckpoint(true)
        // batch-keyed overwrite: a replayed batch recomputes the SAME
        // emission set (deterministic given idempotent state) and lands
        // on its own subdir instead of appending a duplicate copy
        if (!emitted.isEmpty)
          emitted.write.mode("overwrite").parquet(s"$outDir/b$batchId")
        // append-only state rollover: O(batch) rows written per table per
        // batch (the r4 versioned-dir scheme rewrote the FULL state each
        // batch — O(total) I/O); generational compaction handled by the
        // shared AppendOnlyState, committed ONCE by the caller
        Seq("mem" -> newMem, "reps" -> novelReps,
          "pairs" -> newRepPairs, "bands" -> newBands)
  }

  /** The accumulated pair emissions of a near-dup stream run. */
  private def nearDupEmissions(spark: SparkSession, outDir: String): DataFrame =
    if (new java.io.File(outDir).isDirectory)
      spark.read.option("recursiveFileLookup", "true").parquet(outDir)
        .orderBy("doc_a", "doc_b")
    else {
      import spark.implicits._
      Seq.empty[(Long, Long, Double)].toDF("doc_a", "doc_b", "jaccard")
    }

  /** qs13 entry: streaming near-dup over the shared corpus — equals the
    * batch qs1 pair set, so it shares qs1's oracle. The stream source IS
    * the batch lake, so the per-batch kernel reuses the session-memoized
    * signature table (the r5 verdict's ticketed share) — the arrival-time
    * probe/emission machinery is still exercised in full. */
  def qs13StreamNearDup(spark: SparkSession, dir: String): DataFrame =
    streamNearDup(spark, dir, pathGlobFilter = "documents.parquet",
      precomputedSigs = Some(graft.dedup.MinHashLSH.signatures(spark, dir)))

  /** Event row / session-state types for the stateful sessionizer. */
  case class Ev(user_id: Long, event_id: Long, ts_us: Long)
  case class OpenSession(session_id: Long, n_events: Long, start_us: Long, end_us: Long)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                        start_us: Long, end_us: Long)

  /** §2.8 custom state: gap-based sessionization with
    * `flatMapGroupsWithState` — the KeyValueGroupedDataset stateful path
    * (SURVEY §2.8 "flatMapGroupsWithState keyed on post id"). Sessions
    * close after 30 minutes of inactivity; state carries the open session
    * across micro-batches. AvailableNow replay of the static lake is a
    * single micro-batch, so the still-open session is emitted too and the
    * result equals batch q19_sessionize (its oracle).
    */
  def streamSessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = 30L * 60L * 1000000L

    def sessionize(uid: Long, rows: Iterator[Ev],
                   state: GroupState[OpenSession]): Iterator[SessionOut] = {
      val evs = rows.toArray.sortBy(e => (e.ts_us, e.event_id))
      var open = state.getOption
      var baseId = open.map(_.session_id).getOrElse(0L)
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      evs.foreach { e =>
        open match {
          case Some(s) if e.ts_us - s.end_us <= gapUs =>
            open = Some(s.copy(n_events = s.n_events + 1, end_us = e.ts_us))
          case Some(s) =>
            out += SessionOut(uid, s.session_id, s.n_events, s.start_us, s.end_us)
            baseId = s.session_id + 1
            open = Some(OpenSession(baseId, 1L, e.ts_us, e.ts_us))
          case None =>
            baseId += 1
            open = Some(OpenSession(baseId, 1L, e.ts_us, e.ts_us))
        }
      }
      open.foreach(state.update)
      // emit the still-open session as well: AvailableNow over a static
      // lake is one batch, and batch-parity requires the final session
      out ++= open.map(s => SessionOut(uid, s.session_id, s.n_events, s.start_us, s.end_us))
      out.iterator
    }

    val name = s"graft_sess_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    val q = eventStream(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(sessionize)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .select(col("user_id"), col("session_id"), col("n_events"),
        col("start_us"), col("end_us"))
      .orderBy("user_id", "session_id")
  }

  /** §2.8 windowed aggregation as a stream: tumbling 1-hour windows with a
    * watermark, complete-mode replay == batch q18_hourly_rollup. */
  def streamHourlyRollup(spark: SparkSession, dir: String): DataFrame = {
    val name = s"graft_hourly_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    val q = eventStream(spark, dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.ExactStats.sum2dp(col("value")).as("value_sum"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .select(unix_micros(col("window.start")).as("hour_us"),
        col("event_type"), col("n_events"), col("value_sum"))
      .orderBy("hour_us", "event_type")
  }
}
