package graft.streaming

import java.nio.file.Files

import graft.Tables
import graft.similarity.Ann
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming PQ ingestion — the arrival-time form of qe8_pq_topk
  * (compressed-domain ANN): embedding batches stream in, each micro-batch
  * pays ONE encode pass over its own rows (map-side argmin against the
  * BROADCAST frozen codebook — the qe8 shape exactly), and appends its
  * (vec_id, codes) rows to an append-only codes INDEX. Any snapshot read
  * ranks the accumulated index by asymmetric distance and returns
  * byte-identical rows to the batch operator over the same corpus —
  * which is how a production vector store actually ingests: vectors
  * arrive continuously, the compressed index grows by appends, and
  * searches run against whatever has arrived.
  *
  * The codebook is MODEL STATE, trained once over the lake and FROZEN
  * across batches and restarts (the SemDedupStream quantizer contract):
  * PQ code ids are only comparable under the codebook that produced
  * them, so an evolving codebook would silently mix incompatible codes
  * — re-encoding on codebook refresh is a batch rebuild (qe8), not a
  * stream. Encoding is embarrassingly per-row, so per-batch cost is
  * O(batch); the per-vector state row is m small ints — the
  * memory-bandwidth compression that makes the 100 TB ADC scan viable
  * is exactly what makes the state append tiny here.
  *
  * Restart contract shared with the sibling streams: the codes index
  * and the streaming checkpoint live side by side under `workDir` and
  * reload together; a batch replayed from the at-least-once window
  * re-encodes the same vectors (pure function of the frozen codebook)
  * and overwrites its own batch-keyed subdir — a double append would
  * duplicate (vec_id, codes) rows and corrupt every ADC ranking the
  * duplicated vector appears in, which the shared qe8 oracle would
  * catch. */
object PqStream {

  private val embStreamSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  def streamPqTopk(spark: SparkSession, stagedDir: String, cb: DataFrame,
                   m: Int, subDim: Int, k: Int = 5,
                   pred: String = "vec_id % 25 = 0",
                   maxQ: Int = Ann.DefaultMaxQueries,
                   maxFilesPerTrigger: Int = 1,
                   compactEvery: Int = 16,
                   workDir: Option[String] = None): DataFrame = {
    val work = workDir match {
      case Some(w) =>
        Files.createDirectories(java.nio.file.Paths.get(w)); w
      case None =>
        val t = Files.createTempDirectory("graft_spq").toString
        Replay.cleanupAtExit(t); t
    }
    val codesSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("codes", ArrayType(IntegerType))))
    val state = new AppendOnlyState(work, Seq(("codes", codesSchema)),
      compactEvery)
    val q = spark.readStream.schema(embStreamSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(stagedDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!state.alreadyFolded(batchId)) {
          state.endBatch(batch.sparkSession, batchId,
            "codes" -> Ann.pqCodes(batch, cb, m, subDim))
        }
        Replay.maybePoison(batchId)
        ()
      }
      .start()
    q.awaitTermination()
    val lake = spark.read.schema(embStreamSchema).parquet(stagedDir)
    Ann.adcTopk(Ann.querySample(lake, pred, maxQ), cb,
      state.read(spark, "codes"), k, m, subDim)
  }

  /** Streaming IVF-PQ ingestion — the production vector-store WRITE
    * PATH (qe9's arrival-time form): embedding batches stream in, each
    * micro-batch encodes its own rows against the FROZEN PQ codebook
    * and assigns them to their coarse cell against the FROZEN centroid
    * table (both are model state, trained once over the lake — the
    * SemDedupStream quantizer contract), then appends (vec_id, codes)
    * into a codes index PARTITIONED BY CELL on disk. A snapshot search
    * ranks by integer ADC within each query's nprobe probed cells and
    * returns byte-identical rows to qe9 over the same corpus.
    *
    * The cell-partitioned layout is the point: the probed cells are
    * already driver-resident (the capped query sample's probe ranking
    * builds them), so the snapshot read prunes the index scan to the
    * UNION of probed cells with a static partition filter — the scan
    * physically reads nprobe-of-k cells' files (spec-asserted on the
    * executed plan), which is what makes a low-probe search on a
    * 100 TB store read gigabytes, not the store. (qs14 demonstrates
    * the DYNAMIC variant of the same pruning, where the probe set
    * stays distributed.)
    *
    * Idempotent replay without a fold: each batch writes its rows via
    * DYNAMIC partition overwrite under (b = batchId, cell = …), so a
    * batch replayed from the at-least-once window overwrites exactly
    * its own partitions — a double append would duplicate candidates
    * and corrupt every ADC ranking the duplicated vectors appear in,
    * which the shared qe9 oracle would catch. The `b` partition column
    * doubles as the batch audit trail; compaction (folding b=* within
    * a cell) is deliberately left to a batch rebuild, as a production
    * vector store does. */
  def streamIvfPqTopk(spark: SparkSession, stagedDir: String, cb: DataFrame,
                      cents: DataFrame, m: Int, subDim: Int, k: Int = 5,
                      nprobe: Int = 2, pred: String = "vec_id % 25 = 0",
                      maxQ: Int = Ann.DefaultMaxQueries,
                      maxFilesPerTrigger: Int = 1,
                      workDir: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.VectorOps.cosine
    val work = workDir match {
      case Some(w) =>
        Files.createDirectories(java.nio.file.Paths.get(w)); w
      case None =>
        val t = Files.createTempDirectory("graft_sivfpq").toString
        Replay.cleanupAtExit(t)
        t
    }
    val idx = s"$work/codes"
    val q = spark.readStream.schema(embStreamSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(stagedDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cells = Ann.assignments(
            batch.withColumn("label", lit(0)), cents)
          .select(col("vec_id"), col("cell").cast("int").as("cell"))
        Ann.pqCodes(batch, cb, m, subDim)
          .join(cells, "vec_id")
          .withColumn("b", lit(batchId))
          .repartition(col("cell")) // one file per (batch, cell)
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("b", "cell")
          .parquet(idx)
        Replay.maybePoison(batchId)
        ()
      }
      .start()
    q.awaitTermination()
    val lake = spark.read.schema(embStreamSchema).parquet(stagedDir)
    val sample = Ann.querySample(lake, pred, maxQ)
    val queries = sample
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val cellRank = Window.partitionBy("q_id")
      .orderBy(col("qsim").desc, col("cell"))
    val probedRows = queries.crossJoin(broadcast(cents))
      .withColumn("qsim", round(cosine(col("q_vec"), col("centroid")), 6))
      .withColumn("crk", row_number().over(cellRank))
      .filter(col("crk") <= nprobe)
      .select(col("q_id"), col("cell").cast("int").as("cell"))
    val collected = probedRows.collect()
    val probedCells = collected.map(_.getInt(1)).distinct.sorted
    // static partition pruning: the scan reads ONLY the probed cells'
    // directories of the index (the probe set is driver-resident by
    // construction — cap × nprobe rows — so no runtime subquery needed)
    val codes = spark.read.parquet(idx)
      .filter(col("cell").isin(probedCells.map(Int.box): _*))
      .select(col("vec_id"), col("codes"), col("cell").cast("int").as("cell"))
    val probedLocal = spark.createDataFrame(
      java.util.Arrays.asList(collected: _*), probedRows.schema)
    Ann.adcTopk(sample, cb, codes, k, m, subDim, probed = Some(probedLocal))
  }

  /** qs20 entry: streaming IVF-PQ over the two-file embeddings lake
    * (shared with qs18), frozen codebook + centroids from the lake;
    * shares qe9's oracle SQL verbatim across the batch boundary. */
  def qs20StreamIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val staged = stagedPqLake(spark, dir, emb)
    val m = 4
    val subDim = Ann.pqSubDim(emb, m)
    val cb = Ann.pqCodebook(emb, m, subDim,
      memoKey = Some(Ann.codebookMemoKey(dir, "pq")))
    val cents = Ann.localCentroids(emb)
    streamIvfPqTopk(spark, staged, cb, cents, m, subDim)
  }

  /** qs18 entry: the embeddings lake staged as two vec_id-range files
    * (contents-memoized like the qs10/qs16/qs17 lakes), so the
    * oracle-checked run crosses a batch boundary — the ranking folds
    * codes appended by BOTH batches, which a dropped or double-applied
    * batch would corrupt. Shares qe8's oracle SQL verbatim. */
  def qs18StreamPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val staged = stagedPqLake(spark, dir, emb)
    val m = 4
    val subDim = Ann.pqSubDim(emb, m)
    val cb = Ann.pqCodebook(emb, m, subDim,
      memoKey = Some(Ann.codebookMemoKey(dir, "pq")))
    streamPqTopk(spark, staged, cb, m, subDim)
  }

  /** Streaming SQ8 ingestion — qe11's arrival-time form, completing the
    * compression family's streaming story next to qs18 (PQ) and qs20
    * (IVF-PQ): the per-dimension [mn, mx] ranges and pico-weights are
    * MODEL STATE trained once over the lake and FROZEN (SQ codes are
    * only comparable under the ranges that produced them — an evolving
    * range would silently re-grid the corpus; re-coding on range
    * refresh is a batch rebuild, exactly the codebook contract). Each
    * micro-batch pays one zero-shuffle encode projection over its own
    * rows and appends (vec_id, codes) to the append-only index; a
    * snapshot read runs the integer weighted-L2 kernel over the
    * accumulated codes and returns byte-identical rows to qe11. */
  def streamSqTopk(spark: SparkSession, stagedDir: String,
                   mn: Array[Double], mx: Array[Double], weights: Array[Long],
                   k: Int = 5, pred: String = "vec_id % 25 = 0",
                   maxQ: Int = Ann.DefaultMaxQueries,
                   maxFilesPerTrigger: Int = 1,
                   compactEvery: Int = 16,
                   workDir: Option[String] = None): DataFrame = {
    val work = workDir match {
      case Some(w) =>
        Files.createDirectories(java.nio.file.Paths.get(w)); w
      case None =>
        val t = Files.createTempDirectory("graft_ssq").toString
        Replay.cleanupAtExit(t); t
    }
    val codesSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("codes", ArrayType(IntegerType))))
    val state = new AppendOnlyState(work, Seq(("codes", codesSchema)),
      compactEvery)
    val q = spark.readStream.schema(embStreamSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(stagedDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!state.alreadyFolded(batchId)) {
          state.endBatch(batch.sparkSession, batchId,
            "codes" -> Ann.sqCodesWith(batch, mn, mx))
        }
        Replay.maybePoison(batchId)
        ()
      }
      .start()
    q.awaitTermination()
    val lake = spark.read.schema(embStreamSchema).parquet(stagedDir)
    Ann.sqRank(state.read(spark, "codes"), weights,
      Ann.querySample(lake, pred, maxQ).select(col("vec_id")), k)
  }

  /** qs23 entry: streaming SQ8 over the shared two-file embeddings
    * lake; frozen ranges from the lake. Shares qe11's oracle SQL
    * verbatim across the batch boundary. */
  def qs23StreamSq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val staged = stagedPqLake(spark, dir, emb)
    val (mn, mx, weights) = Ann.sqStats(emb)
    streamSqTopk(spark, staged, mn, mx, weights)
  }

  /** Two-file vec_id-range staging of the embeddings lake, contents-
    * memoized and shared by qs18/qs20 so both streams cross the same
    * batch boundary. */
  private def stagedPqLake(spark: SparkSession, dir: String,
                           emb: DataFrame): String =
    Replay.stagedLakes.computeIfAbsent(
      "pq|" + Tables.contentKey(s"$dir/embeddings.parquet"), _ => {
        val t = Files.createTempDirectory("graft_pq_lake").toString
        Replay.cleanupAtExit(t)
        emb.select(col("vec_id"), col("embedding"))
          .repartitionByRange(2, col("vec_id"))
          .write.mode("overwrite").parquet(t)
        t
      })

  /** Streaming MMR-diversified retrieval — qe15's arrival-time form
    * and the last retrieval-family member without a streaming twin
    * (VERDICT r10 #6, the qs27/qs28 pattern): vectors stream in, each
    * micro-batch appends its OWN (vec_id, embedding) rows to the
    * append-only vector index — O(batch) per batch, no model state to
    * freeze because MMR is a pure function of the exact cosines — and
    * a snapshot read runs qe15's margin-pruned top-c kernel + k-step
    * integer greedy trace over the accumulated index (`mmrTopkFrom`).
    * The trace is engine-deterministic (integer micro-cosines, λ as
    * integer percents, ties to the lowest cand_id), so the report over
    * the fully-arrived lake is byte-identical to qe15 over the same
    * vectors and SHARES ITS ORACLE SQL VERBATIM across the two-file
    * batch boundary: a query's candidate set and every greedy step can
    * mix vectors that arrived in different batches.
    *
    * Restart contract as the codes-index siblings: batch-keyed
    * overwrites + `alreadyFolded` skip (a double-appended batch would
    * duplicate vectors, corrupting the pair frame's cand_a ≠ cand_b
    * shape and every affected trace — which the shared oracle catches);
    * kill-tested in RestartSpec. */
  def streamMmr(spark: SparkSession, stagedDir: String,
                k: Int = Ann.DefaultTopK,
                c: Int = Ann.DefaultMmrCandidates,
                lambdaPct: Int = Ann.DefaultMmrLambdaPct,
                maxQ: Int = Ann.DefaultMaxQueries,
                maxFilesPerTrigger: Int = 1,
                compactEvery: Int = 16,
                workDir: Option[String] = None): DataFrame = {
    val work = workDir match {
      case Some(w) =>
        Files.createDirectories(java.nio.file.Paths.get(w)); w
      case None =>
        val t = Files.createTempDirectory("graft_smmr").toString
        Replay.cleanupAtExit(t); t
    }
    val state = new AppendOnlyState(work, Seq(("vx", embStreamSchema)),
      compactEvery)
    val q = spark.readStream.schema(embStreamSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(stagedDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!state.alreadyFolded(batchId)) {
          state.endBatch(batch.sparkSession, batchId,
            "vx" -> batch.select(col("vec_id"), col("embedding")))
        }
        Replay.maybePoison(batchId)
        ()
      }
      .start()
    q.awaitTermination()
    Ann.mmrTopkFrom(state.read(spark, "vx"), k, c, lambdaPct, maxQ)
  }

  /** qs33 entry: streaming MMR over the shared two-file embeddings
    * lake; shares qe15's oracle SQL verbatim across the batch
    * boundary. */
  def qs33StreamMmr(spark: SparkSession, dir: String): DataFrame =
    streamMmr(spark, stagedPqLake(spark, dir, Tables(spark, dir, "embeddings")))

  private val pcaStreamSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Two-file embeddings lake CARRYING labels (qs29 projects the full
    * row), memoized like the qs18/qs20 lake. */
  private def stagedPcaLake(spark: SparkSession, dir: String,
                            emb: DataFrame): String =
    Replay.stagedLakes.computeIfAbsent(
      "pca|" + Tables.contentKey(s"$dir/embeddings.parquet"), _ => {
        val t = Files.createTempDirectory("graft_pca_lake").toString
        Replay.cleanupAtExit(t)
        emb.select(col("vec_id"), col("embedding"), col("label"))
          .repartitionByRange(2, col("vec_id"))
          .write.mode("overwrite").parquet(t)
        t
      })

  /** Streaming PCA — qe18's arrival-time form, and the cleanest
    * streaming-sufficient-statistics story in the engine: the integer
    * second-moment matrix is a PURE SUM MONOID, so durable state is
    * exactly dim² longs — independent of corpus size, batch count, and
    * arrival order (the CMS D×W promise, for linear algebra). Each
    * micro-batch pays one quantize + outer-product kernel over its own
    * rows and appends its (i, j, c) moment delta; any snapshot read
    * folds the deltas (exact integers — bit-equal to the batch matrix),
    * power-iterates on the driver, and projects the arrived corpus,
    * returning byte-identical rows to qe18 over the same vectors — so
    * qe18's oracle SQL is shared verbatim. A double-applied batch
    * doubles ITS contribution relative to the others, bending the
    * dominant direction — which the shared oracle and the RestartSpec
    * kill-test both catch. */
  def streamPca(spark: SparkSession, stagedDir: String,
                dim: Int = graft.similarity.Pca.Dim,
                iters: Int = graft.similarity.Pca.Iters,
                maxFilesPerTrigger: Int = 1,
                compactEvery: Int = 16,
                workDir: Option[String] = None): DataFrame = {
    import graft.similarity.Pca
    val work = workDir match {
      case Some(w) =>
        Files.createDirectories(java.nio.file.Paths.get(w)); w
      case None =>
        val t = Files.createTempDirectory("graft_spca").toString
        Replay.cleanupAtExit(t); t
    }
    val smSchema = StructType(Seq(
      StructField("i", IntegerType),
      StructField("j", IntegerType),
      StructField("c", LongType)))
    val state = new AppendOnlyState(work, Seq(("sm", smSchema)), compactEvery,
      folds = Map("sm" -> ((df: DataFrame) =>
        df.groupBy("i", "j").agg(sum("c").as("c")))))
    val q = spark.readStream.schema(pcaStreamSchema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(stagedDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!state.alreadyFolded(batchId)) {
          val acc = Pca.secondMoment(Pca.quantized(batch), dim)
          val rows = acc.indices.collect {
            case idx if acc(idx) != 0L => (idx / dim, idx % dim, acc(idx))
          }
          val sess = batch.sparkSession
          import sess.implicits._
          state.endBatch(sess, batchId, "sm" -> rows.toDF("i", "j", "c"))
        }
        Replay.maybePoison(batchId)
        ()
      }
      .start()
    q.awaitTermination()
    val folded = state.read(spark, "sm").groupBy("i", "j")
      .agg(sum("c").as("c")).collect()
    val second = new Array[Long](dim * dim)
    folded.foreach(r => second(r.getInt(0) * dim + r.getInt(1)) = r.getLong(2))
    val snapshot = spark.read.schema(pcaStreamSchema).parquet(stagedDir)
    Pca.projectionFrom(Pca.quantized(snapshot), second, dim, iters)
  }

  /** qs29 entry: streaming PCA over the label-carrying two-file
    * embeddings lake; shares qe18's oracle SQL verbatim across the
    * batch boundary. */
  def qs29StreamPca(spark: SparkSession, dir: String): DataFrame =
    streamPca(spark, stagedPcaLake(spark, dir, Tables(spark, dir, "embeddings")))

  /** Streaming embedding-drift monitoring — qe21's arrival-time form
    * (and qs21's embedding-space twin): each micro-batch pays one
    * quantize + component-sum pass over its own rows and appends its
    * (w, i, s, n) delta; durable state is O(windows × dim) longs, a
    * pure sum monoid independent of arrival order, so any snapshot
    * read folds to the exact batch report and qe21's oracle SQL is
    * shared verbatim. This is the alarm a live ingest watches — the
    * batch form is the postmortem view of the same statistic. */
  def streamEmbDrift(spark: SparkSession, stagedDir: String,
                     span: Long = graft.similarity.Pca.DriftSpan,
                     alarm: Long = graft.similarity.Pca.DriftD2Alarm,
                     maxFilesPerTrigger: Int = 1,
                     compactEvery: Int = 16,
                     workDir: Option[String] = None): DataFrame = {
    import graft.similarity.Pca
    val work = workDir match {
      case Some(w) =>
        Files.createDirectories(java.nio.file.Paths.get(w)); w
      case None =>
        val t = Files.createTempDirectory("graft_sembdrift").toString
        Replay.cleanupAtExit(t); t
    }
    val wiSchema = StructType(Seq(
      StructField("w", LongType),
      StructField("i", IntegerType),
      StructField("s", LongType),
      StructField("n", LongType)))
    val state = new AppendOnlyState(work, Seq(("wi", wiSchema)), compactEvery,
      folds = Map("wi" -> ((df: DataFrame) =>
        df.groupBy("w", "i").agg(sum("s").as("s"), sum("n").as("n")))))
    val q = spark.readStream.schema(pcaStreamSchema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(stagedDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!state.alreadyFolded(batchId)) {
          state.endBatch(batch.sparkSession, batchId,
            "wi" -> Pca.embDriftSums(Pca.quantized(batch), span))
        }
        Replay.maybePoison(batchId)
        ()
      }
      .start()
    q.awaitTermination()
    Pca.embDriftReport(
      state.read(spark, "wi").groupBy("w", "i")
        .agg(sum("s").as("s"), sum("n").as("n")), alarm)
  }

  /** qs31 entry: embedding drift over the shared label-carrying lake;
    * shares qe21's oracle SQL verbatim across the batch boundary. */
  def qs31StreamEmbDrift(spark: SparkSession, dir: String): DataFrame =
    streamEmbDrift(spark, stagedPcaLake(spark, dir, Tables(spark, dir, "embeddings")))
}
