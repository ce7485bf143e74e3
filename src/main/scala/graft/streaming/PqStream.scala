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

  /** qs18 entry: the embeddings lake staged as two vec_id-range files
    * (contents-memoized like the qs10/qs16/qs17 lakes), so the
    * oracle-checked run crosses a batch boundary — the ranking folds
    * codes appended by BOTH batches, which a dropped or double-applied
    * batch would corrupt. Shares qe8's oracle SQL verbatim. */
  def qs18StreamPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val staged = Replay.stagedLakes.computeIfAbsent(
      "pq|" + Tables.contentKey(s"$dir/embeddings.parquet"), _ => {
        val t = Files.createTempDirectory("graft_pq_lake").toString
        Replay.cleanupAtExit(t)
        emb.select(col("vec_id"), col("embedding"))
          .repartitionByRange(2, col("vec_id"))
          .write.mode("overwrite").parquet(t)
        t
      })
    val m = 4
    val subDim = Ann.pqSubDim(emb, m)
    val cb = Ann.pqCodebook(emb, m, subDim)
    streamPqTopk(spark, staged, cb, m, subDim)
  }
}
