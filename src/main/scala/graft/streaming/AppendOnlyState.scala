package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Append-only parquet state shared by the incremental dedup streams
  * (Replay.streamNearDup, SemDedupStream.streamKeepList): a set of named
  * tables under generation directories `work/g<N>/<table>`.
  *
  * Contract (the subtle parts, kept in ONE place):
  *   - per-batch appends are O(batch) files; nothing rewrites the full
  *     state per batch;
  *   - callers MUST fully consume (eagerly localCheckpoint) every `read`
  *     BEFORE calling `endBatch` — a parquet DataFrame re-lists its files
  *     at each action, so a late-bound read would see the batch's own
  *     appends;
  *   - every `compactEvery` batches the generation's per-batch files fold
  *     into a coalesced rewrite under `g<N+1>` and the superseded dir is
  *     deleted (a durable deployment would size the coalesce by bytes);
  *   - single-stream use only: foreachBatch runs sequentially within a
  *     stream; concurrent streams need one instance each.
  */
private[streaming] final class AppendOnlyState(work: String,
    tables: Seq[(String, StructType)], compactEvery: Int) {
  @volatile private var gen = 0
  @volatile private var batchesInGen = 0
  @volatile private var hasData = false
  private val schemas = tables.toMap

  /** One state table as a DataFrame — explicit-schema read (an append dir
    * whose only batches were empty has no files to infer from); an empty
    * local frame before the first `endBatch`. */
  def read(ss: SparkSession, table: String): DataFrame = {
    val sch = schemas(table)
    if (hasData) ss.read.schema(sch).parquet(s"$work/g$gen/$table")
    else ss.createDataFrame(ss.sparkContext.emptyRDD[Row], sch)
  }

  /** Append this batch's rows and advance the generation clock. */
  def endBatch(ss: SparkSession, appends: (String, DataFrame)*): Unit = {
    val stateDir = s"$work/g$gen"
    appends.foreach { case (t, df) =>
      df.write.mode("append").parquet(s"$stateDir/$t")
    }
    hasData = true
    batchesInGen += 1
    if (batchesInGen >= compactEvery) {
      val next = s"$work/g${gen + 1}"
      tables.foreach { case (t, sch) =>
        ss.read.schema(sch).parquet(s"$stateDir/$t")
          .coalesce(4).write.mode("overwrite").parquet(s"$next/$t")
      }
      Replay.deleteRecursively(new java.io.File(stateDir))
      gen += 1
      batchesInGen = 0
    }
  }

  def nonEmpty: Boolean = hasData
}
