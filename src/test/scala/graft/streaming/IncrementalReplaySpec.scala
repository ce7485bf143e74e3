package graft.streaming

import graft.{SparkTestSession, Tables}
import graft.operators.Events
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** True incremental streaming: the lake is split into several files and
  * consumed one file per micro-batch, so the foreachBatch upsert must
  * merge state across batches — a stronger §2.8 check than the
  * single-batch AvailableNow replay. */
class IncrementalReplaySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("multi-batch incremental upsert equals batch recompute") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.expressions.Window

    // split events into 4 files ordered by time (arrival order ~ event time)
    val tmp = java.nio.file.Files.createTempDirectory("graft_incr").toString
    val ev = Tables(spark, SparkTestSession.sfDir, "events")
      .withColumn("ts_us", unix_micros(col("ts")))
      .select("event_id", "ts_us", "user_id", "event_type", "value", "props")
    ev.withColumn("bucket", ntile(4).over(
        org.apache.spark.sql.expressions.Window.orderBy("ts_us")))
      .write.partitionBy("bucket").mode("overwrite").parquet(s"$tmp/lake")

    val schema = spark.read.parquet(s"$tmp/lake/bucket=1").schema
    val work = java.nio.file.Files.createTempDirectory("graft_incr_state").toString
    @volatile var latest: Option[String] = None
    var batches = 0

    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/lake/bucket=*")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val ss = batch.sparkSession
        val incoming = batch.select("user_id", "event_id", "event_type", "ts_us")
        val merged = latest match {
          case Some(prev) => ss.read.parquet(prev).unionByName(incoming)
          case None       => incoming
        }
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts_us").desc, col("event_id").desc)
        val next = s"$work/state_v$batchId"
        merged.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
          .write.mode("overwrite").parquet(next)
        latest = Some(next)
        batches += 1
        ()
      }
      .start()
    q.awaitTermination()

    assert(batches >= 2, s"expected multiple micro-batches, got $batches")
    val streamed = spark.read.parquet(latest.get)
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    val batch = Events.q8LatestPerKey(spark, SparkTestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    assert(streamed == batch)
  }

  test("multi-batch incremental near-dup equals batch pair graph") {
    // documents split 4 ways and consumed one file per micro-batch: a
    // near-dup pair whose members arrive in DIFFERENT batches must be
    // discovered by the state band-probe, exact-dup groups must collapse
    // across batches, and the emission union must equal batch qs1 exactly
    val tmp = java.nio.file.Files.createTempDirectory("graft_sneardup_multi").toString
    Tables(spark, SparkTestSession.sfDir, "documents")
      .withColumn("bucket", pmod(col("doc_id"), lit(4)))
      .repartition(4, col("bucket")).drop("bucket")
      .write.mode("overwrite").parquet(tmp)
    val streamed = Replay.streamNearDup(spark, tmp, maxFilesPerTrigger = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val batch = graft.dedup.MinHashLSH.nearDups(spark, SparkTestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(streamed == batch,
      s"streamed=${streamed.size} batch=${batch.size}")
    assert(streamed.nonEmpty)
  }

  test("near-dup band work is batch-proportional and compaction preserves the answer") {
    // 4 micro-batches with compactEvery = 2 → two state compactions
    // mid-stream; the answer must still equal batch qs1, and the total
    // band-explode work across ALL batches must equal ONE explode of the
    // final rep set (16 bands × distinct texts) — the r4 code re-exploded
    // the full accumulated state every batch, making the sum O(batches ×
    // state) instead
    val tmp = java.nio.file.Files.createTempDirectory("graft_sneardup_cmp").toString
    Tables(spark, SparkTestSession.sfDir, "documents")
      .withColumn("bucket", pmod(col("doc_id"), lit(4)))
      .repartition(4, col("bucket")).drop("bucket")
      .write.mode("overwrite").parquet(tmp)
    Replay.recordBandRows = true
    val streamed =
      try Replay.streamNearDup(spark, tmp, maxFilesPerTrigger = 1,
          compactEvery = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      finally Replay.recordBandRows = false
    val batch = graft.dedup.MinHashLSH.nearDups(spark, SparkTestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(streamed == batch)
    val counts = Replay.bandRowsPerBatch.toList
    assert(counts.size >= 2, s"expected multiple micro-batches, got $counts")
    val distinctTexts = graft.dedup.MinHashLSH
      .docSignatures(spark, Tables(spark, SparkTestSession.sfDir, "documents"))
      .toDF("doc_id", "txt_md5", "sh", "bands")
      .filter(size(col("sh")) > 0)
      .select("txt_md5").distinct().count()
    assert(counts.sum == graft.dedup.MinHashLSH.NumBands * distinctTexts,
      s"band rows $counts should sum to 16 x $distinctTexts distinct texts")
  }

  test("multi-batch incremental corpus dedup equals batch exact dedup") {
    // split documents into 4 files; one file per micro-batch forces the
    // per-hash (min, sum) state fold to merge across batches
    val tmp = java.nio.file.Files.createTempDirectory("graft_sdedup_multi").toString
    Tables(spark, SparkTestSession.sfDir, "documents")
      .withColumn("bucket", pmod(col("doc_id"), lit(4)))
      .repartition(4, col("bucket")).drop("bucket")
      .write.mode("overwrite").parquet(tmp)
    val streamed = Replay.streamCorpusDedup(spark, tmp, maxFilesPerTrigger = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = graft.operators.TextOps.qd1DedupExact(spark, SparkTestSession.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
