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
  * The upsert sink uses *versioned* parquet state dirs (state_v{batch}):
  * each micro-batch merges the previous version with the new rows and
  * writes a new version — never overwriting what it is reading. At
  * production scale the same merge would target a transactional table
  * format; the versioned-dir scheme keeps identical semantics with plain
  * parquet.
  */
object Replay {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // TIMESTAMP(NANOS) read as long (legacy conf)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def eventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The streaming file source requires a *directory*; select just the
    // events table out of the shared sfDir with a glob filter.
    spark.readStream.schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** K2 streaming form: latest-wins keyed upsert via foreachBatch merge.
    * AvailableNow replay of the whole lake == batch q8_latest_per_key. */
  def streamUpsert(spark: SparkSession, dir: String): DataFrame = {
    val work = Files.createTempDirectory("graft_upsert").toString
    @volatile var latest: Option[String] = None

    val q = eventStream(spark, dir).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ss = batch.sparkSession
        val incoming = batch.select("user_id", "event_id", "event_type", "ts")
        val merged = latest match {
          case Some(prev) => ss.read.parquet(prev).unionByName(incoming)
          case None       => incoming
        }
        // latest-wins per user, deterministic tie-break on event_id
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
        val next = s"$work/state_v$batchId"
        merged.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
          .write.mode("overwrite").parquet(next)
        latest = Some(next)
        ()
      }
      .start()
    q.awaitTermination()

    latest match {
      case Some(path) =>
        spark.read.parquet(path)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("ts_us"))
          .orderBy("user_id")
      case None =>
        spark.emptyDataFrame
    }
  }

  /** §2.8 windowed aggregation as a stream: tumbling 1-hour windows with a
    * watermark, complete-mode replay == batch q18_hourly_rollup. */
  def streamHourlyRollup(spark: SparkSession, dir: String): DataFrame = {
    val name = s"graft_hourly_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    val q = eventStream(spark, dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("value_sum"))
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
