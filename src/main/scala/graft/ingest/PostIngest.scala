package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Post-document ingest — SURVEY §3.1: the reference's per-PUT Lambda chain
  * (lambda/s3Posts-to-ES-lambda/s3-to-es_aws.py:131-205) as one declarative
  * Spark plan: PERMISSIVE JSON scan (S1) → prune (P1) → flatten owner (P3)
  * → id cast (P5) → follower sentinel (P6) → media-url rewrite (P8, F1) →
  * latest-wins keyed snapshot (K2).
  *
  * One superset schema covers all five media_type variants × both
  * connection tiers (README.md:45-56,147-149): absent keys are nulls, and
  * the Basic-tier missing follower count becomes the reference's -1
  * sentinel (s3-to-es_aws.py:184-189).
  */
object PostIngest {

  /** Superset post schema (FIXTURES.md §1; README.md:62-96,377-416). */
  val postSchema: StructType = StructType(Seq(
    StructField("caption", StringType),
    StructField("comments_count", LongType),
    StructField("id", StringType), // arrives as number in some tiers; cast on read
    StructField("ig_id", StringType),
    StructField("is_comment_enabled", BooleanType),
    StructField("like_count", LongType),
    StructField("media_type", StringType),
    StructField("media_url", StringType),
    StructField("permalink", StringType),
    StructField("shortcode", StringType),
    StructField("timestamp", StringType), // ISO-8601 with +0000 (README.md:76)
    StructField("username", StringType),
    StructField("mentioned_users", StringType),
    StructField("hashtags", StringType),
    StructField("owner", StructType(Seq(
      StructField("id", StringType),
      StructField("username", StringType),
      StructField("followers_count", LongType)))),
    StructField("children", StructType(Seq(
      StructField("data", ArrayType(StructType(Seq(
        StructField("id", StringType),
        StructField("media_type", StringType),
        StructField("media_url", StringType)))))))),
    StructField("comments", StructType(Seq(
      StructField("data", ArrayType(StructType(Seq(
        StructField("like_count", LongType),
        StructField("id", StringType)))))))),
    // Business-only metrics (README.md:409-413)
    StructField("impressions", LongType),
    StructField("reach", LongType),
    StructField("engagement", LongType),
    StructField("saved", LongType),
    StructField("video_view", LongType),
    // video-only (README.md:51-52)
    StructField("views", LongType),
    StructField("thumbnail_url", StringType),
    // story-only (README.md:54)
    StructField("sticker_taps", LongType),
    StructField("tap_backs", LongType),
    StructField("swipe_ups", LongType),
    StructField("_corrupt_record", StringType)))

  /** S1: PERMISSIVE JSON scan of the post lake. The FULL ingest envelope
    * the reference wraps each document with — objectKey, createdDate,
    * content_type, content_length (s3-to-es_aws.py:163-168) — is derived
    * from real file metadata: content_length is the actual object size
    * (`_metadata.file_size`), content_type from the object key suffix. */
  def readPosts(spark: SparkSession, path: String): DataFrame = {
    spark.read
      .schema(postSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .withColumn("objectKey", decodedObjectKey) // F5
      .withColumn("createdDate", col("timestamp")) // replay: arrival == post time
      .withColumn("content_length", col("_metadata.file_size"))
      .withColumn("content_type",
        when(col("objectKey").endsWith(".json"), lit("application/json"))
          .otherwise(lit("application/octet-stream")))
  }

  /** F5: the Lambda URL-decodes the S3 event key (unquote_plus,
    * s3-to-es_aws.py:148-149). `input_file_name()` is PERCENT-encoded (a
    * literal '+' stays '+'), so '+' is protected before the form-decoding
    * url_decode — otherwise a file named a+b.json would corrupt to
    * "a b.json". Shared by the batch and streaming readers so their
    * objectKey values can never diverge. */
  private def decodedObjectKey =
    url_decode(replace(input_file_name(), lit("+"), lit("%2B")))

  private val extPattern = "\\.(\\w{3,4})\\?" // F1: reference regex uses a
  // lookahead `\.\w{3,4}(?=\?)` (s3-to-es_aws.py:92); Spark's RE2-style
  // engine supports it via java.util.regex, but we rewrite with a capture
  // group for engine portability.

  /** P1+P3+P5+P6+P8+F1: the Lambda's transform chain. */
  def flatten(posts: DataFrame, mediaStorePrefix: String = "s3://media-store/"): DataFrame = {
    posts
      .filter(col("_corrupt_record").isNull && col("id").isNotNull) // P12 analog
      .drop("ig_id", "username", "is_comment_enabled", "_corrupt_record") // P1
      .withColumn("owner_id", col("owner.id")) // P3
      .withColumn("id", col("id").cast(StringType)) // P5
      .withColumn("followers",
        coalesce(col("owner.followers_count"), lit(-1L))) // P6 sentinel
      .drop("owner")
      .withColumn("ext", regexp_extract(col("media_url"), extPattern, 1)) // F1
      .withColumn("media_url", // P8: CDN url → owned store url
        when(col("media_url").isNotNull, concat(
          lit(mediaStorePrefix), col("owner_id"), lit("/"), col("id"),
          lit("/original."), col("ext"))))
      .drop("ext")
      .withColumn("ts", to_timestamp(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ssZ")) // F8
  }

  /** K2: keyed latest-wins snapshot — the ES upsert semantics
    * (doc id = post id, `_version` increments; README.md:369-374).
    * Deterministic tie-break on objectKey (SURVEY §7 risk 5). */
  def latestPerPost(flattened: DataFrame): DataFrame = {
    val w = Window.partitionBy("id")
      .orderBy(col("createdDate").desc, col("objectKey").desc)
    flattened
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Full ingest: lake path → current post snapshot. */
  def snapshot(spark: SparkSession, path: String): DataFrame =
    latestPerPost(flatten(readPosts(spark, path)))

  /** Streaming form of the ingest — SURVEY §3.1's engine equivalent of
    * the per-PUT Lambda: `readStream.json(lake)` → the same flatten chain
    * → foreachBatch keyed merge (versioned parquet state, latest-wins).
    * `Trigger.AvailableNow` replay of the static lake equals `snapshot`;
    * `maxFilesPerTrigger` bounds each micro-batch so the merge is
    * exercised across batches. */
  def streamSnapshot(spark: SparkSession, globPath: String,
                     maxFilesPerTrigger: Int = 3): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val work = java.nio.file.Files.createTempDirectory("graft_posts").toString
    graft.streaming.Replay.cleanupAtExit(work)
    @volatile var latest: Option[String] = None
    val stream = spark.readStream
      .schema(postSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .json(globPath)
      .withColumn("objectKey", decodedObjectKey) // F5, identical to batch
      .withColumn("createdDate", col("timestamp"))
      .withColumn("content_length", col("_metadata.file_size"))
      .withColumn("content_type",
        when(col("objectKey").endsWith(".json"), lit("application/json"))
          .otherwise(lit("application/octet-stream")))
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ss = batch.sparkSession
        val incoming = flatten(batch)
        val merged = latest match {
          case Some(prev) => ss.read.parquet(prev).unionByName(incoming)
          case None       => incoming
        }
        val next = s"$work/state_v$batchId"
        latestPerPost(merged).write.mode("overwrite").parquet(next)
        latest = Some(next)
        ()
      }
      .start()
    q.awaitTermination()
    latest match {
      case Some(path) => spark.read.parquet(path)
      case None       => spark.emptyDataFrame
    }
  }

  /** Ingest observability: valid vs corrupt record counts for a lake path
    * (the operational metric behind P12's skip-corrupt behavior). */
  def ingestStats(spark: SparkSession, path: String): DataFrame = {
    readPosts(spark, path)
      .agg(
        count(when(col("_corrupt_record").isNull && col("id").isNotNull, 1)).as("n_valid"),
        count(when(col("_corrupt_record").isNotNull, 1)).as("n_corrupt"))
  }
}
