package graft.enrich

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling — the training-data-pipeline surface for
  * image/audio/video payloads: opaque `binary` columns with a typed
  * metadata struct, decode / frame-sample / feature-extract as
  * per-partition batch transforms.
  *
  * The DECODE step is STUBBED (no image/audio codecs in this container):
  * `Palette.FakeDecoder` deterministically expands bytes to BGR pixels,
  * and "video" frame sampling slices the payload into fixed-size chunks.
  * Everything around the stub — schema, binary encoding, partition-wise
  * batch shape, feature vector contract — is the production path; a real
  * codec drops into `FakeDecoder.decode` / `sampleFrames` unchanged.
  *
  * Scale shape: all transforms are narrow (no shuffle); feature
  * extraction is a per-partition batch loop, the JVM analog of a Pandas
  * `mapInPandas` over Arrow batches. The final rollup is one exchange.
  */
object Multimodal {

  val FeatureDim = 16

  /** Build the media table from the documents corpus: payload = UTF-8
    * bytes (stand-in for stored media), kind cycles image/video/audio,
    * metadata derived deterministically. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("video"), lit("audio")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          lit(Palette.FakeDecoder.W).as("width"),
          lit(Palette.FakeDecoder.H).as("height"),
          (col("n_chars") * 10L).as("duration_ms"),
          col("source").as("format")).as("meta"))
  }

  /** Pure kernel: sample every `stride`-th fixed-size frame chunk of a
    * "video" payload (stub for keyframe extraction). */
  def sampleFrames(payload: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] = {
    if (payload.isEmpty) Seq.empty
    else payload.grouped(frameSize).zipWithIndex
      .collect { case (chunk, i) if i % stride == 0 => chunk }
      .toSeq
  }

  /** Pure kernel: FeatureDim-bucket normalized byte histogram — the
    * deterministic stand-in for an embedding model. */
  def features(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    if (payload.isEmpty) return hist
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xFF) * FeatureDim / 256) += 1f
      i += 1
    }
    var j = 0
    while (j < FeatureDim) { hist(j) /= payload.length; j += 1 }
    hist
  }

  /** media table → per-item feature vectors, per-partition batch loop
    * (narrow, codec-swappable). Videos are frame-sampled then pooled. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, kind, payload) =>
          val vec = kind match {
            case "video" =>
              val frames = sampleFrames(payload, frameSize = 64, stride = 4)
              if (frames.isEmpty) new Array[Float](FeatureDim)
              else {
                val pooled = new Array[Float](FeatureDim)
                frames.foreach { f =>
                  val fv = features(f)
                  var j = 0
                  while (j < FeatureDim) { pooled(j) += fv(j); j += 1 }
                }
                var j = 0
                while (j < FeatureDim) { pooled(j) /= frames.length; j += 1 }
                pooled
              }
            case _ => features(payload)
          }
          (id, kind, vec)
        }
      }
      .toDF("media_id", "kind", "feature")
  }

  /** Query surface: per-kind rollup of the extracted features (count,
    * payload volume, mean first feature component). */
  def featureRollup(spark: SparkSession, dir: String): DataFrame = {
    val media = mediaTable(spark, dir)
    val sizes = media.select(col("media_id"), col("kind"),
      length(col("payload")).cast("long").as("payload_bytes"),
      col("meta.duration_ms").as("duration_ms"))
    extractFeatures(media)
      .select(col("media_id"), element_at(col("feature"), 1).cast("double").as("f1"))
      .join(sizes, "media_id")
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_items"),
        sum("payload_bytes").as("total_bytes"),
        round(avg("f1"), 6).as("f1_avg"),
        round(avg("duration_ms"), 2).as("duration_avg"))
      .orderBy("kind")
  }
}
