package graft.enrich

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("feature histogram is normalized and deterministic") {
    val payload = "hello multimodal world".getBytes("UTF-8")
    val f = Multimodal.features(payload)
    assert(f.length == Multimodal.FeatureDim)
    assert(math.abs(f.sum - 1.0f) < 1e-5)
    assert(f.toSeq == Multimodal.features(payload).toSeq)
    // ASCII text: all bytes < 128 → upper half of the histogram empty
    assert(f.drop(8).forall(_ == 0f))
  }

  test("empty payload yields zero vector, no crash") {
    assert(Multimodal.features(Array.empty).forall(_ == 0f))
    assert(Multimodal.sampleFrames(Array.empty, 64, 4).isEmpty)
  }

  test("frame sampling takes every stride-th chunk") {
    val payload = Array.tabulate[Byte](640)(_.toByte) // 10 frames of 64
    val frames = Multimodal.sampleFrames(payload, frameSize = 64, stride = 4)
    assert(frames.length == 3) // chunks 0, 4, 8
    assert(frames(0)(0) == 0.toByte && frames(1)(0) == 0.toByte && frames(2)(0) == 0.toByte)
    assert(frames.forall(_.length == 64))
  }

  test("media table + feature rollup covers all three kinds end-to-end") {
    val rollup = Multimodal.featureRollup(spark, SparkTestSession.sfDir).collect()
    assert(rollup.map(_.getAs[String]("kind")).toSeq == Seq("audio", "image", "video"))
    assert(rollup.map(_.getAs[Long]("n_items")).sum == 500L)
    rollup.foreach { r =>
      assert(r.getAs[Long]("total_bytes") > 0L)
      assert(!r.isNullAt(r.fieldIndex("f1_avg")))
    }
  }

  test("metadata struct carries typed fields") {
    val media = Multimodal.mediaTable(spark, SparkTestSession.sfDir)
    val row = media.filter(col("media_id") === 0).select("meta.width", "meta.height", "meta.duration_ms").collect().head
    assert(row.getInt(0) == Palette.FakeDecoder.W)
    assert(row.getInt(1) == Palette.FakeDecoder.H)
    assert(row.getLong(2) > 0L)
  }
}
