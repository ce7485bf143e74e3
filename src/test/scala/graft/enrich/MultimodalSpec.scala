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

  test("MJPEG AVI round-trip: real JPEG frames survive the container and codec") {
    // paint three solid frames, JPEG-encode with the real ImageIO codec,
    // wrap in the minimal AVI, then decode back through the RIFF walk +
    // per-frame JPEG decode. Solid frames are the near-lossless JPEG
    // case, so channel means must come back within a small tolerance.
    val colors = Seq(0xC04020, 0x20C040, 0x4020C0)
    val (w, h) = (48, 32)
    val jpegs = colors.map(c => VideoFrames.jpegBytes(VideoFrames.solidFrame(w, h, c)))
    val avi = VideoFrames.writeMjpegAvi(jpegs, w, h)
    assert(VideoFrames.isRiffAvi(avi))
    val (hw, hh, hn) = VideoFrames.header(avi)
    assert((hw, hh, hn) == (w, h, 3), "avih header disagrees with the stream")
    val frames = VideoFrames.decodeFrames(avi)
    assert(frames.length == 3)
    frames.zip(colors).foreach { case (img, c) =>
      assert(img.getWidth == w && img.getHeight == h)
      val px = img.getRGB(w / 2, h / 2)
      def ch(v: Int, shift: Int) = (v >> shift) & 0xff
      Seq(16, 8, 0).foreach { shift =>
        assert(math.abs(ch(px, shift) - ch(c, shift)) <= 8,
          f"channel>>$shift of frame: got ${ch(px, shift)} want ${ch(c, shift)} (JPEG drifted too far)")
      }
    }
    // a non-AVI payload is rejected loudly, not mis-parsed
    intercept[IllegalArgumentException] {
      VideoFrames.mjpegFrames("plainly not a riff container".getBytes("UTF-8"))
    }
  }

  test("qm3 decodes every video row's real MJPEG payload") {
    val got = Multimodal.qm3VideoFrames(spark, SparkTestSession.sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("header_frames") == r.getAs[Long]("decoded_frames"),
        s"media ${r.getLong(0)}: container header disagrees with decoded stream")
      assert(r.getAs[Long]("decoded_frames") >= 2L)
      assert(r.getAs[String]("header_dims") == "32x24")
      assert(r.getAs[Long]("frame_w") == 32L && r.getAs[Long]("frame_h") == 24L)
      assert(r.getAs[Long]("avi_bytes") > 0L)
      val luma = r.getAs[Long]("mean_luma")
      assert(luma >= 0L && luma <= 255L)
    }
    // frames are painted from per-doc text bytes: luma must discriminate
    assert(got.map(_.getAs[Long]("mean_luma")).distinct.length > 1,
      "constant luma - the decode saw no per-document signal")
  }

  test("extractFeatures routes real MJPEG video payloads through the codec") {
    import spark.implicits._
    // one real MJPEG payload: a dark and a bright frame. The pooled
    // byte histogram of the decoded BGR pixels must reflect PIXEL
    // values (dark frame bytes ~0x10, bright ~0xF0), which the stub
    // byte-chunking of the compressed container bytes could never
    // produce so cleanly.
    val jpegs = Seq(VideoFrames.jpegBytes(VideoFrames.solidFrame(32, 24, 0x101010)),
      VideoFrames.jpegBytes(VideoFrames.solidFrame(32, 24, 0xF0F0F0)))
    val avi = VideoFrames.writeMjpegAvi(jpegs, 32, 24)
    val media = Seq((1L, "video", avi)).toDF("media_id", "kind", "payload")
    val f = Multimodal.extractFeatures(media).collect().head
      .getAs[scala.collection.Seq[Float]]("feature")
    // bucket 1 holds 0x10..0x1f, bucket 15 holds 0xf0..0xff: each frame
    // contributes ~all its bytes to its own bucket, pooled ~0.5 each
    assert(f(1) > 0.3f, s"dark-frame bucket ${f(1)} - real pixels not seen")
    assert(f(15) > 0.3f, s"bright-frame bucket ${f(15)} - real pixels not seen")
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
