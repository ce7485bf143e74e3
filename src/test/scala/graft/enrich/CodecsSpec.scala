package graft.enrich

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

/** Regression guard for the ImageIO stream-cache policy (r17's qm3/qm4/
  * qs24 variance root cause): the memory-cache flip must hold after ANY
  * ImageIO-using codec entry point runs, regardless of class-load order.
  * A codec class that reads before `Codecs` initializes would silently
  * revert its reads to the disk-backed tmp-file cache — this spec
  * exercises each codec surface and asserts the JVM-wide state after
  * each, so a future codec that forgets `Codecs.ensureImageIoMemoryCache()`
  * in its initializer fails here instead of re-opening the variance
  * argument in a bench round. */
class CodecsSpec extends AnyFunSuite {

  test("Codecs init flips ImageIO to the memory cache") {
    // Reference the object WITHOUT calling ensureImageIoMemoryCache():
    // the flip under test is the one in the object initializer (the
    // load-order guarantee this suite guards). Calling the method here
    // would make the assert pass even with the initializer deleted.
    identity(Codecs)
    assert(!ImageIO.getUseCache)
  }

  test("memory cache holds after VideoFrames (JPEG/MJPEG) entry points") {
    val img = VideoFrames.solidFrame(16, 12, 0x336699)
    val avi = VideoFrames.writeMjpegAvi(Seq(VideoFrames.jpegBytes(img)), 16, 12)
    assert(VideoFrames.decodeFrames(avi).nonEmpty)
    assert(!ImageIO.getUseCache,
      "VideoFrames path reverted ImageIO to the disk-backed stream cache")
  }

  test("memory cache holds after the Multimodal PNG round trip") {
    // featureExtract's PNG branch is the Multimodal ImageIO surface;
    // exercising the object's initializer plus one encode/decode is the
    // guard — the exact kernel is covered by MultimodalSpec
    Multimodal.FeatureDim // force object init
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(VideoFrames.solidFrame(8, 8, 0xaabbcc), "png", bos)
    assert(ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray)) != null)
    assert(!ImageIO.getUseCache,
      "Multimodal path reverted ImageIO to the disk-backed stream cache")
  }
}
