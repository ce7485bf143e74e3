package graft.enrich

import org.scalatest.funsuite.AnyFunSuite

class ColorSpaceSpec extends AnyFunSuite {

  test("bgrToHsv matches OpenCV 8-bit conventions on primaries") {
    // OpenCV: H in [0,180), S,V in [0,255]
    assert(ColorSpace.bgrToHsv(0, 0, 255) == (0, 255, 255))    // pure red
    assert(ColorSpace.bgrToHsv(0, 255, 0) == (60, 255, 255))   // pure green
    assert(ColorSpace.bgrToHsv(255, 0, 0) == (120, 255, 255))  // pure blue
    assert(ColorSpace.bgrToHsv(128, 128, 128) == (0, 0, 128))  // gray: S=0
    assert(ColorSpace.bgrToHsv(0, 0, 0) == (0, 0, 0))          // black
    assert(ColorSpace.bgrToHsv(255, 255, 255) == (0, 0, 255))  // white
  }

  test("hsvToRgb inverts primaries") {
    assert(ColorSpace.hsvToRgb(0, 255, 255) == (255, 0, 0))
    assert(ColorSpace.hsvToRgb(60, 255, 255) == (0, 255, 0))
    assert(ColorSpace.hsvToRgb(120, 255, 255) == (0, 0, 255))
    assert(ColorSpace.hsvToRgb(0, 0, 200) == (200, 200, 200))
  }

  test("hsv roundtrip error is small across random colors") {
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val (b, g, r) = (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256))
      val (h, s, v) = ColorSpace.bgrToHsv(b, g, r)
      val (r2, g2, b2) = ColorSpace.hsvToRgb(h, s, v)
      // uint8 H-halving costs up to ~8 levels per channel
      assert(math.abs(r - r2) <= 8 && math.abs(g - g2) <= 8 && math.abs(b - b2) <= 8,
        s"roundtrip too lossy for BGR($b,$g,$r) → HSV($h,$s,$v) → RGB($r2,$g2,$b2)")
    }
  }

  test("resizeArea 2x downscale is exact box average") {
    // 2×2 BGR image: four pixels with distinct values per channel
    val src = Array[Byte](
      10, 20, 30,  50, 60, 70,
      90, 100, 110,  (130 & 0xFF).toByte, (140 & 0xFF).toByte, (150 & 0xFF).toByte)
    val out = ColorSpace.resizeArea(src, 2, 2, 1, 1)
    assert((out(0) & 0xFF) == 70 && (out(1) & 0xFF) == 80 && (out(2) & 0xFF) == 90)
  }

  test("resizeArea identity when sizes match") {
    val src = Array.tabulate[Byte](2 * 3 * 3)(i => (i * 7).toByte)
    assert(ColorSpace.resizeArea(src, 2, 3, 2, 3).toSeq == src.toSeq)
  }
}
