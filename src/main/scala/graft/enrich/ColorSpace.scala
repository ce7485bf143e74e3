package graft.enrich

/** OpenCV-compatible color-space and resize kernels (pure Scala, no native
  * deps) — the F12 helpers from SURVEY.md §2.7.
  *
  * Semantics matched to OpenCV's 8-bit conversions
  * (reference: spark/spark_image.py:40-56,149-161):
  *  - pixels are BGR uint8 (image mode 16 = CV_8UC3);
  *  - HSV has H ∈ [0,180) (degrees halved to fit uint8), S,V ∈ [0,255];
  *  - resize uses INTER_AREA (area-weighted box average), OpenCV's
  *    recommended mode for downscaling.
  */
object ColorSpace {

  /** BGR uint8 → HSV uint8 with OpenCV ranges (H∈[0,180)). */
  def bgrToHsv(b: Int, g: Int, r: Int): (Int, Int, Int) = {
    val v = math.max(b, math.max(g, r))
    val mn = math.min(b, math.min(g, r))
    val diff = v - mn
    val s = if (v == 0) 0 else math.round(255.0 * diff / v).toInt
    val h =
      if (diff == 0) 0.0
      else if (v == r) 60.0 * (g - b) / diff
      else if (v == g) 120.0 + 60.0 * (b - r) / diff
      else 240.0 + 60.0 * (r - g) / diff
    val hPos = if (h < 0) h + 360.0 else h
    (math.round(hPos / 2.0).toInt % 180, math.min(255, s), v)
  }

  /** HSV uint8 (OpenCV ranges) → RGB uint8. */
  def hsvToRgb(h: Int, s: Int, v: Int): (Int, Int, Int) = {
    if (s == 0) return (v, v, v)
    val hDeg = h * 2.0
    val c = v * (s / 255.0)
    val x = c * (1.0 - math.abs((hDeg / 60.0) % 2.0 - 1.0))
    val m = v - c
    val (r1, g1, b1) =
      if (hDeg < 60) (c, x, 0.0)
      else if (hDeg < 120) (x, c, 0.0)
      else if (hDeg < 180) (0.0, c, x)
      else if (hDeg < 240) (0.0, x, c)
      else if (hDeg < 300) (x, 0.0, c)
      else (c, 0.0, x)
    (math.round(r1 + m).toInt, math.round(g1 + m).toInt, math.round(b1 + m).toInt)
  }

  /** INTER_AREA resize of an interleaved BGR uint8 buffer. General
    * area-weighted average: each destination pixel integrates the exact
    * (possibly fractional) source rectangle it covers. */
  def resizeArea(src: Array[Byte], srcH: Int, srcW: Int,
                 dstH: Int, dstW: Int): Array[Byte] = {
    val dst = new Array[Byte](dstH * dstW * 3)
    val scaleY = srcH.toDouble / dstH
    val scaleX = srcW.toDouble / dstW
    var dy = 0
    while (dy < dstH) {
      val y0 = dy * scaleY; val y1 = (dy + 1) * scaleY
      var dx = 0
      while (dx < dstW) {
        val x0 = dx * scaleX; val x1 = (dx + 1) * scaleX
        val acc = new Array[Double](3)
        var area = 0.0
        var sy = math.floor(y0).toInt
        while (sy < math.ceil(y1).toInt && sy < srcH) {
          val wy = math.min(y1, sy + 1.0) - math.max(y0, sy.toDouble)
          var sx = math.floor(x0).toInt
          while (sx < math.ceil(x1).toInt && sx < srcW) {
            val wx = math.min(x1, sx + 1.0) - math.max(x0, sx.toDouble)
            val w = wy * wx
            val base = (sy * srcW + sx) * 3
            acc(0) += w * (src(base) & 0xFF)
            acc(1) += w * (src(base + 1) & 0xFF)
            acc(2) += w * (src(base + 2) & 0xFF)
            area += w
            sx += 1
          }
          sy += 1
        }
        val base = (dy * dstW + dx) * 3
        dst(base) = math.round(acc(0) / area).toByte
        dst(base + 1) = math.round(acc(1) / area).toByte
        dst(base + 2) = math.round(acc(2) / area).toByte
        dx += 1
      }
      dy += 1
    }
    dst
  }
}
