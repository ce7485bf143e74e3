package graft.enrich

import java.awt.image.BufferedImage
import java.io.File
import javax.imageio.ImageIO
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** End-to-end image pipeline over Spark's built-in image source with REAL
  * decoding (JDK ImageIO, PNG): the reference's weekly enrichment job
  * (FIXTURES.md §4) — solid-color images with known palettes, a corrupt
  * file exercising dropInvalid, per-user grouping from the path. */
class ImageSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def writePng(path: File, rgb: Int, w: Int = 16, h: Int = 16): Unit = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb))
    g.fillRect(0, 0, w, h)
    g.dispose()
    path.getParentFile.mkdirs()
    ImageIO.write(img, "png", path)
    ()
  }

  private lazy val imageDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_images").toFile
    // user1: 7 red + 3 green → 70/30 palette
    (1 to 7).foreach(i => writePng(new File(dir, s"user1/red$i.png"), 0xFF0000))
    (1 to 3).foreach(i => writePng(new File(dir, s"user1/green$i.png"), 0x00FF00))
    // user2: all blue
    (1 to 2).foreach(i => writePng(new File(dir, s"user2/blue$i.png"), 0x0000FF))
    // corrupt file → dropInvalid must skip it
    java.nio.file.Files.write(new File(dir, "user2/broken.png").toPath,
      "not a png at all".getBytes)
    dir.toString
  }

  test("image source decodes PNGs into mode-16 BGR rows") {
    val images = spark.read.format("image").option("dropInvalid", "true")
      .option("recursiveFileLookup", "true")
      .load(imageDir).select("image.*")
    val rows = images.collect()
    assert(rows.length == 12, s"expected 12 valid images, got ${rows.length}") // corrupt dropped
    assert(rows.forall(_.getAs[Int]("mode") == 16))
    assert(rows.forall(_.getAs[Int]("nChannels") == 3))
    val red = images.filter(col("origin").contains("red1")).collect().head
    val data = red.getAs[Array[Byte]]("data")
    // BGR layout: first pixel of a red image is (B=0, G=0, R=255)
    assert((data(0) & 0xFF) == 0 && (data(1) & 0xFF) == 0 && (data(2) & 0xFF) == 255)
  }

  test("JPEG decodes through the same path (the reference corpus is .jpg)") {
    // s3-to-es_aws.py:88-128 stores .jpg media; JDK ImageIO decodes JPEG
    // natively, so the real pipeline must handle it without any stub.
    // JPEG is lossy — assert the dominant color within a small tolerance
    // rather than an exact golden.
    val dir = java.nio.file.Files.createTempDirectory("graft_jpeg").toFile
    val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(0xFF0000))
    g.fillRect(0, 0, 16, 16)
    g.dispose()
    val f = new File(dir, "user9/solid.jpg")
    f.getParentFile.mkdirs()
    assert(ImageIO.write(img, "jpg", f), "JDK ImageIO must encode JPEG")
    val rows = Palette.paletteFromImages(spark, s"$dir/*").collect()
    assert(rows.length == 1 && rows.head.getString(0) == "user9")
    assert(rows.head.getDouble(3) > 0.99, "solid JPEG should be one bucket")
    val hex = "#([0-9a-f]{6})".r.findFirstMatchIn(rows.head.getString(1)).get.group(1)
    val (r, gg, b) = (Integer.parseInt(hex.substring(0, 2), 16),
      Integer.parseInt(hex.substring(2, 4), 16), Integer.parseInt(hex.substring(4), 16))
    assert(r >= 248 && gg <= 8 && b <= 8, s"expected ~pure red, got #$hex")
  }

  test("real-decode palette pipeline: per-user dominant colors from files") {
    val result = Palette.paletteFromImages(spark, s"$imageDir/*")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(3))).toList
    assert(result.map(_._1) == List("user1", "user2"))
    val (_, u1colors, u1top) = result(0)
    assert(math.abs(u1top - 0.7) < 0.02, s"user1 top share $u1top")
    assert(u1colors.contains("\"hex\":\"#ff0000\"")) // red dominant
    assert(u1colors.contains("\"hex\":\"#00ff00\"")) // green second
    val (_, u2colors, u2top) = result(1)
    assert(u2top > 0.99)
    assert(u2colors.startsWith("""[{"percentage":1.0""") || u2top == 1.0)
    assert(u2colors.contains("\"hex\":\"#0000ff\""))
  }
}
