package graft.enrich

import org.scalatest.funsuite.AnyFunSuite

class PaletteSpec extends AnyFunSuite {

  private def solidPayload(b: Int, g: Int, r: Int, reps: Int = 256): Array[Byte] =
    Array.fill(reps)(Array(b.toByte, g.toByte, r.toByte)).flatten

  test("kmeans recovers well-separated clusters deterministically") {
    val pts = (Array.fill(50)(Array(0f, 0f, 0f)) ++
      Array.fill(30)(Array(100f, 100f, 100f)) ++
      Array.fill(20)(Array(200f, 0f, 200f))).flatten
    val (centers, labels) = Palette.kmeans(pts, 3)
    val sizes = labels.groupBy(identity).values.map(_.length).toSeq.sorted
    assert(sizes == Seq(20, 30, 50))
    val again = Palette.kmeans(pts, 3)
    assert(again._1.map(_.toSeq).toSeq == centers.map(_.toSeq).toSeq)
  }

  test("palette of a solid-color image is one dominant bucket") {
    // payload = repeating (B,G,R) triple → fake-decoded image is solid
    val buckets = Palette.palette(Iterator(solidPayload(0, 0, 255)))
    assert(buckets.nonEmpty)
    assert(buckets.head.percentage > 0.99)
    assert(buckets.head.hex == "#ff0000") // pure red
  }

  test("palette ranks a 70/30 two-color group correctly") {
    // 7 solid blue images + 3 solid green images in one group
    val images = Iterator.fill(7)(solidPayload(255, 0, 0)) ++
      Iterator.fill(3)(solidPayload(0, 255, 0))
    val buckets = Palette.palette(images)
    assert(buckets.length >= 2)
    assert(math.abs(buckets(0).percentage - 0.7) < 0.02)
    assert(math.abs(buckets(1).percentage - 0.3) < 0.02)
    assert(buckets(0).hex == "#0000ff" && buckets(1).hex == "#00ff00")
  }

  test("percentages sum to ~1 and are descending") {
    val images = Iterator(solidPayload(10, 200, 30), solidPayload(200, 10, 30),
      solidPayload(30, 30, 200), solidPayload(120, 120, 120))
    val buckets = Palette.palette(images)
    val total = buckets.map(_.percentage).sum
    assert(math.abs(total - 1.0) < 1e-9)
    assert(buckets.map(_.percentage) == buckets.map(_.percentage).sortBy(-_))
  }

  test("paletteJson is strict JSON with hex colors") {
    val json = Palette.paletteJson(Seq(Palette.ColorBucket(0.5, 255, 0, 16, "#ff0010")))
    assert(json == """[{"percentage":0.5,"red":255,"green":0,"blue":16,"hex":"#ff0010"}]""")
  }

  test("empty group yields empty palette") {
    assert(Palette.palette(Iterator.empty).isEmpty)
  }

  test("group iterator streams one group at a time, never the partition") {
    // 10 groups × 10 rows in one "partition"; after producing the first
    // group's palette, rows of later groups must not have been pulled —
    // whole-partition buffering (the r1 audit finding) would consume all
    // 100 up front.
    var pulled = 0
    val rows = Iterator.tabulate(100) { i =>
      pulled += 1
      (s"key${i / 10}", 24, 24, solidPayload(i % 256, 0, 0, reps = 24 * 24))
    }
    val out = Palette.groupPalettes(rows)(_._1, r => (r._2, r._3, r._4))
    val first = out.next()
    assert(first._1 == "key0")
    assert(pulled <= 11, s"pulled $pulled rows for a 10-row group — partition buffered")
    assert(out.size == 9) // remaining groups still produced
  }

  test("pixel buffer is exact below the cap") {
    val buf = new Palette.FloatPixelBuffer(maxTriples = 1000)
    (0 until 999).foreach(i => buf.append(i.toFloat, 0f, 0f))
    assert(buf.currentStride == 1L)
    assert(buf.result().length == 999 * 3)
    assert(buf.result()(3 * 500) == 500f) // order + values preserved
  }

  test("pixel buffer decimation bounds memory and preserves proportions") {
    // 2M pixels in 70/30 blocks through a 64k cap: the resident sample
    // must stay under the cap, remain deterministic, and keep the color
    // shares within sampling error
    val cap = 64 * 1024
    def fill(): Palette.FloatPixelBuffer = {
      val b = new Palette.FloatPixelBuffer(maxTriples = cap)
      var i = 0
      while (i < 2000000) {
        // interleave at block granularity like images arriving in a group:
        // 7 red images then 3 green, 1000 px each
        val block = (i / 1000) % 10
        if (block < 7) b.append(1f, 0f, 0f) else b.append(0f, 1f, 0f)
        i += 1
      }
      b
    }
    val b1 = fill(); val b2 = fill()
    val s1 = b1.result(); val s2 = b2.result()
    assert(s1.length <= cap * 3, s"resident ${s1.length / 3} > cap $cap")
    assert(s1.length >= cap * 3 / 2 - 3, "decimation overshot: kept under half the cap")
    assert(s1.toSeq == s2.toSeq, "sample not deterministic")
    val red = s1.grouped(3).count(t => t(0) == 1f).toDouble
    val share = red / (s1.length / 3)
    assert(math.abs(share - 0.7) < 0.02, s"red share $share drifted from 0.7")
  }

  test("small-palette fast path equals converged Lloyd's exactly (d <= 6)") {
    // the <= 6-distinct shortcut must reproduce the kmeans fixed point
    // bit-exactly: same centers, same cluster indices (init order), same
    // counts — across random color sets, counts, and arrival orders
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 25; d = 1 + trial % 6) {
      val colors = Seq.fill(d)((rnd.nextInt(180).toFloat,
        rnd.nextInt(256).toFloat, rnd.nextInt(256).toFloat)).distinct
      val pixels = rnd.shuffle(colors.zipWithIndex.flatMap { case (c, i) =>
        Seq.fill(1 + rnd.nextInt(50))(c) })
      val pts = pixels.flatMap(c => Seq(c._1, c._2, c._3)).toArray
      val fast = Palette.smallPalette(pts)
      assert(fast.isDefined, s"trial $trial: fast path refused ${colors.size} colors")
      val (fc, fn) = fast.get
      val (kc, labels) = Palette.kmeans(pts, 6)
      val kCounts = labels.groupBy(identity).view.mapValues(_.length).toMap
      val fastRanked = fn.zipWithIndex.map { case (n, c) => (c, n) }
        .sortBy { case (c, n) => (-n, c) }
        .map { case (c, n) => (fc(c).toSeq, n) }
      val kRanked = kCounts.toSeq.sortBy { case (c, n) => (-n, c) }
        .map { case (c, n) => (kc(c).toSeq, n) }
      assert(fastRanked == kRanked, s"trial $trial diverged (d=${colors.size})")
    }
    // 7 distinct colors must fall through to the full kernel
    val seven = (0 until 7).flatMap(i => Seq(i * 20f, 10f, 10f)).toArray
    assert(Palette.smallPalette(seven).isEmpty)
  }

  test("exact-mode palette: over-budget <=6-color groups stay exact via the tally") {
    // constant-color images, 5 distinct colors cycling; each image
    // resizes to 75x75 = 5625 triples, so 3+ images overflow a 12k
    // budget — the sink must drop the buffer, finish on the tally, and
    // produce BIT-IDENTICAL output to an unbounded-budget run
    def imgs(n: Int) = Iterator.tabulate(n)(i =>
      (Palette.FakeDecoder.H, Palette.FakeDecoder.W,
        Palette.FakeDecoder.decode(Array((20 + 40 * (i % 5)).toByte))))
    for (n <- Seq(2, 3, 12)) {
      val bounded = Palette.paletteOfDecodedExact(imgs(n), maxTriples = 12000)
      val unbounded = Palette.paletteOfDecodedExact(imgs(n), maxTriples = 1 << 20)
      assert(bounded == unbounded, s"n=$n tally route diverged from buffer route")
      assert(bounded.nonEmpty)
    }
    // share arithmetic survives the route switch: 12 images over 5 colors
    // -> shares are small exact integer ratios
    val p12 = Palette.paletteOfDecodedExact(imgs(12), maxTriples = 12000)
    assert(math.abs(p12.map(_.percentage).sum - 1.0) < 1e-9)
  }

  test("exact-mode palette fails loudly when over budget with >6 colors") {
    // the qs11 oracle is an exact histogram and cannot model sampling: a
    // group past the budget that the tally cannot hold either (>6
    // distinct colors) must ERROR, not silently skew (ADVICE r4)
    def manyColorImgs(n: Int) = Iterator.tabulate(n)(i =>
      (Palette.FakeDecoder.H, Palette.FakeDecoder.W,
        Palette.FakeDecoder.decode(Array((i * 29 % 256).toByte))))
    // 7+ distinct colors visible BEFORE the budget trips
    val e1 = intercept[IllegalArgumentException] {
      Palette.paletteOfDecodedExact(manyColorImgs(8), maxTriples = 12000)
    }
    assert(e1.getMessage.contains("exact pixel budget"))
    // 7th distinct color arriving AFTER the buffer was already dropped:
    // 6 distinct colors across images 0-5 (the 12k budget trips during
    // image 3), then color #7 on image 6
    def lateSeventh = Iterator.tabulate(8)(i =>
      (Palette.FakeDecoder.H, Palette.FakeDecoder.W,
        Palette.FakeDecoder.decode(Array((if (i < 6) 40 * i else 250).toByte))))
    val e2 = intercept[IllegalArgumentException] {
      Palette.paletteOfDecodedExact(lateSeventh, maxTriples = 12000)
    }
    assert(e2.getMessage.contains("exact pixel budget"))
    // under an unbounded budget the same >6-color group is fine (kmeans)
    assert(Palette.paletteOfDecodedExact(manyColorImgs(8), maxTriples = 1 << 20).nonEmpty)
    // and the sampling path accepts it at the small budget
    assert(Palette.paletteOfDecoded(manyColorImgs(8), maxTriples = 12000).nonEmpty)
  }

  test("paletteBySource is deterministic under replay") {
    val spark = graft.SparkTestSession.spark
    val a = Palette.paletteBySource(spark, graft.SparkTestSession.sfDir)
      .collect().map(_.toSeq).toSeq
    val b = Palette.paletteBySource(spark, graft.SparkTestSession.sfDir)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }
}
