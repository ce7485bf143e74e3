package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Direct coverage for the two codegen Expressions' edge contracts:
  * collation agreement between the driver-side shingle sort and the
  * UTF8String merge walk, and the length-mismatch guard on graft_dot
  * (DuckDB's list_inner_product — the oracle — errors there too). */
class NativeFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("shingleSet sorts in UTF-8 byte order, matching the merge comparator") {
    // Supplementary-plane emoji (U+1F600, 4-byte UTF-8) vs U+FF01-range
    // fullwidth forms (3-byte UTF-8): Java UTF-16 order puts the emoji's
    // high surrogate (0xD83D) BEFORE 0xFF01 while UTF-8 byte order puts it
    // after — exactly the case where a UTF-16 sort breaks the merge walk.
    val text = "😀 ！x 😀 ！x 😀 ！x zz"
    val sh = graft.dedup.MinHashLSH.shingleSet(text)
    assert(sh.length > 1)
    val u = sh.map(UTF8String.fromString)
    assert(u.zip(u.tail).forall { case (a, b) => a.compareTo(b) < 0 },
      s"shingle array not sorted in UTF8 byte order: ${sh.mkString("|")}")
  }

  test("sortedOverlap on UTF8-sorted mixed-plane shingles equals exact set intersection") {
    val t1 = "😀 ！x alpha 😀 beta ！x gamma"
    val t2 = "😀 ！x alpha 😀 beta ！x DELTA"
    val s1 = graft.dedup.MinHashLSH.shingleSet(t1)
    val s2 = graft.dedup.MinHashLSH.shingleSet(t2)
    val exact = (s1.toSet & s2.toSet).size
    val got = Seq((s1.toSeq, s2.toSeq)).toDF("a", "b")
      .select(SetFunctions.sortedOverlap(col("a"), col("b")))
      .head().getInt(0)
    assert(got == exact, s"merge walk got $got, exact $exact")
  }

  test("graft_dot throws on vector length mismatch instead of truncating") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    // local mode surfaces the IllegalArgumentException directly; a cluster
    // wraps it in SparkException — accept either
    val e = intercept[Exception] {
      df.select(VectorFunctions.dot(col("a"), col("b"))).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("length mismatch")), s"got $msgs")
  }

  test("fused SRP buckets are bit-identical to the per-bit dot form") {
    import graft.similarity.SrpLsh
    val planes = SrpLsh.hyperplanes(dim = 16, bits = 8, tables = 4)
    val rnd = new scala.util.Random(7)
    val df = Seq.tabulate(50)(i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian()))).toDF("vec_id", "embedding")
    val fused = df.select(col("vec_id"),
        posexplode(SrpFunctions.srpBuckets(spark, col("embedding"), planes))
          .as(Seq("table_idx", "bucket")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val reference = df.select(col("vec_id"),
        posexplode(array((0 until 4).map(t =>
          SrpLsh.bucket(col("embedding"), planes(t))): _*))
          .as(Seq("table_idx", "bucket")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(fused == reference)
  }

  test("graft_dot equal-length semantics unchanged") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(df.select(VectorFunctions.dot(col("a"), col("b"))).head().getDouble(0) == 32.0)
  }

  test("graft_nfc composes canonically and is identity on NFC input") {
    // decomposed e + U+0301 composes to one code point; ASCII and
    // already-composed strings come back unchanged (same object path)
    val rows = Seq(
      ("éclair", "éclair"),
      ("plain ascii", "plain ascii"),
      ("é", "é"),
      // Hangul decomposed jamo -> precomposed syllable
      ("가", "가"),
      ("", "")).toDF("in", "want")
    val got = rows.select(col("want"), TextNormalize.nfc(col("in")).as("got"))
      .collect()
    got.foreach(r => assert(r.getString(1) == r.getString(0),
      s"got ${r.getString(1)} want ${r.getString(0)}"))
    // kernel fast path: NFC input returns the SAME UTF8String instance
    val s = UTF8String.fromString("already nfc")
    assert(NfcNormalize.normalize(s) eq s)
    // null propagates
    assert(rows.select(TextNormalize.nfc(lit(null).cast("string")))
      .head().isNullAt(0))
  }
}
