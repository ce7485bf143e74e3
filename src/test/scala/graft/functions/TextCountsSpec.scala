package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-equality of the byte-scan count kernels against the
  * `regexp_count` expressions they replace on the qd2/qd3 hot path —
  * the regex forms stay in the DuckDB oracle SQL, so any divergence
  * here would also show up as an oracle hash mismatch; this spec keeps
  * the contract testable without a corpus. */
class TextCountsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val PunctRe = "[^a-zA-Z0-9\\s]"
  private val BpeRe = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  // hand-picked edges: empty, all-ws, java-\s whitespace zoo, case runs,
  // digit/letter boundaries, ASCII punct runs, 2/3/4-byte UTF-8 code
  // points (each must count ONCE, not per byte/surrogate), mixed planes
  private val edges = Seq(
    "", " ", " \t\n\f\r ", "abc", "ABC", "aAbBcC", "a1b2", "123",
    "a  b", "hello, world!", "--", "..a..", "éé", "é a é", "中文 text",
    "😀", "a😀b", "😀😀", "！x", "naïve café", "a-b_c.d", "x y",
    "CamelCaseRuns", "digits123then456", "trailing space ", " leading")

  private def rnd(seed: Int): Seq[String] = {
    val r = new scala.util.Random(seed)
    // draw whole CODE POINTS (not chars) so the 4-byte emoji stays an
    // intact surrogate pair in every random string — char-level
    // sampling either minted lone surrogates or dropped the
    // supplementary plane from the fuzz entirely
    val alphabet = "ab z09AZ ,.!?-_\t\n\ré中😀！ ".codePoints().toArray
    (1 to 300).map { _ =>
      val n = r.nextInt(40)
      val sb = new java.lang.StringBuilder
      (1 to n).foreach(_ => sb.appendCodePoint(alphabet(r.nextInt(alphabet.length))))
      sb.toString
    }
  }

  test("punctCount == regexp_count('[^a-zA-Z0-9\\\\s]') on edges + random strings") {
    import spark.implicits._
    val rows = (edges ++ rnd(7)).toDF("t")
      .select(col("t"),
        TextCounts.punctCount(spark, col("t")).as("kern"),
        regexp_count(col("t"), lit(PunctRe)).as("re"))
      .collect()
    rows.foreach(r => assert(r.getInt(1) == r.getInt(2),
      s"punctCount mismatch on ${r.getString(0)}: kernel ${r.getInt(1)} vs regex ${r.getInt(2)}"))
  }

  test("bpeTokenCount == regexp_count('[a-z]+|[0-9]+|[^a-z0-9\\\\s]') on edges + random strings") {
    import spark.implicits._
    val rows = (edges ++ rnd(13)).toDF("t")
      .select(col("t"),
        TextCounts.bpeTokenCount(spark, col("t")).as("kern"),
        regexp_count(col("t"), lit(BpeRe)).as("re"))
      .collect()
    rows.foreach(r => assert(r.getInt(1) == r.getInt(2),
      s"bpeTokenCount mismatch on ${r.getString(0)}: kernel ${r.getInt(1)} vs regex ${r.getInt(2)}"))
  }

  test("NULL text propagates NULL through both kernels") {
    import spark.implicits._
    val r = Seq[Option[String]](None, Some("a.")).toDF("t")
      .select(TextCounts.punctCount(spark, col("t")),
        TextCounts.bpeTokenCount(spark, col("t")))
      .collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1))
    assert(r(1).getInt(0) == 1 && r(1).getInt(1) == 2)
  }
}
