package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFeaturesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("tokens / tokenSet / jaccard column builders") {
    val df = Seq(
      ("a b b c", "b c d"),
      ("  x  y ", "x y"),
      ("same same", "same")).toDF("t1", "t2")
    val got = df.select(
      TextFeatures.tokens(col("t1")).as("toks"),
      TextFeatures.tokenSet(col("t1")).as("set1"),
      round(TextFeatures.jaccard(
        TextFeatures.tokenSet(col("t1")), TextFeatures.tokenSet(col("t2"))), 4).as("j"))
      .collect()
    assert(got(0).getSeq[String](0) == Seq("a", "b", "b", "c"))
    assert(got(0).getSeq[String](1) == Seq("a", "b", "c"))
    assert(got(0).getDouble(2) == 0.5) // {b,c} / {a,b,c,d}
    assert(got(1).getSeq[String](0) == Seq("x", "y")) // multi-space + trim
    assert(got(1).getDouble(2) == 1.0)
    assert(got(2).getDouble(2) == 1.0)
  }
}
