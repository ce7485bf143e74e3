package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AdvancedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = SparkTestSession.sfDir

  test("approx_count_distinct stays within HLL++ error bounds of exact") {
    // the query output asserts the 5% bound itself (approx_ok); recompute
    // the raw sketch here to bound the actual relative error directly
    val rows = Advanced.q25ApproxDistinct(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("approx_ok"),
        s"${r.getAs[String]("event_type")}: sketch outside 15% of exact")
    }
    val raw = graft.Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .collect()
    raw.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.15,
        s"${r.getAs[String]("event_type")}: approx=$approx exact=$exact")
    }
  }

  test("generic as-of join matches a nested-loop reference") {
    import spark.implicits._
    val probe = Seq((1L, 10L), (1L, 25L), (2L, 5L), (2L, 100L), (3L, 50L))
      .toDF("k", "t")
    val build = Seq((1L, 5L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      (2L, 100L, "x"))
      .toDF("k", "t", "v")
    val got = AsOf.asOfJoin(probe, build, "k", "t", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    val expected = Set(
      (1L, 10L, Some("a")),  // latest build ≤ 10 is (5,"a")
      (1L, 25L, Some("b")),  // (20,"b")
      (2L, 5L, None),        // nothing at or before 5
      (2L, 100L, Some("x")), // equal timestamps: build row wins (inclusive)
      (3L, 50L, None))       // key absent from build side
    assert(got == expected)
  }

  test("rollup includes the grand total row") {
    val rows = Advanced.q21Rollup(spark, dir).collect()
    val total = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(total.length == 1)
    assert(total.head.getAs[Long]("n_orders") ==
      graft.Tables(spark, dir, "orders").count())
  }
}
