package graft.plans

import graft.SparkTestSession
import graft.operators.Advanced
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BandJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("strategy plans BandJoinExec for the natural condition") {
    val df = Advanced.q26BandJoin(spark, SparkTestSession.sfDir)
    assert(planOf(df).contains("BandJoin"),
      s"custom operator missing from plan:\n${df.queryExecution.executedPlan}")
  }

  test("band join equals the stock Spark join on the same condition") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val left = (1 to 500).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextLong() % 100, rnd.nextInt(1000).toLong))
      .zipWithIndex.map { case ((k, _, t), i) => (k, i.toLong, t) }
      .toDF("lk", "lid", "lt")
    val right = (1 to 500).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, i.toLong, t) }
      .toDF("rk", "rid", "rt")
    val custom = BandJoin.join(left, right, "lk", "rk", "lt", "rt", delta = 50L)
      .select("lid", "rid")
    assert(planOf(custom).contains("BandJoin"))
    // stock plan: equivalent condition written WITHOUT abs() so the
    // strategy cannot match it (it is session-registered by now) and
    // Spark plans its default hash join + filter
    val stock = left.join(right,
      col("lk") === col("rk") &&
        col("lt") - col("rt") <= 50L && col("rt") - col("lt") <= 50L)
      .select("lid", "rid")
    assert(!planOf(stock).contains("BandJoin"), "stock plan unexpectedly custom")
    val s = stock.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val c = custom.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(c == s, s"custom=${c.size} stock=${s.size} missing=${(s -- c).take(5)} extra=${(c -- s).take(5)}")
    assert(s.nonEmpty)
  }

  test("band join handles duplicate timestamps and empty sides") {
    import spark.implicits._
    val left = Seq((1L, 1L, 10L), (1L, 2L, 10L), (2L, 3L, 5L)).toDF("lk", "lid", "lt")
    val right = Seq((1L, 7L, 10L), (1L, 8L, 10L), (3L, 9L, 5L)).toDF("rk", "rid", "rt")
    val got = BandJoin.join(left, right, "lk", "rk", "lt", "rt", delta = 0L)
      .select("lid", "rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // lids 1 and 2 (key 1, t=10) each match rids 7 and 8 (key 1, t=10);
    // lid 3 (key 2) and rid 9 (key 3) have no partner at delta=0
    assert(got == Set((1L, 7L), (1L, 8L), (2L, 7L), (2L, 8L)))
    val empty = BandJoin.join(left.filter(col("lk") === 99), right, "lk", "rk", "lt", "rt", 100L)
    assert(empty.count() == 0)
  }
}
