package graft.plans

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PushdownRulesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def pushedFilters(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val scans = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def walk(p: SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(walk)
      }
      walk(df.queryExecution.executedPlan)
    }
    scans.map(_.metadata.getOrElse("PushedFilters", "")).mkString(";")
  }

  test("abs-band predicate is rewritten into pushable range filters") {
    RewriteAbsBand.register(spark)
    // events written as plain parquet with a long column to filter on
    val tmp = java.nio.file.Files.createTempDirectory("graft_push").toString
    Tables(spark, SparkTestSession.sfDir, "events")
      .withColumn("ts_us", unix_micros(col("ts")))
      .select("event_id", "ts_us", "user_id")
      .write.mode("overwrite").parquet(s"$tmp/ev")
    val center = 1704853800000000L // mid-January 2024 in epoch micros
    val df = spark.read.parquet(s"$tmp/ev")
      .filter(abs(col("ts_us") - center) <= 3600000000L) // ±1 hour
    val pushed = pushedFilters(df)
    assert(pushed.contains("GreaterThanOrEqual(ts_us") &&
      pushed.contains("LessThanOrEqual(ts_us"),
      s"band predicate not pushed: $pushed")
    // and the rewrite is semantics-preserving
    val expected = spark.read.parquet(s"$tmp/ev")
      .filter(col("ts_us") >= center - 3600000000L &&
        col("ts_us") <= center + 3600000000L).count()
    assert(df.count() == expected)
  }

  test("rule leaves non-matching and unsafe shapes alone") {
    RewriteAbsBand.register(spark)
    import spark.implicits._
    val df = Seq((1L, 5L), (2L, 50L)).toDF("id", "x")
    // double-typed band: no rewrite, still correct
    val d = df.filter(abs(col("x") * 1.0 - 10.0) <= 6.0)
    assert(d.collect().map(_.getLong(0)).toSeq == Seq(1L))
    // overflow-unsafe literals: left alone, still correct
    val big = df.filter(abs(col("x") - Long.MaxValue) <= 10L)
    assert(big.count() == 0)
  }
}
