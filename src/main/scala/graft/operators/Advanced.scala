package graft.operators

import graft.Tables
import graft.functions.ExactStats
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced SQL-surface operators beyond the reference's own usage — the
  * aggregation/window capabilities a warehouse user expects when switching
  * engines (SURVEY §2.4 note: "Engine exposes approx_count_distinct etc.
  * for free via Spark"). Everything here is stock Catalyst: partial
  * aggregation map-side, one exchange per grouping, window partitions on
  * high-cardinality keys.
  */
object Advanced {

  /** Distinct aggregation (count distinct via expand + two-phase agg). */
  def q20DistinctAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** ROLLUP hierarchy totals. Subtotal rows are COALESCE-labelled so the
    * sort order is engine-independent (Spark sorts NULLS FIRST, DuckDB
    * NULLS LAST). */
  def q21Rollup(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    o.rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        ExactStats.sum2dp(col("o_totalprice")).as("revenue"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("revenue"))
      .orderBy("status", "priority")
  }

  /** Window-function family: lag/lead/rank/dense_rank/ntile/running sum/
    * moving average, all per-user (high-cardinality partitions). */
  def q22WindowFuncs(spark: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val byValue = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    Tables(spark, dir, "events")
      .filter(col("user_id") < 30)
      .select(
        col("user_id"), col("event_id"),
        lag(col("value"), 1).over(byTime).as("prev_value"),
        lead(col("value"), 1).over(byTime).as("next_value"),
        rank().over(byValue).cast("long").as("value_rank"),
        dense_rank().over(byValue).cast("long").as("value_dense_rank"),
        ntile(4).over(byValue).cast("long").as("value_quartile"),
        round(percent_rank().over(byValue), 6).as("value_pct_rank"),
        round(cume_dist().over(byValue), 6).as("value_cume_dist"),
        round(sum(col("value")).over(
          byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("running_sum"),
        round(avg(col("value")).over(byTime.rowsBetween(-2, 0)), 4)
          .as("moving_avg3"))
      .orderBy("user_id", "event_id")
  }

  /** Approximate aggregates (HLL++): the scale path next to q20's exact
    * distinct counts. The sketch value itself is engine-specific, so the
    * driver-checked output carries the exact columns plus a boolean
    * asserting the sketch landed within a 15% relative-error budget —
    * the oracle predicts TRUE, making the sketch's accuracy (not just
    * its execution) part of the hash-checked contract. 15%, not the
    * configured 5% rsd: rsd is a standard DEVIATION, not a bound, so a
    * 3σ budget keeps the oracle robust on any regenerated corpus; the
    * spec bounds the raw error at the same 15%. */
  def q25ApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    ev.groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("n_events"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")).cast("double")
          <= col("exact_users").cast("double") * 0.15).as("approx_ok"))
      .orderBy("event_type")
  }

  /** Approximate percentiles (GK sketch) beside the exact interpolated
    * percentile, with an accuracy-bound boolean the oracle predicts —
    * the q25 pattern extended to the quantile-sketch family. The bound
    * is RANK-based, which is what the sketch actually guarantees: the
    * returned element's rank is within ε·n of the median, so its VALUE
    * must lie between the interpolated p45 and p55 (rank window ±5% ≫
    * ε = 1/accuracy; a value-distance bound would falsely fail on
    * gapped/bimodal data where the interpolated median sits between two
    * distant elements). Tiny groups (< 11 rows), where the ±5% rank
    * window can exclude the median element, fall back to [min, max]. */
  def q36ApproxPercentile(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        expr("approx_percentile(value, 0.5, 10000)").as("approx_p50"),
        expr("percentile(value, 0.5)").as("exact_p50_raw"),
        expr("percentile(value, 0.45)").as("p45_raw"),
        expr("percentile(value, 0.55)").as("p55_raw"),
        min("value").as("vmin_raw"),
        max("value").as("vmax_raw"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("n"),
        round(col("exact_p50_raw"), 4).as("exact_p50"),
        round(col("vmin_raw"), 2).as("vmin"),
        round(col("vmax_raw"), 2).as("vmax"),
        when(col("n") >= 11,
          col("approx_p50").between(col("p45_raw"), col("p55_raw")))
          .otherwise(col("approx_p50").between(col("vmin_raw"), col("vmax_raw")))
          .as("approx_ok"))
      .orderBy("event_type")
  }

  /** Custom physical operator (plans.BandJoinExec): purchases joined to
    * the same user's errors within ±5 minutes. The strategy rewrites the
    * natural equi+band join condition into a sorted sweep instead of the
    * stock per-key cross product + filter. */
  def q26BandJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("p_us"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("event_id").as("error_id"),
        unix_micros(col("ts")).as("e_us"))
    graft.plans.BandJoin.join(purchases, errors,
        "p_user", "e_user", "p_us", "e_us", delta = 300000000L) // ±5 min
      .select(col("p_user").as("user_id"), col("purchase_id"), col("error_id"),
        col("p_us"), col("e_us"))
      .orderBy("user_id", "purchase_id", "error_id")
  }

  /** Fixed-width histogram of event values per type (integer bucket
    * arithmetic → engine-exact). */
  def q34ValueHistogram(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "events")
      .select(col("event_type"),
        floor(col("value") / 50.0).cast("long").as("bucket"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "bucket")
  }

  /** GROUPING SETS with explicit set list (the general form behind
    * rollup/cube), grouping-id disambiguated via COALESCE labels. */
  def q32GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "orders").createOrReplaceTempView("v_orders_gs")
    spark.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n_orders,
        |  cast(round(sum(cast(o_totalprice AS DECIMAL(20,6))), 2) AS DOUBLE) AS revenue
        |FROM v_orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |  (o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin)
  }

  /** SQL surface: correlated + uncorrelated scalar subqueries through
    * `spark.sql` over registered views — Catalyst decorrelates the inner
    * count into a left-outer aggregate join. */
  def q31ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "customer").createOrReplaceTempView("v_customer")
    Tables(spark, dir, "orders").createOrReplaceTempView("v_orders")
    spark.sql(
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS bal,
        |  (SELECT count(*) FROM v_orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM v_customer c
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM v_customer)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Pivot: per-user daily counts spread across event-type columns —
    * dynamic-to-wide reshaping with a FIXED value list so the schema is
    * deterministic (the oracle mirrors it as conditional aggregation). */
  def q30Pivot(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "events")
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .groupBy("user_id", "day")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id", "day")
  }

  /** A2 via a typed Aggregator (partial-agg listagg): same result as the
    * collect_list form in q9_ordered_series, but map-side combined — the
    * shuffle carries merged buffers, not raw rows. Shares q9's oracle
    * semantics (type_series column). */
  def q27SeriesAggregator(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3, r._4))
      .agg(graft.functions.OrderedSeriesAgg.stringSeries.toColumn.name("type_series"))
      .toDF("user_id", "type_series")
      .orderBy("user_id")
  }

  /** Funnel analysis: per-user first signup → first click at/after that
    * signup → first purchase at/after that click; stage counts over the
    * population. Three grouped passes, each joining the previous stage
    * time back in (every user survives every stage — missing steps are
    * NULLs counted out by the final conditional counts). */
  def q28Funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
    val u1 = ev.groupBy("user_id").agg(
      min(when(col("event_type") === "signup", col("t"))).as("t_signup"))
    val u2 = ev.join(u1, "user_id").groupBy("user_id").agg(
      min("t_signup").as("t_signup"),
      min(when(col("event_type") === "click" && col("t") >= col("t_signup"),
        col("t"))).as("t_click"))
    val u3 = ev.join(u2, "user_id").groupBy("user_id").agg(
      min("t_signup").as("t_signup"),
      min("t_click").as("t_click"),
      min(when(col("event_type") === "purchase" && col("t") >= col("t_click"),
        col("t"))).as("t_purchase"))
    u3.agg(
      count(col("t_signup")).as("n_signup"),
      count(col("t_click")).as("n_signup_click"),
      count(col("t_purchase")).as("n_full_funnel"),
      count(lit(1)).as("n_users"))
  }

  /** Cohort retention: users grouped by first-active day, counted per
    * (cohort_day, day_offset) of later activity. */
  def q29Cohort(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
    val cohorts = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
    ev.join(cohorts, "user_id")
      .select(col("cohort_day"),
        datediff(to_date(col("day")), to_date(col("cohort_day")))
          .cast("long").as("day_offset"),
        col("user_id"))
      .distinct()
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Exact percentiles (linear interpolation in both engines) +
    * dispersion statistics per group. */
  def q23Percentiles(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(min("value"), 2).as("vmin"),
        round(max("value"), 2).as("vmax"),
        round(stddev_samp(col("value")), 4).as("v_stddev"))
      .orderBy("event_type")
  }
}
