package graft.operators

import graft.Tables
import graft.functions.ExactStats
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator family from SURVEY.md §2: scans (S1-S6), projections /
  * filters / predicates (P1-P13), joins (J1-J3), aggregations (A1, A6, A7),
  * scalar functions (F1-F11), set ops, and the sort/limit/top-k shapes of
  * §2.5.
  *
  * Design notes for 100 TB scale:
  *  - every query is a declarative DataFrame plan: filters and projections
  *    reach the parquet scan (PushedFilters / ReadSchema), aggregation is
  *    partial (map-side combine) before the single shuffle per groupBy;
  *  - dimension tables that are small *by schema design* (region = 5 rows,
  *    nation = 25 rows — fixed cardinality at any SF) are broadcast
  *    explicitly; data-dependent sides are left to AQE;
  *  - no collect(), no driver-side loops; results stay distributed until
  *    the caller sinks them.
  */
object Relational {

  /** A1 analog / TPC-H Q1 shape: pricing summary over lineitem.
    * Reference: grouped avg+count rollup (get_elastic_data.py:69-100). */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    // engine-exact half-up 4dp means over decimal-quantized columns —
    // see functions.ExactStats (double avg is summation-order-dependent
    // and the engines' round() disagree on quantized-mean midpoints)
    def eAvg(c: String) =
      graft.functions.ExactStats.avg4dp(spark, col(c))
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        // order-independent decimal sums (ExactStats.sum2dp): at sf1 the
        // double-sum partitioning noise crossed a 2dp rounding boundary
        ExactStats.sum2dp(col("l_quantity")).as("sum_qty"),
        ExactStats.sum2dp(col("l_extendedprice")).as("sum_base_price"),
        ExactStats.sum2dp(disc).as("sum_disc_price"),
        ExactStats.sum2dp(disc * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        eAvg("l_quantity").as("avg_qty"),
        eAvg("l_extendedprice").as("avg_price"),
        eAvg("l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** P9-style predicate + projection with per-row arithmetic (filter pushdown
    * showcase; TPC-H Q6 shape kept row-level so the scan prunes columns). */
  def q2FilterProject(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * col("l_discount"), 4).as("revenue"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** J1/J2 analog: multi-way equi-join with broadcast dims + grouped agg
    * (TPC-H Q5 shape). region/nation have fixed cardinality at any scale
    * factor, so broadcasting them is correct at 100 TB too. */
  def q3JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    val n = Tables(spark, dir, "nation")
    val r = Tables(spark, dir, "region")
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .filter(
        r("r_name") === "ASIA" &&
        o("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        o("o_orderdate") <  lit("1998-01-01").cast("timestamp"))
      .groupBy(n("n_name").as("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        ExactStats.sum2dp(o("o_totalprice")).as("revenue"))
      .orderBy("n_name")
  }

  /** J1 + P6: left join keeping all customers, -1 sentinel for the missing
    * side (s3-to-es_aws.py:184-189 semantics). */
  def q4LeftJoinSentinel(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    val perCust = o.groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("order_cnt"),
        ExactStats.sum2dp(col("o_totalprice")).as("total_spent"))
    c.join(perCust, c("c_custkey") === perCust("o_custkey"), "left")
      .select(
        c("c_custkey"), c("c_name"),
        coalesce(col("order_cnt"), lit(0L)).as("order_cnt"),
        coalesce(col("total_spent"), lit(-1.0)).as("total_spent"))
      .orderBy("c_custkey")
  }

  /** J3 analog: anti join — "keys not already present"
    * (existence-checked image put, s3-to-es_aws.py:94-104). Customers
    * with no event activity: a genuinely non-empty result at every SF
    * (every customer has orders, so the orders variant verified nothing). */
  def q5AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val ev = Tables(spark, dir, "events")
    c.join(ev, c("c_custkey") === ev("user_id"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** Semi join + rollup: customers with at least one order, counted per
    * market segment. */
  def q6SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** A6: row-count quality gate as a first-class operator
    * (data_quality.py:26-36), over every source table. */
  def q11QualityRowcounts(spark: SparkSession, dir: String): DataFrame = {
    Tables.all.map { t =>
      Tables(spark, dir, t).agg(count(lit(1)).as("row_cnt"))
        .select(lit(t).as("tbl"), col("row_cnt"),
          (col("row_cnt") >= 1L).as("pass"))
    }.reduce(_.unionAll(_)).orderBy("tbl")
  }

  /** A7 *intent*: per-table total null count (the reference's
    * `COUNT(*) - COUNT(-1)` at data_quality.py:40 is a constant-expression
    * bug; we implement what it meant: count(*) - count(col) per column). */
  def q12QualityNulls(spark: SparkSession, dir: String): DataFrame = {
    def nulls(t: String, cols: Seq[String]): DataFrame = {
      val df = Tables(spark, dir, t)
      val total = cols.map(c => count(lit(1)) - count(col(c)))
        .reduce(_ + _)
      df.agg(count(lit(1)).as("n_rows"), total.as("n_nulls"))
        .select(lit(t).as("tbl"), col("n_rows"), col("n_nulls"))
    }
    Seq(
      nulls("region", Seq("r_regionkey", "r_name")),
      nulls("nation", Seq("n_nationkey", "n_name", "n_regionkey")),
      nulls("customer", Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")),
      nulls("supplier", Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal")),
      nulls("part", Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")),
      nulls("orders", Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")),
      nulls("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")),
      nulls("events", Seq("event_id", "ts", "user_id", "event_type", "value", "props")),
      nulls("documents", Seq("doc_id", "text", "lang", "source", "n_chars")),
      nulls("embeddings", Seq("vec_id", "embedding", "label")))
      .reduce(_.unionAll(_)).orderBy("tbl")
  }

  /** F1-F4, F11 scalar chain: regex extract, split/element, printf hex color
    * (F3, spark_image.py:61-72), concat keys, pad, case normalize. */
  def q13ScalarChain(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part")
    p.select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("name_last_word"),
        element_at(split(col("p_name"), " "), 1).as("name_first_word"),
        upper(col("p_brand")).as("brand_u"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type_key"),
        format_string("#%02x%02x%02x",
          col("p_size"), (col("p_size") * 2) % 256, lit(255) - col("p_size"))
          .as("hex_color"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_pad"),
        round(col("p_retailprice") * 1.1, 2).as("inflated_price"))
      .orderBy("p_partkey")
  }

  /** Set ops (§2.6): EXCEPT + INTERSECT + UNION ALL in one labeled result.
    * Cross-table key sets are used so both branches are genuinely
    * non-empty (the earlier within-events event-type EXCEPT was vacuously
    * empty — every user has every event type): customers that never
    * produced an event (the idempotent re-ingest "not yet stored" set,
    * README.md:41 analog of K1's existence check), and evented users that
    * also placed orders. */
  def q16SetOps(spark: SparkSession, dir: String): DataFrame = {
    val custKeys = Tables(spark, dir, "customer")
      .select(col("c_custkey").as("key"))
    val eventUsers = Tables(spark, dir, "events")
      .select(col("user_id").as("key"))
    val orderCusts = Tables(spark, dir, "orders")
      .select(col("o_custkey").as("key"))
    val neverEvented = custKeys.except(eventUsers)
      .select(lit("customer_no_events").as("set_name"), col("key"))
    val eventedBuyers = eventUsers.intersect(orderCusts)
      .select(lit("evented_with_orders").as("set_name"), col("key"))
    neverEvented.unionAll(eventedBuyers).orderBy("set_name", "key")
  }

  /** F10 (blank→null) + CASE banding + least/greatest over customer. */
  def q17CaseSentinel(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    c.select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 5000, "low")
          .otherwise("high").as("bal_band"),
        when(trim(col("c_mktsegment")) === "", null)
          .otherwise(col("c_mktsegment")).as("seg_norm"),
        round(greatest(col("c_acctbal"), lit(0.0)), 2).as("bal_floor"),
        round(least(col("c_acctbal"), lit(1000.0)), 2).as("bal_cap"))
      .orderBy("c_custkey")
  }
}
