package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The daily `history` fact build — SURVEY §3.2: the reference's Airflow
  * DAG (stage users → ES engagement agg → two left joins + ordered
  * LISTAGG → Redshift `history`, airflow/plugins/helpers/sql_queries.py:2-30)
  * collapsed into one linear Spark job: two shuffles (stats group-by,
  * posts group-by) plus broadcast joins.
  *
  * The engine keeps the time series as real ArrayType columns and renders
  * the reference's comma-joined VARCHAR only at the sink (SURVEY §2.4 A2).
  */
object History {

  /** A1: trailing-window engagement rollup, ES terms-agg shape
    * (get_elastic_data.py:61-100): posts in the last `days` before `now`,
    * grouped by owner, top `maxGroups` owners by post count. */
  def engagementRollup(posts: DataFrame, now: Column, days: Int = 60,
                       maxGroups: Int = 10000): DataFrame = {
    val spark = posts.sparkSession
    posts
      .filter(col("ts") >= now - expr(s"INTERVAL $days DAYS")) // P9
      .groupBy(col("owner_id").as("id"))
      .agg(
        count(lit(1)).as("doc_count"),
        // engine-exact half-up 4dp means (functions.ExactStats scaladoc:
        // double avg is order-dependent AND Spark/DuckDB round() disagree
        // exactly on the quantized-mean midpoints these metrics produce)
        graft.functions.ExactStats.avg4dp(spark, col("followers")).as("fol_avg"),
        graft.functions.ExactStats.avg4dp(spark, col("engagement")).as("eng_avg"))
      .orderBy(desc("doc_count"), col("id")) // ES terms order, size cap
      .limit(maxGroups)
  }

  /** A2: ordered per-user series as real arrays (order by created_at, with
    * the date as tie-broken sort key inside the group). NULL values are
    * skipped — SQL LISTAGG ignores NULL inputs, and collect_list only
    * skips NULL *elements*, so the struct is null-gated to match
    * (Basic-tier users have no impressions/reach → empty series, exactly
    * as the reference's warehouse shows). */
  private def series(valueCol: String): Column =
    transform(
      array_sort(collect_list(when(col(valueCol).isNotNull,
        struct(col("created_at"), col(valueCol).as("v"))))),
      x => x.getField("v"))

  /** The `history` fact: per-user daily series + engagement rollup +
    * palette colors, left-joined so every staged user appears
    * (sql_queries.py:2-30). `aggs` and `colors` are orders of magnitude
    * smaller than stats at scale (one row per active user) → broadcast. */
  def build(stagedUsers: DataFrame, aggs: DataFrame, colors: DataFrame): DataFrame = {
    val perUser = stagedUsers
      .groupBy("id")
      .agg(
        series("followers_count").as("followers"),
        series("impressions").as("impressions"),
        series("reach").as("reach"))
    perUser
      .join(broadcast(aggs), Seq("id"), "left") // J1
      .join(broadcast(colors.withColumnRenamed("igId", "id")), Seq("id"), "left") // J2
      .select(col("id"), col("followers"), col("impressions"), col("reach"),
        col("doc_count"), col("fol_avg"), col("eng_avg"), col("colors"))
      .orderBy("id")
  }

  /** Sink render: the reference's comma-joined VARCHAR series
    * (LISTAGG ', '; create_redshift_tables.py:50-52). */
  def renderForWarehouse(history: DataFrame): DataFrame = {
    def joined(c: String): Column =
      array_join(transform(col(c), x => x.cast("string")), ", ")
    history
      .withColumn("followers", joined("followers"))
      .withColumn("impressions", joined("impressions"))
      .withColumn("reach", joined("reach"))
  }

  /** The §3.2 flagship as a DRIVER-CHECKED query: the exact
    * `engagementRollup` → `build` → `renderForWarehouse` composition
    * (sql_queries.py:2-30) over the events table, so the fact build is
    * oracle-verified end-to-end, not just fixture-tested. The domain
    * mapping keeps every semantic the reference exercises: per-user
    * ordered series with NULL-skipping LISTAGG (only view/click rows
    * carry impressions/reach — Basic-tier null behavior), a trailing
    * 60-day engagement rollup, and two broadcast left joins. Series
    * values are integral so the warehouse string render is byte-exact
    * against the oracle. */
  def q35HistoryFact(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables(spark, dir, "events")
    val staged = ev.select(
      col("user_id").as("id"),
      unix_micros(col("ts")).as("created_at"),
      col("event_id").as("followers_count"),
      when(col("event_type") === "view",
        floor(col("value") * 10).cast("long")).as("impressions"),
      when(col("event_type") === "click",
        floor(col("value") * 10).cast("long")).as("reach"))
    val posts = ev.select(col("ts"), col("user_id").as("owner_id"),
      col("value").as("followers"), (col("value") * 2).as("engagement"))
    val aggs = engagementRollup(posts, lit("2024-02-15").cast("timestamp"))
      .select(col("id"), col("doc_count"),
        round(col("fol_avg"), 4).as("fol_avg"),
        round(col("eng_avg"), 4).as("eng_avg"))
    val colors = ev.select(col("user_id")).distinct()
      .select(col("user_id").as("igId"),
        format_string("#%06x", col("user_id") % 16777216).as("colors"))
    renderForWarehouse(build(staged, aggs, colors))
  }

  /** A6: row-count gate (data_quality.py:26-36). */
  def checkRowCount(df: DataFrame): Boolean = !df.isEmpty

  /** A7 *intent*: no NULLs in a key column (the reference's
    * `COUNT(*) - COUNT(-1)` is a constant-expression bug — SURVEY §2.4). */
  def checkNoNulls(df: DataFrame, column: String): Boolean =
    df.filter(col(column).isNull).isEmpty

  /** F13: keyword / hashtag / mention search over the post snapshot —
    * the product capability the reference delegates to Elasticsearch
    * full-text (README.md:154). */
  def searchPosts(posts: DataFrame, keyword: Option[String] = None,
                  hashtag: Option[String] = None,
                  mention: Option[String] = None): DataFrame = {
    val preds = Seq(
      keyword.map(k => lower(col("caption")).contains(k.toLowerCase)),
      hashtag.map(h => array_contains(split(col("hashtags"), ",\\s*"), h)),
      mention.map(m => array_contains(split(col("mentioned_users"), ",\\s*"), m)))
      .flatten
    preds.foldLeft(posts)((df, p) => df.filter(p))
  }
}
