package graft.operators

import graft.Tables
import graft.functions.ExactStats
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operator family from SURVEY.md §2.4/§2.5/§2.8: the keyed
  * latest-wins upsert (K2), ordered series aggregation (A2 LISTAGG), top-K
  * groups (A1's terms size cap), per-key top-N (the "latest 25 posts"
  * contract), trailing-window rollups (P9), time features (F6-F8), JSON
  * extraction, and gap-based sessionization.
  *
  * Timestamps: `Tables` normalizes the nanosecond parquet timestamps to
  * microseconds (truncation — same as DuckDB's TIMESTAMP_NS→TIMESTAMP cast).
  * Outputs carry epoch-micros longs (`*_us`) instead of raw timestamps so
  * oracle comparison is type-stable.
  *
  * Scale: each query here is one shuffle (by user_id or by the group key),
  * with map-side partial aggregation. The window queries partition by
  * user_id — at 100 TB that key is high-cardinality (no single-partition
  * global windows anywhere).
  */
object Events {

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")

  /** A1 analog: trailing-window engagement rollup + top-K groups
    * (ES terms size cap, get_elastic_data.py:69-100). Deterministic
    * tie-break on user_id. */
  def q7TopkGroups(spark: SparkSession, dir: String): DataFrame = {
    events(spark, dir)
      .filter(col("ts") >= lit("2024-01-15 00:00:00").cast("timestamp"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("doc_count"),
        // engine-exact half-up 4dp mean (functions.ExactStats)
        graft.functions.ExactStats.avg4dp(spark, col("value")).as("val_avg"),
        ExactStats.sum2dp(col("value")).as("val_sum"))
      .orderBy(desc("doc_count"), col("user_id"))
      .limit(10)
  }

  /** K2: keyed latest-wins upsert — the ES `_version` semantics
    * (s3-to-es_aws.py:198-204) as a window: one row per key, newest first.
    * Tie-break on event_id keeps replay deterministic (SURVEY §7 risk 5). */
  def q8LatestPerKey(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .orderBy("user_id")
  }

  /** A2: ordered series aggregation — LISTAGG WITHIN GROUP (ORDER BY ...)
    * (sql_queries.py:13-29). Engine keeps the real array; the string render
    * happens at the sink, exactly as SURVEY §2.4 A2 prescribes. Order is
    * made deterministic by sorting on (ts, event_id) inside the group. */
  def q9OrderedSeries(spark: SparkSession, dir: String): DataFrame = {
    val sortedStructs = array_sort(collect_list(struct(
      col("ts").as("ts"), col("event_id").as("event_id"),
      col("event_type").as("event_type"))))
    events(spark, dir)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("doc_count"),
        array_join(transform(sortedStructs, x => x.getField("event_type")), ",")
          .as("type_series"),
        array_join(transform(sortedStructs,
          x => x.getField("event_id").cast("string")), ",").as("id_series"))
      .orderBy("user_id")
  }

  /** §2.5 per-key top-N: the "latest 25 posts per user" contract
    * (README.md:37-39) → row_number ≤ N. */
  def q10TopnPerKey(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("user_id"), col("rn").cast("long").as("rn"),
        col("event_id"), col("event_type"))
      .orderBy("user_id", "rn")
  }

  /** F6/F7/F8: time features — epoch math, calendar parts, formatting. */
  def q14TimeFeatures(spark: SparkSession, dir: String): DataFrame = {
    events(spark, dir)
      .filter(col("event_id") < 500)
      .select(
        col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        year(col("ts")).cast("long").as("y"),
        month(col("ts")).cast("long").as("m"),
        dayofmonth(col("ts")).cast("long").as("d"),
        hour(col("ts")).cast("long").as("h"),
        minute(col("ts")).cast("long").as("mi"),
        date_format(col("ts"), "yyyy-MM-dd").as("day_str"),
        unix_micros(col("ts") + expr("INTERVAL 1 DAY")).as("ts_plus_day_us"),
        // F7: epoch-millis timestamp parse (the staging COPY's
        // TIMEFORMAT 'epochmillisecs', stage_redshift.py:63)
        unix_micros(timestamp_millis(col("event_id"))).as("ms_roundtrip_us"))
      .orderBy("event_id")
  }

  /** Semi-structured extraction: JSON props column (the reference's
    * schema-tolerant document ingest, SURVEY §1.3). */
  def q15JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    events(spark, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .filter(col("k") > 50)
      .orderBy("event_id")
  }

  /** §2.8 tumbling-window rollup (batch form of the streaming hourly agg):
    * one shuffle on (hour, event_type), partial agg map-side. */
  def q18HourlyRollup(spark: SparkSession, dir: String): DataFrame = {
    events(spark, dir)
      .groupBy(
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        ExactStats.sum2dp(col("value")).as("value_sum"))
      .orderBy("hour_us", "event_type")
  }

  /** Gap-based sessionization (30-min inactivity): lag + cumulative-sum
    * window, then per-session rollup. All window partitions are per-user —
    * scales with key cardinality, no global sort. */
  def q19Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val cumulative = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = 30L * 60L * 1000000L
    events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byTime))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(cumulative))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"),
        max("ts_us").as("end_us"))
      .orderBy("user_id", "session_id")
  }
}
