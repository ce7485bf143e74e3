package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) enrichment — SURVEY §2.3 J4: "join posts to
  * latest stats <= timestamp". The reference carries the enrichment value
  * inside the document; the engine exposes it as a real operator.
  *
  * Spark-first preference order (builder brief): this is case (a) —
  * composed from built-ins. For two separate tables the same shape is a
  * union-tagged window (tag rows, union, last(tagged value, ignoreNulls)
  * over time order, filter probe rows): one shuffle on the key, no custom
  * strategy needed. Here the reference stream (purchases) lives in the
  * same events table, so the tag is the event_type itself.
  */
object AsOf {

  /** For every event: the event_id and ts of the same user's most recent
    * purchase at or before it (inclusive as-of). */
  def q24AsOfEnrich(spark: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "events")
      .filter(col("user_id") < 30)
      .withColumn("last_purchase_id",
        last(when(col("event_type") === "purchase", col("event_id")), ignoreNulls = true)
          .over(byTime))
      .withColumn("last_purchase_us",
        last(when(col("event_type") === "purchase", unix_micros(col("ts"))), ignoreNulls = true)
          .over(byTime))
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"),
        col("last_purchase_id"),
        col("last_purchase_us"),
        (unix_micros(col("ts")) - col("last_purchase_us")).as("us_since_purchase"))
      .orderBy("event_id")
  }

  /** General two-table as-of join via union-tagging: for each probe row
    * (leftKey, leftTime) attach the latest build row value with
    * buildTime <= leftTime. Used by the spec against a nested-loop
    * reference; scales as one shuffle on the key. */
  def asOfJoin(probe: DataFrame, build: DataFrame,
               key: String, time: String, payload: String): DataFrame = {
    val p = probe.select(col(key), col(time),
      lit(null).cast(build.schema(payload).dataType).as(payload),
      lit(1).as("__side"))
    val b = build.select(col(key), col(time), col(payload), lit(0).as("__side"))
    // build rows sort before probe rows at equal time → inclusive as-of
    val w = Window.partitionBy(key).orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.unionByName(b)
      .withColumn("__asof", last(when(col("__side") === 0, col(payload)),
        ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col(key), col(time), col("__asof").as(s"asof_$payload"))
  }
}
