package graft.operators

import graft.{SparkEntry, SparkTestSession}
import graft.streaming.Replay
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-cutting properties from SURVEY §5: order preservation of the
  * listagg series, latest-wins upsert determinism, streaming == batch. */
class OperatorPropertiesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = SparkTestSession.sfDir

  test("every query returns rows at sf0.001 (smoke; driver contract)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      if (!name.startsWith("qs")) { // streaming/LSH covered separately
        val n = fn(spark, dir).count()
        assert(n >= 0, s"$name failed")
        // queries allowed to be legitimately empty on tiny data:
        val mayBeEmpty = Set("q16_set_ops")
        if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
      }
    }
  }

  test("ordered series is insensitive to input partitioning/order (A2)") {
    val baseline = Events.q9OrderedSeries(spark, dir).collect()
    // recompute over a deliberately scrambled copy of the events table
    val scrambled = graft.Tables(spark, dir, "events")
      .orderBy(rand(12345)).repartition(7)
    scrambled.createOrReplaceTempView("___scrambled_events")
    val sortedStructs = array_sort(collect_list(struct(
      col("ts").as("ts"), col("event_id").as("event_id"),
      col("event_type").as("event_type"))))
    val again = spark.table("___scrambled_events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("doc_count"),
        array_join(transform(sortedStructs, x => x.getField("event_type")), ",")
          .as("type_series"),
        array_join(transform(sortedStructs,
          x => x.getField("event_id").cast("string")), ",").as("id_series"))
      .orderBy("user_id").collect()
    assert(again.toSeq == baseline.toSeq)
  }

  test("latest-wins upsert is deterministic under replay (K2)") {
    val a = Events.q8LatestPerKey(spark, dir).collect().toSeq
    val b = Events.q8LatestPerKey(spark, dir).collect().toSeq
    assert(a == b)
  }

  test("streaming AvailableNow replay equals batch recompute (§2.8)") {
    val batch = Events.q8LatestPerKey(spark, dir).collect().toSeq
    val stream = Replay.streamUpsert(spark, dir).collect().toSeq
    assert(stream == batch)
  }

  test("quality gates pass on the testdata (A6/A7 intent)") {
    val rc = Relational.q11QualityRowcounts(spark, dir).collect()
    assert(rc.forall(_.getBoolean(2)), "some table is empty")
    val nulls = Relational.q12QualityNulls(spark, dir).collect()
    assert(nulls.forall(_.getLong(2) == 0L), "unexpected nulls in testdata")
  }
}
