package graft.sources

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink coverage beyond parquet (SURVEY §2.1 S4/S5/K3): CSV with
  * headers (the reference's ES-aggregation staging file), JSON lines
  * (the lake format), and ORC — each written and read back with schema
  * and values preserved. */
class SourcesRoundTripSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val base = Tables(spark, SparkTestSession.sfDir, "customer")
  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$name").toString + "/data"

  test("csv round trip with header and explicit schema (S5/K3)") {
    val path = tmp("csv")
    base.write.option("header", "true").csv(path)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    val back = spark.read.option("header", "true").schema(schema).csv(path)
    assert(back.count() == base.count())
    assert(back.schema == schema)
    val a = base.orderBy("c_custkey").collect().map(_.toSeq)
    val b = back.orderBy("c_custkey").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("json-lines round trip (S1/S4 lake format)") {
    val path = tmp("json")
    base.write.json(path)
    val back = spark.read
      .schema("c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string")
      .json(path)
    assert(back.orderBy("c_custkey").collect().map(_.toSeq).toSeq ==
      base.orderBy("c_custkey").collect().map(_.toSeq).toSeq)
  }

  test("orc round trip preserves schema exactly") {
    val path = tmp("orc")
    base.write.orc(path)
    val back = spark.read.orc(path)
    assert(back.schema == base.schema)
    assert(back.orderBy("c_custkey").collect().map(_.toSeq).toSeq ==
      base.orderBy("c_custkey").collect().map(_.toSeq).toSeq)
  }

  test("csv blank-as-null staging semantics (F10/S5)") {
    import spark.implicits._
    val path = tmp("blanks")
    Seq(("1", "alice"), ("2", ""), ("3", "  ")).toDF("id", "name")
      .write.option("header", "true").csv(path)
    val back = spark.read.option("header", "true").csv(path)
      .withColumn("name",
        when(trim(coalesce(col("name"), lit(""))) === "", lit(null))
          .otherwise(col("name")))
    val names = back.orderBy("id").collect().map(r => Option(r.getString(1)))
    assert(names.toSeq == Seq(Some("alice"), None, None))
  }

  test("events timestamp-flavor normalization (nanos / NTZ / adjusted-UTC lakes)") {
    // the driver lake is TIMESTAMP(NANOS); DuckDB-synthesized corpora are
    // TIMESTAMP_MICROS without tz (Spark: TIMESTAMP_NTZ); a Spark-written
    // lake is tz-adjusted TIMESTAMP. Tables.readEvents and the streaming
    // reader must land all three on the same UTC-instant TIMESTAMP column
    // (the sf1 soak caught batch failing on NTZ and streaming silently
    // reading micros as nanos)
    val canonical = Tables(spark, SparkTestSession.sfDir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    def rewrite(dir: String, tsCol: org.apache.spark.sql.Column): Unit = {
      // the lake layout is a single FILE named events.parquet (what the
      // streaming reader's pathGlobFilter matches) — write via a staging
      // dir and move the lone part file into place
      val stage = s"$dir/_stage"
      Tables(spark, SparkTestSession.sfDir, "events")
        .select(col("event_id"), tsCol.as("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      ()
    }

    val ntzDir = java.nio.file.Files.createTempDirectory("graft_evntz").toString
    rewrite(ntzDir, col("ts").cast(TimestampNTZType))
    val ltzDir = java.nio.file.Files.createTempDirectory("graft_evltz").toString
    rewrite(ltzDir, col("ts"))

    val ref = graft.streaming.Replay.streamUpsert(spark, SparkTestSession.sfDir)
      .select("user_id", "ts_us").orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    for (d <- Seq(ntzDir, ltzDir)) {
      val back = Tables(spark, d, "events")
      assert(back.schema("ts").dataType == TimestampType, s"dir $d")
      val got = back.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == canonical, s"batch values diverged for $d")
      // streaming path: the latest-wins upsert replays the same lake and
      // emits epoch micros — equality proves the stream schema/conversion
      // matched the flavor (a micros-as-nanos misread would shift every ts)
      val up = graft.streaming.Replay.streamUpsert(spark, d)
        .select("user_id", "ts_us").orderBy("user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(up == ref, s"stream values diverged for $d")
    }
  }
}
