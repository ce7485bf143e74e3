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
}
