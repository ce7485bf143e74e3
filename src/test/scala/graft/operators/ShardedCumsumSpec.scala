package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two-phase sharded cumsum (VERDICT r10 #1): result byte-equality
  * against the naive single-window form, multi-shard execution actually
  * exercised (≥2 shards on real gate data), and the plan property that
  * motivated it — the big stream's window runs hash-partitioned, never
  * behind a global-order single-partition Exchange. */
class ShardedCumsumSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = SparkTestSession.sfDir

  private def counted = graft.Tables(spark, dir, "documents")
    .select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("tok_cnt"))

  test("sharded cumsum equals the naive global-order window exactly") {
    val naive = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = counted.withColumn("cum", sum("tok_cnt").over(naive))
      .select("doc_id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = TextOps.shardedCumsum(counted, "tok_cnt", Seq("doc_id"))
      .select("doc_id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }

  test("gate data actually exercises multiple shards") {
    // sf0.001 has 500 docs → ceil(500/128) = 4 shards; the equality
    // test above therefore proves the cross-shard base-offset stitch,
    // not just the degenerate one-shard case
    val nShards = counted
      .select(expr(s"doc_id div ${TextOps.DefaultCumsumShardSpan}").as("s"))
      .distinct().count()
    assert(nShards >= 2, s"only $nShards shard(s) — spec is vacuous")
  }

  test("secondary order columns stitch across shards too (qd38 shape)") {
    // per-word stream: (doc_id, widx, n) — the packedTokenStream shape
    val stream = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("widx", "term")))
      .select(col("doc_id"), col("widx"),
        length(col("term")).cast("long").as("n"))
    val naive = Window.orderBy("doc_id", "widx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = stream.withColumn("cum", sum("n").over(naive))
      .select("doc_id", "widx", "cum").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val got = TextOps.shardedCumsum(stream, "n", Seq("doc_id", "widx"))
      .select("doc_id", "widx", "cum").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == exp)
  }

  test("plan: stream window is hash-partitioned; no global-order Exchange" +
      " feeds the corpus-width window") {
    val plan = TextOps.shardedCumsum(counted, "tok_cnt", Seq("doc_id"))
      .queryExecution.executedPlan.toString
    // phase-1 window partitions by the shard key …
    assert(plan.contains("hashpartitioning(__shard"),
      s"no hash-partitioned shard window in:\n$plan")
    // … and the only SinglePartition exchange feeds the skinny
    // (shard, total) frame — its child aggregates on __shard, so the
    // corpus-width stream itself never funnels into one task. Assert
    // by counting: exactly one single-partition exchange, and the plan
    // orders only by __shard there (never by doc_id globally).
    val single = "SinglePartition"
    assert(plan.linesIterator.count(_.contains(single)) <= 1, plan)
    val globalSort = plan.linesIterator.exists(l =>
      l.contains("Sort [doc_id") && l.contains("global=true"))
    assert(!globalSort, s"global doc_id sort survived:\n$plan")
  }
}
