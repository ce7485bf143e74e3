package graft.similarity

import java.nio.file.Files

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contents-fingerprinted memo keys: the session memos of derived state
  * (MinHash signatures/pairs, the materialized IVF index) are keyed on
  * `Tables.contentKey` — canonical path PLUS file list/sizes/mtimes — so
  * a corpus rewritten IN PLACE mid-session misses the stale entry and
  * rebuilds. Before round 6 these were path-keyed: the rewrite served
  * stale results until an explicit clearCache(). */
class MemoFreshnessSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("contentKey changes when the corpus is rewritten in place") {
    val dir = Files.createTempDirectory("graft_ckey").toString
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "s").write.mode("overwrite")
      .parquet(s"$dir/t.parquet")
    val k1 = Tables.contentKey(dir)
    assert(k1 == Tables.contentKey(dir), "key must be stable when untouched")
    assert(Tables.contentKey(dir + "/") startsWith k1.takeWhile(_ != '#'),
      "path spellings must canonicalize")
    Seq((2L, "b"), (3L, "c")).toDF("id", "s").write.mode("overwrite")
      .parquet(s"$dir/t.parquet")
    assert(Tables.contentKey(dir) != k1, "rewrite must change the key")
  }

  test("MinHash signature memo rebuilds after an in-place corpus rewrite") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_memo_mh").toString
    def write(texts: Seq[(Long, String)]): Unit =
      texts.toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("spec").as("source"), length(col("text")).cast("long").as("n_chars"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    write(Seq((1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "an entirely different document about spark partitioning")))
    assert(graft.dedup.MinHashLSH.signatures(spark, dir).count() == 2)

    write(Seq((1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "an entirely different document about spark partitioning"),
      (3L, "a third document that only exists after the rewrite")))
    // path-keyed memos served the stale 2-row signature table here
    assert(graft.dedup.MinHashLSH.signatures(spark, dir).count() == 3)
  }

  test("materialized IVF index rebuilds after an in-place corpus rewrite") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_memo_ivf").toString
    val rnd = new scala.util.Random(7)
    def write(n: Int): Unit =
      (0 until n).map(i =>
          (i.toLong, Seq.fill(8)(rnd.nextGaussian()), i % 2))
        .toDF("vec_id", "embedding", "label")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    write(20)
    val before = Ann.knnIndexed(spark, dir, k = 3, nprobe = 2,
      queryPred = "vec_id < 2").count()
    assert(before > 0)
    write(40) // different corpus at the same path
    val expect = Ann.knn(spark, dir, k = 3, nprobe = 2,
      queryPred = "vec_id < 2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val after = Ann.knnIndexed(spark, dir, k = 3, nprobe = 2,
        queryPred = "vec_id < 2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // a stale index would still rank the 20-vector store's candidates
    assert(after == expect, "indexed search must reflect the rewritten corpus")
  }
}
