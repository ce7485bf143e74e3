package graft.dedup

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ClustersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("connected components resolve chains and merges to min labels") {
    import spark.implicits._
    // graph: {1-2, 2-3} chain, {10-11}, {20-21, 21-22, 20-22} triangle
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("doc_a", "doc_b")
    val got = Clusters.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("long chain converges within iteration budget") {
    import spark.implicits._
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Clusters.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.values.toSet == Set(1L))
    assert(got.size == 12)
  }

  test("corpus clusters: every member pair is a verified near-dup") {
    val clusters = Clusters.q33DedupClusters(spark, SparkTestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = MinHashLSH.nearDups(spark, SparkTestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(clusters.nonEmpty)
    // representative is the minimum member of each cluster
    val byRep = clusters.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    byRep.foreach { case (rep, members) => assert(members.min == rep) }
    // every clustered doc appears in at least one pair
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2))
    assert(clusters.forall(c => inPairs.contains(c._1)))
  }
}
