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

  test("distributed label loop (past the local gate) equals driver-local union-find") {
    import spark.implicits._
    // chains, a triangle, a star, and singleton-free merges — run with
    // localThreshold = 0 to force the distributed path the gate normally
    // reserves for >1M-edge graphs
    val rnd = new scala.util.Random(11)
    val pairs = ((1L until 12L).map(i => (i, i + 1)) ++
      Seq((20L, 21L), (21L, 22L), (20L, 22L), (30L, 40L), (30L, 50L)) ++
      (0 until 200).map(_ => { val a = rnd.nextInt(100).toLong + 100L
        val b = rnd.nextInt(100).toLong + 100L; (math.min(a, b), math.max(a, b)) })
    ).filter(p => p._1 != p._2).toDF("doc_a", "doc_b")
    val local = Clusters.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val dist = Clusters.connectedComponents(pairs, localThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dist == local)
  }

  test("reliable-storage checkpoint mode equals executor-local mode (CC)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = ((1L until 12L).map(i => (i, i + 1)) ++
      (0 until 150).map(_ => { val a = rnd.nextInt(80).toLong + 100L
        val b = rnd.nextInt(80).toLong + 100L; (math.min(a, b), math.max(a, b)) })
    ).filter(p => p._1 != p._2).toDF("doc_a", "doc_b")
    // localThreshold = 0 forces the distributed label loop — the path
    // whose per-iteration truncation the checkpoint mode actually routes
    val base = Clusters.connectedComponents(pairs, localThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_ckpt")
    try {
      spark.conf.set("spark.graft.checkpointDir", ckptDir.toString)
      // Spark pins the checkpoint dir per context: if an earlier suite
      // already set one, the run writes THERE (iterCheckpoint warns) —
      // assert against the ACTIVE dir, not our conf value, so the test
      // is suite-order-robust
      val sc = spark.sparkContext
      def activeRddDirs(): Set[String] = sc.getCheckpointDir match {
        case None => Set.empty[String]
        case Some(d) =>
          val p = new org.apache.hadoop.fs.Path(d)
          val fs = p.getFileSystem(sc.hadoopConfiguration)
          if (!fs.exists(p)) Set.empty[String]
          else fs.listStatus(p).toSeq.map(_.getPath.getName)
            .filter(_.startsWith("rdd-")).toSet
      }
      val before = activeRddDirs()
      val reliable = Clusters.connectedComponents(pairs, localThreshold = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(reliable == base)
      // the run really went through RELIABLE storage: new
      // ReliableCheckpointRDD dirs appeared (the chain reclaims
      // superseded generations, but the final one and the one-shot
      // longPairs checkpoint remain); localCheckpoint writes nothing
      assert((activeRddDirs() -- before).nonEmpty,
        "no reliable checkpoint files written — mode never engaged")
    } finally spark.conf.unset("spark.graft.checkpointDir")
  }

  test("rep-graph CC equals member-level CC on the corpus") {
    // the optimized q33 (CC over collapsed representatives, members
    // attached after) must give exactly the clusters of CC over the full
    // expanded pair graph
    val viaReps = Clusters.q33DedupClusters(spark, SparkTestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaMembers = Clusters.connectedComponents(
        MinHashLSH.nearDups(spark, SparkTestSession.sfDir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaReps == viaMembers,
      s"reps=${viaReps.size} members=${viaMembers.size}")
    assert(viaReps.nonEmpty)
  }

  test("rep-graph CC handles duplicate groups with and without cross edges") {
    import spark.implicits._
    // planted corpus: a 5-copy duplicate group with NO near-dup neighbors
    // (its own cluster, labeled by its min id), a 3-copy group near-dup to
    // a distinct single doc (one merged cluster), and an unrelated doc
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val lone = "one two three four five six seven eight nine ten eleven twelve"
    val docs = (
      (0 until 5).map(i => (100L + i, lone)) ++          // isolated dup group
      (0 until 3).map(i => (200L + i, base)) ++          // dup group with a neighbor
      Seq((300L, base + " extra"),                       // near-dup of the group
          (400L, "completely different unrelated content with many plain words here okay"))
    ).toDF("doc_id", "text")
    val sigs = MinHashLSH.docSignatures(spark, docs)
      .toDF("doc_id", "txt_md5", "sh", "bands").localCheckpoint(true)
    val pairs = MinHashLSH.pairsFromSigs(sigs, 0.8).localCheckpoint(true)
    val expected = Map(100L -> 100L, 101L -> 100L, 102L -> 100L,
      103L -> 100L, 104L -> 100L,
      200L -> 200L, 201L -> 200L, 202L -> 200L, 300L -> 200L)
    // expected: {100..104} -> 100 (isolated dup group, no cross edges —
    // exercises the coalesce(comp, rep) branch), {200..202, 300} -> 200
    // (dup group merged with a near-dup neighbor); 400 absent
    val viaReps = Clusters.repClusters(sigs, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaReps == expected, s"q33 rep path: $viaReps")
    val member = Clusters.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(member == expected, s"member-level CC: $member")
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
