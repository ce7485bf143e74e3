package graft.plans

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleTechniquesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = SparkTestSession.sfDir

  test("bucketed tables join without a shuffle") {
    import spark.implicits._
    val orders = Tables(spark, dir, "orders")
    val customer = Tables(spark, dir, "customer")
    ScaleTechniques.writeBucketed(orders, "b_orders", "o_custkey", 8)
    ScaleTechniques.writeBucketed(
      customer.withColumnRenamed("c_custkey", "o_custkey"), "b_customer", "o_custkey", 8)
    // hint the INPUT relation (a hint on the join output is a no-op) so
    // the join is a SortMergeJoin and co-located buckets are what save us
    val merged = spark.table("b_orders")
      .join(spark.table("b_customer").hint("merge"), "o_custkey")
    merged.write.format("noop").mode("overwrite").save()
    assert(merged.queryExecution.executedPlan.toString.contains("SortMergeJoin"),
      s"expected SortMergeJoin:\n${merged.queryExecution.executedPlan}")
    assert(ScaleTechniques.countExchanges(merged) == 0,
      s"expected shuffle-free bucketed join:\n${merged.queryExecution.executedPlan}")
    // the same merge join over un-bucketed inputs needs two shuffles
    val unbucketed = orders.join(
      customer.withColumnRenamed("c_custkey", "o_custkey").hint("merge"), "o_custkey")
    unbucketed.write.format("noop").mode("overwrite").save()
    assert(ScaleTechniques.countExchanges(unbucketed) == 2,
      s"expected 2 shuffles unbucketed:\n${unbucketed.queryExecution.executedPlan}")
    // and the result matches the plain join
    val plain = orders.join(
      customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey").count()
    assert(merged.count() == plain)
  }

  test("salted join equals plain join under a hot key") {
    import spark.implicits._
    // skew: 90% of the big side hits key 1
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i % 5 + 2L else 1L, i.toLong))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"), (5L, "d"), (6L, "e"))
      .toDF("k", "v")
    val salted = ScaleTechniques.saltedJoin(big, small, "k", salt = 8)
      .select("k", "payload", "v")
    val plain = big.join(small, Seq("k")).select("k", "payload", "v")
    assert(salted.collect().toSet == plain.collect().toSet)
    assert(salted.count() == plain.count())
  }

  test("AQE splits a skewed join partition at runtime") {
    // isolated session: skew thresholds lowered so local data triggers it
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    import s.implicits._
    // 200k rows, 95% on one key; small side has all keys
    val big = s.range(0, 200000)
      .selectExpr("IF(id % 20 = 0, id % 5 + 2, 1L) AS k", "id AS payload",
        "repeat('x', 64) AS pad")
    val small = (1L to 7L).map(k => (k, s"v$k")).toDF("k", "v")
    val joined = big.join(small.hint("merge"), "k")
    // execute THIS queryExecution (a write/count would plan a fresh one
    // and leave joined's adaptive plan unfinalized)
    val rows = joined.collect().length
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew="), s"no skew marker in plan:\n${plan.take(2000)}")
    assert(rows == 200000)
  }

  test("compaction collapses small files and preserves data") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val path = s"$tmp/events"
    // write deliberately fragmented: one file per partition
    Tables(spark, dir, "events").repartition(24)
      .write.mode("overwrite").parquet(path)
    val beforeRows = spark.read.parquet(path).count()
    val (nBefore, nAfter) = ScaleTechniques.compactParquet(spark, path, targetMB = 128)
    assert(nBefore == 24)
    assert(nAfter < nBefore, s"no compaction: $nBefore -> $nAfter")
    assert(spark.read.parquet(path).count() == beforeRows)
  }

  test("date-partitioned lake prunes partitions under a date filter") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_lake").toString
    ScaleTechniques.writeDatePartitioned(
      Tables(spark, dir, "events"), s"$tmp/events", "ts")
    val pruned = spark.read.parquet(s"$tmp/events")
      .filter(col("__date") === "2024-01-05")
    pruned.write.format("noop").mode("overwrite").save()
    val scan = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(scan.metadata("PartitionFilters").contains("__date"),
      s"no partition filter pushed: ${scan.metadata}")
    // the scan reads strictly fewer partition directories than exist
    val allDays = spark.read.parquet(s"$tmp/events")
      .select("__date").distinct().count()
    assert(allDays > 1)
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 of $allDays partitions selected, got ${scan.selectedPartitions.partitionCount}")
    assert(pruned.count() ==
      Tables(spark, dir, "events")
        .filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-05").count())
  }

  test("sortedOutput single-partitions small results and range-sorts large ones") {
    import spark.implicits._
    val small = ScaleTechniques.sortedOutput(
      (1 to 50).map(i => (50 - i, s"v$i")).toDF("k", "v"), Seq("k"))
    assert(small.rdd.getNumPartitions == 1)
    assert(small.collect().map(_.getInt(0)).toSeq == (0 until 50).toSeq)
    val big = ScaleTechniques.sortedOutput(
      (1 to 500).map(i => (500 - i, i)).toDF("k", "v"), Seq("k"), smallThreshold = 100)
    // over-threshold results take the distributed range-sort path (AQE may
    // still coalesce tiny test data, so assert the partitioning strategy,
    // not the post-AQE partition count)
    big.collect()
    assert(big.queryExecution.executedPlan.toString
        .toLowerCase.contains("rangepartitioning"),
      s"large result must range-sort, not funnel:\n${big.queryExecution.executedPlan}")
    assert(big.collect().map(_.getInt(0)).toSeq == (0 until 500).toSeq)
  }

  test("qd6 candidates ride the prefix-token equi join, not an in-band cross") {
    // r5: candidate generation is the AllPairs prefix filter — some equi
    // join in the executed plan must key on the prefix TOKEN together
    // with the (lang, source) band columns; an all-pairs-within-band
    // cross product (the r4 shape, quadratic in band occupancy) has no
    // tok-keyed join anywhere
    val pairs = graft.operators.TextOps.qd6Pairs(spark, dir)
    // AQE: finalize the adaptive plan, then recurse through query stages
    // (a bare plan.collect misses stage internals)
    pairs.collect()
    def flatten(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val inner = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => flatten(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => flatten(q.plan)
        case _ => p.children.flatMap(flatten)
      }
      p +: inner
    }
    val allKeys = flatten(pairs.queryExecution.executedPlan).collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j.leftKeys
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.leftKeys
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.leftKeys
    }
    assert(allKeys.nonEmpty, s"no equi join found:\n${pairs.queryExecution.executedPlan}")
    val candKeys = allKeys.find(ks =>
      ks.exists(_.toString.toLowerCase.contains("tok")) && ks.length >= 3)
    assert(candKeys.isDefined,
      s"no (tok, lang, source) prefix-join keys found, got: $allKeys")
  }

  test("releaseLocalCheckpoints frees checkpoint blocks, not DataFrame persists") {
    // the round-6 bench-inflation fix: dead localCheckpoint blocks must
    // be releasable at a query boundary WITHOUT touching persisted memos
    import spark.implicits._
    val ckpt = spark.range(1000).toDF("id").localCheckpoint(true)
    assert(ckpt.count() == 1000)
    val memo = spark.range(500).toDF("id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assert(memo.count() == 500)
    assert(spark.sparkContext.getPersistentRDDs.values.exists(_.isCheckpointed),
      "expected a registered checkpointed RDD before the release")

    val released = ScaleTechniques.releaseLocalCheckpoints(spark)
    assert(released >= 1, s"released=$released")
    assert(!spark.sparkContext.getPersistentRDDs.values.exists(_.isCheckpointed),
      "checkpoint blocks must be gone after the release")
    // the persisted memo is untouched and still readable
    assert(memo.count() == 500)
    memo.unpersist(blocking = true)
  }

  test("CheckpointChain reclaims superseded reliable generations; " +
       "final generation survives total block loss (kill proxy)") {
    import org.apache.hadoop.fs.Path
    val sc = spark.sparkContext
    // the context may already have a pinned checkpoint dir from an earlier
    // suite (Spark pins base/<uuid> per context); reuse it via the conf,
    // else pin a fresh temp dir
    val base = sc.getCheckpointDir
      .map(d => new Path(d).getParent.toUri.getPath)
      .getOrElse(java.nio.file.Files.createTempDirectory("graft_chain").toString)
    spark.conf.set("spark.graft.checkpointDir", base)
    if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(base)
    try {
      val active = new Path(sc.getCheckpointDir.get)
      val fs = active.getFileSystem(sc.hadoopConfiguration)
      def rddDirs(): Set[String] =
        if (!fs.exists(active)) Set.empty[String]
        else fs.listStatus(active).toSeq.map(_.getPath.getName)
          .filter(_.startsWith("rdd-")).toSet
      val baseline = rddDirs() // pre-existing one-shots from other suites
      val chain = new ScaleTechniques.CheckpointChain
      var df = spark.range(0, 1000).toDF("id")
      val liveAfterEach = (1 to 5).map { _ =>
        df = chain.next(df.withColumn("id", col("id") + 1))
        (rddDirs() -- baseline).size
      }
      // after every next() exactly ONE of this chain's generations remains
      // on disk (the superseded one was deleted as soon as its successor
      // materialized) — without the chain this would read 1,2,3,4,5
      assert(liveAfterEach.forall(_ == 1),
        s"superseded generations accumulated: $liveAfterEach")
      // kill proxy: reliable checkpoints must carry the computation even
      // when every storage block this frame ever held is gone (on a real
      // cluster: executor loss mid-iteration). localCheckpoint dies here —
      // that asymmetry is the whole reason the reliable mode exists.
      df.queryExecution.analyzed.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }.foreach(_.unpersist(blocking = true))
      val expected = (0L until 1000L).map(_ + 5L).sum
      assert(df.agg(sum("id")).head.getLong(0) == expected,
        "final generation unreadable after block loss — not reliable storage")
    } finally spark.conf.unset("spark.graft.checkpointDir")
  }

  test("checkpoint-dir match compares qualified Paths, not strings") {
    // benign spellings of the same base (trailing slash, explicit
    // file: scheme) must NOT trip the pinned-dir warning (ADVICE r12);
    // a genuinely different base must
    import org.apache.hadoop.fs.Path
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val active = new Path("file:/tmp/graft_ckpt_base/6f1a-uuid")
    assert(ScaleTechniques.checkpointDirMatches(active, "/tmp/graft_ckpt_base", fs))
    assert(ScaleTechniques.checkpointDirMatches(active, "/tmp/graft_ckpt_base/", fs))
    assert(ScaleTechniques.checkpointDirMatches(active, "file:/tmp/graft_ckpt_base", fs))
    assert(!ScaleTechniques.checkpointDirMatches(active, "/tmp/other_base", fs))
    // a rootless active dir (no parent) never matches silently
    assert(!ScaleTechniques.checkpointDirMatches(new Path("file:/"), "/tmp", fs))
  }
}
