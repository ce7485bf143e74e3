package graft.plans

import java.nio.file.Files

import scala.collection.mutable

import graft.SparkTestSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Key-skew robustness (round-15 fixture): the 10×-duplication soak
  * proves DUPLICATE-skew is bounded (exact-dup collapse); this spec
  * proves KEY-skew — one hot key owning half the corpus — does not
  * concentrate a shuffle into one task:
  *
  *  - banded near-dup generator: one label owns 50% of embeddings. The
  *    join key is (label, band, bucket), so the hot label subdivides
  *    across 2^subBits sign-bit buckets per band — a label-only blocking
  *    would put half the corpus in one task.
  *  - connected components: a hub node on half the graph's edges. Every
  *    per-iteration aggregate is min(), which partial-combines map-side,
  *    so the hub receives ≤ one record per map partition.
  *  - history fact build: one user owns 50% of events. The per-user
  *    series aggregate (collect_list) partial-combines too, so the
  *    reduce side sees ≤ one (pre-combined) record per user per map
  *    split. (Bytes for the hot user's series are irreducibly ~50% — an
  *    ordered per-user series must see all the user's values — but they
  *    arrive as few large pre-combined records, not a record flood.)
  *
  * Measurement: a task listener collects per-task shuffle-read RECORD
  * counts; for every stage with ≥4 record-bearing tasks and ≥1000 total
  * records, max ≤ max(4 × median, 256). AQE partition coalescing is
  * disabled inside the harness (it would legitimately merge these small
  * test shuffles into one task and hide the distribution being tested);
  * production keeps it on, plus the skew-join splitter
  * (GraftSession.configure sets spark.sql.adaptive.skewJoin.enabled).
  */
class SkewRobustnessSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Runs `body` with 32 shuffle partitions and AQE coalescing off,
    * returning (stageId, per-task shuffle-read records) for each stage. */
  private def shuffleProfile(body: => Unit): Seq[(Int, Seq[Long])] = {
    val rows = mutable.ArrayBuffer.empty[(Int, Long)]
    val l = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) rows.synchronized {
          rows += ((t.stageId, m.shuffleReadMetrics.recordsRead))
        }
      }
    }
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevCoalesce =
      spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.sparkContext.addSparkListener(l)
    try body
    finally {
      // deterministic drain — a fixed sleep can drop late TaskEnd events
      org.apache.spark.GraftTestBridge.drainListenerBus(spark.sparkContext)
      spark.sparkContext.removeSparkListener(l)
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
    rows.synchronized {
      rows.groupBy(_._1).toSeq.map { case (sid, ts) => (sid, ts.map(_._2).toSeq) }
    }
  }

  private def assertBounded(stages: Seq[(Int, Seq[Long])], what: String): Unit = {
    val heavy = stages.filter { case (_, recs) =>
      recs.count(_ > 0) >= 4 && recs.sum >= 1000L }
    assert(heavy.nonEmpty,
      s"$what produced no measurable shuffle stage — the fixture is too small")
    heavy.foreach { case (sid, recs) =>
      val nz = recs.filter(_ > 0).sorted
      val med = nz(nz.length / 2)
      val mx = nz.last
      assert(mx <= math.max(4L * med, 256L),
        s"$what stage $sid is key-skewed: max task read $mx records vs " +
          s"median $med over ${nz.length} record-bearing tasks")
    }
  }

  test("negative control: the harness DOES flag a label-only (unbanded) join") {
    import spark.implicits._
    // the retired r12 blocking shape — group by label alone; the hot
    // label concentrates in one hash partition. If this does NOT trip
    // the 4×-median bar, the listener harness is measuring nothing and
    // every green test in this suite is vacuous.
    val rnd = new scala.util.Random(7)
    val n = 20000
    val df = (0 until n).map { i =>
      (i.toLong, if (i % 2 == 0) 7 else 8 + (i % 40), rnd.nextInt())
    }.toDF("id", "label", "payload").repartition(8)
    val prof = shuffleProfile {
      // a WINDOW partitioned by label has no map-side combine: every row
      // travels to its label's task, so the hot label's task reads half
      // the corpus (an aggregate would partial-combine and hide it; and a
      // rank filter would let Spark's WindowGroupLimit pre-prune the
      // shuffle map-side — measured: 20k rows shrink to 168 — so the
      // control writes EVERY ranked row)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("label").orderBy("id")
      df.withColumn("rn", row_number().over(w))
        .write.format("noop").mode("overwrite").save()
    }
    val skewed = prof.exists { case (_, recs) =>
      val nz = recs.filter(_ > 0).sorted
      nz.length >= 4 && nz.sum >= 1000L &&
        nz.last > math.max(4L * nz(nz.length / 2), 256L)
    }
    assert(skewed, "harness failed to flag a deliberately label-skewed shuffle — " +
      "the positive tests in this suite would be vacuous")
  }

  test("banded near-dup generator stays bounded with one label owning 50%") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_skew_emb").toString
    val rnd = new scala.util.Random(15)
    val n = 20000
    // half the corpus under label 7, the rest spread over 40 labels;
    // vectors are diverse, so sign-bit buckets subdivide the hot label
    val rows = (0 until n).map { i =>
      val label = if (i % 2 == 0) 7 else 8 + (i % 40)
      (i.toLong, Seq.fill(64)(rnd.nextGaussian().toFloat), label)
    }
    rows.toDF("vec_id", "embedding", "label")
      .repartition(8).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    var out = 0L
    val prof = shuffleProfile {
      out = graft.operators.VectorOps.qe2NearDupPairs(spark, dir).count()
    }
    assert(out >= 0) // the count is the action; pairs may legitimately be few
    assertBounded(prof, "banded generator")
  }

  test("connected components stay bounded with a hub on 50% of edges") {
    import spark.implicits._
    val n = 20000
    // hub 0 touches n/2 spokes; the other n/2 edges form disjoint chains
    val pairs = ((1 to n / 2).map(i => (0L, i.toLong)) ++
      (n / 2 + 1 until n).map(i => (i.toLong, i.toLong + 100000L)))
      .toDF("doc_a", "doc_b").repartition(8)
    var comps = 0L
    val prof = shuffleProfile {
      // localThreshold = 0 forces the DISTRIBUTED path (the ≤1M-edge
      // local fast path would hide the shuffle being measured)
      comps = graft.dedup.Clusters
        .connectedComponents(pairs, localThreshold = 0L)
        .agg(countDistinct("cluster_rep")).as[Long].head()
    }
    assert(comps == 1L + (n - n / 2 - 1), "hub component + one per chain pair")
    assertBounded(prof, "connected components")
  }

  /** Save/set/restore session confs around `body` (unset restores the
    * built-in default). */
  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("byte-skew: AQE splits a long-payload hot key's join partition (skew= in plan)") {
    import spark.implicits._
    // BYTE skew, not record skew: every key gets exactly 200 rows, so the
    // record-count harness above is blind to this fixture by construction
    // — but key 7 carries ~8 KiB of incompressible payload per row vs
    // 16 B elsewhere, so ~70% of the join's shuffle BYTES land in one
    // hash partition. This is the case PLAN_AUDIT's header previously
    // claimed only as config ("skewJoin.enabled=true"): here the splitter
    // must actually fire — `skew=true` in the executed plan — and the
    // physical byte distribution must come out bounded.
    val rnd = new scala.util.Random(16)
    def blob(len: Int): String = {
      val a = new Array[Char](len)
      var i = 0
      while (i < len) { a(i) = ('a' + rnd.nextInt(26)).toChar; i += 1 }
      new String(a)
    }
    val nKeys = 200
    val left = (0 until nKeys).flatMap { k =>
      (0 until 200).map(i => (k, i.toLong, blob(if (k == 7) 8192 else 16)))
    }.toDF("key", "seq", "payload").repartition(8)
    val right = (0 until nKeys).map(k => (k, s"dim$k")).toDF("key", "name")

    val bytesByStage = mutable.ArrayBuffer.empty[(Int, Long)]
    val l = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) bytesByStage.synchronized {
          bytesByStage += ((t.stageId, m.shuffleReadMetrics.totalBytesRead))
        }
      }
    }
    var plan = ""
    withConfs(
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // production defaults (factor 5, threshold 256 MB, advisory 64 MB)
      // assume production-sized partitions; scaled down in the SAME
      // ratios so a ~1.6 MiB hot partition is to this fixture what a
      // multi-GiB one is to a real corpus
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "131072",
      // coalescing would merge the many tiny cold partitions of this
      // deliberately small fixture into one task and drown the signal
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // broadcast (planning-time AND AQE runtime demotion) would bypass
      // the shuffled join under test — the tiny dim side must SMJ
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      spark.sparkContext.addSparkListener(l)
      try {
        val joined = left.join(right, "key")
          .select(col("key"), col("seq"), length(col("payload")).as("plen"),
            col("name"))
        // collect() executes THIS queryExecution (foreach would detour
        // through a separate deserializing QE and leave this plan
        // un-finalized); the payload is projected away above, so the
        // driver receives 40k skinny rows, not the blobs
        assert(joined.collect().length == nKeys * 200)
        plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("isFinalPlan=true"), s"AQE did not finalize:\n$plan")
      } finally {
        org.apache.spark.GraftTestBridge.drainListenerBus(spark.sparkContext)
        spark.sparkContext.removeSparkListener(l)
      }
    }
    assert(plan.contains("skew=true"),
      s"AQE skew-join splitter did not fire — executed plan:\n$plan")
    // and the split is physical, not just cosmetic: in every byte-heavy
    // shuffle-read stage, no single task read the hot key's whole ~70%
    // byte share (unsplit, the hot task reads ~1.6 MiB of ~2.3 MiB total)
    val stages = bytesByStage.synchronized {
      bytesByStage.groupBy(_._1).map { case (sid, ts) => (sid, ts.map(_._2)) }
    }
    val heavy = stages.filter { case (_, bs) =>
      bs.count(_ > 0) >= 4 && bs.sum >= (1L << 20) }
    assert(heavy.nonEmpty, "fixture produced no byte-heavy shuffle stage")
    heavy.foreach { case (sid, bs) =>
      val mx = bs.max.toDouble
      val tot = bs.sum.toDouble
      assert(mx / tot <= 0.6,
        s"stage $sid byte-skewed after AQE: max task read ${bs.max} of " +
          s"${bs.sum} bytes (${math.round(100 * mx / tot)}%)")
    }
  }

  test("history fact build stays bounded with one user owning 50% of events") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_skew_ev").toString
    val n = 100000
    val base = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    val rows = (0 until n).map { i =>
      val user = if (i % 2 == 0) 7777L else (i % 2000).toLong
      val ts = new java.sql.Timestamp(base.getTime + i.toLong * 30000L)
      val et = if (i % 3 == 0) "view" else if (i % 3 == 1) "click" else "like"
      (i.toLong, ts, user, et, (i % 97).toDouble / 7.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(16).write.mode("overwrite").parquet(s"$dir/events.parquet")
    var users = 0L
    val prof = shuffleProfile {
      users = graft.analytics.History.q35HistoryFact(spark, dir).count()
    }
    // odd i → 1000 distinct odd residues mod 2000, plus the hot user
    assert(users == 1001L, "one row per user incl. the hot one")
    assertBounded(prof, "history fact build")
  }
}
