package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct semantics checks for the round-2 curation operators (each also
  * carries a full DuckDB oracle in SparkEntry). */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = SparkTestSession.sfDir

  test("unicode cleaning strips controls, collapses runs, composes NFC") {
    val got = TextOps.qd41UnicodeClean(spark, dir).collect()
    assert(got.nonEmpty)
    val composed = "é"
    got.foreach { r =>
      val id = r.getLong(0); val clean = r.getString(2)
      // every control/format char stripped, every run collapsed, trimmed
      assert(!clean.exists(c => Character.isISOControl(c)), s"doc $id")
      assert(!clean.contains("  "), s"doc $id has a residual run")
      assert(clean == clean.trim, s"doc $id not trimmed")
      // the decomposed marker composed to one pre-composed char
      assert(clean.startsWith(composed + " "), s"doc $id marker")
      assert(!clean.contains("́"), s"doc $id combining mark survived")
      // parity tail: even ids keep the pre-composed tail char
      assert(clean.endsWith(composed) == (id % 2 == 0), s"doc $id tail")
      // derived-corpus arithmetic: the decoration always nets 5 chars
      // (1 composed-away + BEL + tab-run collapse on odd; the even tail
      // adds one kept char and one stripped BEL — same net)
      assert(r.getLong(4) == 5L, s"doc $id stripped ${r.getLong(4)}")
    }
  }

  test("chunking covers every token with the configured overlap") {
    val chunks = TextOps.qd11Chunking(spark, dir).collect()
    val tokCounts = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet == tokCounts.keySet, "every doc must produce chunks")
    byDoc.foreach { case (doc, cs) =>
      val n = tokCounts(doc)
      val expected = (n + 47) / 48
      assert(cs.length == expected, s"doc $doc: ${cs.length} chunks for $n tokens")
      // interior chunks are full-size; coverage: starts advance by stride
      val sorted = cs.sortBy(_.getLong(1))
      sorted.dropRight(1).zipWithIndex.foreach { case (c, i) =>
        val start = i * 48
        assert(c.getLong(2) == math.min(64, n - start),
          s"doc $doc chunk $i wrong size")
      }
    }
  }

  test("repetition signals match a directly computed document") {
    val text = graft.Tables(spark, dir, "documents")
      .filter(col("doc_id") === 0).select("text").head().getString(0)
    val toks = text.trim.split("\\s+")
    val expDup = BigDecimal(1.0 - toks.distinct.length.toDouble / toks.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expTop = toks.sliding(2).map(_.mkString(" ")).toSeq
      .groupBy(identity).values.map(_.size).max
    val row = TextOps.qd12Repetition(spark, dir)
      .filter(col("doc_id") === 0).head()
    assert(row.getLong(row.fieldIndex("n_tokens")) == toks.length.toLong)
    assert(row.getDouble(row.fieldIndex("dup_token_ratio")) == expDup)
    assert(row.getLong(row.fieldIndex("top_bigram_n")) == expTop.toLong)
  }

  test("pii redaction counts follow the planted schedule and clean the text") {
    val rows = TextOps.qd13PiiRedaction(spark, dir).collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(r.fieldIndex("n_emails")) == (if (id % 3 == 0) 1L else 0L))
      assert(r.getLong(r.fieldIndex("n_phones")) == (if (id % 2 == 0) 1L else 0L))
    }
  }

  test("stratified sample keeps ~1/k of every stratum deterministically") {
    val sample = TextOps.qd15StratifiedSample(spark, dir, k = 5)
    val byLang = sample.collect().groupBy(_.getString(1)).view.mapValues(_.length)
    val corpus = graft.Tables(spark, dir, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    corpus.foreach { case (lang, n) =>
      val expected = (n + 4) / 5 // ceil(n/5): ranks 1, 6, 11, ...
      assert(byLang(lang).toLong == expected,
        s"$lang: ${byLang(lang)} sampled of $n")
    }
    val again = TextOps.qd15StratifiedSample(spark, dir, k = 5).collect().toSeq
    assert(again == TextOps.qd15StratifiedSample(spark, dir, k = 5).collect().toSeq)
  }

  test("domain mixture fills exact per-source quotas") {
    val mix = TextOps.qd16DomainMixture(spark, dir).collect()
    val bySource = mix.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bySource == Map("src0" -> 20, "src1" -> 13, "src2" -> 10,
      "src3" -> 5, "src4" -> 3))
    assert(mix.forall(r => r.getLong(3) <= 20))
  }

  test("contamination screen flags the benchmark docs themselves fully") {
    val rows = TextOps.qd14Contamination(spark, dir).collect()
    rows.filter(_.getLong(0) < 5).foreach { r =>
      assert(r.getLong(r.fieldIndex("n_contaminated")) ==
        r.getLong(r.fieldIndex("n_shingles")), "benchmark doc must self-hit fully")
      assert(r.getBoolean(r.fieldIndex("flagged")))
    }
    assert(rows.length == graft.Tables(spark, dir, "documents").count())
  }

  test("sequence packing lays out a gapless, budget-aligned corpus") {
    val budget = 512L
    val rows = graft.operators.TextOps.qd20SequencePack(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // contiguous concat: each doc starts exactly where the previous ended
    rows.sliding(2).foreach {
      case Array((_, cnt, off, _, _, _), (_, _, off2, _, _, _)) =>
        assert(off + cnt == off2, s"gap between offsets $off+$cnt and $off2")
      case _ =>
    }
    rows.foreach { case (id, cnt, off, startChunk, startSlot, nChunks) =>
      assert(startChunk == off / budget && startSlot == off % budget, s"doc $id")
      // spans exactly the chunks its token range touches
      assert(nChunks == (off + cnt - 1) / budget - off / budget + 1, s"doc $id")
      assert(cnt >= 1)
    }
  }

  test("bigram logprob matches a directly computed reference") {
    val docs = graft.Tables(spark, dir, "documents")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def toks(s: String) = s.trim.split("\\s+").toSeq
    val uni = docs.flatMap(d => toks(d._2)).groupBy(identity).view.mapValues(_.size)
    val v = uni.size.toDouble
    val bgs = docs.flatMap { case (id, t) =>
      val ts = toks(t)
      ts.zip(ts.drop(1)).map { case (a, b) => (id, a, s"$a $b") }
    }
    val bc = bgs.map(_._3).groupBy(identity).view.mapValues(_.size)
    val want = bgs.groupBy(_._1).map { case (id, rows) =>
      val lps = rows.map { case (_, a, bg) =>
        -math.log((bc(bg) + 1).toDouble / (uni(a) + v))
      }
      // same 6dp rounding as the operator; compare at 5dp to stay clear
      // of summation-order ULPs in this reference (the SQL oracle is the
      // exact-parity check)
      (id, rows.size.toLong,
        math.round(lps.sum / lps.size * 100000.0) / 100000.0)
    }
    val got = graft.operators.TextOps.qd21BigramLogprob(spark, dir)
      .collect().map(r => (r.getLong(0),
        (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 100000.0) / 100000.0))).toMap
    assert(got.size == want.size)
    want.foreach { case w @ (id, _, _) =>
      assert(math.abs(got(id)._3 - w._3) <= 2e-5, s"doc $id: ${got(id)} vs $w")
      assert(got(id)._2 == w._2, s"doc $id bigram count")
    }
    // fluency sanity: a score exists for every multi-token doc
    assert(want.nonEmpty)
  }

  test("kneser-ney bigram score matches a directly computed reference") {
    val docs = graft.Tables(spark, dir, "documents")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def toks(s: String) = s.trim.split("\\s+").toSeq
    val bgs = docs.flatMap { case (id, t) =>
      val ts = toks(t)
      ts.zip(ts.drop(1)).map { case (a, b) => (id, a, b) }
    }
    val typeC = bgs.map(r => (r._2, r._3)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val cu = typeC.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nfw = typeC.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nbw = typeC.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val t = typeC.size.toDouble
    val want = bgs.groupBy(_._1).map { case (id, rows) =>
      val lps = rows.map { case (_, u, w) =>
        val p = math.max(typeC((u, w)) - 0.75, 0.0) / cu(u) +
          0.75 * nfw(u) / cu(u) * (nbw(w) / t)
        -math.log(p)
      }
      (id, rows.size.toLong, lps.sum / lps.size)
    }
    val got = graft.operators.TextOps.qd42KneserNey(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.size == want.size)
    want.foreach { case (id, n, score) =>
      assert(got(id)._1 == n, s"doc $id bigram count")
      assert(math.abs(got(id)._2 - score) <= 2e-5, s"doc $id: ${got(id)} vs $score")
    }
    // the discount actually bites: every probability < its add-one-free
    // MLE sibling, so scores are strictly positive and finite
    assert(want.forall { case (_, _, s) => s > 0.0 && !s.isNaN })
  }

  test("trigram interpolated logprob matches a directly computed reference") {
    val docs = graft.Tables(spark, dir, "documents")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def toks(s: String) = s.trim.split("\\s+").toSeq
    val uni = docs.flatMap(d => toks(d._2)).groupBy(identity).view.mapValues(_.size)
    val v = uni.size.toDouble
    val n = uni.values.sum.toDouble
    val bc = docs.flatMap { case (_, t) =>
      val ts = toks(t); ts.zip(ts.drop(1)).map { case (a, b) => s"$a $b" }
    }.groupBy(identity).view.mapValues(_.size)
    val tgs = docs.flatMap { case (id, t) =>
      val ts = toks(t)
      if (ts.length < 3) Nil
      else (0 until ts.length - 2).map { i =>
        (id, s"${ts(i)} ${ts(i + 1)}", s"${ts(i + 1)} ${ts(i + 2)}",
          s"${ts(i)} ${ts(i + 1)} ${ts(i + 2)}", ts(i + 1), ts(i + 2))
      }
    }
    val tc = tgs.map(_._4).groupBy(identity).view.mapValues(_.size)
    val want = tgs.groupBy(_._1).map { case (id, rows) =>
      val lps = rows.map { case (_, ab, bcs, tg, b, c) =>
        -math.log(0.6 * (tc(tg) + 1).toDouble / (bc(ab) + v)
          + 0.3 * (bc(bcs) + 1).toDouble / (uni(b) + v)
          + 0.1 * (uni(c) + 1).toDouble / (n + v))
      }
      (id, rows.size.toLong,
        math.round(lps.sum / lps.size * 100000.0) / 100000.0)
    }
    val got = graft.operators.TextOps.qd37TrigramLogprob(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), math.round(r.getDouble(2) * 100000.0) / 100000.0))).toMap
    assert(got.size == want.size)
    want.foreach { case (id, cnt, score) =>
      assert(got(id)._1 == cnt, s"doc $id trigram count")
      assert(math.abs(got(id)._2 - score) <= 2e-5, s"doc $id: ${got(id)} vs $score")
    }
    // the deeper context must discriminate: scores vary across docs
    assert(want.map(_._3).toSeq.distinct.size > 1)
  }

  test("CDC chunks reassemble each document and survive an offset shift") {
    import spark.implicits._
    // the CDC property fixed-size chunking lacks: a shared 400-char
    // passage at DIFFERENT offsets must still produce identical chunks
    val rnd = new scala.util.Random(5)
    def blob(n: Int) = (0 until n).map(_ =>
      ('a' + rnd.nextInt(26)).toChar).mkString
    val passage = blob(400)
    val a = blob(120) + passage + blob(90)
    val b = blob(57) + passage + blob(33) // different prefix length → shifted
    val tmp = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("spec").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val dups = graft.operators.TextOps.qd22CdcChunkDedup(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // at mask 1/64 a 400-char passage has ~6 expected cuts; interior
    // chunks between the first and last shared cut are offset-invariant
    assert(dups.exists(_._3 == 2L),
      s"no cross-document duplicate chunk found: ${dups.toSeq}")

    // the kernel's ROLLING gear state must equal the oracle's 16-term
    // window-sum form of the same predicate (terms shifted >= 16 places
    // vanish mod 2^16 — the equivalence the DuckDB oracle relies on) on
    // the REAL corpus too, not just the planted docs
    val kernelReal = graft.operators.TextOps.cdcChunks(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val refReal = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .flatMap(r => windowSumChunks(r.getLong(0), r.getString(1))).toSet
    assert(kernelReal == refReal)

    // reassembly: chunks of each doc concatenate back to the document
    val chunks = Seq((1L, a), (2L, b)).flatMap {
      case (id, t) => windowSumChunks(id, t) }
    val reassembled = chunks.groupBy(_._1).view.mapValues(
      _.sortBy(_._2).map(_._3).mkString)
    assert(reassembled(1L) == a && reassembled(2L) == b)
    // and the operator's chunks over the planted lake equal the reference
    val kernelPlanted = graft.operators.TextOps.cdcChunks(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(kernelPlanted == chunks.toSet)
  }

  /** Independent reference for the gear-CDC boundary predicate: the
    * oracle's per-position 16-term window sum (no rolling state) — a cut
    * after 1-based position i iff Σⱼ gear[cp(i−j)]·2ʲ mod 2¹⁶ < 1024. */
  private def windowSumChunks(id: Long, text: String): Seq[(Long, Long, String)] = {
    val cp = text.codePoints().toArray
    val n = cp.length
    val cuts = scala.collection.mutable.ArrayBuffer[Int](0)
    for (i <- 16 until n) { // 1-based cut positions 16..n-1
      val h = (0 until 16).map(j =>
        graft.operators.TextOps.cdcGear(cp(i - 1 - j) & 255) << j).sum & 0xffffL
      if (h < 1024L) cuts += i
    }
    cuts += n
    (0 until cuts.length - 1).map { j =>
      (id, j.toLong, new String(cp, cuts(j), cuts(j + 1) - cuts(j)))
    }.toSeq
  }

  test("duplicated spans equal an independent shingle-count + merge recompute") {
    val k = 8
    val docsArr = graft.Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+"))
    // corpus-wide window occurrence counts
    val occ = scala.collection.mutable.HashMap.empty[String, Int]
    for ((_, t) <- docsArr; i <- 0 to t.length - k)
      occ.updateWith(t.slice(i, i + k).mkString(" "))(c => Some(c.getOrElse(0) + 1))
    // per-doc marked positions (1-based), merged into maximal spans
    val expected = docsArr.flatMap { case (id, t) =>
      val marks = (0 to t.length - k)
        .filter(i => occ(t.slice(i, i + k).mkString(" ")) >= 2).map(_ + 1)
      if (marks.isEmpty) Nil
      else {
        val res = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, String)]
        var start = marks.head; var prev = marks.head; var n = 1L
        def flush(): Unit = {
          val len = prev + k - start
          res += ((id, start.toLong, len.toLong, n,
            t.slice(start - 1, start - 1 + len).mkString(" ")))
        }
        for (p <- marks.tail) {
          if (p > prev + k) { flush(); start = p; n = 0L }
          n += 1L; prev = p
        }
        flush()
        res.toSeq
      }
    }.toSet
    val got = TextOps.qd23DupSpans(spark, dir, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSet
    assert(got.nonEmpty, "fixture must contain duplicated spans")
    assert(got == expected)
  }

  test("duplicated spans: planted cross-doc phrase yields one maximal span each") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("qd23").toString
    val phrase = (1 to 10).map(i => s"p$i").mkString(" ") // 10 shared tokens
    val d1 = s"alpha beta $phrase gamma delta epsilon zeta eta theta"
    val d2 = s"one two three four $phrase five six seven eight nine"
    val d3 = "unique tokens only nothing repeats here at all in this text ever once"
    Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextOps.qd23DupSpans(spark, tmp, k = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    // 10 shared tokens → 3 duplicated 8-windows per doc, one merged span
    // of exactly the phrase; doc 3 is span-free
    assert(got.toSeq.sortBy(r => (r._1, r._2)) == Seq(
      (1L, 3L, 10L, 3L, phrase),
      (2L, 5L, 10L, 3L, phrase)))
  }

  test("bloom decontamination equals the exact screen, fp-rate independent") {
    // exact reference computed directly: per-doc distinct 4-windows vs
    // the eval (doc_id < 5) window set
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def windows(t: String): Set[String] = {
      val toks = t.trim.split("\\s+")
      if (toks.length < 4) Set.empty
      else (0 to toks.length - 4).map(i => toks.slice(i, i + 4).mkString(" ")).toSet
    }
    val evalSet = docs.filter(_._1 < 5).flatMap(w => windows(w._2)).toSet
    val expected = docs.filter(_._1 >= 5).map { case (id, t) =>
      val hits = (windows(t) & evalSet).size.toLong
      (id, hits, hits == 0L)
    }.sortBy(_._1).toSeq
    val got = TextOps.qd24BloomDecontam(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == expected)
    assert(expected.exists(!_._3), "fixture must plant real contamination")
    // a saturated-fp filter admits far more candidates but the exact
    // verify join keeps the answer identical
    val sloppy = TextOps.qd24BloomDecontam(spark, dir, fpp = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(sloppy == expected)
  }

  test("hash split matches the md5-lower-64 kernel contract and the 90/5/5 design") {
    val rows = TextOps.qd25HashSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getString(3)))
    // declarative conv/substring path == the JVM kernel contract that
    // DuckDB's md5_number_lower is pinned to (SimHash specs)
    rows.foreach { case (id, bucket, split) =>
      val exp = java.lang.Long.remainderUnsigned(
        graft.dedup.SimHash.md5Lower64String(s"split:$id"), 100L)
      assert(bucket.toLong == exp, s"doc $id bucket")
      assert(split == (if (bucket < 90) "train" else if (bucket < 95) "val" else "test"))
    }
    // near the designed fractions (binomial noise at 500 docs)
    val n = rows.length.toDouble
    val frac = rows.groupBy(_._3).view.mapValues(_.length / n).toMap
    assert(math.abs(frac("train") - 0.90) < 0.04, s"train ${frac("train")}")
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.05) < 0.03)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.05) < 0.03)
    // growth stability: membership is a pure function of the id — the
    // assignment computed over a physically half-size lake is the exact
    // restriction of the full one (a random split would reshuffle)
    val tmp = java.nio.file.Files.createTempDirectory("qd25").toString
    graft.Tables(spark, dir, "documents").filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val halfRows = TextOps.qd25HashSplit(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val full = rows.map(t => t._1 -> t._3).toMap
    assert(halfRows.nonEmpty)
    halfRows.foreach { case (id, s) => assert(full(id) == s, s"doc $id moved") }
  }

  test("bloom prefilter prunes the corpus-side window stream map-side") {
    TextOps.recordCandidates = true
    try {
      val result = TextOps.qd24BloomDecontam(spark, dir)
      val trueHits = result.agg(sum("n_eval_hits")).head().getLong(0)
      result.write.format("noop").mode("overwrite").save()
      val candidates = TextOps.lastCandidateRows.get()
      val corpusWindows = graft.Tables(spark, dir, "documents")
        .filter(col("doc_id") >= 5)
        .select(col("doc_id"), col("text")).collect()
        .map { r =>
          val toks = r.getString(1).trim.split("\\s+")
          if (toks.length < 4) 0L
          else (0 to toks.length - 4).map(i => toks.slice(i, i + 4).mkString(" ")).toSet.size.toLong
        }.sum
      // superset of the true hits (no false negatives), but a small
      // fraction of the stream (fpp 1% + true hits)
      assert(candidates >= trueHits)
      assert(candidates < corpusWindows / 10,
        s"bloom admitted $candidates of $corpusWindows windows")
    } finally { TextOps.recordCandidates = false }
  }

  test("BPE merge candidates match an independent recompute over the vocabulary") {
    val wc = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    graft.Tables(spark, dir, "documents").select("text").collect()
      .foreach(_.getString(0).trim.split("\\s+").foreach(w => wc(w) += 1L))
    val pc = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    wc.foreach { case (w, c) =>
      val syms = w.map(_.toString) :+ "</w>"
      syms.sliding(2).foreach { case Seq(a, b) => pc((a, b)) += c }
    }
    val expected = pc.toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.take(20).zipWithIndex
      .map { case (((a, b), n), i) => (i + 1L, a, b, n) }
    val got = TextOps.qd27BpePairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected)
    // the canonical BPE sanity: end-of-word pairs must rank — a corpus
    // where no (char, </w>) pair makes top-20 means the marker is lost
    assert(got.exists(_._3 == "</w>"))
  }

  test("BPE merge loop: greedy non-overlap and argmax tie-break on a planted vocabulary") {
    import spark.implicits._
    // one word "aaa" x2: iter1 (a,a)=4 beats (a,</w>)=2; the merge must
    // apply greedily left-to-right — [a,a,a,</w>] -> [aa,a,</w>], NOT
    // [aa,aa? or a,aa,</w>]; iter2 ties (aa,a)=2 with (a,</w>)=2 and
    // the (sym_a, sym_b) tie-break must pick (a,</w>); iter3 merges the
    // only remaining pair (aa, a</w>)=2
    val v0 = Seq((Seq("a", "a", "a", "</w>"), 2L)).toDS()
    val expected3 = Seq(
      (1L, "a", "a", 4L),
      (2L, "a", "</w>", 2L),
      (3L, "aa", "a</w>", 2L))
    def runs(gate: Long) = TextOps.bpeMerges(v0, nMerges = 3, driverGate = gate)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // BOTH trainer paths — the size-gated driver kernel (gate above the
    // vocab size) and the distributed per-iteration loop (gate 0) —
    // must walk the identical greedy/tie-break semantics
    assert(runs(gate = 1000000L) == expected3)
    assert(runs(gate = 0L) == expected3)
    // degenerate vocabulary: single-symbol words exhaust the merges
    val tiny = Seq((Seq("x", "</w>"), 5L)).toDS()
    Seq(0L, 1000000L).foreach { gate =>
      val short = TextOps.bpeMerges(tiny, nMerges = 3, driverGate = gate).collect()
      assert(short.length == 1) // (x, </w>) merges once, then nothing remains
    }
  }

  test("BPE merge loop matches an independent recompute over the corpus") {
    val wc = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    graft.Tables(spark, dir, "documents").select("text").collect()
      .foreach(_.getString(0).trim.split("\\s+").foreach(w => wc(w) += 1L))
    var vocab: Seq[(Vector[String], Long)] = wc.toSeq.collect {
      case (w, c) if w.nonEmpty => (w.map(_.toString).toVector :+ "</w>", c)
    }
    val expected = (1 to 32).map { it =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).filter(_.size == 2)
          .foreach { w => pc((w(0), w(1))) += c } }
      val ((a, b), n) = pc.toSeq.minBy { case ((x, y), m) => (-m, x, y) }
      vocab = vocab.map { case (syms, c) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.result(), c)
      }
      (it.toLong, a, b, n)
    }
    val got = TextOps.qd28BpeMerges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("BPE encoding matches an independent train-then-encode recompute") {
    val docs = graft.Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").filter(_.nonEmpty))
    val wc = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    docs.foreach(_._2.foreach(w => wc(w) += 1L))
    var vocab: Map[String, Vector[String]] =
      wc.keys.map(w => w -> (w.map(_.toString).toVector :+ "</w>")).toMap
    (1 to 32).foreach { _ =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (w, syms) =>
        syms.sliding(2).filter(_.size == 2)
          .foreach { p => pc((p(0), p(1))) += wc(w) } }
      val ((a, b), _) = pc.toSeq.minBy { case ((x, y), m) => (-m, x, y) }
      vocab = vocab.map { case (w, syms) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        (w, out.result())
      }
    }
    val expected = docs.filter(_._2.nonEmpty).map { case (id, ws) =>
      val toks = ws.map(w => vocab(w).length.toLong).sum
      (id, ws.length.toLong, toks,
        BigDecimal(toks.toDouble / ws.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1).toSeq
    val got = TextOps.qd29BpeEncode(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
    // merges must actually compress: strictly fewer tokens than chars+1
    // per word somewhere, and never more
    val charsPlus1 = docs.filter(_._2.nonEmpty).map { case (id, ws) =>
      id -> ws.map(_.length.toLong + 1).sum }.toMap
    assert(got.forall { case (id, _, t, _) => t <= charsPlus1(id) })
    assert(got.exists { case (id, _, t, _) => t < charsPlus1(id) })
  }

  test("domain drift report matches an independent JS-divergence recompute") {
    val B = 1024
    def bucket(t: String): Int =
      java.lang.Long.remainderUnsigned(
        graft.dedup.SimHash.md5Lower64String(s"drift:$t"), B.toLong).toInt
    val counts = scala.collection.mutable.Map
      .empty[(String, Int), Long].withDefaultValue(0L)
    graft.Tables(spark, dir, "documents").select("source", "text").collect()
      .foreach { r =>
        r.getString(1).trim.split("\\s+").filter(_.nonEmpty)
          .foreach(t => counts((r.getString(0), bucket(t))) += 1L)
      }
    val sources = counts.keys.map(_._1).toSeq.distinct.sorted
    val allBuckets = counts.keys.map(_._2).toSet
    val bySource = sources.map(s =>
      s -> counts.collect { case ((`s`, b), c) => b -> c }.toMap).toMap
    val nS = bySource.view.mapValues(_.values.sum).toMap
    val byBucket = allBuckets.map(b =>
      b -> sources.map(s => bySource(s).getOrElse(b, 0L)).sum).toMap
    val n = nS.values.sum.toDouble
    val expected = sources.map { s =>
      val ns = nS(s)
      val jsNanos = allBuckets.toSeq.map { b =>
        val c = bySource(s).getOrElse(b, 0L)
        val p = (c + 1).toDouble / (ns + B)
        val q = (byBucket(b) - c + 1).toDouble / (n - ns + B)
        val mid = (p + q) / 2
        val contrib = 0.5 * p * math.log(p / mid) + 0.5 * q * math.log(q / mid)
        BigDecimal(contrib * 1e9)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }.sum
      (s, ns, jsNanos,
        BigDecimal(jsNanos / 1e9).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = TextOps.qd30DomainDrift(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
    // the report must discriminate: sources differ in drift
    assert(got.map(_._3).distinct.size > 1, "constant JS — vacuous report")
    assert(got.forall(_._3 >= 0L), "JS divergence must be non-negative")
  }

  test("windowed drift report matches an independent window-vs-lifetime JS recompute") {
    val B = 1024
    val span = 250L
    def bucket(t: String): Int =
      java.lang.Long.remainderUnsigned(
        graft.dedup.SimHash.md5Lower64String(s"drift:$t"), B.toLong).toInt
    val counts = scala.collection.mutable.Map
      .empty[(String, Long, Int), Long].withDefaultValue(0L)
    graft.Tables(spark, dir, "documents")
      .select("source", "doc_id", "text").collect()
      .foreach { r =>
        val w = r.getLong(1) / span
        r.getString(2).trim.split("\\s+").filter(_.nonEmpty)
          .foreach(t => counts((r.getString(0), w, bucket(t))) += 1L)
      }
    val expected = counts.keys.map(k => (k._1, k._2)).toSeq.distinct.sorted
      .map { case (s, w) =>
        // .toSeq first: collect on a Map would re-materialize a Map and
        // silently drop duplicate bucket keys across windows
        val lifetime = counts.toSeq.collect { case ((`s`, _, b), c) => b -> c }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        val winCounts = counts.toSeq
          .collect { case ((`s`, `w`, b), c) => b -> c }.toMap
        val ns = lifetime.values.sum
        val nsw = winCounts.values.sum
        val jsNanos = lifetime.keys.toSeq.map { b =>
          val c = winCounts.getOrElse(b, 0L)
          val p = (c + 1).toDouble / (nsw + B)
          val q = (lifetime(b) + 1).toDouble / (ns + B)
          val mid = (p + q) / 2
          val contrib = 0.5 * p * math.log(p / mid) + 0.5 * q * math.log(q / mid)
          BigDecimal(contrib * 1e9)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        }.sum
        (s, w, nsw, jsNanos,
          BigDecimal(jsNanos / 1e9).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    val got = TextOps.qd31WindowedDrift(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expected)
    // a window matching its source's lifetime scores near zero; the
    // report must still discriminate across (source, window) pairs
    assert(got.map(_._4).distinct.size > 1, "constant JS — vacuous report")
    assert(got.forall(_._4 >= 0L), "JS divergence must be non-negative")
    // every source appears with every one of ITS windows
    assert(got.map(t => (t._1, t._2)).distinct.size == got.size)
  }

  test("windowed drift alarms on a planted vocabulary shift, and only there") {
    // One source, sixteen arrival windows (span 10 → windows 0..15).
    // Fifteen windows draw from a shared vocabulary; window 2 is a
    // wholesale vocabulary swap — the monitor must page on window 2
    // and stay quiet elsewhere. B = 64 and ~800 tokens per window keep
    // the add-one smoothing floor (the JS a window pays just for being
    // finite) an order of magnitude under the planted signal.
    import spark.implicits._
    val normal = Seq.fill(10)(
      "alpha beta gamma delta epsilon zeta eta theta").mkString(" ")
    val shifted = Seq.fill(10)(
      "xqzv wkjy pmrt bgnd lfsc hvwx qqtt zzyy").mkString(" ")
    val docsDf = (0L until 160L).map { id =>
      val text = if (id / 10L == 2L) shifted else normal
      (id, "src", text)
    }.toDF("doc_id", "source", "text")
    val report = TextOps.windowedDriftReport(
      TextOps.windowedDriftBucketed(docsDf, 64, 10L), 64)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(report.keySet == (0L until 16L).toSet)
    val quiet = (0L until 16L).filter(_ != 2L).map(report)
    assert(quiet.forall(_ < report(2L) / 10L),
      s"planted shift must dominate: shifted=${report(2L)} quiet=$quiet")
  }

  test("integer PageRank matches an independent propagation over the rare-shingle graph") {
    val got = TextOps.qd36PageRank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    // rebuild the edge set independently: rare (df 2..5) trigram
    // shingles, docs sharing one are linked
    val docsRows = graft.Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
      .filter(_._2.length >= 3)
    val shOf = docsRows.map { case (id, toks) =>
      id -> toks.sliding(3).map(_.mkString(" ")).toSet }.toMap
    val df = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    shOf.values.foreach(_.foreach(s => df(s) += 1))
    val rare = df.collect { case (s, d) if d >= 2 && d <= 5 => s }.toSet
    val ids = shOf.keys.toSeq.sorted
    val edges = (for {
      i <- ids; j <- ids if i < j
      if (shOf(i) & shOf(j)).exists(rare)
    } yield (i, j)).toSeq
    val und = edges ++ edges.map(_.swap)
    val deg = und.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var r = deg.keys.map(_ -> 1000000L).toMap
    (1 to TextOps.DefaultPageRankIters).foreach { _ =>
      val inflow = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      und.foreach { case (src, dst) =>
        inflow(dst) += (r(src) * 85L) / (deg(src) * 100L) }
      r = inflow.map { case (n, in) => n -> (150000L + in) }.toMap
    }
    val expected = deg.keys.toSeq
      .map(n => (n, deg(n), r(n)))
      .sortBy { case (n, _, ru) => (-ru, n) }
    assert(got.toSeq == expected)
    // the graph and the ranks are non-degenerate: real degree spread,
    // non-uniform centrality (the near-dup-clique pitfall this graph
    // choice exists to avoid)
    assert(got.map(_._2).distinct.length > 3, "degree-regular graph")
    assert(got.map(_._3).distinct.length > got.length / 2,
      "near-uniform ranks — vacuous centrality")
  }

  test("leak-safe split keeps near-dup clusters on one side and matches qd25 elsewhere") {
    val got = TextOps.qd35LeakSafeSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
    val docs = graft.Tables(spark, dir, "documents").count()
    assert(got.length.toLong == docs, "every document must get a split")
    // cluster coherence: all members of a rep share bucket AND split —
    // the leakage property the operator exists for
    got.groupBy(_._2).foreach { case (rep, rows) =>
      assert(rows.map(_._3).distinct.length == 1,
        s"rep $rep members landed in different buckets")
      assert(rows.map(_._4).distinct.length == 1,
        s"rep $rep members landed in different splits")
    }
    // there IS at least one multi-member cluster, or the test is vacuous
    assert(got.groupBy(_._2).exists(_._2.length > 1),
      "no near-dup cluster in the gate corpus — vacuous")
    // unclustered docs (rep == own id, and nobody else shares the rep)
    // get exactly their qd25 assignment — drop-in upgrade, not a reshuffle
    val qd25 = TextOps.qd25HashSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getString(3))).toMap
    val repSizes = got.groupBy(_._2).view.mapValues(_.length).toMap
    val singles = got.filter(t => t._2 == t._1 && repSizes(t._2) == 1)
    assert(singles.nonEmpty)
    singles.foreach { case (id, _, bucket, split) =>
      assert(qd25(id) == ((bucket, split)),
        s"unclustered doc $id diverged from its qd25 assignment")
    }
    // and the clusters actually changed something vs qd25 (some member's
    // split moved to its rep's side)
    assert(got.exists { case (id, rep, bucket, _) =>
      id != rep && qd25(id)._1 != bucket
    }, "no member inherited a different bucket — vacuous leak protection")
  }

  test("temperature mixture upsamples the tail and matches the quota math") {
    val corpus = graft.Tables(spark, dir, "documents")
      .select("lang").collect().map(_.getString(0))
    val counts = corpus.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val weights = counts.view.mapValues(n =>
      BigDecimal(math.sqrt(n.toDouble) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toMap
    val tw = weights.values.sum
    val quotas = weights.view.mapValues(w => 100L * w / tw).toMap
    val got = TextOps.qd34TemperatureMixture(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // quotas hold exactly and every stratum fills to its quota
    got.foreach { case (_, l, rank, quota) =>
      assert(quota == quotas(l)); assert(rank >= 1 && rank <= quota)
    }
    val perLang = got.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    quotas.foreach { case (l, q) => assert(perLang.getOrElse(l, 0L) == q,
      s"stratum $l filled ${perLang.getOrElse(l, 0L)} of quota $q") }
    // the alpha < 1 property: the head lang's sample share is BELOW its
    // corpus share, the thinnest lang's is ABOVE — the whole point
    val n = counts.values.sum.toDouble
    val s = perLang.values.sum.toDouble
    val head = counts.maxBy(_._2)._1
    val tail = counts.minBy(_._2)._1
    assert(perLang(head) / s < counts(head) / n,
      s"head $head not downsampled")
    assert(perLang(tail) / s > counts(tail) / n,
      s"tail $tail not upsampled")
  }

  test("CMS estimates match an independent sketch recompute and never undercount") {
    val (width, depth) = (16, 4)
    def bucket(j: Int, t: String): Int =
      java.lang.Long.remainderUnsigned(
        graft.dedup.SimHash.md5Lower64String(s"cms$j:$t"), width.toLong).toInt
    // exact counts straight off the corpus
    val exact = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    graft.Tables(spark, dir, "documents").select("text").collect()
      .foreach(_.getString(0).trim.split("\\s+").filter(_.nonEmpty)
        .foreach(t => exact(t) += 1L))
    // the counter grid, then min-over-rows estimates
    val grid = Array.fill(depth, width)(0L)
    exact.foreach { case (t, c) =>
      (0 until depth).foreach(j => grid(j)(bucket(j, t)) += c) }
    val expected = exact.keys.toSeq.map { t =>
      (t, (0 until depth).map(j => grid(j)(bucket(j, t))).min, exact(t))
    }.sortBy { case (t, est, _) => (-est, t) }
      .zipWithIndex
      .map { case ((t, est, ex), i) => (t, est, ex, est - ex, (i + 1).toLong) }
    val got = TextOps.qd33CmsHeavyHitters(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // CMS contract: estimates only ever OVERCOUNT, and on a 31-term
    // vocabulary over a 16-wide grid collisions must actually occur
    assert(got.forall(_._4 >= 0L), "CMS undercounted — broken sketch")
    assert(got.exists(_._4 > 0L), "no collisions — sketch too wide to test")
    assert(got.exists(_._4 == 0L), "every term collided — degenerate grid")
  }

  test("DSIR weights match an independent recompute of the hashed-bigram model") {
    val B = 1024
    def h(s: String, m: Long): Long =
      java.lang.Long.remainderUnsigned(
        graft.dedup.SimHash.md5Lower64String(s"dsir:$s"), m)
    val corpus = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+"))
      .filter(_._2.length >= 2)
    val isT = corpus.map { case (id, _) => id -> (h(id.toString, 20L) == 0L) }.toMap
    val bigrams = corpus.map { case (id, toks) =>
      id -> toks.sliding(2).map(p => h(p.mkString(" "), B.toLong).toInt).toSeq }
    val ct = new Array[Long](B); val cr = new Array[Long](B)
    bigrams.foreach { case (id, bs) =>
      bs.foreach(b => if (isT(id)) ct(b) += 1 else cr(b) += 1) }
    val (nt, nr) = (ct.sum.toDouble, cr.sum.toDouble)
    val expected = bigrams.filterNot { case (id, _) => isT(id) }.map { case (id, bs) =>
      val mean = bs.map(b =>
        math.log((ct(b) + 1) / (nt + B)) - math.log((cr(b) + 1) / (nr + B))).sum / bs.size
      (id, bs.size.toLong,
        BigDecimal(mean).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1).toSeq
    val got = TextOps.qd26DsirWeights(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(expected.nonEmpty && isT.values.exists(identity),
      "fixture must contain both target and raw documents")
    assert(got.map(t => (t._1, t._2)) == expected.map(t => (t._1, t._2)))
    got.zip(expected).foreach { case ((id, _, g), (_, _, e)) =>
      assert(math.abs(g - e) < 2e-6, s"doc $id weight $g vs $e") }
  }

  test("qd38 packed sequences detokenize back to the exact corpus token stream") {
    val budget = TextOps.DefaultPackBudget
    val rows = TextOps.qd38PackedSequences(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    // gapless fixed-budget layout: consecutive seq ids, every row full
    // except (possibly) the last, and n_tokens always matches the ids
    assert(rows.map(_._1).toSeq == rows.indices.map(_.toLong),
      "sequence ids must be contiguous from 0")
    rows.dropRight(1).foreach { case (sid, n, _) =>
      assert(n == budget.toLong, s"interior sequence $sid not full: $n") }
    assert(rows.last._2 <= budget.toLong && rows.last._2 > 0L)
    rows.foreach { case (sid, n, ids) =>
      assert(ids.split(" ").length.toLong == n, s"seq $sid: count mismatch") }
    // DETOKENIZE round trip: ids -> subword symbols -> strip the '</w>'
    // markers -> the corpus word stream in (doc_id, word) order. Nothing
    // may be lost or reordered between the tokenizer and the loader.
    val vocab = TextOps.bpeTrain(TextOps.bpeV0(spark, dir),
      TextOps.DefaultBpeMerges)._2
    val idToSym = TextOps.bpeSymbolIds(vocab).map(_.swap)
    val decoded = rows.flatMap(_._3.split(" ")).map(s => idToSym(s.toLong))
      .mkString("").split("</w>", -1).filter(_.nonEmpty).toSeq
    val expected = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .sortBy(_.getLong(0))
      .flatMap(_.getString(1).trim.split("\\s+").filter(_.nonEmpty)).toSeq
    assert(decoded.length == expected.length,
      s"decoded ${decoded.length} words, corpus has ${expected.length}")
    val firstDiff = decoded.zip(expected).zipWithIndex.collectFirst {
      case ((a, b), i) if a != b => s"word $i: got $a want $b"
    }
    assert(firstDiff.isEmpty, s"first divergence at ${firstDiff.getOrElse("")}")
    assert(decoded == expected)
    // the encoding is non-trivial: at least one word spans >1 subword id
    // (merges stop short of whole words) and at least one merge applied
    // (some word uses fewer ids than characters + 1)
    val perWordIds = vocab.collect().map { case (t, syms, _) => t -> syms.length }
    assert(perWordIds.exists(_._2 > 1), "every word collapsed to one id?")
    assert(perWordIds.exists { case (t, n) => n < t.length + 1 },
      "no merge ever applied — vacuous tokenizer")
  }

  test("qd39 doc spans tile every packed sequence and cover each doc exactly") {
    val seqs = TextOps.qd38PackedSequences(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = TextOps.qd39PackedDocSpans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.map(_._1).toSet == seqs.keySet,
      "qd38 and qd39 disagree on the sequence set")
    val spansByDoc = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    rows.foreach { case (sid, nDocs, nToks, spansStr) =>
      assert(nToks == seqs(sid), s"seq $sid token count diverged from qd38")
      val spans = spansStr.split(" ").map { sp =>
        val Array(d, st, ln) = sp.split(":").map(_.toLong); (d, st, ln)
      }
      assert(spans.length.toLong == nDocs, s"seq $sid: span count != n_docs")
      // spans TILE the sequence: start at 0, contiguous, end at n_tokens
      assert(spans.head._2 == 0L, s"seq $sid: first span not at slot 0")
      spans.sliding(2).foreach {
        case Array((_, s1, l1), (_, s2, _)) =>
          assert(s1 + l1 == s2, s"seq $sid: gap/overlap at slot $s2")
        case _ =>
      }
      assert(spans.last._2 + spans.last._3 == nToks,
        s"seq $sid: spans do not cover the sequence")
      // within one sequence a doc appears at most once (docs are
      // concatenated in order — a doc's tokens are contiguous globally)
      assert(spans.map(_._1).distinct.length == spans.length,
        s"seq $sid: doc split into non-adjacent spans")
      spans.foreach { case (d, _, l) => spansByDoc(d) += l }
    }
    // across sequences every doc's spans sum to its encoded token count
    // (qd29's n_tokens — the independent per-doc encoding)
    val perDoc = TextOps.qd29BpeEncode(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(spansByDoc.toMap == perDoc,
      "per-doc span totals diverge from qd29's encoded token counts")
  }
}
