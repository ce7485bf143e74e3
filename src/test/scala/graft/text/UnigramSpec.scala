package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class UnigramSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsDf(texts: Seq[String]) =
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")

  /** Exhaustive segmentation search — the brute-force mirror of the
    * packed-DP objective (max Σ len², ties → fewest pieces). */
  private def brute(t: String, vocab: Set[String]): (Long, Long) = {
    def go(i: Int): (Long, Long) =
      if (i == t.length) (0L, 0L)
      else (1 to 4).filter(len => i + len <= t.length)
        .filter(len => len == 1 || vocab.contains(t.substring(i, i + len)))
        .map { len =>
          val (s, p) = go(i + len)
          (s + len.toLong * len, p + 1)
        }
        .max(Ordering.by[(Long, Long), (Long, Long)] {
          case (s, p) => (s, -p)
        })
    go(0)
  }

  test("DP matches exhaustive segmentation over a planted vocabulary") {
    // corpus designed so 'abcd', 'abc', 'bc', 'cd' all pass a gate of
    // MinPieceCount when repeated enough — instead of replicating the
    // gate, drive the kernel's DP through segmentFrame on a corpus
    // whose repetition makes the intended pieces the whole vocabulary
    val base = "abcdabcdabcdabcd"
    val texts = Seq.fill(Unigram.MinPieceCount)(base) ++
      Seq("abcde", "xxabcd", "dcba", "a")
    val out = Unigram.segmentFrame(docsDf(texts))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    // recover the vocabulary the kernel actually induced and check the
    // DP against brute force on every doc
    val vocab = Unigram.vocab(docsDf(texts))
      .select("piece").as[String].collect().toSet
    assert(vocab.nonEmpty && vocab.forall(p => p.length >= 2 && p.length <= 4))
    texts.zipWithIndex.foreach { case (t, i) =>
      val (s, p) = brute(t, vocab)
      val (n, _, score, pieces) = out(i.toLong)
      assert(n == t.length)
      assert(score == s && pieces == p,
        s"doc $i '$t': dp=($score,$pieces) brute=($s,$p)")
    }
  }

  test("no multi-char vocabulary -> every doc is single-char segmented") {
    // each doc is a distinct repeated letter, so a substring repeats
    // only within its own short doc — far below MinPieceCount
    val texts = (0 until 8).map(i => ('a' + i).toChar.toString * (i + 2))
    val out = Unigram.segmentFrame(docsDf(texts)).collect()
    out.foreach { r =>
      assert(r.getLong(2) == 0L, "vocab_hits must be 0 with no vocab")
      assert(r.getLong(3) == r.getLong(1), "score = n under singles")
      assert(r.getLong(4) == r.getLong(1), "pieces = n under singles")
    }
  }

  test("vocabulary is gated, capped, and deterministically ordered") {
    val texts = Seq.fill(Unigram.MinPieceCount)("zyxw" * 4)
    val v = Unigram.vocab(docsDf(texts))
      .select("piece").as[String].collect()
    assert(v.length == v.distinct.length)
    assert(v.length <= Unigram.VocabCap)
    // every substring of length 2-4 of the repeated motif passes the
    // gate (each occurs >= 50 times across the corpus)
    assert(v.contains("zy") && v.contains("zyxw") && v.contains("wzy"))
    // a second induction returns the identical set (deterministic)
    val v2 = Unigram.vocab(docsDf(texts))
      .select("piece").as[String].collect()
    assert(v.sorted.toSeq == v2.sorted.toSeq)
  }

  test("vocab_hits counts every (position, length) vocabulary match") {
    val texts = Seq.fill(Unigram.MinPieceCount)("aaaa")
    val out = Unigram.segmentFrame(docsDf(texts)).collect()
    // vocab = {aa, aaa, aaaa}; hits in 'aaaa': aa x3, aaa x2, aaaa x1
    out.foreach(r => assert(r.getLong(2) == 6L))
    // best segmentation: one 4-char piece -> score 16, 1 piece
    out.foreach(r => assert(r.getLong(3) == 16L && r.getLong(4) == 1L))
  }

  test("non-BMP text fails loudly instead of diverging from the oracle") {
    // both kernels index by UTF-16 unit; a surrogate pair counts 2 here
    // but 1 under the oracle's code-point semantics — the guard must
    // reject it (ADVICE r12), and plain BMP text must be unaffected
    val emoji = new String(Character.toChars(0x1F600)) // outside the BMP
    val bad = Seq.fill(Unigram.MinPieceCount)("abab" + emoji)
    val e = intercept[org.apache.spark.SparkException] {
      Unigram.segmentFrame(docsDf(bad)).collect()
    }
    assert(e.getMessage.contains("non-BMP") ||
      Option(e.getCause).exists(_.getMessage.contains("non-BMP")))
    // BMP-only text, including non-ASCII BMP chars, still segments
    val ok = Seq.fill(Unigram.MinPieceCount)("ébéb")
    assert(Unigram.segmentFrame(docsDf(ok)).count() == ok.length)
  }

  test("isBmp is the sanctioned pre-filter: accepts exactly what the kernels do") {
    import org.apache.spark.sql.functions._
    val emoji = new String(Character.toChars(0x1F600))
    val rows = Seq(
      ("ascii only", true), ("ébéb BMP accents", true),
      ("中文 BMP CJK", true), ("has " + emoji + " emoji", false))
    val got = rows.map(_._1).toDF("text")
      .select(col("text"), Unigram.isBmp(col("text")).as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    rows.foreach { case (t, want) => assert(got(t) == want, s"isBmp('$t')") }
    // the stray-surrogate alternative can't be exercised THROUGH Spark —
    // UTF8String replaces an unpaired surrogate on UTF-8 encode, so a
    // Spark string column can never hold one — but the pattern itself
    // must still reject it (defensive; Java-side Strings can carry them)
    val p = java.util.regex.Pattern.compile(
      "[\\x{10000}-\\x{10FFFF}]|[\\x{D800}-\\x{DFFF}]")
    assert(p.matcher("stray " + "\uD800" + " surrogate").find())
    assert(!p.matcher("plain bmp").find())
    // the filtered corpus passes the kernel guard end-to-end
    val mixed = Seq.fill(Unigram.MinPieceCount)("abab") :+ ("abab" + emoji)
    val gated = docsDf(mixed).filter(Unigram.isBmp(col("text")))
    assert(gated.count() == Unigram.MinPieceCount)
    assert(Unigram.segmentFrame(gated).count() == Unigram.MinPieceCount)
  }

  test("isBmp(NULL) is FALSE, so the ok/out split loses no rows (ADVICE r15)") {
    import org.apache.spark.sql.functions._
    // rlike null-propagates; without the coalesce a null-text row would
    // fail BOTH filter(isBmp) and filter(!isBmp) — an unauditable drop
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row("bmp ok"),
        org.apache.spark.sql.Row(null),
        org.apache.spark.sql.Row("x" + new String(Character.toChars(0x1F600)))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType, nullable = true))))
    val ok = df.filter(Unigram.isBmp(col("text"))).count()
    val out = df.filter(!Unigram.isBmp(col("text"))).count()
    assert(ok == 1L, "only the BMP row passes the gate")
    assert(out == 2L, "null text lands in the reported-out partition")
    assert(ok + out == df.count(), "the split is a partition — no silent drop")
  }
}
