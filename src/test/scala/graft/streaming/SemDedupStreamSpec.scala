package graft.streaming

import java.nio.file.Files

import graft.SparkTestSession
import graft.similarity.{Ann, SemDedup}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SemDedupStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Same duplicate-heavy shape as SemDedupSpec's planted corpus — bases,
    * 5-copy exact-dup clusters, a near-parallel cross-edge copy, zero and
    * NaN vectors — with ids arranged so every duplicate GROUP spans batch
    * boundaries when range-partitioned into files. */
  private def planted() = {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val dim = 16
    val bases = IndexedSeq.fill(30)(Array.fill(dim)(rnd.nextGaussian()))
    val nanVec = bases(2).updated(3, Double.NaN)
    val rows =
      bases.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq, i % 3) } ++
      (0 until 6).flatMap(i => (1 to 4).map(c =>
        ((100 + 10 * i + c).toLong, bases(i).toSeq, i % 3))) ++
      Seq((200L, bases(0).map(x => x * (1 + 1e-9)).toSeq, 0)) ++
      (0 until 3).map(z => ((300 + z).toLong, Seq.fill(dim)(0.0), 1)) ++
      (0 until 2).map(z => ((400 + z).toLong, nanVec.toSeq, 2))
    rows.toDF("vec_id", "embedding", "label")
  }

  private def stage(df: DataFrame, files: Int, byCol: Column = col("vec_id")): String = {
    val dir = Files.createTempDirectory("semdedup_stream_spec").toString
    Replay.cleanupAtExit(dir)
    df.select(col("vec_id"), col("embedding"))
      .repartitionByRange(files, byCol)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def asSet(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

  test("streamed keep-list equals batch keepList across batch boundaries") {
    val emb = planted()
    val cents = Ann.localCentroids(emb)
    val want = asSet(SemDedup.keepList(emb, threshold = 0.95, s = 4))
    // 3 one-file batches, compaction mid-stream; every duplicate group,
    // the cross edge, and the degenerate vectors all span batches
    val staged = stage(emb, files = 3)
    val got = asSet(SemDedupStream.streamKeepList(spark, staged, cents, s = 4,
      maxFilesPerTrigger = 1, compactEvery = 2))
    assert(got == want)
    // degenerate vectors survive streaming too: singletons, keep=true
    assert((300L to 302L).forall(z => got.contains((z, z, true))))
    assert((400L to 401L).forall(z => got.contains((z, z, true))))
  }

  test("final labels are independent of arrival order") {
    val emb = planted()
    val cents = Ann.localCentroids(emb)
    val want = asSet(SemDedup.keepList(emb, threshold = 0.95, s = 4))
    // stage range-partitioned on the NEGATED id: the first-listed files
    // hold the HIGHEST ids, so duplicate groups' first-arriving members
    // are not their minima — the resolution must re-minimize
    val staged = stage(emb, files = 3, byCol = -col("vec_id"))
    val got = asSet(SemDedupStream.streamKeepList(spark, staged, cents, s = 4,
      maxFilesPerTrigger = 1, compactEvery = 2))
    assert(got == want)
  }

  test("per-batch assignment work is proportional to the batch's novel digests") {
    val emb = planted()
    val cents = Ann.localCentroids(emb)
    val staged = stage(emb, files = 3)
    SemDedupStream.recordProbeRows = true
    try SemDedupStream.streamKeepList(spark, staged, cents, s = 4,
      maxFilesPerTrigger = 1, compactEvery = 16).collect()
    finally SemDedupStream.recordProbeRows = false
    val perBatch = SemDedupStream.probeRowsPerBatch.toList
    assert(perBatch.size == 3, s"expected 3 micro-batches, got $perBatch")
    // every LIVE distinct vector is assigned exactly once, in its arrival
    // batch: totals equal the distinct non-degenerate count, and no batch
    // re-assigns accumulated state (31 live distinct: 30 bases + the
    // near-parallel copy; zero/NaN vectors route around assignment)
    assert(perBatch.sum == 31L, s"assigned rows per batch: $perBatch")
  }

  test("qs15 equals batch qe4 on the shared corpus") {
    val got = asSet(SemDedupStream.qs15StreamSemDedup(spark, SparkTestSession.sfDir))
    val want = asSet(SemDedup.qe4SemanticDedup(spark, SparkTestSession.sfDir))
    assert(got == want)
  }
}
