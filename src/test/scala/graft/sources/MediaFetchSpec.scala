package graft.sources

import graft.SparkTestSession
import graft.ingest.MediaFetch
import org.scalatest.funsuite.AnyFunSuite

/** S8/K1: existence-checked media mirroring with a pluggable transport.
  * The transport here resolves a deterministic byte payload per URL (the
  * container has no egress); production swaps in an HTTP client without
  * touching the operator. */
/** Transport-call counters for the ranged-fetch spec: static so the
  * serialized transport closure and the driver-side assertions see the
  * same cells (one JVM in local mode). */
object RangedCalls {
  val headers = new java.util.concurrent.atomic.AtomicInteger(0)
  val ranges = new java.util.concurrent.atomic.AtomicInteger(0)
  /** When set, the next non-header range GET returns a TRUNCATED body
    * (short read), then clears itself — the connection-reset stand-in
    * for the healing spec. */
  val truncateNext = new java.util.concurrent.atomic.AtomicBoolean(false)
}

class MediaFetchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // serializable stand-in transport: payload derived from the url
  private val fakeFetch: String => Array[Byte] =
    url => s"payload-of:$url".getBytes("UTF-8")

  test("fetches only missing keys and is idempotent across runs (K1)") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft_media").toString
    val batch1 = Seq(("u1/p1/original", "cdn://a.jpg"),
      ("u1/p2/original", "cdn://b.jpg")).toDF("key", "url")

    val got1 = MediaFetch.fetchMissing(batch1, store, fakeFetch)
    assert(got1.count() == 2)
    // replay of the same candidates: the anti join sees the populated
    // store -> nothing fetched, store unchanged
    val got2 = MediaFetch.fetchMissing(batch1, store, fakeFetch)
    assert(got2.count() == 0)
    assert(spark.read.parquet(store).count() == 2)

    // a partially-new batch fetches exactly the new key
    val batch2 = Seq(("u1/p2/original", "cdn://b.jpg"),
      ("u2/p9/original", "cdn://c.jpg")).toDF("key", "url")
    val got3 = MediaFetch.fetchMissing(batch2, store, fakeFetch)
    assert(got3.collect().map(_.getString(0)).toSeq == Seq("u2/p9/original"))
    assert(spark.read.parquet(store).count() == 3)

    // payloads came through the transport intact
    val p = spark.read.parquet(store)
      .filter($"key" === "u1/p1/original").collect().head
    assert(new String(p.getAs[Array[Byte]]("payload"), "UTF-8") ==
      "payload-of:cdn://a.jpg")
    assert(p.getAs[Long]("content_length") == "payload-of:cdn://a.jpg".length.toLong)
  }

  test("ranged fetch plans keyframes from one header GET, fetches only " +
       "missing ranges, and replays idempotently") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft_ranged").toString
    // two synthetic media objects, each the qm11 chunked container; the
    // transport serves the header from the container and every other
    // range from the deterministic position-based byte function
    val docs = Seq((1L, "alpha"), (4L, "beta gamma"))
    val headerByUrl = docs.map { case (id, text) =>
      s"media/$id" -> graft.enrich.Multimodal.qm11Container(id, text)
    }.toMap
    // count transport calls via a static accumulator-free counter (one
    // JVM in local mode); header GETs are off == 0
    RangedCalls.headers.set(0); RangedCalls.ranges.set(0)
    val transport: (String, Long, Long) => Array[Byte] = { (url, off, len) =>
      if (off == 0L) {
        RangedCalls.headers.incrementAndGet()
        headerByUrl(url).take(len.toInt)
      } else {
        RangedCalls.ranges.incrementAndGet()
        graft.enrich.Multimodal.oracleRange(off, len)
      }
    }
    val candidates = docs.map { case (id, _) => (s"kf/$id", s"media/$id") }
      .toDF("key", "url")
    val got1 = MediaFetch.fetchKeyframeRanges(candidates, store, transport)
      .collect()
    assert(got1.nonEmpty)
    val expectedRanges = got1.length
    assert(RangedCalls.headers.get() == 2, "one header GET per object")
    assert(RangedCalls.ranges.get() == expectedRanges,
      "one ranged GET per planned keyframe")
    // the fetched rows are EXACTLY the qm13 kernel's rows for the same
    // corpus — the store-backed operator and the oracle-checked query
    // are the same machine
    val kernel = graft.enrich.Multimodal
      .rangedFetchFrame(docs.toDF("doc_id", "text"),
        (_, off, len) => graft.enrich.Multimodal.oracleRange(off, len))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    val opRows = got1.map(r => (r.getString(1).stripPrefix("media/").toLong,
      r.getLong(2), r.getLong(3), r.getLong(4),
      r.getAs[Long]("content_length"))).toSet
    assert(opRows == kernel)
    // replay: planning re-runs (one header GET per object — the cheap
    // HEAD-like probe), but ZERO range GETs and nothing appended
    RangedCalls.headers.set(0); RangedCalls.ranges.set(0)
    val got2 = MediaFetch.fetchKeyframeRanges(candidates, store, transport)
    assert(got2.count() == 0)
    assert(RangedCalls.headers.get() == 2 && RangedCalls.ranges.get() == 0)
    assert(spark.read.parquet(store).count() == expectedRanges.toLong)
    // a header whose moov exceeds the budget is skipped, never
    // half-planned: nothing new fetched, nothing thrown
    val got3 = MediaFetch.fetchKeyframeRanges(candidates, store, transport,
      headerBytes = 16L)
    assert(got3.count() == 0)
  }

  test("a short ranged GET is never recorded — replay heals it") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft_short").toString
    val docs = Seq((1L, "alpha"))
    val headerByUrl = docs.map { case (id, text) =>
      s"media/$id" -> graft.enrich.Multimodal.qm11Container(id, text)
    }.toMap
    RangedCalls.truncateNext.set(true)
    val transport: (String, Long, Long) => Array[Byte] = { (url, off, len) =>
      if (off == 0L) headerByUrl(url).take(len.toInt)
      else {
        val full = graft.enrich.Multimodal.oracleRange(off, len)
        // simulate a connection reset mid-body exactly once
        if (RangedCalls.truncateNext.getAndSet(false)) full.take(full.length / 2)
        else full
      }
    }
    val candidates = docs.map { case (id, _) => (s"kf/$id", s"media/$id") }
      .toDF("key", "url")
    val got1 = MediaFetch.fetchKeyframeRanges(candidates, store, transport)
    // the truncated range was DROPPED, not staged with a short
    // content_length — the anti join can therefore refetch it
    val stored1 = spark.read.parquet(store)
    assert(stored1.filter($"content_length" =!= $"byte_length").count() == 0)
    val missingAfter1 = got1.count() + 1 // one planned range was dropped
    // replay: exactly the dropped range is fetched, intact this time
    val got2 = MediaFetch.fetchKeyframeRanges(candidates, store, transport)
    assert(got2.count() == 1)
    val stored2 = spark.read.parquet(store)
    assert(stored2.count() == missingAfter1)
    assert(stored2.filter($"content_length" =!= $"byte_length").count() == 0)
    // converged: a third run fetches nothing
    assert(MediaFetch.fetchKeyframeRanges(candidates, store, transport)
      .count() == 0)
  }

  test("candidate keys follow the reference's store layout") {
    val snapshot = graft.ingest.PostIngest.snapshot(
      spark, "src/test/resources/fixtures/posts/*")
    val cands = MediaFetch.candidatesFromPosts(snapshot).collect()
    assert(cands.nonEmpty)
    val keys = cands.map(_.getString(0))
    assert(keys.contains("1/100/original"), s"got ${keys.toSeq}")
    assert(keys.forall(_.split("/").length == 3))
  }
}
