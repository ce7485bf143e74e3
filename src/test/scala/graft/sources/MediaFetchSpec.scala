package graft.sources

import graft.SparkTestSession
import graft.ingest.MediaFetch
import org.scalatest.funsuite.AnyFunSuite

/** S8/K1: existence-checked media mirroring with a pluggable transport.
  * The transport here resolves a deterministic byte payload per URL (the
  * container has no egress); production swaps in an HTTP client without
  * touching the operator. */
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
