package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** S8 + K1 — the reference's media mirroring: download each post's media
  * bytes and put them into the owned store, SKIPPING keys that already
  * exist (`store_images`, s3-to-es_aws.py:64-128: `list_objects_v2`
  * existence probe before every fetch).
  *
  * Engine shape, exactly as SURVEY §2.1 S8 prescribes: the existence
  * check is a `left_anti` join of candidate keys against the store
  * inventory (K1 — the broadcast-able small side is the candidate set),
  * and the fetch itself is a side-effecting `mapPartitions` with a
  * PLUGGABLE transport — one client per partition, never per row. The
  * container has no network egress, so production HTTP is exercised via
  * a `file://`/byte-map transport in the spec; an HTTP client drops into
  * the same `fetch` slot unchanged. Idempotency is structural: re-running
  * over the same candidates fetches nothing (the anti join sees the
  * now-populated store), which is the reference's "subsequent runs are
  * better than a backup" contract (README.md:527).
  */
object MediaFetch {

  /** Fetch payloads for candidate (key, url) rows whose key is absent
    * from the parquet store at `storeDir`; append them to the store and
    * return the newly fetched rows (key, url, payload, content_length).
    *
    * `fetch` must be serializable (it ships to executors); it is invoked
    * once per missing row inside a per-partition loop.
    */
  def fetchMissing(candidates: DataFrame, storeDir: String,
                   fetch: String => Array[Byte]): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    // resolve through the Hadoop FS layer, NOT java.io.File: the store may
    // be any Hadoop-supported URI (s3a://, hdfs://, file:); a local-file
    // round trip would silently rebase remote URIs onto the local disk
    val fs = new org.apache.hadoop.fs.Path(storeDir).getFileSystem(hconf)
    val storePath =
      fs.makeQualified(new org.apache.hadoop.fs.Path(storeDir))
    // first-run probe by LISTING, not by catching a read failure: a
    // missing dir and an existing-but-empty dir are both "first run"
    // (the AnalysisException catch treated them differently), and
    // leftover non-parquet temp files don't count as data
    val hasData = fs.exists(storePath) &&
      fs.listStatus(storePath).exists(f =>
        f.isFile && f.getPath.getName.endsWith(".parquet"))
    val inventory: DataFrame =
      if (hasData) spark.read.parquet(storeDir).select("key")
      else spark.emptyDataset[String].toDF("key")
    val missing = candidates.select("key", "url")
      // one fetch per key even if a batch repeats a key; min(url) makes
      // the surviving row DETERMINISTIC (dropDuplicates would keep an
      // arbitrary one and the mirrored payload would vary run to run)
      .groupBy("key").agg(min("url").as("url"))
      .join(inventory, Seq("key"), "left_anti") // K1 existence check
    // EAGER localCheckpoint before the write: the fetch is side-effecting,
    // so it must run exactly once per missing row — a lazy plan would
    // re-download everything for each consumer, and any post-append read
    // of `missing`/the store would see the mutated inventory and lie
    val fetched = missing.as[(String, String)]
      .mapPartitions { rows =>
        // one transport per partition; rows stream through it
        rows.map { case (key, url) =>
          val payload = fetch(url)
          (key, url, payload, payload.length.toLong)
        }
      }
      .toDF("key", "url", "payload", "content_length")
      .localCheckpoint(true)
    // ATOMIC-ish append (stagedAppend): it replaces a direct
    // `mode(Append)` that could die mid-part-file and poison every
    // subsequent inventory read with a truncated footer
    if (!fetched.isEmpty) stagedAppend(fetched, fs, storePath)
    fetched
  }

  /** Ranged media mirroring — the thumbnail pipeline the 100-TB way
    * (s3-to-es_aws.py:101-128 downloads each media object whole to
    * derive stills; at petabyte scale a thumbnailing job must fetch
    * KEYFRAME BYTE RANGES only). Composition of the two machines this
    * file and `Mp4Box` provide: per candidate object, ONE small header
    * GET feeds the real §8.7.4/§8.7.5 demuxer walk
    * (`Mp4Box.probeKeyframeRanges`) to plan the keyframe ranges; the
    * plan anti-joins the store on (key, sample_number) — K1's existence
    * check at range granularity — and only MISSING ranges are fetched,
    * one ranged GET each, and staged-append'ed to the store. Replay is
    * idempotent on the side effects that matter: a re-run re-issues
    * only the O(1)-per-object header GETs (planning is stateless and
    * cheap, like a HEAD probe) and zero range GETs.
    *
    * `fetchRange(url, offset, length)` is the single transport
    * primitive (an S3/HTTP ranged GET); a header whose `moov` lies
    * beyond `headerBytes` fails its box walk and the object is SKIPPED
    * this run (production would retry with a tail GET), never
    * half-planned. */
  def fetchKeyframeRanges(candidates: DataFrame, storeDir: String,
                          fetchRange: (String, Long, Long) => Array[Byte],
                          headerBytes: Long = 1L << 16): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(storeDir).getFileSystem(hconf)
    val storePath =
      fs.makeQualified(new org.apache.hadoop.fs.Path(storeDir))
    val hasData = fs.exists(storePath) &&
      fs.listStatus(storePath).exists(f =>
        f.isFile && f.getPath.getName.endsWith(".parquet"))
    val inventory: DataFrame =
      if (hasData) spark.read.parquet(storeDir).select("key", "sample_number")
      else spark.emptyDataset[(String, Long)].toDF("key", "sample_number")
    val planned = candidates.select("key", "url")
      .groupBy("key").agg(min("url").as("url")) // deterministic, like fetchMissing
      .as[(String, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (key, url) =>
          val header = fetchRange(url, 0L, headerBytes)
          graft.enrich.Mp4Box.probeKeyframeRanges(header).toSeq.flatten
            .map { case (sn, off, len) => (key, url, sn, off, len) }
        }
      }
      .toDF("key", "url", "sample_number", "file_offset", "byte_length")
    val missing = planned
      .join(inventory, Seq("key", "sample_number"), "left_anti")
    // EAGER localCheckpoint before the write, as in fetchMissing: each
    // missing range must be GET exactly once (the join put its keys
    // first — reselect before the positional tuple encoder)
    val fetched = missing
      .select("key", "url", "sample_number", "file_offset", "byte_length")
      .as[(String, String, Long, Long, Long)]
      .mapPartitions { rows =>
        // a short/truncated ranged GET must NOT be recorded: the
        // (key, sample_number) anti join would then treat the range as
        // fetched forever and the idempotent-replay healing could never
        // trigger. Dropping the row leaves it missing, so the next run
        // refetches it.
        rows.flatMap { case (key, url, sn, off, len) =>
          val payload = fetchRange(url, off, len)
          if (payload.length.toLong == len)
            Some((key, url, sn, off, len, payload, payload.length.toLong))
          else None
        }
      }
      .toDF("key", "url", "sample_number", "file_offset", "byte_length",
        "payload", "content_length")
      .localCheckpoint(true)
    if (!fetched.isEmpty) stagedAppend(fetched, fs, storePath)
    fetched
  }

  /** Atomic-ish append shared by both fetch operators: write to a
    * dot-prefixed staging dir (invisible to parquet listings), then
    * move completed part files into the store one rename at a time. A
    * crash mid-write leaves only the staging dir; a crash mid-move
    * leaves some COMPLETE files — the idempotent anti join refetches
    * the remainder. */
  private def stagedAppend(fetched: DataFrame,
                           fs: org.apache.hadoop.fs.FileSystem,
                           storePath: org.apache.hadoop.fs.Path): Unit = {
    val staging = new org.apache.hadoop.fs.Path(
      storePath, s".staging-${java.util.UUID.randomUUID}")
    fetched.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    fs.listStatus(staging)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .foreach { f =>
        val dest = new org.apache.hadoop.fs.Path(storePath, f.getPath.getName)
        // a silently-false rename would DROP a completed batch part —
        // fail loudly
        if (!fs.rename(f.getPath, dest))
          throw new java.io.IOException(
            s"failed to move completed media batch part ${f.getPath} -> $dest")
      }
    fs.delete(staging, true)
  }

  /** The reference's candidate builder: per-post media + thumbnail keys
    * (`<owner>/<post>/original.<ext>`; s3-to-es_aws.py:88-128), from a
    * flattened post snapshot. */
  def candidatesFromPosts(posts: DataFrame): DataFrame = {
    posts
      .filter(col("media_url").isNotNull)
      .select(
        concat_ws("/", col("owner_id"), col("id"), lit("original")).as("key"),
        col("media_url").as("url"))
  }
}
