package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query wall seconds.
  *
  * Each query is forced with a `noop`-format write: unlike `count()`
  * (where Catalyst prunes every computed column and often skips the real
  * work), noop fully evaluates and serializes each row, which is the
  * honest cost of the operator. A tiny warm-up query runs first so the
  * first measured query doesn't pay session/codegen start-up.
  *
  * Single runs on a shared machine have ±50% noise (observed qs9
  * 1.87–3.35 s across runs), so the suite runs THREE full passes in the
  * same query order and reports the per-query MEDIAN; `total` is the sum
  * of medians. The session-scoped MinHash memo is cleared between passes
  * so every pass pays the signature kernel exactly once through its first
  * consumer (same order every pass → comparable costs); memoization
  * WITHIN a pass is the production composition and stays.
  */
object Bench {
  val Passes = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: session + codegen + parquet footer reads for every table a
    // first query might touch (a region-only warm-up left the
    // alphabetically-first query paying ~2s of events-scan start-up);
    // Tables.all is the canonical inventory, so new tables can't drift out
    Tables.all.foreach(t =>
      Tables(spark, sfDir, t).limit(1000).write.format("noop").mode("overwrite").save())

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val passes = (1 to Passes).map { p =>
      if (p > 1) {
        // each pass pays the shared signature/pair-graph kernel once, via
        // the same (alphabetically first) consumer as every other pass
        graft.dedup.MinHashLSH.clearCache()
        System.gc() // let the ContextCleaner reclaim dropped checkpoints
      }
      ordered.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] pass $p $name failed: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val results = ordered.map { case (name, _) =>
      val runs = passes.map(_.toMap.apply(name)).sorted
      name -> runs(runs.length / 2)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$Passes,"stat":"median"}""")
    spark.stop()
  }
}
