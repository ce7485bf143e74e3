package graft.similarity

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Power-iteration PCA over the embedding corpus — the dominant
  * principal direction of the (uncentered) second-moment matrix, and
  * each vector's projection onto it (qe18). The whitening/decorrelation
  * primitive a curation pipeline uses for embedding drift axes, coreset
  * directions, and spectral diagnostics.
  *
  * Determinism contract (the qd36 integer idiom, applied to linear
  * algebra): components quantize to INTEGER micros (round(x·1e6), a
  * per-element closed form both engines share), so the corpus-scale
  * second-moment sums are exact integer arithmetic — order-independent
  * under any partitioning, bit-equal in DuckDB's HUGEINT accumulator.
  * With |x| ≤ 0.58 in this corpus, C_ij ≤ n·3.4e11: long-safe to ~27M
  * vectors and exact-in-double through sf1; a warehouse deployment
  * upgrades the accumulator to decimal(38,0) without changing the
  * algorithm. The 64×64 matrix then iterates on the DRIVER — dim²
  * doubles, the k-centroid-table kind of bounded local structure, NOT
  * a corpus-sized graph (contrast qd36, where iteration state is
  * corpus-sized and must stay distributed). Each matvec and norm is a
  * sequential left-to-right double sum, the same order DuckDB's
  * `list_inner_product` and the engine's codegen'd `graft_dot` use, so
  * the oracle's generated iteration CTEs reproduce the floats exactly.
  *
  * Scale shape: ONE corpus pass (per-partition long[dim²] outer-product
  * accumulation, no shuffle — partials merge in a reduce), a bounded
  * driver iteration, then one broadcast-literal projection pass. At
  * 100 TB nothing but the two linear scans touches the corpus.
  */
object Pca {
  /** Embedding dimensionality (embeddings table contract). */
  val Dim = 64
  /** Power-iteration depth. This corpus' top eigengap ratio is ~0.93
    * (near-isotropic synthetic vectors), so convergence goes as 0.93^k:
    * 64 steps land the eigen-residual below 2e-3 (spec-checked), while
    * the projection itself is deterministic at ANY depth. Driver cost
    * is k dim² multiply-adds — microseconds; the oracle generates one
    * CTE per step (the BPE depth-32 chain precedent, ×2). */
  val Iters = 64
  /** Micro quantization scale (1e-6 resolution, the family's 6dp). */
  val Micro = 1000000.0

  /** Sequential left-to-right dot — the scalar contract shared with
    * graft_dot / DuckDB list_inner_product. */
  private def seqDot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** The dominant eigenvector of the integer second-moment matrix,
    * iterated on the driver with oracle-identical float order. */
  private[graft] def powerIterate(c: Array[Long], dim: Int, iters: Int)
      : Array[Double] = {
    val cd = c.map(_.toDouble)
    var x = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble)) // 0.125 exact at 64
    var k = 0
    while (k < iters) {
      val y = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var s = 0.0; var j = 0
        while (j < dim) { s += cd(i * dim + j) * x(j); j += 1 }
        y(i) = s; i += 1
      }
      val n = math.sqrt(seqDot(y, y))
      x = y.map(_ / n)
      k += 1
    }
    x
  }

  /** Integer-micro quantized view: (vec_id, label, vi long[dim]). */
  private[graft] def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"),
      transform(col("embedding"),
        x => round(x.cast("double") * lit(Micro)).cast("long")).as("vi"))

  /** One corpus pass: per-partition outer-product accumulation into
    * long[dim^2] (exact integer sums — order-independent), merged by
    * elementwise reduce; the result is dim^2 longs on the driver (a
    * bounded local structure, like the k-centroid tables). */
  private[graft] def secondMoment(quant: DataFrame, dim: Int): Array[Long] = {
    val spark = quant.sparkSession
    import spark.implicits._
    quant.select("vi").as[Seq[Long]]
      .mapPartitions { it =>
        val acc = new Array[Long](dim * dim)
        it.foreach { v =>
          var i = 0
          while (i < dim) {
            val vi = v(i); var j = 0
            while (j < dim) { acc(i * dim + j) += vi * v(j); j += 1 }
            i += 1
          }
        }
        Iterator.single(acc)
      }
      .reduce { (a, b) =>
        val out = new Array[Long](a.length)
        var i = 0
        while (i < a.length) { out(i) = a(i) + b(i); i += 1 }
        out
      }
  }

  /** The projection tail: iterate the (already summed) moment matrix and
    * project every quantized vector — shared by the batch form and the
    * streaming report (qs29, which folds the matrix from per-batch
    * deltas; identical integers → identical direction → identical
    * rows). */
  private[graft] def projectionFrom(quant: DataFrame, second: Array[Long],
                                    dim: Int, iters: Int): DataFrame = {
    val x = powerIterate(second, dim, iters)
    val xLit = array(x.map(lit): _*)
    quant.select(col("vec_id"), col("label"),
        round(graft.functions.VectorFunctions.dot(
          transform(col("vi"), v => v.cast("double")), xLit) / lit(Micro), 6)
          .as("pc1"))
      .orderBy("vec_id")
  }

  /** qe18: per-vector projection onto the corpus' dominant principal
    * direction. */
  def qe18PcaPower(spark: SparkSession, dir: String,
                   dim: Int = Dim, iters: Int = Iters): DataFrame = {
    val e = quantized(Tables(spark, dir, "embeddings"))
    projectionFrom(e, secondMoment(e, dim), dim, iters)
  }

  /** qe21 arrival-window width (vec_id div span — deterministic under
    * replay where a wall-clock window would not be; the qd31 idiom). */
  val DriftSpan = 100L
  /** qe21 alarm bar on the squared micro-mean displacement: natural
    * window noise on this corpus tops out at ~1.3e10 micro² across all
    * SFs (sampling error of ~100-vector windows), so 5e10 stays quiet
    * on clean data while a 0.03-unit per-dimension mean shift
    * (0.03²·1e12·64 ≈ 5.8e10) — a small real embedding-model
    * regression — crosses it (spec-planted). */
  val DriftD2Alarm = 50000000000L

  /** qe21: EMBEDDING drift monitoring — the embedding-space twin of
    * qd31's text drift: per arrival-window, the squared displacement of
    * the window's mean vector from the lifetime mean, in integer micro²
    * units. The signal an embedding pipeline pages on when an upstream
    * model, normalizer, or corrupted shard shifts the representation
    * distribution mid-ingest.
    *
    * Integer-exact end to end: per-(window, dim) component sums are
    * exact longs (order-free under any partitioning), means are
    * TRUNCATED integer division (Spark `div`; the oracle mirrors
    * truncation explicitly — DuckDB's `//` floors, which differs on
    * negative sums), and the displacement square-sum stays within long
    * (|dmean| ≤ 2.4e6 micro → Σ ≤ 3.7e14). */
  def qe21EmbeddingDrift(spark: SparkSession, dir: String,
                         span: Long = DriftSpan,
                         alarm: Long = DriftD2Alarm): DataFrame =
    embDriftReport(
      embDriftSums(quantized(Tables(spark, dir, "embeddings")), span), alarm)

  /** The (w, i, s, n) integer component sums — qe21's only corpus-width
    * stage, shared with the streaming form (qs31: pure sum monoid,
    * state O(windows × dim)). */
  private[graft] def embDriftSums(quant: DataFrame, span: Long): DataFrame =
    quant.select(expr(s"vec_id div $span").as("w"),
        posexplode(col("vi")).as(Seq("i", "v")))
      .groupBy("w", "i").agg(sum("v").as("s"), count(lit(1)).as("n"))

  /** The drift report over a (w, i, s, n) sum table — bounded by
    * windows × dim after the first shuffle. */
  private[graft] def embDriftReport(sums: DataFrame, alarm: Long): DataFrame = {
    val life = sums.groupBy("i").agg(sum("s").as("ls"), sum("n").as("ln"))
    sums.join(life, "i")
      .withColumn("dmean", expr("s div n - ls div ln"))
      .groupBy("w")
      .agg(max("n").as("n_vecs"),
        sum(col("dmean") * col("dmean")).as("d2_units"))
      .withColumn("alarm", col("d2_units") > lit(alarm))
      .orderBy("w")
  }
}
