package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate clustering: connected components over the verified
  * near-dup pair graph, keeping the minimum doc_id as each cluster's
  * representative — the finisher that turns pairwise similarity into a
  * keep/drop decision per document.
  *
  * Algorithm: iterative min-label propagation (each vertex takes the
  * minimum label among itself and its neighbors until fixpoint) — the
  * standard Pregel-style CC. The driver loop only inspects a converged
  * *count* per iteration; all data movement is joins/groupBys, and the
  * iteration count is the graph diameter (near-dup clusters are tiny, so
  * 2-4 rounds in practice). At 100 TB the same loop runs with
  * checkpointing every few rounds to cut lineage.
  */
object Clusters {

  /** pairs(doc_a, doc_b) → (doc_id, cluster_rep) for every doc appearing
    * in at least one pair.
    *
    * REQUIRES numeric ids (castable to BIGINT): under ANSI mode the
    * entry cast fails LOUDLY on non-numeric or overflowing ids, and the
    * distributed loop's convergence detector additionally verifies
    * castability per iteration — it can never silently mis-converge.
    * Callers with string ids should key their graph on a 64/128-bit
    * numeric digest first (the same move as `dedup.Collapse`'s digest
    * keys).
    *
    * Size-gated like `ScaleTechniques.sortedOutput`: the verified
    * near-dup REP graph is orders of magnitude smaller than the corpus
    * (it holds only duplicate-cluster edges), so up to `localThreshold`
    * edges the components run as driver-local union-find — two Spark
    * jobs total (materialize + collect) instead of two PER ITERATION,
    * which is what dominates small-diameter graphs. Past the gate, the
    * distributed label-propagation loop (the 100 TB path) takes over. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
                          localThreshold: Long = 1000000L): DataFrame = {
    val longPairs = graft.plans.ScaleTechniques.iterCheckpoint(
      pairs.selectExpr("cast(doc_a as long) doc_a",
        "cast(doc_b as long) doc_b"))
    if (longPairs.count() <= localThreshold) return localCC(longPairs)
    val edges = longPairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(longPairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("doc_id"))
      .distinct()
      .withColumn("comp", col("doc_id"))
      .cache()
    // convergence detector: every step assigns comp' = least(comp, min
    // neighbor comp) <= comp, so labels are MONOTONE NON-INCREASING and
    // the label total strictly decreases iff any vertex changed — one
    // cheap aggregate over the just-checkpointed frame replaces a
    // next-vs-previous join + count per iteration (fewer driver barriers,
    // the cost that dominates small-diameter graphs). DECIMAL(38) sum:
    // a long sum can overflow at warehouse-scale id × vertex counts.
    // The sum is null in exactly three cases — empty frame (fine: ZERO),
    // non-numeric ids whose cast nulls out, or decimal overflow — and the
    // latter two MUST fail loudly: mapping them to ZERO would declare
    // convergence after one hop and return partially-propagated labels.
    def labelTotal(df: DataFrame): java.math.BigDecimal = {
      val casted = col("comp").cast("decimal(38,0)")
      val r = df.agg(sum(casted), count(lit(1)), count(casted)).head()
      val (t, n, c) = (r.getDecimal(0), r.getLong(1), r.getLong(2))
      require(n == c,
        s"connectedComponents needs numeric ids ($c of $n rows castable)")
      require(t != null || n == 0,
        "label-sum overflow: id totals exceed decimal(38,0)")
      if (t == null) java.math.BigDecimal.ZERO else t
    }
    var total = labelTotal(labels)
    var iter = 0
    var converged = false
    // generation-bounded checkpointing: each round's reclaim of the
    // superseded generation happens as soon as the next materializes
    val chain = new graft.plans.ScaleTechniques.CheckpointChain
    while (iter < maxIter && !converged) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "src"), "src")
        .groupBy(col("dst").as("doc_id"))
        .agg(min("comp").as("n_comp"))
      // localCheckpoint breaks the lineage each round: without it the
      // logical plan nests one level per iteration and blows up planning
      // (an O(2^iters) plan tree — the iterative-algorithm trap)
      val next = chain.next(
        labels.join(neighborMin, Seq("doc_id"), "left")
          .select(col("doc_id"),
            least(col("comp"), coalesce(col("n_comp"), col("comp"))).as("comp")))
      val nextTotal = labelTotal(next)
      // release the superseded generation: the iteration-0 `.cache()` is
      // dropped from the SQL cache here (it was never unpersisted before —
      // one leaked cached DF per invocation); later generations are
      // localCheckpoints whose blocks the ContextCleaner reclaims once the
      // rebind drops the last reference
      labels.unpersist()
      labels = next
      converged = nextTotal.compareTo(total) == 0
      total = nextTotal
      iter += 1
    }
    edges.unpersist()
    labels.unpersist() // no-op unless the loop never ran (maxIter == 0)
    // NO presentation sort here: every caller (q33's repClusters, the
    // semantic-dedup label resolutions) JOINS this frame and applies its
    // own final size-gated sort — an internal sortedOutput paid an extra
    // checkpoint + count + sort per query for row order the next join
    // immediately destroyed. The labels frame is already materialized
    // (localCheckpoint) by the final iteration.
    labels.select(col("doc_id"), col("comp").as("cluster_rep"))
  }

  /** Driver-local union-find over a small (gated) edge list: one pass
    * builds min-rooted trees with path compression, so every component
    * is labeled by its MINIMUM member id — exactly the distributed
    * loop's fixpoint. */
  private def localCC(longPairs: DataFrame): DataFrame = {
    val spark = longPairs.sparkSession
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    longPairs.collect().foreach { row =>
      require(!row.isNullAt(0) && !row.isNullAt(1),
        "connectedComponents: null id in the pair graph")
      val (a, b) = (row.getLong(0), row.getLong(1))
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra
      else if (rb < ra) parent(ra) = rb
    }
    import spark.implicits._
    // materialize the key set BEFORE labeling: find() path-compresses the
    // same map, and iterating a collection while mutating it (even
    // value-only updates) is undocumented HashMap behavior
    val keys = parent.keys.toArray
    keys.map(k => (k, find(k))).toSeq.toDF("doc_id", "cluster_rep")
  }

  /** q33: clusters over the MinHash-LSH verified near-dup graph. The
    * oracle recomputes the same graph exactly (all-pairs shingle Jaccard
    * ≥ 0.8) and resolves components with a recursive CTE.
    *
    * CC runs over the COLLAPSED representative graph, members attached
    * afterwards: the expanded member graph carries C(B,2) intra edges per
    * B-copy duplicate group (quadratic in the copy count — 10× soak:
    * 18.7 s), while the rep graph is linear in distinct texts. The two
    * give IDENTICAL clusters: each group's representative is its minimum
    * doc_id, so every component's minimum over members equals its minimum
    * over representatives; a multi-member group with no cross edges is
    * its own cluster labeled by its rep. Spec-asserted equal to
    * member-level CC on a planted duplicate-heavy corpus. */
  def q33DedupClusters(spark: SparkSession, dir: String): DataFrame =
    repClusters(
      MinHashLSH.signatures(spark, dir),       // memoized + persisted
      MinHashLSH.nearDups(spark, dir))         // memoized + materialized

  /** The collapse/attach body of q33, factored so specs can drive planted
    * in-memory corpora through the SAME path the query uses. */
  private[graft] def repClusters(sigs: DataFrame, pairs: DataFrame): DataFrame = {
    val groups = Collapse.groups(
      sigs.filter(size(col("sh")) > 0).select(col("txt_md5"), col("doc_id")),
      Seq(col("txt_md5")), col("doc_id"))
    val memRep = groups.select(explode(col("members")).as("doc_id"),
      col("rep"), size(col("members")).as("gsize"))
    // rep-level cross edges: both endpoints are representatives (intra
    // pairs never qualify — a group has one rep, so they drop out here)
    val repSet = groups.select(col("rep"))
    val repPairs = pairs
      .join(repSet.withColumnRenamed("rep", "doc_a"), "doc_a")
      .join(repSet.withColumnRenamed("rep", "doc_b"), "doc_b")
      .select("doc_a", "doc_b")
    val repCC = connectedComponents(repPairs)
      .withColumnRenamed("doc_id", "rep").withColumnRenamed("cluster_rep", "comp")
    // member label: its rep's component; a ≥2-member group whose rep has
    // no cross edges is a cluster of its own under the rep's id
    val labels = memRep.join(repCC, Seq("rep"), "left")
      .filter(col("comp").isNotNull || col("gsize") >= 2)
      .select(col("doc_id"), coalesce(col("comp"), col("rep")).as("cluster_rep"))
    graft.plans.ScaleTechniques.sortedOutput(labels, Seq("doc_id"))
  }
}
