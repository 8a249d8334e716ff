package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ColFns

/** Distributed multi-level Louvain community detection (SURVEY §2.10 G2;
  * reference: python-louvain best_partition on the similarity graph,
  * Louvain_community_algorithm.py:56-60).
  *
  * Semantics contract (SURVEY §7.4 trap 1): sequential Louvain's exact
  * partition is not reproducible distributed; we guarantee instead
  * (a) determinism under a fixed seed — moves use hash-staggering, not
  * rand(); (b) modularity that is measurably positive and non-decreasing
  * across levels by construction (best-composed-partition tracking);
  * (c) stable output schema (id, community).
  *
  * Structure: the classic two phases, both distributed —
  *  1. synchronous modularity-gain local moves (two joins + two
  *     aggregations per iteration, shuffles keyed by node/community);
  *  2. graph contraction: communities become supernodes, intra-community
  *     weight becomes self-loops (which move with the node, so they
  *     cancel out of move comparisons and enter only through degrees),
  *     and local moves repeat on the coarsened graph.
  * Hash-staggering (a fresh pseudo-random half of nodes may move each
  * iteration) prevents the synchronous-swap oscillation pathology
  * without any sequential dependency.
  *
  * Within a run the returned partition is the best composed one seen;
  * across different maxIter caps results need not be monotone (a
  * higher-Q level-0 partition can contract to a worse coarse graph —
  * greedy path dependence, inherent to Louvain, observed at maxIter=2
  * on the two-clique fixture). At the default maxIter both phases
  * converge before the cap.
  */
object Louvain {

  /** @param edges undirected weighted edges (src, dst, weight), each
    *              pair once; self-loops allowed (intra-weight).
    * @return (id, community) — community keyed by its lowest member id.
    */
  def detect(spark: SparkSession, edges: DataFrame, maxIter: Int = 10,
             resolution: Double = 1.0, seed: Long = 42L,
             levels: Int = 2): DataFrame = {
    var mapping: DataFrame = null // original id -> current community
    var bestMapping: DataFrame = null
    var bestQ = Double.MinValue
    var cur = edges
    var level = 0
    var continue = true
    while (level < levels && continue) {
      val comm = localMoves(spark, cur, maxIter, resolution, seed + 1000L * level)
      mapping =
        if (mapping == null) comm
        else mapping.withColumnRenamed("community", "prev")
          .join(comm.withColumnRenamed("id", "prev")
            .withColumnRenamed("community", "next"), "prev")
          .select(col("id"), col("next").as("community"))
          .localCheckpoint(true)
      val q = modularity(spark, edges, mapping, resolution)
      if (sys.env.contains("GRAFT_LOUVAIN_DEBUG"))
        println(f"[louvain] level=$level composedQ=$q%.4f bestQ=$bestQ%.4f")
      if (q > bestQ + 1e-12) { bestQ = q; bestMapping = mapping }
      else if (level > 0) continue = false // coarsening stopped helping
      // phase 2: contract to the community graph (canonical orientation,
      // intra-community weight as self-loops)
      cur = cur
        .join(comm.withColumnRenamed("id", "src")
          .withColumnRenamed("community", "sc"), "src")
        .join(comm.withColumnRenamed("id", "dst")
          .withColumnRenamed("community", "dc"), "dst")
        .select(least(col("sc"), col("dc")).as("src"),
          greatest(col("sc"), col("dc")).as("dst"), col("weight"))
        .groupBy("src", "dst").agg(sum("weight").as("weight"))
        .localCheckpoint(true)
      level += 1
    }
    val canon = bestMapping.groupBy("community").agg(min("id").as("canon"))
    bestMapping.join(canon, "community")
      .select(col("id"), col("canon").as("community"))
  }

  /** Phase 1: synchronous local moves on one graph level. Returns
    * (id, community) over this level's node ids. */
  private def localMoves(spark: SparkSession, edges: DataFrame, maxIter: Int,
                         resolution: Double, seed: Long): DataFrame = {
    val nonSelf = edges.filter(col("src") =!= col("dst"))
    val selfLoops = edges.filter(col("src") === col("dst"))
      .groupBy(col("src").as("id")).agg(sum("weight").as("self_w"))
    // symmetric adjacency over non-self edges
    val adj = nonSelf.select(col("src"), col("dst"), col("weight"))
      .unionAll(nonSelf.select(col("dst").as("src"), col("src").as("dst"), col("weight")))
      .localCheckpoint(true)

    // degrees include 2× self-loop weight (the contracted node's internal
    // edges); m2 likewise
    val kiBase = adj.groupBy("src").agg(sum("weight").as("k0"))
    val allIds = kiBase.select(col("src"))
      .unionAll(selfLoops.select(col("id").as("src"))).distinct()
    val ki = allIds
      .join(kiBase, Seq("src"), "left")
      .join(selfLoops.withColumnRenamed("id", "src"), Seq("src"), "left")
      .select(col("src"),
        (coalesce(col("k0"), lit(0.0)) + lit(2.0) * coalesce(col("self_w"), lit(0.0)))
          .as("k"))
      .localCheckpoint(true)
    val m2 = ki.agg(sum("k")).head().getDouble(0)

    var comm = ki.select(col("src").as("id"), col("src").as("community"))
    var bestComm = comm
    var bestQ = Double.MinValue
    var iter = 0
    var moved = 1L
    while (iter < maxIter && moved > 0) {
      val commB = comm
      val sigma = commB.join(ki, commB("id") === ki("src"))
        .groupBy("community").agg(sum("k").as("sigma_tot"))
      val nbrComm = adj
        .join(commB.withColumnRenamed("id", "dst")
          .withColumnRenamed("community", "nbr_comm"), "dst")
        .groupBy(col("src"), col("nbr_comm")).agg(sum("weight").as("w_ic"))
      val own = commB.select(col("id").as("src"), col("community").as("nbr_comm"))
        .withColumn("w_ic", lit(0.0))
      val cands = nbrComm.unionByName(own)
        .groupBy("src", "nbr_comm").agg(max("w_ic").as("w_ic"))
        .join(commB.withColumnRenamed("id", "src"), "src")
        .join(ki, "src")
        .join(sigma.withColumnRenamed("community", "nbr_comm"), "nbr_comm")
      // gain = w_ic − res · k_i · Σ_tot\{i} / (2m); Σ excludes i when
      // evaluating its own community (standard Louvain bookkeeping).
      // Self-loop weight moves with the node and cancels across options.
      val sigmaAdj = when(col("nbr_comm") === col("community"),
        col("sigma_tot") - col("k")).otherwise(col("sigma_tot"))
      val scored = cands.withColumn("gain",
        col("w_ic") - lit(resolution) * col("k") * sigmaAdj / lit(m2))
      val w = Window.partitionBy("src")
        .orderBy(col("gain").desc, col("nbr_comm").asc)
      val best = scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("src").as("id"), col("community"),
          col("nbr_comm").as("best_comm"), col("gain"))
      // per-iteration hash stagger: each node gets an independent 50%
      // move window every iteration. A fixed parity scheme is periodic —
      // the same cohort moves every other iteration, which can lock a
      // clique into a perpetual balanced swap; fresh randomness per
      // iteration guarantees an eventually-asymmetric pattern that lets
      // the dance collapse into the stable merged state.
      val stagger = pmod(xxhash64(col("id"), lit(seed + iter)), lit(2)) === 0
      // localCheckpoint truncates the iterative lineage — without it the
      // logical plan doubles per iteration and the driver OOMs just
      // *printing* it (AQE explainString)
      val withNext = best.withColumn("new_comm",
        when(col("best_comm") =!= col("community") && stagger, col("best_comm"))
          .otherwise(col("community")))
        .localCheckpoint(true)
      // convergence = nobody *wants* to move; counting actual moves would
      // terminate spuriously whenever the hash-stagger happens to block
      // every would-be mover in one iteration
      moved = withNext.filter(col("best_comm") =!= col("community")).count()
      comm = withNext.select(col("id"), col("new_comm").as("community"))
      // synchronous moves don't guarantee monotone modularity — keep the
      // best partition seen (evaluated on THIS level's cached adjacency)
      val q = modularityFromParts(adj, selfLoops, ki, m2, comm, resolution)
      if (sys.env.contains("GRAFT_LOUVAIN_DEBUG"))
        println(f"[louvain]   iter=$iter q=$q%.4f moved=$moved")
      if (q > bestQ) { bestQ = q; bestComm = comm }
      iter += 1
    }
    bestComm
  }

  /** Modularity Q of a partition over the original edge input (quality
    * gate used by tests; self-loop-aware). */
  def modularity(spark: SparkSession, edges: DataFrame, communities: DataFrame,
                 resolution: Double = 1.0): Double = {
    val nonSelf = edges.filter(col("src") =!= col("dst"))
    val selfLoops = edges.filter(col("src") === col("dst"))
      .groupBy(col("src").as("id")).agg(sum("weight").as("self_w"))
    val adj = nonSelf.select(col("src"), col("dst"), col("weight"))
      .unionAll(nonSelf.select(col("dst").as("src"), col("src").as("dst"), col("weight")))
    val kiBase = adj.groupBy("src").agg(sum("weight").as("k0"))
    val allIds = kiBase.select(col("src"))
      .unionAll(selfLoops.select(col("id").as("src"))).distinct()
    val ki = allIds
      .join(kiBase, Seq("src"), "left")
      .join(selfLoops.withColumnRenamed("id", "src"), Seq("src"), "left")
      .select(col("src"),
        (coalesce(col("k0"), lit(0.0)) + lit(2.0) * coalesce(col("self_w"), lit(0.0)))
          .as("k"))
    val m2 = ki.agg(sum("k")).head().getDouble(0)
    modularityFromParts(adj, selfLoops, ki, m2, communities, resolution)
  }

  private def modularityFromParts(adj: DataFrame, selfLoops: DataFrame,
                                  ki: DataFrame, m2: Double,
                                  communities: DataFrame, resolution: Double): Double = {
    val withComm = adj
      .join(communities.withColumnRenamed("id", "src")
        .withColumnRenamed("community", "src_comm"), "src")
      .join(communities.withColumnRenamed("id", "dst")
        .withColumnRenamed("community", "dst_comm"), "dst")
    val intraPairs = withComm.filter(col("src_comm") === col("dst_comm"))
      .agg(coalesce(sum("weight"), lit(0.0))).head().getDouble(0)
    // self-loops are always intra; each contributes 2w to the A_ii sum
    val selfW = selfLoops.agg(coalesce(sum("self_w"), lit(0.0))).head().getDouble(0)
    val intra = intraPairs + 2.0 * selfW
    val sigma = communities.withColumnRenamed("id", "src").join(ki, "src")
      .groupBy("community").agg(sum("k").as("s"))
    val sumSq = sigma.agg(sum(col("s") * col("s"))).head().getDouble(0)
    intra / m2 - resolution * sumSq / (m2 * m2)
  }
}
