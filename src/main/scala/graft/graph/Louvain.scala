package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ColFns

/** Distributed Louvain-style community detection (SURVEY §2.10 G2;
  * reference: python-louvain best_partition on the similarity graph,
  * Louvain_community_algorithm.py:56-60).
  *
  * Semantics contract (SURVEY §7.4 trap 1): sequential Louvain's exact
  * partition is not reproducible distributed; we guarantee instead
  * (a) determinism under a fixed seed — moves use hash-staggering, not
  * rand(); (b) modularity that is measurably positive and comparable to
  * the reference's partitions (asserted in tests); (c) stable output
  * schema (id, community).
  *
  * Shape: synchronous modularity-gain local moves, iterated. Each
  * iteration is two joins + two aggregations over the edge list — all
  * shuffle-partitioned by node/community key, nothing global. At 100 TB
  * the edge table shuffles by `src` once per iteration; community sums
  * are a groupBy of |V| rows. Hash-staggering (only ~60% of nodes may
  * move per iteration) prevents the synchronous-oscillation pathology
  * without any sequential dependency.
  */
object Louvain {

  /** @param edges undirected weighted edges (src, dst, weight), each
    *              pair once; self-loops ignored.
    * @return (id, community) — community keyed by its lowest member id.
    */
  def detect(spark: SparkSession, edges: DataFrame, maxIter: Int = 10,
             resolution: Double = 1.0, seed: Long = 42L): DataFrame = {
    // symmetric adjacency
    val adj = edges.filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), col("weight"))
      .unionAll(edges.filter(col("src") =!= col("dst"))
        .select(col("dst").as("src"), col("src").as("dst"), col("weight")))
      .cache()

    val m2 = adj.agg(sum("weight")).head().getDouble(0) // = 2m
    val ki = adj.groupBy("src").agg(sum("weight").as("k")).cache()

    var comm = ki.select(col("src").as("id"), col("src").as("community"))
    var bestComm = comm
    var bestQ = Double.MinValue
    var iter = 0
    var moved = 1L
    while (iter < maxIter && moved > 0) {
      val commB = comm
      // Σ_tot per community (sum of member weighted degrees)
      val sigma = commB.join(ki, commB("id") === ki("src"))
        .groupBy("community").agg(sum("k").as("sigma_tot"))
      // weights from each node to each neighboring community
      val nbrComm = adj
        .join(commB.withColumnRenamed("id", "dst")
          .withColumnRenamed("community", "nbr_comm"), "dst")
        .groupBy(col("src"), col("nbr_comm")).agg(sum("weight").as("w_ic"))
      // candidate communities = neighbor communities ∪ own
      val own = commB.select(col("id").as("src"), col("community").as("nbr_comm"))
        .withColumn("w_ic", lit(0.0))
      val cands = nbrComm.unionByName(own)
        .groupBy("src", "nbr_comm").agg(max("w_ic").as("w_ic"))
        .join(commB.withColumnRenamed("id", "src"), "src")
        .join(ki, "src")
        .join(sigma.withColumnRenamed("community", "nbr_comm"), "nbr_comm")
      // gain = w_ic − res · k_i · Σ_tot\{i} / (2m); Σ excludes i when
      // evaluating its own community (standard Louvain bookkeeping)
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
      // best partition seen and return that. Computed against the CACHED
      // adjacency: rebuilding from `edges` would re-execute the caller's
      // upstream plan (e.g. a 4M-pair KNN join) once per iteration.
      val q = modularityFromAdj(adj, ki, m2, comm, resolution)
      if (q > bestQ) { bestQ = q; bestComm = comm }
      iter += 1
    }
    // canonical community label: lowest member id
    val canon = bestComm.groupBy("community").agg(min("id").as("canon"))
    bestComm.join(canon, "community")
      .select(col("id"), col("canon").as("community"))
  }

  /** Modularity Q of a partition over the same edge input (quality gate
    * used by tests; reference-class partitions score Q > 0.3 on the
    * similarity graphs this runs on). */
  def modularity(spark: SparkSession, edges: DataFrame, communities: DataFrame,
                 resolution: Double = 1.0): Double = {
    val adj = edges.filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), col("weight"))
      .unionAll(edges.filter(col("src") =!= col("dst"))
        .select(col("dst").as("src"), col("src").as("dst"), col("weight")))
    val m2 = adj.agg(sum("weight")).head().getDouble(0)
    val ki = adj.groupBy("src").agg(sum("weight").as("k"))
    modularityFromAdj(adj, ki, m2, communities, resolution)
  }

  private def modularityFromAdj(adj: DataFrame, ki: DataFrame, m2: Double,
                                communities: DataFrame, resolution: Double): Double = {
    val withComm = adj
      .join(communities.withColumnRenamed("id", "src")
        .withColumnRenamed("community", "src_comm"), "src")
      .join(communities.withColumnRenamed("id", "dst")
        .withColumnRenamed("community", "dst_comm"), "dst")
    val intra = withComm.filter(col("src_comm") === col("dst_comm"))
      .agg(coalesce(sum("weight"), lit(0.0))).head().getDouble(0)
    val sigma = communities.withColumnRenamed("id", "src").join(ki, "src")
      .groupBy("community").agg(sum("k").as("s"))
    val sumSq = sigma.agg(sum(col("s") * col("s"))).head().getDouble(0)
    intra / m2 - resolution * sumSq / (m2 * m2)
  }
}
