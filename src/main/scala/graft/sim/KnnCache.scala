package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Process-local materialized view of the embeddings KNN graph: the
  * exact brute-force top-k is a deterministic pure function of
  * (sfDir, k, ranking), and four catalog operators (J7, A10, G2's
  * similarity graph, sim_recall's ground truth) consume it —
  * materialize once per (app, inputs) and share.
  * The 100 TB analogue is a persisted similarity-edges table refreshed
  * per injection fold (which FeatureFold writes); this cache is the
  * in-session equivalent. applicationId keys every entry because the
  * values are localCheckpoint-backed — a fresh context in the same JVM
  * must never see a dead context's blocks.
  */
object KnnCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int, Boolean), DataFrame]()

  def topk(spark: SparkSession, dir: String, k: Int = 5,
           rankRounded: Boolean = false): DataFrame =
    graft.core.AppCache.get(cache,
      (spark.sparkContext.applicationId, dir, k, rankRounded)) {
        val e = graft.core.Tables.embeddings(spark, dir)
        // blocked kernel: bit-identical to bruteForceTopK (asserted in
        // SimilaritySpec) without the n² pair shuffle
        Similarity.bruteForceTopKBlocked(e, e, "vec_id", "embedding", k,
            rankRounded = rankRounded)
          .localCheckpoint(true)
      }

  private val pairCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Double), DataFrame]()

  /** The near-dup pair table (threshold cosine self-join), shared by the
    * pair-report operator (D5) and the cluster-resolution operator (D6). */
  def neardupPairs(spark: SparkSession, dir: String, minCos: Double): DataFrame =
    graft.core.AppCache.get(pairCache,
      (spark.sparkContext.applicationId, dir, minCos)) {
        val e = graft.core.Tables.embeddings(spark, dir)
        Similarity.thresholdJoinBlocked(e, "vec_id", "embedding", minCos)
          .localCheckpoint(true)
      }
}
