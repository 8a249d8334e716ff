package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Process-local materialized view of the embeddings KNN graph: the
  * exact brute-force top-k is a deterministic pure function of
  * (sfDir, k), and three catalog operators (J7, A10, G2's similarity
  * graph) consume it — materialize once per session and share.
  * The 100 TB analogue is a persisted similarity-edges table refreshed
  * per injection fold (which FeatureFold writes); this cache is the
  * in-session equivalent.
  */
object KnnCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), DataFrame]()

  def topk(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    cache.computeIfAbsent((dir, k), _ => {
      val e = graft.core.Tables.embeddings(spark, dir)
      // blocked kernel: bit-identical to bruteForceTopK (asserted in
      // SimilaritySpec) without the n² pair shuffle
      Similarity.bruteForceTopKBlocked(e, e, "vec_id", "embedding", k)
        .localCheckpoint(true)
    })

  private val pairCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Double), DataFrame]()

  /** The near-dup pair table (threshold cosine self-join), shared by the
    * pair-report operator (D5) and the cluster-resolution operator (D6). */
  def neardupPairs(spark: SparkSession, dir: String, minCos: Double): DataFrame =
    pairCache.computeIfAbsent((dir, minCos), _ => {
      val e = graft.core.Tables.embeddings(spark, dir)
      Similarity.thresholdJoinBlocked(e, "vec_id", "embedding", minCos)
        .localCheckpoint(true)
    })
}
