package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY §2.3 J7, §2.10 G4; plus the
  * LLM-pipeline ANN operators the 100 TB design point requires).
  *
  * Numeric contract: dot products fold left-to-right in double precision
  * (`aggregate` over `zip_with`), matching the DuckDB oracle's generated
  * left-associative 64-term sum bit-for-bit — so top-k ranking and
  * rounded similarity values are reproducible across engines.
  */
object Similarity {

  /** Exact double-precision dot product of two array columns (F10).
    * Backed by the custom codegen ArrayDotProduct expression — the
    * builtin aggregate(zip_with(·)) pipeline interprets two lambdas per
    * element and falls out of whole-stage codegen, which made brute-force
    * KNN the bench bottleneck. Summation order (left-to-right, double)
    * is identical, so results stay bitwise oracle-compatible. */
  def dot(a: Column, b: Column): Column =
    graft.plans.expressions.array_dot(a.cast("array<double>"), b.cast("array<double>"))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** DuckDB mirror of `dot` as a generated left-associative sum. */
  def dotSql(a: String, b: String, dim: Int): String =
    (1 to dim).map(i =>
      s"CAST(list_extract($a,$i) AS DOUBLE)*CAST(list_extract($b,$i) AS DOUBLE)")
      .mkString("(", " + ", ")")

  def cosineSql(a: String, b: String, dim: Int): String = {
    val d  = dotSql(a, b, dim)
    val na = s"sqrt(${dotSql(a, a, dim)})"
    val nb = s"sqrt(${dotSql(b, b, dim)})"
    s"($d / ($na * $nb))"
  }

  /** J7/G4/W1: exact brute-force cosine top-k per source vector.
    * The baseline ANN path; O(n²) cross join — correct but reserved for
    * bounded candidate sets. At 100 TB use `lshTopK` below.
    *
    * `queries` and `corpus` both carry (idCol, vecCol). Self-matches are
    * excluded. Deterministic tie-break on neighbor id.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     symmetric: Boolean = false): DataFrame = {
    // norms are computed once per vector (O(n·d)), not once per pair
    // (O(n²·d)) — the pair loop then does a single dot product
    val q = queries.select(col(idCol).as("src"), col(vecCol).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val c = corpus.select(col(idCol).as("dst"), col(vecCol).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val scored =
      if (symmetric) {
        // queries == corpus: cos(a,b) = cos(b,a), so evaluate each
        // unordered pair once (src < dst) and mirror — halves the pair
        // loop's dot products
        val half = q.join(c, col("src") < col("dst"))
          .select(col("src"), col("dst"),
            (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
        half.unionAll(half.select(col("dst").as("src"), col("src").as("dst"), col("cos")))
      } else
        q.join(c, col("src") =!= col("dst"))
          .select(col("src"), col("dst"),
            (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("src"), col("rn"), col("dst"), round(col("cos"), 6).as("cos"))
  }

  /** Deterministic pseudo-random hyperplane component for plane `j`,
    * dimension `i` — pure integer math, mirrored in SQL below. */
  private def planeComponent(j: Int, i: Int): Double =
    ((j * 73 + i * 179) % 97) / 97.0 - 0.5

  /** Sign-random-projection (SimHash-style) LSH bucket id over
    * `nPlanes` deterministic hyperplanes. Vectors agreeing on all sign
    * bits land in one bucket; the ANN join then only pairs within a
    * bucket — the 100 TB scale path (shuffle keyed by bucket, no cross
    * join). Recall is tunable via nPlanes (fewer planes → bigger
    * buckets → higher recall, more compute).
    */
  def lshBucket(vecCol: Column, dim: Int, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { j =>
      // one codegen'd dot against the constant plane vector — the naive
      // dim-term Add chain compiles to a pathological expression tree.
      // Fold order (left-to-right, double) is identical, so bucket ids
      // and the DuckDB mirror are unchanged.
      val plane = typedLit((0 until dim).map(i => planeComponent(j, i)))
      val proj = dot(vecCol, plane)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** DuckDB mirror of `lshBucket`. */
  def lshBucketSql(vec: String, dim: Int, nPlanes: Int): String = {
    val bits = (0 until nPlanes).map { j =>
      val proj = (0 until dim).map { i =>
        // string→double parse is correctly rounded in DuckDB, unlike a
        // wide DECIMAL literal converted to double
        val comp = planeComponent(j, i)
        s"CAST(list_extract($vec,${i + 1}) AS DOUBLE)*CAST('$comp' AS DOUBLE)"
      }.mkString("(", " + ", ")")
      s"(CASE WHEN $proj >= 0 THEN ${1L << j} ELSE 0 END)"
    }
    bits.mkString("(", " + ", ")")
  }

  /** ANN top-k restricted to LSH bucket collisions. Same output shape as
    * bruteForceTopK; a vector with no bucket-mates simply yields no rows
    * (approximate semantics, documented). */
  def lshTopK(vectors: DataFrame, idCol: String, vecCol: String,
              dim: Int, nPlanes: Int, k: Int): DataFrame = {
    val withBucket = vectors.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), dim, nPlanes).as("bucket"),
      norm(col(vecCol)).as("nrm"))
    val a = withBucket.select(col("id").as("src"), col("v").as("qv"),
      col("bucket"), col("nrm").as("qn"))
    val b = withBucket.select(col("id").as("dst"), col("v").as("cv"),
      col("bucket"), col("nrm").as("cn"))
    val scored = a.join(b, Seq("bucket")).filter(col("src") =!= col("dst"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("src"), col("rn"), col("dst"), round(col("cos"), 6).as("cos"))
  }

  /** IVF (inverted-file) ANN top-k — the second scale path alongside
    * LSH: a KMeans coarse quantizer assigns every vector to its nearest
    * centroid ("list"); a query probes its `nProbe` nearest lists and
    * scores only vectors inside them. Shuffle is keyed by list id, list
    * sizes are balanced by the quantizer, and the centroid table
    * (nLists × dim) broadcasts. Recall tunes via nProbe.
    *
    * Same output shape as bruteForceTopK; approximate semantics — a
    * neighbor outside the probed lists is missed (documented).
    */
  def ivfTopK(vectors: DataFrame, idCol: String, vecCol: String, k: Int,
              nLists: Int = 16, nProbe: Int = 3, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    val sp = vectors.sparkSession
    import sp.implicits._
    val base = vectors.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("fv", org.apache.spark.ml.functions.array_to_vector(
        col("v").cast("array<double>")))
    val model = new KMeans().setK(nLists).setSeed(seed)
      .setFeaturesCol("fv").setPredictionCol("list").fit(base)
    // corpus side: every vector in exactly its nearest list
    val assigned = model.transform(base)
      .select(col("id").as("dst"), col("v").as("cv"), col("list"))
      .withColumn("cn", norm(col("cv")))
    // query side: nProbe nearest centroids via a broadcast join against
    // the tiny centroid table (d² = |q|² − 2q·c + |c|²; |q|² constant per
    // query, so rank by |c|² − 2q·c)
    val cents = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray) }.toDF("list", "cvec")
    val probeW = Window.partitionBy("src").orderBy(col("rank_d").asc, col("list").asc)
    val probes = base.select(col("id").as("src"), col("v").as("qv"))
      .withColumn("qn", norm(col("qv")))
      .crossJoin(broadcast(cents))
      .withColumn("rank_d", dot(col("cvec"), col("cvec")) -
        lit(2.0) * dot(col("qv"), col("cvec")))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nProbe)
      .select("src", "qv", "qn", "list")
    val scored = probes.join(assigned, Seq("list")).filter(col("src") =!= col("dst"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("src"), col("rn"), col("dst"), round(col("cos"), 6).as("cos"))
  }

  /** MLlib-native ANN alternative (SURVEY J7's "scalable" branch):
    * BucketedRandomProjectionLSH approxSimilarityJoin over L2-normalized
    * vectors — Euclidean distance on unit vectors is monotone in cosine
    * (cos = 1 − d²/2), so the threshold translates directly. Returns
    * (src, dst, cos) pairs with cosine ≥ minCosine.
    */
  def mllibLshJoin(vectors: DataFrame, idCol: String, vecCol: String,
                   minCosine: Double, bucketLength: Double = 1.0,
                   numTables: Int = 3, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, Normalizer}
    val toVec = org.apache.spark.ml.functions.array_to_vector(
      col(vecCol).cast("array<double>"))
    val withVec = vectors.select(col(idCol).as("id"), toVec.as("raw"))
    val normed = new Normalizer().setInputCol("raw").setOutputCol("v").setP(2.0)
      .transform(withVec).select("id", "v")
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("v").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numTables).setSeed(seed)
    val model = lsh.fit(normed)
    val maxDist = math.sqrt(math.max(2.0 * (1.0 - minCosine), 0.0))
    model.approxSimilarityJoin(normed, normed, maxDist, "dist")
      .select(col("datasetA.id").as("src"), col("datasetB.id").as("dst"),
        round(lit(1.0) - col("dist") * col("dist") / 2.0, 6).as("cos"))
      .filter(col("src") =!= col("dst"))
  }

  /** A10: similarity-edge statistics per source node
    * (xgboost_training_for_big_data.py:298-318). */
  def similarityStats(simEdges: DataFrame): DataFrame =
    simEdges.groupBy("src").agg(
      round(avg("cos"), 6).as("avg_sim"),
      round(max("cos"), 6).as("max_sim"),
      round(min("cos"), 6).as("min_sim"),
      count(lit(1)).as("n_sim"))
}
