package graft

import org.apache.spark.sql.functions._
import graft.graph.{GraphBuilder, GraphXAnalytics, PropertyGraph}
import graft.recommend.Recommend
import graft.sim.Similarity

class GraphXEnrichSpec extends SparkSpec {
  import spark.implicits._

  test("GraphX connected components find known components") {
    val g = PropertyGraph(
      Seq(("a", "X", 1), ("b", "X", 1), ("c", "X", 1), ("d", "X", 1))
        .toDF("id", "label", "dvid"),
      Seq(("a", "b", "E", 1), ("c", "d", "E", 1))
        .toDF("src", "dst", "type", "dvid")
        .withColumn("ts", lit(null).cast("timestamp"))
        .withColumn("qty", lit(null).cast("double")))
    val cc = GraphXAnalytics.connectedComponents(spark, g).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc("a") === cc("b") && cc("c") === cc("d"))
    assert(cc("a") !== cc("c"))
    assert(cc("a") === "a" && cc("c") === "c") // canonical = lowest member id
  }

  test("distributed CC leg accepts a weight-less pair graph (the d6/d9/d11 shape)") {
    // dedup/ER cluster entries hand CC bare pair frames (src, dst,
    // cos/dist) with NO qty column; toGraphX's unconditional col("qty")
    // failed ANALYSIS on exactly the runs big enough to cross the dense
    // gate (first seen at sf10 — d6/d9/d11 all down). The dense
    // union-find leg never touches qty, so both legs must accept the
    // qty-less shape AND agree.
    val pairs = Seq(("a", "b", 0.9), ("b", "c", 0.8), ("x", "y", 0.7))
      .toDF("src", "dst", "cos")
    val verts = Seq("a", "b", "c", "x", "y").toDF("id")
      .withColumn("label", lit("D")).withColumn("dvid", lit(1))
    val g = PropertyGraph(verts, pairs)
    val dense = GraphXAnalytics.connectedComponents(spark, g).collect()
      .map(r => r.getString(0) -> r.getString(1)).toSet
    val dist = GraphXAnalytics.connectedComponents(spark, g, seqMaxEdges = 0L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toSet
    assert(dense === dist)
    assert(dense.toMap.apply("c") === "a" && dense.toMap.apply("y") === "x")
  }

  test("distributed CC contraction leg matches union-find on a multi-wave graph") {
    // a 60-node path floods its min label one hop per round, so the
    // 3-round first phase CANNOT converge and the contraction + quotient
    // fixpoint leg must run; the separate triangle converges in phase 1
    // and exercises the labels-absent-from-the-quotient compose branch
    val pathEdges = (0 until 59).map(i => (s"p%02d".format(i), "p%02d".format(i + 1), 1.0))
    val triEdges = Seq(("ta", "tb", 1.0), ("tb", "tc", 1.0), ("tc", "ta", 1.0))
    val pairs = (pathEdges ++ triEdges).toDF("src", "dst", "cos")
    val verts = ((0 until 60).map(i => "p%02d".format(i)) ++ Seq("ta", "tb", "tc"))
      .toDF("id").withColumn("label", lit("D")).withColumn("dvid", lit(1))
    val g = PropertyGraph(verts, pairs)
    val dense = GraphXAnalytics.connectedComponents(spark, g).collect()
      .map(r => r.getString(0) -> r.getString(1)).toSet
    val dist = GraphXAnalytics.connectedComponents(spark, g, seqMaxEdges = 0L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toSet
    assert(dense === dist)
    val m = dense.toMap
    assert(m("p59") === "p00" && m("tc") === "ta")
  }

  test("union-find fast path matches the GraphX path exactly") {
    val g = GraphBuilder.fromTpch(spark, sfDir)
    val seq = GraphXAnalytics.connectedComponents(spark, g).collect()
      .map(r => r.getString(0) -> r.getString(1)).toSet
    val gx = GraphXAnalytics.connectedComponents(spark, g, seqMaxEdges = 0L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toSet
    assert(seq === gx)
  }

  test("PageRank dense-array fast path matches the GraphX path at round-6") {
    val g = GraphBuilder.fromTpch(spark, sfDir)
    val seq = GraphXAnalytics.pageRank(spark, g, iters = 5).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val gx = GraphXAnalytics.pageRank(spark, g, iters = 5, seqMaxEdges = 0L)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(seq.keySet === gx.keySet)
    // identical recurrence, different float-sum order — rounded ranks agree
    val diff = seq.count { case (k, v) => math.abs(v - gx(k)) > 1e-9 }
    assert(diff === 0, s"$diff of ${seq.size} rounded ranks diverge")
  }

  test("triangle-count driver kernel matches the GraphX path exactly") {
    import org.apache.spark.sql.functions.col
    val edges = graft.sim.KnnCache.topk(spark, sfDir, 5).select("src", "dst")
    def asSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id").cast("string"), col("triangles"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    val seq = asSet(GraphXAnalytics.triangles(spark, edges))
    val gx = asSet(GraphXAnalytics.triangles(spark, edges, seqMaxEdges = 0L))
    assert(seq === gx)
    assert(seq.exists(_._2 > 0L), "no triangles at all — parity is vacuous")
  }

  test("landmark-BFS driver kernel matches the Pregel path exactly") {
    val g = GraphBuilder.fromTpch(spark, sfDir)
    val seq = GraphXAnalytics.shortestPaths(spark, g, "loc_", rounds = 8)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val gx = GraphXAnalytics.shortestPaths(spark, g, "loc_", rounds = 8,
        seqMaxEdges = 0L)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(seq === gx)
  }

  test("landmark-BFS invariants: hubs at dist 0, neighbors within 1 hop of each other") {
    val g = GraphBuilder.fromTpch(spark, sfDir)
    val df = GraphXAnalytics.shortestPaths(spark, g, "loc_", rounds = 8).cache()
    import org.apache.spark.sql.functions._
    // every hub is a loc_ node at distance 0 of itself
    assert(df.filter(col("id").startsWith("loc_"))
      .filter(col("dist") =!= 0 || col("hub") =!= col("id")).count() === 0)
    assert(df.filter(!col("hub").startsWith("loc_")).count() === 0)
    // triangle inequality across every edge: dists differ by ≤ 1
    val d1 = df.select(col("id").as("src"), col("dist").as("ds"))
    val d2 = df.select(col("id").as("dst"), col("dist").as("dd"))
    val viol = g.edges.select("src", "dst").join(d1, "src").join(d2, "dst")
      .filter(abs(col("ds") - col("dd")) > 1).count()
    assert(viol === 0)
  }

  test("GraphX degrees agree with the DataFrame A2 operator") {
    val g = GraphBuilder.fromTpch(spark, sfDir)
    val gx = GraphXAnalytics.degrees(spark, g)
    val df = graft.graph.DegreeFeatures.degrees(g.edges)
    val diff = gx.join(df.withColumnRenamed("degree", "df_degree"), "id")
      .filter($"degree" =!= $"df_degree").count()
    assert(diff === 0)
    assert(gx.count() === df.count())
  }

  test("GraphX PageRank: popular products rank above obscure ones") {
    val g = GraphBuilder.fromTpch(spark, sfDir)
    val pr = GraphXAnalytics.pageRank(spark, g, iters = 5).cache()
    assert(pr.count() > 0)
    // a node's rank is positive and the distribution is non-degenerate
    assert(pr.filter($"rank" <= 0).count() === 0)
    assert(pr.select("rank").distinct().count() > 10)
  }

  test("enrichment joins catalog attrs and formats messages") {
    val recs = Recommend.topK(spark, sfDir, "diverse",
      pmod(col("c_custkey"), lit(50)) === 1, queryMonth = 12, topN = 3)
    val enriched = Recommend.enrich(spark, sfDir, recs, queryMonth = 12).cache()
    assert(enriched.count() === recs.count())
    assert(enriched.filter($"final_price" > $"p_retailprice").count() === 0)
    val msg = enriched.select("message").head().getString(0)
    assert(msg.contains("for customer") && msg.contains("% off"))
  }

  test("MLlib LSH join finds the high-cosine pairs the exact join finds") {
    val e = graft.core.Tables.embeddings(spark, sfDir)
    val exact = e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id")
      .withColumn("cos", Similarity.cosine($"a.embedding", $"b.embedding"))
      .filter($"cos" >= 0.4)
      .select($"a.vec_id".as("src"), $"b.vec_id".as("dst"))
    val approx = Similarity.mllibLshJoin(e, "vec_id", "embedding",
        minCosine = 0.4, numTables = 6)
      .filter($"src" < $"dst").select("src", "dst")
    val nExact = exact.count()
    val found = exact.join(approx, Seq("src", "dst"), "inner").count()
    // LSH is approximate: expect decent recall, no false positives beyond
    // threshold artifacts
    assert(nExact === 0 || found.toDouble / nExact > 0.5,
      s"LSH recall too low: $found/$nExact")
  }

  test("personalized PageRank: dense and shuffle paths agree; mass conserved") {
    // small undirected star + chain: both directions materialized, as
    // the contract requires
    val und = Seq(("s", "a"), ("s", "b"), ("a", "b"), ("b", "c"))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val dense = GraphXAnalytics.personalizedPageRank(spark, edges, "s", iters = 5)
      .select($"id", round($"rank", 6).as("rank"))
      .as[(String, Double)].collect().toMap
    val shuffled = GraphXAnalytics.personalizedPageRank(spark, edges, "s",
        iters = 5, seqMaxEdges = 0L)
      .select($"id", round($"rank", 6).as("rank"))
      .as[(String, Double)].collect().toMap
    assert(dense.keySet === Set("s", "a", "b", "c"))
    assert(dense === shuffled)
    // restart mass: the walk redistributes but never creates/destroys it
    assert(math.abs(dense.values.sum - 1.0) < 1e-5)
    // restart favors the seed over its same-degree peer 'a'; the
    // degree-1 vertex two hops out holds the least mass (hub 'b' may
    // legitimately out-rank the seed — mass flows through it)
    assert(dense("s") > dense("a"))
    assert(dense.values.min === dense("c"))
  }
}
