package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-3 catalog additions (beyond
  * CatalogSpec's smoke checks and the DuckDB hash gate): the cap,
  * fallback, policy, and scaling operators behave as SURVEY §2 specifies
  * on any input, not just the one the oracle replays. */
class CatalogGuardsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("r2_candidate_cap: bounded, deterministic subset of valid products") {
    val cap = run("r2_candidate_cap").cache()
    assert(cap.count() <= 1500)
    val valid = graft.recommend.Recommend
      .validProducts(graft.core.Tables.part(spark, sfDir))
      .select(col("p_partkey").as("product"))
    assert(cap.join(valid, Seq("product"), "left_anti").count() === 0)
    // hash-seeded, so a rerun picks the identical set
    assert(run("r2_candidate_cap").exceptAll(cap).count() === 0)
  }

  test("j9_feature_injection: inactive customers get the fallback constants") {
    val f = run("j9_feature_injection").cache()
    val inactive = f.filter(col("degree") === -1L)
    assert(inactive.filter(col("recency_days") =!= 999L).count() === 0)
    // active customers carry real aggregates
    assert(f.filter(col("degree") > 0).count() > 0)
  }

  test("m6_compat_probe: alert agrees with the 0.02 drop policy") {
    val row = run("m6_compat_probe").head()
    val drop = row.getAs[Double]("auc_drop")
    val alert = row.getAs[Long]("alert")
    assert((drop > 0.02) === (alert == 1L))
    assert(row.getAs[Double]("prev_auc") >= 0.0 && row.getAs[Double]("prev_auc") <= 1.0)
  }

  test("m8_tower_scaling: scaled features are standardized") {
    val z = run("m8_tower_scaling")
    val stats = z.agg(avg("z_orders").as("m"), stddev_samp("z_qty").as("s")).head()
    assert(math.abs(stats.getAs[Double]("m")) < 1e-3)
    assert(math.abs(stats.getAs[Double]("s") - 1.0) < 1e-3)
  }

  test("s8_history_roundtrip: two epochs, second shifted by +1.0") {
    val h = run("s8_history_roundtrip").cache()
    val byEpoch = h.groupBy("epoch").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byEpoch.keySet === Set(0L, 1L))
    val joined = h.filter(col("epoch") === 0).as("a")
      .join(h.filter(col("epoch") === 1).as("b"), Seq("metric"))
      .select((col("b.value") - col("a.value")).as("d")).collect()
    assert(joined.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }

  test("f10_dot_product: cosine bounded, dot consistent with self-norm") {
    import graft.sim.Similarity
    val e = graft.core.Tables.embeddings(spark, sfDir).limit(50)
    val self = e.select(
      Similarity.dot(col("embedding"), col("embedding")).as("d"),
      Similarity.norm(col("embedding")).as("n")).collect()
    self.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1) * r.getDouble(1)) < 1e-6) }
    val cosBad = run("f10_dot_product")
      .filter(col("cos") < -1.000001 || col("cos") > 1.000001).count()
    assert(cosBad === 0)
  }

  test("sql surface: spark.sql over registered views equals the Column API") {
    graft.core.Views.register(spark, sfDir)
    val sql = spark.sql(
      "SELECT count(*) AS n FROM graph_edges WHERE type = 'PURCHASED'").head().getLong(0)
    val api = graft.graph.GraphBuilder.fromTpch(spark, sfDir)
      .edges.filter(col("type") === "PURCHASED").count()
    assert(sql === api)
    assert(run("sql_revenue_rollup").count() > 0)
  }

  test("d6_dedup_clusters: near-dup pairs share a canonical; canonical is a member") {
    val clusters = run("d6_dedup_clusters").cache()
    val pairs = graft.sim.KnnCache.neardupPairs(spark, sfDir, 0.4)
    val a = clusters.select(col("vec_id").as("src"), col("canonical").as("ca"))
    val b = clusters.select(col("vec_id").as("dst"), col("canonical").as("cb"))
    // both ends of every detected pair resolve to the same canonical doc
    assert(pairs.join(a, "src").join(b, "dst")
      .filter(col("ca") =!= col("cb")).count() === 0)
    // the canonical id is itself a member of the corpus and is kept
    val canon = clusters.select(col("canonical").as("cid")).distinct()
    val kept = clusters.filter(col("kept") === 1)
      .select(col("vec_id").cast("string").as("cid"))
    assert(canon.join(kept, Seq("cid"), "left_anti").count() === 0)
    // exactly one kept doc per cluster
    assert(clusters.groupBy("canonical").agg(sum("kept").as("k"))
      .filter(col("k") =!= 1).count() === 0)
  }

  test("a16_approx_sketches: estimates sit within documented error bounds") {
    val row = run("a16_approx_sketches").head()
    val li = graft.core.Tables.lineitem(spark, sfDir)
    val exact = li.agg(
      countDistinct(col("l_partkey")).as("p"),
      countDistinct(col("l_orderkey")).as("o"),
      min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi")).head()
    // HLL++ default rsd = 0.05; allow 3× margin for small inputs
    def relErr(est: Long, act: Long) = math.abs(est - act).toDouble / act
    assert(relErr(row.getAs[Long]("nd_parts"), exact.getAs[Long]("p")) < 0.15)
    assert(relErr(row.getAs[Long]("nd_orders"), exact.getAs[Long]("o")) < 0.15)
    val (p50, p95) = (row.getAs[Double]("p50_price"), row.getAs[Double]("p95_price"))
    assert(p50 <= p95)
    assert(p50 >= exact.getAs[Double]("lo") && p95 <= exact.getAs[Double]("hi"))
  }

  test("f12_f14_guards: clip bounds hold and forced NaNs are scrubbed") {
    val g = run("f12_f14_guards").cache()
    assert(g.filter(col("discount_clipped") < 0.02 || col("discount_clipped") > 0.08)
      .count() === 0)
    val forced = g.filter(pmod(col("l_orderkey") + col("l_linenumber"), lit(7)) === 0)
    assert(forced.count() > 0)
    assert(forced.filter(col("unit_price") =!= 0.0).count() === 0)
    assert(g.filter(col("flag_filled") === "N").count() === 0)
  }
}
