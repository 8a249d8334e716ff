package graft

import org.apache.spark.sql.functions._
import graft.graph.{DegreeFeatures, GraphBuilder, Links}

class GraphLinksSpec extends SparkSpec {
  import spark.implicits._

  lazy val g = GraphBuilder.fromTpch(spark, sfDir)

  test("graph invariants: node ids unique, edges reference known nodes") {
    val n = g.nodes.count()
    assert(g.nodes.select("id").distinct().count() === n)
    val ids = g.nodes.select("id")
    val dangling = g.edges.select($"src".as("id")).union(g.edges.select($"dst".as("id")))
      .distinct().join(ids, Seq("id"), "left_anti").count()
    assert(dangling === 0)
  }

  test("degree invariant: sum of degrees = 2 * |edges|") {
    val degSum = DegreeFeatures.degrees(g.edges).agg(sum("degree")).head().getLong(0)
    assert(degSum === 2 * g.edges.count())
  }

  test("histogram degreePercentile is bit-equal to the global percent_rank") {
    import org.apache.spark.sql.expressions.Window
    val deg = DegreeFeatures.degrees(g.edges)
    val viaHist = DegreeFeatures.degreePercentile(deg).select($"id", $"degree_pct")
    val direct = deg.withColumn("expected",
      round(percent_rank().over(Window.orderBy($"degree")), 6))
      .select($"id", $"expected")
    assert(viaHist.join(direct, "id")
      .filter($"degree_pct" =!= $"expected").count() === 0)
  }

  test("cached pair view equals the 2-hop edge traversal") {
    val fromEdges = Links.positivePairs(g.edges)
    val cached = Links.positivePairsCached(spark, sfDir)
    assert(cached.exceptAll(fromEdges).count() === 0)
    assert(fromEdges.exceptAll(cached).count() === 0)
  }

  test("negative pairs are disjoint from positives") {
    val pos = Links.positivePairs(g.edges)
    val neg = Links.negativePairs(
      graft.core.Tables.customer(spark, sfDir), graft.core.Tables.part(spark, sfDir),
      pos, "c_custkey", "p_partkey")
    assert(neg.join(pos, Seq("customer", "product"), "inner").count() === 0)
    assert(neg.count() > 0)
  }

  test("recencyFrequency: sentinel for inactive nodes, real values otherwise") {
    val custIds = g.nodes.filter($"label" === "Customer").select("id")
    val purchases = g.edges.filter($"type" === "PURCHASED")
    val rf = Links.recencyFrequency(custIds, purchases, "src",
      java.sql.Timestamp.valueOf("1995-06-01 00:00:00")).cache()
    // customers with no orders before mid-1995 carry the 999/0 sentinel
    val sentinels = rf.filter($"recency_days" === 999 && $"frequency" === 0)
    assert(sentinels.count() > 0)
    val active = rf.filter($"frequency" > 0)
    assert(active.filter($"recency_days" < 0).count() === 0)
  }

  test("determinism: two runs of hash-based sampling agree") {
    val a = catalog.Analytics.queries("r1_seeded_sample")(spark, sfDir).collect()
    val b = catalog.Analytics.queries("r1_seeded_sample")(spark, sfDir).collect()
    assert(a.sameElements(b))
  }
}
