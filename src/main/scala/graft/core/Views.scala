package graft.core

import org.apache.spark.sql.SparkSession

/** The engine's plain-SQL surface: register the source tables and the
  * property-graph relations as temp views, so a user can drive the whole
  * engine with `spark.sql(...)` instead of (or alongside) the Column
  * API. Combined with `graft.plans.GraftExtensions` (graft_dot,
  * graft_shingles) this is the "switch from the reference" query
  * entry point.
  *
  * On a cluster these would be catalog tables over the parquet store
  * (graph relations partitioned by dvid, bucketable by src) — temp
  * views are the session-local equivalent and inherit every Catalyst
  * optimization (pushdown, pruning, broadcast) a table gets.
  */
object Views {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def register(spark: SparkSession, dir: String): Unit = {
    tableNames.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case t => spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
    val g = graft.graph.GraphBuilder.fromTpch(spark, dir)
    g.nodes.createOrReplaceTempView("graph_nodes")
    g.edges.createOrReplaceTempView("graph_edges")
    // the custom Catalyst expressions as SQL functions — same registry
    // entries GraftExtensions injects at session build; registering here
    // too makes the SQL surface self-contained for sessions built
    // without `spark.sql.extensions`
    val reg = spark.sessionState.functionRegistry
    Seq(graft.plans.GraftExtensions.arrayDot,
        graft.plans.GraftExtensions.charShingles).foreach {
      case (id, inf, builder) =>
        if (!reg.functionExists(id)) reg.registerFunction(id, inf, builder)
    }
  }
}
