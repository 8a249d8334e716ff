package graft.graph

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GraphX-backed analytics over the property graph (the survey's
  * "materialize GraphX from the node/edge DataFrames on demand" design,
  * SURVEY §1.4). The DataFrame tables stay canonical; GraphX is the
  * execution engine for genuinely iterative whole-graph algorithms the
  * relational planner can't express well: connected components, PageRank
  * (plus degrees for cross-checking A2).
  *
  * Vertex ids: GraphX needs Long ids — we key by xxhash64(id) and keep
  * the (hash → id) mapping as a DataFrame to translate results back.
  * Collision probability at 2^64 is negligible for any realistic graph;
  * the mapping join would surface one as a duplicate id downstream.
  */
object GraphXAnalytics {

  private def vertexMap(g: PropertyGraph): DataFrame =
    g.nodes.select(col("id"), xxhash64(col("id")).as("vid")).distinct()

  private def toGraphX(g: PropertyGraph): Graph[Unit, Double] = {
    val edgeRdd = g.edges
      .select(xxhash64(col("src")).as("s"), xxhash64(col("dst")).as("d"),
        coalesce(col("qty"), lit(1.0)).as("w"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), r.getDouble(2)))
    Graph.fromEdges(edgeRdd, ())
  }

  /** Weakly connected components → (id, component) with the component
    * labeled by its lowest member id string (deterministic). */
  def connectedComponents(spark: SparkSession, g: PropertyGraph): DataFrame = {
    import spark.implicits._
    val cc = toGraphX(g).connectedComponents().vertices
      .toDF("vid", "component_vid")
    val vm = vertexMap(g)
    val withIds = cc.join(vm, "vid")
    val canon = withIds.groupBy("component_vid").agg(min("id").as("component"))
    withIds.join(canon, "component_vid").select(col("id"), col("component"))
  }

  /** PageRank (standard damping 0.15), translated back to string ids. */
  def pageRank(spark: SparkSession, g: PropertyGraph,
               iters: Int = 10): DataFrame = {
    import spark.implicits._
    val pr = toGraphX(g).staticPageRank(iters).vertices.toDF("vid", "rank")
    pr.join(vertexMap(g), "vid")
      .select(col("id"), round(col("rank"), 6).as("rank"))
  }

  /** GraphX total degrees — cross-checks the DataFrame A2 operator. */
  def degrees(spark: SparkSession, g: PropertyGraph): DataFrame = {
    import spark.implicits._
    toGraphX(g).degrees.toDF("vid", "degree")
      .join(vertexMap(g), "vid")
      .select(col("id"), col("degree").cast("long").as("degree"))
  }
}
