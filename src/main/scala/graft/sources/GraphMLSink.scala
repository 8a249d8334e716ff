package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph

/** GraphML writer (SURVEY §2.1 S5 — nx.write_graphml parity,
  * knowledge_graph_creation.py:243). XML fragments are rendered
  * per-row as a distributed text dataset and ordered header → nodes →
  * edges → footer by an explicit section key; one output file via
  * coalesce(1) (GraphML is inherently a single-document format — this
  * sink is for interop export, not the engine's canonical storage,
  * which is the dvid-partitioned parquet).
  */
object GraphMLSink {

  private def esc(c: org.apache.spark.sql.Column) = {
    val amp = regexp_replace(c.cast("string"), "&", "&amp;")
    val lt = regexp_replace(amp, "<", "&lt;")
    regexp_replace(lt, ">", "&gt;")
  }

  def lines(g: PropertyGraph): DataFrame = {
    val spark = g.nodes.sparkSession
    import spark.implicits._
    val header = Seq(
      (0, 0L, """<?xml version="1.0" encoding="UTF-8"?>"""),
      (0, 1L, """<graphml xmlns="http://graphml.graphdrawing.org/xmlns">"""),
      (0, 2L, """  <key id="label" for="node" attr.name="label" attr.type="string"/>"""),
      (0, 3L, """  <key id="type" for="edge" attr.name="type" attr.type="string"/>"""),
      (0, 4L, """  <graph id="G" edgedefault="directed">"""))
      .toDF("section", "ord", "line")
    val nodes = g.nodes.select(lit(1).as("section"),
      xxhash64(col("id")).as("ord"),
      concat(lit("    <node id=\""), esc(col("id")),
        lit("\"><data key=\"label\">"), esc(col("label")),
        lit("</data></node>")).as("line"))
    val edges = g.edges.select(lit(2).as("section"),
      xxhash64(col("src"), col("dst")).as("ord"),
      concat(lit("    <edge source=\""), esc(col("src")),
        lit("\" target=\""), esc(col("dst")),
        lit("\"><data key=\"type\">"), esc(col("type")),
        lit("</data></edge>")).as("line"))
    val footer = Seq((3, 0L, "  </graph>"), (3, 1L, "</graphml>"))
      .toDF("section", "ord", "line")
    header.unionByName(nodes).unionByName(edges).unionByName(footer)
      .orderBy("section", "ord")
  }

  def write(g: PropertyGraph, path: String): Unit =
    lines(g).repartition(1).sortWithinPartitions("section", "ord")
      .select("line").write.mode("overwrite").text(path)
}
