package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph

/** GraphML reader (SURVEY §2.1 S7 — nx.read_graphml parity,
  * xgboost_training_for_big_data.py:142): parses the one-element-per-line
  * GraphML that GraphMLSink emits (and any GraphML whose node/edge
  * elements each sit on a single line) back into the nodes/edges
  * DataFrame model. A distributed text scan + regexp projections — no
  * driver-side XML DOM, so a multi-GB export parses in parallel.
  */
object GraphMLSource {

  private def unesc(c: Column): Column = {
    val gt = regexp_replace(c, "&gt;", ">")
    val lt = regexp_replace(gt, "&lt;", "<")
    regexp_replace(lt, "&amp;", "&")
  }

  /** Returns a PropertyGraph with the attributes GraphML carries
    * (id/label for nodes, src/dst/type for edges); columns the parquet
    * model has but GraphML doesn't are null-filled so downstream
    * operators see the canonical schema. */
  def read(spark: SparkSession, path: String): PropertyGraph = {
    val lines = spark.read.text(path).select(col("value"))
    val nodes = lines.filter(col("value").rlike("<node\\s"))
      .select(
        unesc(regexp_extract(col("value"), "<node[^>]*\\sid=\"([^\"]*)\"", 1)).as("id"),
        unesc(regexp_extract(col("value"),
          "<data key=\"label\">([^<]*)</data>", 1)).as("label"))
    val edges = lines.filter(col("value").rlike("<edge\\s"))
      .select(
        unesc(regexp_extract(col("value"), "source=\"([^\"]*)\"", 1)).as("src"),
        unesc(regexp_extract(col("value"), "target=\"([^\"]*)\"", 1)).as("dst"),
        unesc(regexp_extract(col("value"),
          "<data key=\"type\">([^<]*)</data>", 1)).as("type"))
    PropertyGraph(nodes, edges)
  }
}
