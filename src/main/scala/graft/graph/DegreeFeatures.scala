package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ColFns

/** Degree feature engineering (SURVEY §2.4 A2–A7; reference
  * feature_engineering/degree_analysis.py:24-126).
  *
  * All pure DataFrame windows/aggregations — one shuffle for the degree
  * groupBy, then window shuffles keyed by the partition column. At scale
  * the windows partitioned by `label`/`community` are fine (bounded
  * cardinality); the single global `Window.orderBy(degree)` for
  * percentile is the one scale hazard, so `percentile` uses rank over a
  * range-partitioned sort (Spark sorts globally via range exchange —
  * no single-partition collapse; verified in the plan).
  */
object DegreeFeatures {

  /** A2: total (in+out) degree per node id from the edges table. */
  def degrees(edges: DataFrame): DataFrame = {
    val ends = edges.select(col("src").as("id"))
      .unionAll(edges.select(col("dst").as("id")))
    ends.groupBy("id").agg(count(lit(1)).as("degree"))
  }

  /** A3: global degree moments. */
  def degreeMoments(degrees: DataFrame): DataFrame =
    degrees.agg(
      ColFns.round6(avg("degree")).as("mean_degree"),
      ColFns.round6(stddev_pop(col("degree"))).as("std_degree"),
      count(lit(1)).as("n_nodes"))

  /** A4/W6: global degree percentile (percent_rank ties = same rank in
    * both engines; deterministic under duplicates). */
  def degreePercentile(degrees: DataFrame): DataFrame =
    degrees.withColumn(
      "degree_pct",
      ColFns.round6(percent_rank().over(Window.orderBy(col("degree")))))

  /** A5: z-score of degree within a grouping column (label / community),
    * plus A7 log1p transform. Zero-stddev groups pin z to 0.0 (cross-
    * engine: DuckDB nulls x/0, Spark gives Infinity — see ColFns). */
  def groupedZScore(degreesWithGroup: DataFrame, groupCol: String): DataFrame = {
    val w = Window.partitionBy(groupCol)
    val mean = avg("degree").over(w)
    val std  = stddev_pop(col("degree")).over(w)
    degreesWithGroup
      .withColumn("degree_z", ColFns.round6(ColFns.safeZScore(col("degree"), mean, std)))
      .withColumn("log_degree", ColFns.round6(log1p(col("degree"))))
  }
}
