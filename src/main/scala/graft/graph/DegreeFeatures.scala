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
  * cardinality); a global `Window.orderBy(degree)` percent_rank would be
  * the one scale hazard (an empty partition spec is a single-partition
  * WindowExec), so `degreePercentile` uses the two-pass count-below /
  * total formulation over the degree histogram instead — the corpus-
  * sized pass is a groupBy, and the window runs over |distinct degrees|
  * rows.
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
    * both engines; deterministic under duplicates).
    *
    * Bit-identical to `percent_rank().over(Window.orderBy(degree))` —
    * percent_rank is (count strictly below) / (n − 1), and both terms
    * are exact longs — but computed over the degree histogram: the
    * full-data pass is the groupBy, the window sees |distinct degrees|
    * rows (partitioned by a single-valued non-foldable key: a literal
    * would be optimizer-stripped back to the empty spec), and the
    * result joins back as a broadcast. */
  def degreePercentile(degrees: DataFrame): DataFrame = {
    val hist = degrees.groupBy("degree").agg(count(lit(1)).as("__cnt"))
    val wBelow = ColFns.boundedGlobal(col("degree"))(col("degree"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = ColFns.boundedGlobal(col("degree"))(col("degree"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val pct = hist
      .withColumn("__below", coalesce(sum("__cnt").over(wBelow), lit(0L)))
      .withColumn("__n", sum("__cnt").over(wAll))
      .withColumn("degree_pct", ColFns.round6(
        when(col("__n") > 1,
          col("__below").cast("double") / (col("__n") - 1).cast("double"))
          .otherwise(lit(0.0))))
      .select("degree", "degree_pct")
    degrees.join(broadcast(pct), "degree")
      .select(degrees.columns.map(col) :+ col("degree_pct"): _*)
  }

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
