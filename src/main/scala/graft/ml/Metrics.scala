package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary-classification metrics as plain DataFrame aggregations
  * (SURVEY §2.11 M4). ROC-AUC is computed as the Mann–Whitney U
  * statistic with average ranks for ties, which is mathematically
  * identical to the trapezoidal area under the tie-grouped ROC curve
  * (what MLlib's BinaryClassificationMetrics integrates) — but in one
  * groupBy + one window pass instead of MLlib's multi-job
  * sortByKey/binning pipeline, which dominates wall time on small
  * scored sets and shuffles once per call at scale.
  */
object Metrics {

  /** Exact ROC-AUC of `scoreCol` against a 0/1 `labelCol`.
    * One shuffle (groupBy score), one window over distinct scores.
    * The rank window is unpartitioned — its input is one row per
    * DISTINCT score, so at 100 TB quantize the score first (e.g.
    * `round(s, 6)` ≈ ≤2M rows) exactly as MLlib's `numBins` does. */
  def auc(scored: DataFrame, labelCol: String, scoreCol: Column): Double = {
    val byScore = scored.select(col(labelCol).cast("double").as("y"), scoreCol.as("s"))
      .groupBy("s").agg(count(lit(1)).as("n"), sum("y").as("npos"))
    // average rank of a tied group = (#rows before it) + (n+1)/2;
    // the explicit single-partition spec states the quantize-first
    // contract (input = one row per DISTINCT score) in the plan itself
    val w = graft.functions.ColFns.boundedGlobal(col("s"))(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byScore.withColumn("before", coalesce(sum("n").over(w), lit(0L)))
      .withColumn("avg_rank", col("before") + (col("n") + 1.0) / 2.0)
    val agg = ranked.agg(
      sum(col("npos") * col("avg_rank")).as("rank_pos"),
      sum("npos").as("np"),
      sum(col("n") - col("npos")).as("nn"))
      .head()
    val (rankPos, np, nn) = (agg.getDouble(0), agg.getDouble(1), agg.getDouble(2))
    if (np == 0 || nn == 0) 0.0
    else (rankPos - np * (np + 1.0) / 2.0) / (np * nn)
  }

  /** ROC-AUC and PR-AUC together from ONE grouped pass over the scores.
    * ROC is the same Mann–Whitney statistic as `auc`; PR-AUC is the
    * trapezoidal area over the tie-grouped precision-recall curve with
    * MLlib's (0, p₁) starting point — computed exactly over every
    * distinct score instead of MLlib's 1000-bin downsampling, in two
    * small jobs over one cached frame instead of its multi-stage RDD
    * pipeline. Same 100 TB note as `auc`: quantize scores first. */
  def binaryAucs(scored: DataFrame, labelCol: String,
                 scoreCol: Column): (Double, Double) = {
    val byScore = scored.select(col(labelCol).cast("double").as("y"), scoreCol.as("s"))
      .groupBy("s").agg(count(lit(1)).as("n"), sum("y").as("npos"))
      .cache()
    try {
      val tot = byScore.agg(sum("n").as("nn"), sum("npos").as("np")).head()
      val (nTotal, pTotal) = (tot.getLong(0), tot.getDouble(1))
      if (pTotal == 0 || pTotal == nTotal) return (0.0, 0.0)
      // descending-score cumulatives give the PR curve directly and the
      // ascending rank arithmetic by complement: rows-before(asc) = N − cum(desc)
      val wDesc = graft.functions.ColFns.boundedGlobal(col("s"))(col("s").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = byScore
        .withColumn("cn", sum("n").over(wDesc))
        .withColumn("cp", sum("npos").over(wDesc))
        .withColumn("recall", col("cp") / pTotal)
        .withColumn("prec", col("cp") / col("cn"))
      val lagW = graft.functions.ColFns.boundedGlobal(col("s"))(col("s").desc)
      val agg = cum
        .withColumn("prev_r", coalesce(lag("recall", 1).over(lagW), lit(0.0)))
        // MLlib's curve starts at (0, p1): first trapezoid uses p1 twice
        .withColumn("prev_p", coalesce(lag("prec", 1).over(lagW), col("prec")))
        .agg(
          sum(col("npos") * (lit(nTotal) - col("cn") + (col("n") + 1.0) / 2.0))
            .as("rank_pos"),
          sum((col("recall") - col("prev_r")) *
            (col("prec") + col("prev_p")) / 2.0).as("pr_auc"))
        .head()
      val roc = (agg.getDouble(0) - pTotal * (pTotal + 1.0) / 2.0) /
        (pTotal * (nTotal - pTotal))
      (roc, agg.getDouble(1))
    } finally byScore.unpersist()
  }

  /** M4's classification-report row at one operating point: confusion
    * counts + accuracy/precision/recall/F1, as a single aggregate job. */
  def confusion(scored: DataFrame, labelCol: String, score: Column,
                threshold: Double): DataFrame = {
    val pred = score >= threshold
    val y = col(labelCol)
    val agg = scored.agg(
      sum(when(pred && y === 1.0, 1L).otherwise(0L)).as("tp"),
      sum(when(pred && y === 0.0, 1L).otherwise(0L)).as("fp"),
      sum(when(!pred && y === 1.0, 1L).otherwise(0L)).as("fn"),
      sum(when(!pred && y === 0.0, 1L).otherwise(0L)).as("tn"))
    agg.select(col("tp"), col("fp"), col("fn"), col("tn"),
      round((col("tp") + col("tn")).cast("double") /
        (col("tp") + col("fp") + col("fn") + col("tn")), 6).as("accuracy"),
      round(col("tp").cast("double") /
        greatest(col("tp") + col("fp"), lit(1L)), 6).as("precision"),
      round(col("tp").cast("double") /
        greatest(col("tp") + col("fn"), lit(1L)), 6).as("recall"))
      .withColumn("f1", round(
        when(col("precision") + col("recall") === 0.0, 0.0)
          .otherwise(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))), 6))
  }
}
