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

  /** Range buckets for the score histogram: a constant fan-out that
    * keeps every window in this file partitioned by bucket (≤ |distinct
    * scores| / ~NBuckets rows each at uniform spread) and every
    * driver-side finish bounded by NBuckets rows — config-bounded, never
    * data-proportional, at any corpus size. */
  private val NBuckets = 1024

  /** Monotone bucket id for `s` in [lo, hi] (clamped outside). Any
    * monotone non-decreasing map of the score works — prefix sums only
    * need bucket order to align with score order. */
  private def bucketCol(lo: Double, hi: Double): Column = {
    val span = hi - lo
    if (span > 0)
      least(lit(NBuckets - 1), greatest(lit(0),
        floor((col("s").cast("double") - lo) / span * NBuckets).cast("int")))
    else lit(0)
  }

  /** Exact ROC-AUC of `scoreCol` against a 0/1 `labelCol`, as the
    * Mann–Whitney U statistic over the tie-grouped score histogram.
    *
    * Two-level exact prefix sum (no single-partition step anywhere):
    * one shuffle groups rows by distinct score; a window PARTITIONED BY
    * range bucket ranks within each bucket; the ≤NBuckets per-bucket
    * subtotals (count, positives, within-bucket rank mass) come back to
    * the driver, which adds the cross-bucket offsets in bucket order.
    * Every term is a half-integer below 2^52, so the split sum is
    * bit-identical to the flat Σ npos·avg_rank the DuckDB oracles
    * compute, under any aggregation order.
    *
    * Pass `bounds` when the score's range is known a priori (model
    * probabilities are (0,1)): bucketing then needs no min/max pass and
    * the whole statistic is ONE job — the shape iterative trainers call
    * every epoch. Without it, a cached min/max pass runs first. */
  def auc(scored: DataFrame, labelCol: String, scoreCol: Column,
          bounds: Option[(Double, Double)] = None): Double = {
    val byScore = scored.select(col(labelCol).cast("double").as("y"), scoreCol.as("s"))
      .groupBy("s").agg(count(lit(1)).as("n"), sum("y").as("npos"))
    val hist = if (bounds.isEmpty) byScore.cache() else byScore
    try {
      val (lo, hi) = bounds.getOrElse {
        val st = hist.agg(min(col("s").cast("double")),
          max(col("s").cast("double"))).head()
        if (st.isNullAt(0)) return 0.0
        (st.getDouble(0), st.getDouble(1))
      }
      // average rank of a tied group = (#rows before it) + (n+1)/2;
      // within-bucket rank mass here, cross-bucket offset on the driver
      val wIn = Window.partitionBy("bkt").orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
      val perBucket = hist.withColumn("bkt", bucketCol(lo, hi))
        .withColumn("wb", coalesce(sum("n").over(wIn), lit(0L)))
        .groupBy("bkt").agg(
          sum("n").as("bn"), sum("npos").as("bp"),
          sum(col("npos") * (col("wb") + (col("n") + 1.0) / 2.0)).as("rp"))
        .collect().sortBy(_.getInt(0))
      var off = 0L; var rankPos = 0.0; var np = 0.0; var nTot = 0L
      perBucket.foreach { r =>
        val (bn, bp, rp) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
        rankPos += rp + off.toDouble * bp
        off += bn; np += bp; nTot += bn
      }
      val nn = nTot - np
      if (np == 0 || nn == 0) 0.0
      else (rankPos - np * (np + 1.0) / 2.0) / (np * nn)
    } finally if (bounds.isEmpty) hist.unpersist()
  }

  /** ROC-AUC and PR-AUC together over one cached score histogram.
    * ROC is the same Mann–Whitney statistic as `auc`; PR-AUC is the
    * trapezoidal area over the tie-grouped precision-recall curve with
    * MLlib's (0, p₁) starting point — computed exactly over every
    * distinct score instead of MLlib's 1000-bin downsampling.
    *
    * Same two-level shape as `auc`: per-bucket totals (≤NBuckets rows)
    * come to the driver once; cross-bucket prefix offsets and the
    * neighbor values each bucket's LAST row needs for its PR trapezoid
    * (the next non-empty bucket's first row — whose cumulative counts
    * are pure functions of the offsets) go back as a broadcast join, so
    * the curve itself is assembled by windows partitioned by bucket. */
  def binaryAucs(scored: DataFrame, labelCol: String, scoreCol: Column,
                 bounds: Option[(Double, Double)] = None): (Double, Double) = {
    val byScore = scored.select(col(labelCol).cast("double").as("y"), scoreCol.as("s"))
      .groupBy("s").agg(count(lit(1)).as("n"), sum("y").as("npos"))
      .cache()
    try {
      val (lo, hi) = bounds.getOrElse {
        val st = byScore.agg(min(col("s").cast("double")),
          max(col("s").cast("double"))).head()
        if (st.isNullAt(0)) return (0.0, 0.0)
        (st.getDouble(0), st.getDouble(1))
      }
      val b = byScore.withColumn("bkt", bucketCol(lo, hi))
      val totals = b.groupBy("bkt").agg(sum("n").as("bn"), sum("npos").as("bp"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1)
      val nTotal = totals.map(_._2).sum
      val pTotal = totals.map(_._3).sum
      if (pTotal == 0 || pTotal == nTotal) return (0.0, 0.0)
      // ascending cross-bucket offsets; the desc-cumulatives the PR
      // curve needs follow by complement: count(≥s) = N − count(<s)
      var cn = 0L; var cp = 0.0
      val offRows = totals.map { case (bkt, bn, bp) =>
        val row = (bkt, cn, cp); cn += bn; cp += bp; row
      }
      // neighbor values for each bucket's last (highest-score) row: the
      // first row of the NEXT non-empty bucket has no within-bucket
      // predecessor mass, so its recall/precision are functions of that
      // bucket's offsets alone
      val offDf = byScore.sparkSession.createDataFrame(
        offRows.zipWithIndex.map { case ((bkt, offN, offP), i) =>
          val next = if (i + 1 < offRows.length) {
            val (_, nN, nP) = offRows(i + 1)
            (Some((pTotal - nP) / pTotal),
             Some((pTotal - nP) / (nTotal - nN).toDouble))
          } else (None, None)
          (bkt, offN, offP, next._1, next._2)
        }.toSeq).toDF("bkt", "off_n", "off_p", "next_r", "next_p")
      val wIn = Window.partitionBy("bkt").orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wLead = Window.partitionBy("bkt").orderBy("s")
      val agg = b.join(broadcast(offDf), "bkt")
        .withColumn("before_n", col("off_n") + coalesce(sum("n").over(wIn), lit(0L)))
        .withColumn("before_p", col("off_p") + coalesce(sum("npos").over(wIn), lit(0.0)))
        .withColumn("cp", lit(pTotal) - col("before_p"))
        .withColumn("recall", col("cp") / pTotal)
        .withColumn("prec", col("cp") / (lit(nTotal) - col("before_n")))
        // prev in descending-score order ≡ next higher score: the lead
        // within the bucket, or the broadcast neighbor at the boundary;
        // MLlib's curve starts at (0, p1): the global-max row (lead and
        // neighbor both absent) uses its own precision twice
        .withColumn("prev_r",
          coalesce(lead("recall", 1).over(wLead), col("next_r"), lit(0.0)))
        .withColumn("prev_p",
          coalesce(lead("prec", 1).over(wLead), col("next_p"), col("prec")))
        .agg(
          sum(col("npos") * (col("before_n") + (col("n") + 1.0) / 2.0))
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
