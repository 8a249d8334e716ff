package graft

import org.apache.spark.sql.functions._
import graft.ml.LinkPredict

class LinkPredictSpec extends SparkSpec {

  lazy val data = LinkPredict.trainingSet(spark, sfDir).cache()

  test("training set has both classes, disjoint from each other") {
    val byLabel = data.groupBy("label").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(byLabel.getOrElse(1.0, 0L) > 100)
    assert(byLabel.getOrElse(0.0, 0L) > 100)
    assert(data.groupBy("customer", "product").count().filter(col("count") > 1).count() === 0)
  }

  test("J4 class ratio stays ~1:1 (the negative frac tracks the cross join's own size)") {
    val byLabel = data.groupBy("label").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val ratio = byLabel(0.0).toDouble / byLabel(1.0)
    assert(ratio > 0.5 && ratio < 2.0, s"neg:pos ratio drifted to $ratio")
  }

  test("feature layouts assert width and reject missing columns; no padding") {
    import graft.ml.FeatureLayout
    assert(FeatureLayout.DiscountV1.width === LinkPredict.featureNames.length)
    assert(FeatureLayout.BaseV1.width === LinkPredict.featureNames.length - 1)
    val assembled = FeatureLayout.assemble(data, FeatureLayout.DiscountV1, "fv")
    val size = org.apache.spark.ml.attribute.AttributeGroup
      .fromStructField(assembled.schema("fv")).size
    assert(size === FeatureLayout.DiscountV1.width)
    val err = intercept[IllegalArgumentException] {
      FeatureLayout.assemble(data.drop("discount"), FeatureLayout.DiscountV1)
    }
    assert(err.getMessage.contains("missing"))
  }

  test("GBT model trains, separates classes; gate tracks the measured gap") {
    val r = LinkPredict.train(spark, data, "gbt", maxIter = 10)
    assert(r.metrics("auc_val") > 0.55, s"AUC too low: ${r.metrics}")
    // the gap itself hovers around the 0.06 threshold on this small real
    // corpus (partition/float noise flips it) — assert the gate's
    // MECHANICS here; the accept/persist path is pinned on a cleanly
    // separable corpus in SamplerIncrementalSpec
    val expected = if (r.metrics("overfit_gap") <= 0.06) 1.0 else 0.0
    assert(r.metrics("gate_pass") === expected, s"gate inconsistent: ${r.metrics}")
    assert(r.importances.map(_._2).sum > 0.99)
  }

  test("threshold sweep produces monotone recall and valid F1") {
    val r = LinkPredict.train(spark, data, "lr")
    val sweep = LinkPredict.thresholdSweep(r.scoredVal,
      Seq(0.1, 0.3, 0.5, 0.7, 0.9)).collect()
    val recalls = sweep.map(_.getAs[Double]("recall"))
    assert(recalls.sliding(2).forall(p => p(0) >= p(1) - 1e-12), "recall not monotone")
    assert(sweep.forall { row =>
      val f1 = row.getAs[Double]("f1"); f1 >= 0.0 && f1 <= 1.0
    })
  }

  test("pickThreshold selects the F1 value closest to the target") {
    import spark.implicits._
    val swept = Seq((0.1, 0.70), (0.2, 0.79), (0.3, 0.83), (0.4, 0.50))
      .toDF("threshold", "f1")
    assert(LinkPredict.pickThreshold(swept, 0.80) === 0.2)
    // ties break toward the lower threshold (0.25/0.75 vs target 0.5:
    // both gaps are exactly 0.25 in binary floating point)
    val tied = Seq((0.1, 0.25), (0.2, 0.75)).toDF("threshold", "f1")
    assert(LinkPredict.pickThreshold(tied, 0.50) === 0.1)
  }
}
