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

  test("GBT model trains, separates classes, passes the overfit gate") {
    val r = LinkPredict.train(spark, data, "gbt", maxIter = 10)
    assert(r.metrics("auc_val") > 0.55, s"AUC too low: ${r.metrics}")
    assert(r.metrics("gate_pass") === 1.0, s"overfit gate failed: ${r.metrics}")
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
}
