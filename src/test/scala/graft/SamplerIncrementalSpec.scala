package graft

import org.apache.spark.sql.functions._
import graft.ml.LinkPredict
import graft.recommend.WeightedSampler

class SamplerIncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("typed weighted sampler: n picks, category cap, weight-biased, deterministic") {
    val cands = (for {
      cust <- 1L to 20L
      prod <- 1L to 50L
    } yield WeightedSampler.Candidate(
      cust, prod, s"cat${prod % 5}",
      weight = if (prod <= 5) 10.0 else 0.1,
      u = ((cust * 131 + prod * 31) % 997) / 997.0 + 1e-6)).toDS()
    val picks = WeightedSampler.sample(cands, n = 3, categoryCap = 1).collect()
    assert(picks.length === 20)
    picks.foreach { case (_, ps) =>
      assert(ps.length === 3)
      assert(ps.map(_.category).distinct.length === 3) // cap 1 per category
    }
    // heavy-weight products (1-5) dominate the picks
    val heavy = picks.flatMap(_._2).count(_.product <= 5)
    assert(heavy > picks.length, s"weighting ineffective: $heavy heavy picks")
    // determinism + partition independence
    val again = WeightedSampler.sample(cands.repartition(13), 3, 1).collect()
    assert(picks.map(p => p._1 -> p._2.map(_.product).toSet).toMap ===
      again.map(p => p._1 -> p._2.map(_.product).toSet).toMap)
  }

  test("SMOTE: activates only past the imbalance gate, interpolates in range") {
    def row(c: Long, p: Long, label: Double, price: Double) =
      (c, p, label, 1.0, 10.0, 100.0, 2.0, price, 0.1, 0.2)
    val cols = Seq("customer", "product", "label") ++ LinkPredict.featureNames
    val skewed = ((1L to 30L).map(i => row(i, i, 1.0, 100.0 + i)) ++
      (100L to 400L).map(i => row(i, i, 0.0, 50.0)))
      .toDF(cols: _*).cache()
    val nPos = 30L
    val augmented = LinkPredict.smoteOversample(skewed).cache()
    val nPosAfter = augmented.filter(col("label") === 1.0).count()
    assert(nPosAfter > nPos, "no synthesis happened")
    // synthesized prices stay inside the minority envelope [101, 130]
    val out = augmented.filter(col("label") === 1.0)
      .filter(col("price") < 101.0 - 1e-9 || col("price") > 130.0 + 1e-9).count()
    assert(out === 0)
    // balanced data passes through untouched
    val balanced = ((1L to 100L).map(i => row(i, i, 1.0, 100.0)) ++
      (200L to 300L).map(i => row(i, i, 0.0, 50.0))).toDF(cols: _*)
    assert(LinkPredict.smoteOversample(balanced).count() === balanced.count())
  }

  test("r6b catalog entry: interpolates inside the minority envelope, repartition-stable") {
    val df = SparkEntry.queries("r6b_smote_interp")(spark, sfDir).cache()
    assert(df.count() > 0, "gate should fire on the testdata imbalance (~9:1)")
    val minority = graft.core.Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 450000.0)
    val (lo, hi) = minority
      .agg(min("o_totalprice"), max("o_totalprice")).as[(Double, Double)].head()
    // every synthetic point is a convex combination of two minority points
    assert(df.filter(col("f1_synth") < lo - 1e-6 || col("f1_synth") > hi + 1e-6)
      .count() === 0)
    assert(df.filter(col("f2_synth") < 1.0 - 1e-6 || col("f2_synth") > 31.0 + 1e-6)
      .count() === 0)
    // pseudoUniform pairing ⇒ identical output under any partitioning
    val again = SparkEntry.queries("r6b_smote_interp")(spark, sfDir)
    assert(df.collect().toSeq === again.collect().toSeq)
  }

  test("M3 incremental train: accepts, persists, and probes on rerun") {
    val dir = "/tmp/graft_incr"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    // Cleanly separable synthetic corpus: label is a deterministic
    // function of `price`, so train and val AUC are both exactly 1.0
    // and the overfit gate passes under ANY partition/float-sum order.
    // (On the real sf0.001 corpus the gap hovers around the 0.06 knife
    // edge and flips with partition-layout noise — gate mechanics, not
    // the accept → persist → probe policy this test is about.)
    val cols = Seq("customer", "product", "label") ++ LinkPredict.featureNames
    val data = (1L to 2000L).map { i =>
      val price = (i % 100).toDouble
      (i, i % 37, if (price >= 50) 1.0 else 0.0,
        (i % 11).toDouble, (i % 13).toDouble, 100.0 + (i % 7),
        2.0, price, 0.05 * (i % 3), price * (100.0 + (i % 7)))
    }.toDF(cols: _*).cache()
    val first = LinkPredict.incrementalTrain(spark, data,
      s"$dir/model", s"$dir/history.jsonl", maxIter = 5)
    assert(first("accepted") === 1.0 && first("probe_drop") === 0.0)
    assert(first("overfit_gap") === 0.0)
    val second = LinkPredict.incrementalTrain(spark, data,
      s"$dir/model", s"$dir/history.jsonl", maxIter = 5)
    // same data, same model → probe sees no regression
    assert(second("probe_drop") < 0.02)
    assert(graft.ml.ModelRegistry.readHistory(s"$dir/history.jsonl").length === 2)
  }
}
