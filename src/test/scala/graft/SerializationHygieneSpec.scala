package graft

import org.apache.spark.sql.functions._
import org.apache.spark.ml.classification.LogisticRegression

/** Pins round 9's session-poisoning bug class: Spark 4's
  * `Observation()` lazily initializes a NON-serializable
  * `ObservationManager` field on the session it observes. Any model
  * whose training summary pins that session (MLlib attaches the
  * predictions DataFrame to the fitted model) then explodes with
  * NotSerializableException the moment a scoring closure captures it.
  * These tests poison an ISOLATED child session on purpose and prove
  * the engine's scoring paths survive — the same way PlanShapeSpec
  * pins plan regressions.
  */
class SerializationHygieneSpec extends SparkSpec {

  private def syntheticCorpus(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    (1 to 600).map { i =>
      val label = if (i % 3 == 0) 1.0 else 0.0
      (i.toLong % 40, (i * 7).toLong % 60, label,
        (i % 11).toDouble, (i % 17).toDouble, (i % 5).toDouble * 100.0,
        (i % 13).toDouble, (i % 7).toDouble * 10.0, (i % 3).toDouble * 0.1,
        (i % 19).toDouble / 19.0)
    }.toDF("customer", "product", "label",
      "cust_frequency", "cust_recency", "acctbal",
      "part_popularity", "price", "discount", "bal_x_price")
  }

  test("LR train+score survives a session whose ObservationManager is initialized") {
    // a dedicated child session so the shared test session stays clean
    val s = spark.newSession()
    // the poison: first Observation() on a session creates the
    // non-serializable manager field (round 9: a25 did this to the
    // shared session and killed every m-family entry that ran after it)
    val obs = org.apache.spark.sql.Observation()
    val n = s.range(10).toDF("x").observe(obs, count(lit(1)).as("n")).count()
    assert(n === 10L && obs.get("n") === 10L)
    // pre-fix this threw NotSerializableException inside train's AUC
    // scoring pass (the fitted model's summary pinned `s`); the
    // stripSummary defense makes scoring closures model-only
    val r = graft.ml.LinkPredict.train(s, syntheticCorpus(s),
      algo = "lr", lrMaxIter = 3)
    assert(!r.metrics("auc_val").isNaN)
    assert(r.scoredVal.count() > 0)
  }

  test("stripSummary removes the summary and leaves the model usable") {
    val s = spark.newSession()
    org.apache.spark.sql.Observation() // just constructing is harmless...
    val obs = org.apache.spark.sql.Observation()
    s.range(5).toDF("x").observe(obs, count(lit(1)).as("n")).count() // ...this poisons
    import s.implicits._
    val df = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("f1", "f2")).setOutputCol("features")
      .transform((1 to 100).map(i =>
          (if (i % 2 == 0) 1.0 else 0.0, i.toDouble, (i % 7).toDouble))
        .toDF("label", "f1", "f2"))
    val m = new LogisticRegression().setMaxIter(3).fit(df)
    assert(m.hasSummary, "MLlib should attach a training summary at fit time")
    val stripped = graft.ml.ModelRegistry.stripSummary(m)
    assert(!stripped.hasSummary, "stripSummary must clear the summary")
    // the stripped model java-serializes even on the poisoned session
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(stripped)
    assert(bos.size() > 0)
    // and still scores
    assert(stripped.transform(df).filter(col("prediction").isNotNull).count() === 100)
  }

  test("a25_observed_audit leaves the shared session transform-safe") {
    // run the real catalog entry (it must isolate its Observation on a
    // newSession clone), then prove a summary-carrying model fit on the
    // SHARED session still serializes — i.e. a25 didn't touch it
    val audit = graft.catalog.Analytics.queries("a25_observed_audit")(spark, sfDir)
    assert(audit.count() === 4)
    import spark.implicits._
    val df = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("f1")).setOutputCol("features")
      .transform((1 to 50).map(i => (i % 2 * 1.0, i.toDouble)).toDF("label", "f1"))
    val m = new LogisticRegression().setMaxIter(2).fit(df)
    // NOT stripped — this serializes only while the shared session has
    // no ObservationManager, which is exactly the invariant under test
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(m)
    assert(bos.size() > 0)
  }
}
