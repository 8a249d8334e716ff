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

  // --- part 2: the cache REGISTRY, by enumeration -------------------
  // Round 9's bug entered through one memoized TrainResult; the spec
  // above pins that exact shape. This sweep pins the CLASS: every value
  // any AppCache memo ever holds is audited, so a future cache can't
  // quietly reintroduce a session-pinning model.

  /** All MLlib transformers reachable at the top level of a cached
    * value (the value itself, its Product elements, pipeline stages). */
  private def reachableModels(v: Any): Seq[AnyRef] = {
    val tops: Seq[Any] = v match {
      case p: Product => p.productIterator.toSeq :+ p
      case other => Seq(other)
    }
    tops.collect { case m: org.apache.spark.ml.Transformer => m }
      .flatMap {
        case pm: org.apache.spark.ml.PipelineModel => pm.stages.toSeq
        case m => Seq(m: AnyRef)
      }
  }

  /** Mirror of stripSummary's match: does any Option-typed
    * trainingSummary slot still hold a value? */
  private def carriesSummary(o: AnyRef): Boolean = {
    var c: Class[_] = o.getClass
    while (c != null) {
      for (f <- c.getDeclaredFields
           if f.getName.contains("trainingSummary") &&
             classOf[Option[_]].isAssignableFrom(f.getType)) {
        f.setAccessible(true)
        val v = f.get(o)
        if (v != null && v != None) return true
      }
      c = c.getSuperclass
    }
    false
  }

  test("registry sweep: no memoized value carries a session-pinning model") {
    // populate the model-bearing memo caches through their real entries
    // (cheap at sf0.001; no-ops if an earlier suite already ran them)
    for (n <- Seq("m1b_gbt_deterministic", "m2b_multidate_deterministic",
        "m7b_mlp_deterministic", "t18_quality_nb"))
      SparkEntry.queries(n)(spark, sfDir).count()
    val vals = graft.core.AppCache.allCachedValues
    assert(vals.nonEmpty, "AppCache registry is empty — sweep is vacuous")
    val models = vals.flatMap(reachableModels)
    assert(models.nonEmpty,
      "no memoized models found — the sweep no longer covers the bug class")
    val dirty = models.filter(carriesSummary)
    assert(dirty.isEmpty,
      s"memoized models pin their fit session via trainingSummary: " +
        dirty.map(_.getClass.getSimpleName).mkString(", "))
    // and each memoized model java-serializes on its own — the closure
    // payload a .transform ships to executors
    models.foreach { m =>
      val bos = new java.io.ByteArrayOutputStream()
      new java.io.ObjectOutputStream(bos).writeObject(m)
      assert(bos.size() > 0)
    }
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

  test("AppCache.trimToBudget evicts checkpoint memos; a re-get rebuilds cleanly") {
    import java.util.concurrent.ConcurrentHashMap
    val cache = new ConcurrentHashMap[(String, String), org.apache.spark.sql.DataFrame]()
    val app = spark.sparkContext.applicationId
    var builds = 0
    def mk(n: Int) = { builds += 1
      spark.range(n).toDF("id").localCheckpoint(true) }
    val a = graft.core.AppCache.get(cache, (app, "trim_a"))(mk(5000))
    graft.core.AppCache.get(cache, (app, "trim_b"))(mk(7000))
    val rddA = org.apache.spark.sql.GraftColumnBridge.checkpointRddId(a).get
    assert(spark.sparkContext.getPersistentRDDs.contains(rddA))
    // budget 0: every resident memo in the app must go (incl. other
    // suites' — by contract they rebuild on their next get)
    val (nEv, _) = graft.core.AppCache.trimToBudget(spark, 0L)
    assert(nEv >= 2, s"expected both memos evicted, got $nEv")
    assert(cache.isEmpty, "evicted entries still in the map")
    assert(!spark.sparkContext.getPersistentRDDs.contains(rddA),
      "evicted memo's checkpoint RDD still persisted")
    // a re-request is a plain rebuild — correctness unaffected
    val a2 = graft.core.AppCache.get(cache, (app, "trim_a"))(mk(5000))
    assert(builds === 3)
    assert(a2.count() === 5000L)
    // and a trim UNDER budget is a no-op
    val (n2, _) = graft.core.AppCache.trimToBudget(spark, Long.MaxValue)
    assert(n2 === 0)
    assert(cache.size === 1)
  }

  test("trimToBudget evicts COLUMNAR-cached memos via the CacheManager; the cache re-fills on next use") {
    import java.util.concurrent.ConcurrentHashMap
    val cache = new ConcurrentHashMap[(String, String), org.apache.spark.sql.DataFrame]()
    val app = spark.sparkContext.applicationId
    val df = graft.core.AppCache.get(cache, (app, "trim_cols")) {
      val d = spark.range(20000).toDF("id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      d.count(); d
    }
    val rddId = org.apache.spark.sql.GraftColumnBridge.cachedPlanRddId(df)
    assert(rddId.isDefined, "persisted memo not seen as a cached plan")
    assert(spark.sparkContext.getRDDStorageInfo.exists(i =>
      i.id == rddId.get && i.memSize > 0), "buffers not materialized")
    val (nEv, _) = graft.core.AppCache.trimToBudget(spark, 0L)
    assert(nEv >= 1)
    // the CacheManager entry must be gone (a fresh plan no longer
    // resolves to an InMemoryRelation)…
    val stillCached = org.apache.spark.sql.GraftColumnBridge
      .cachedPlanRddId(spark.range(20000).toDF("id"))
    assert(stillCached.isEmpty,
      s"CacheManager still serves the evicted memo: $stillCached")
    // …and the blocks clear (the release is non-blocking — poll)
    val gone = (1 to 50).exists { _ =>
      val still = spark.sparkContext.getRDDStorageInfo.exists(i =>
        i.id == rddId.get && (i.memSize > 0 || i.diskSize > 0))
      if (still) Thread.sleep(100)
      !still
    }
    assert(gone, "evicted columnar memo still resident after 5 s")
    // the release went through Dataset.unpersist, NOT a raw RDD
    // unpersist — so a fresh scan of the same plan re-caches (the
    // raw path would pin the buffers RDD at StorageLevel.NONE and
    // the memo would silently never cache again)
    val df2 = spark.range(20000).toDF("id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df2.count()
    val rdd2 = org.apache.spark.sql.GraftColumnBridge.cachedPlanRddId(df2)
    assert(rdd2.isDefined)
    assert(spark.sparkContext.getRDDStorageInfo.exists(i =>
      i.id == rdd2.get && (i.memSize > 0 || i.diskSize > 0)),
      "re-persist after eviction did not re-cache")
    df2.unpersist(blocking = false)
  }
}
