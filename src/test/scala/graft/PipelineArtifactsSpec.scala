package graft

import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph
import graft.ml.{LinkPredict, ModelRegistry, MultiTower}
import graft.pipeline.{FeatureFold, Injections}
import graft.sources.GraphMLSink

class PipelineArtifactsSpec extends SparkSpec {
  import spark.implicits._

  private val tmp = "/tmp/graft_artifacts"

  test("S9/S8/M6: model save/load + perf history + compat probe") {
    val data = LinkPredict.trainingSet(spark, sfDir, cap = 5000).cache()
    val r = LinkPredict.train(spark, data, "gbt", maxIter = 5)
    val modelPath = s"$tmp/gbt_model"
    val histPath = s"$tmp/history.jsonl"
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(histPath))
    ModelRegistry.saveModel(
      r.model.asInstanceOf[org.apache.spark.ml.classification.GBTClassificationModel],
      modelPath)
    ModelRegistry.appendHistory(histPath, r.metrics)
    val hist = ModelRegistry.readHistory(histPath)
    assert(hist.length === 1 && hist.head("auc_val") === r.metrics("auc_val"))
    // compat probe on the same features: AUC identical → no alert
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(LinkPredict.featureNames.toArray).setOutputCol("features")
      .transform(data)
    val probe = ModelRegistry.compatProbe(spark, modelPath, histPath, assembled)
    assert(!probe.alert, s"unexpected alert: $probe")
    assert(math.abs(probe.newAuc - probe.prevAuc.get) < 0.05)
  }

  test("M2: multi-date corpus has one slice per month with per-month discounts") {
    val d = LinkPredict.multiDateTrainingSet(spark, sfDir, cap = 2000)
    val months = d.select("sim_month").distinct().as[Int].collect().sorted
    assert(months.toSeq === Seq(3, 6, 9, 12))
    // December discounts are the deep band (≥0.30), March regular (≤0.05)
    val dec = d.filter($"sim_month" === 12).agg(min("discount")).head().getDouble(0)
    val mar = d.filter($"sim_month" === 3).agg(max("discount")).head().getDouble(0)
    assert(dec >= 0.30 && mar <= 0.05)
  }

  test("M7/M8: multi-tower MLP trains, separates classes, passes the overfit gate") {
    val r = MultiTower.train(spark, LinkPredict.trainingSet(spark, sfDir, cap = 5000))
    assert(r.metrics("auc_val") > 0.55, s"MLP AUC too low: ${r.metrics}")
    // the reference's own acceptance shape (is_model_overfitting,
    // xgboost_training_for_big_data.py:523-529) applied to the MLP
    // approximation: train/val AUC gap must stay within 0.06
    assert(r.metrics("overfit_gap") <= 0.06,
      s"MLP overfits beyond the reference gate: ${r.metrics}")
    assert(r.metrics("gate_pass") === 1.0, s"gate inconsistent: ${r.metrics}")
  }

  test("M9/M10: the AdamW loop learns, clips, schedules, and checkpoints like the reference") {
    val r = graft.ml.AdamWTrainer.train(
      LinkPredict.trainingSet(spark, sfDir, cap = 5000), epochs = 20)
    val eps = r.epochs
    assert(eps.size === 20)
    // it learns: best validation AUC beats chance and loss decreases
    assert(r.bestAuc > 0.55, s"AdamW loop failed to learn: $eps")
    assert(eps.last.trainLoss < eps.head.trainLoss, s"loss did not decrease: $eps")
    // checkpointing: bestAuc is exactly the max of the trajectory, at bestEpoch
    assert(math.abs(r.bestAuc - eps.map(_.aucVal).max) < 1e-9)
    assert(eps(r.bestEpoch).improved)
    // clip_grad_norm: gradNorm is the PRE-clip norm (torch semantics);
    // `clipped` must flag exactly the epochs whose norm exceeded 1.0
    assert(eps.forall(e => e.clipped == (e.gradNorm > 1.0)), s"clip flag wrong: $eps")
    assert(eps.forall(_.gradNorm > 0.0), s"degenerate gradient: $eps")
    // ReduceLROnPlateau(factor=0.5): every lr is lr0 · 0.5^k, monotone non-increasing
    val ratios = eps.map(e => math.log(0.02 / e.lr) / math.log(2.0))
    assert(ratios.forall(x => math.abs(x - math.round(x)) < 1e-9), s"lr off-schedule: $eps")
    assert(eps.sliding(2).forall { case Seq(a, c) => c.lr <= a.lr + 1e-12; case _ => true })
  }

  test("M9 early stop: truncates to the exact prefix of the full trajectory") {
    // The pipelined loop computes each epoch's gradient BEFORE awaiting
    // the previous epoch's val AUC; when that AUC fires early stop the
    // speculative gradient must be discarded — the logged trajectory
    // has to be exactly the prefix the sequential loop would produce.
    val data = LinkPredict.trainingSet(spark, sfDir, cap = 5000)
    val full = graft.ml.AdamWTrainer.train(data, epochs = 20)
    val k = 1
    // expected stop: first epoch with k consecutive non-improvements
    var sinceBest = 0; var stopAt = -1
    full.epochs.foreach { e =>
      if (stopAt < 0) {
        if (e.improved) sinceBest = 0 else sinceBest += 1
        if (sinceBest >= k) stopAt = e.epoch
      }
    }
    assert(stopAt > 0, s"trajectory never plateaued, pick a different k: ${full.epochs}")
    val stopped = graft.ml.AdamWTrainer.train(data, epochs = 20, earlyStop = k)
    assert(stopped.epochs === full.epochs.take(stopAt + 1),
      s"early-stopped log is not a prefix of the full trajectory:\n" +
        s"stopped=${stopped.epochs}\nfull=${full.epochs}")
    assert(stopped.bestEpoch === full.epochs.take(stopAt + 1)
      .maxBy(_.aucVal).epoch)
    assert(math.abs(stopped.bestAuc -
      full.epochs.take(stopAt + 1).map(_.aucVal).max) < 1e-12)
  }

  test("M9 minibatch stream: one optimizer step per micro-batch, deterministic, learns") {
    val data = LinkPredict.trainingSet(spark, sfDir, cap = 5000)
    def run() = graft.ml.AdamWTrainer.trainMinibatchStream(spark, data,
      epochs = 2, nBatches = 4,
      stageDir = s"$tmp/m13_stream")
    val r = run()
    // every shard of every epoch produced exactly one optimizer step
    assert(r.steps.size === 2 * 4, s"steps: ${r.steps}")
    assert(r.steps.map(s => (s.epoch, s.step)) ===
      (for (e <- 0 until 2; s <- 0 until 4) yield (e, s)))
    // it learns: loss decreases across the trajectory, val AUC beats chance
    assert(r.steps.last.trainLoss < r.steps.head.trainLoss, s"no descent: ${r.steps}")
    assert(r.aucVal > 0.5, s"failed to learn: ${r.aucVal}")
    // the batch order is pinned (name + mtime agree), so a re-run
    // reproduces the trajectory bit-for-bit
    val r2 = run()
    assert(r2.steps === r.steps)
    assert(r2.aucVal === r.aucVal)
  }

  test("G6: dvid injections append partitions and report counts") {
    val dir = s"$tmp/graph"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val g1 = PropertyGraph(
      Seq(("n1", "Customer", 1)).toDF("id", "label", "dvid"),
      Seq(("n1", "n2", "PURCHASED", 1)).toDF("src", "dst", "type", "dvid"))
    val g2 = PropertyGraph(
      Seq(("n3", "Product", 2)).toDF("id", "label", "dvid"),
      Seq(("n2", "n3", "CONTAINS", 2)).toDF("src", "dst", "type", "dvid"))
    Injections.append(g1, dir)
    Injections.append(g2, dir)
    val loaded = Injections.load(spark, dir)
    assert(loaded.nodes.count() === 2 && loaded.edges.count() === 2)
    val rep = Injections.report(loaded).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(rep(("node", 1)) === 1 && rep(("edge", 2)) === 1)
    // dvid partition pruning reaches the file listing
    val pruned = loaded.edges.filter($"dvid" === 1)
    assert(pruned.count() === 1)
  }

  test("G6: compaction rewrites each dvid partition to one file, content unchanged") {
    val dir = s"$tmp/compact/orders"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$tmp/compact"))
    val o = graft.core.Tables.orders(spark, sfDir)
      .withColumn("dvid", (pmod($"o_orderkey", lit(2)) + 1).cast("int"))
    // simulate accreted micro-batches: 6 appends → many small files
    (1 to 6).foreach { _ =>
      o.sample(0.2, 7L).write.mode("append").partitionBy("dvid").parquet(dir)
    }
    def files(): Int = org.apache.commons.io.FileUtils
      .listFiles(new java.io.File(dir), Array("parquet"), true).size()
    val before = spark.read.parquet(dir).groupBy("dvid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nBefore = files()
    Injections.compact(spark, dir)
    val after = spark.read.parquet(dir).groupBy("dvid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(after === before, "compaction changed row counts")
    assert(files() === 2, s"expected 1 file per dvid, had $nBefore before, ${files()} after")
    assert(files() < nBefore)
  }

  test("§3.2 fold: embeddings → knn → louvain → features in one pass") {
    val g = graft.graph.GraphBuilder.fromTpch(spark, sfDir)
    val small = PropertyGraph(g.nodes,
      g.edges.filter($"type" =!= "BELONGS_TO")
        .filter(xxhash64($"src") % 20 === 0))
    val fold = FeatureFold.run(spark, small)
    assert(fold.features.count() > 0)
    assert(fold.features.columns.toSet.intersect(
      Set("degree", "degree_z", "log_degree", "community", "embedding")).size === 5)
    assert(fold.communities.select("community").distinct().count() >= 1)
  }

  test("S5: GraphML sink writes well-formed XML") {
    val g = PropertyGraph(
      Seq(("a", "Customer", 1), ("b", "Order", 1)).toDF("id", "label", "dvid"),
      Seq(("a", "b", "PURCHASED", 1)).toDF("src", "dst", "type", "dvid"))
    val path = s"$tmp/graphml"
    GraphMLSink.write(g, path)
    val txt = spark.read.text(path).as[String].collect().mkString("\n")
    assert(txt.startsWith("<?xml"))
    assert(txt.contains("<node id=\"a\">"))
    assert(txt.contains("<edge source=\"a\" target=\"b\">"))
    assert(txt.trim.endsWith("</graphml>"))
    scala.xml.XML.loadString(txt) // parses as XML
  }

  test("S7: GraphML source round-trips the sink (incl. XML escaping)") {
    val g = PropertyGraph(
      Seq(("a<1>", "Customer", 1), ("b&2", "Order", 1), ("c", "Product", 1))
        .toDF("id", "label", "dvid"),
      Seq(("a<1>", "b&2", "PURCHASED", 1), ("b&2", "c", "CONTAINS", 1))
        .toDF("src", "dst", "type", "dvid"))
    val path = s"$tmp/graphml_rt"
    GraphMLSink.write(g, path)
    val back = graft.sources.GraphMLSource.read(spark, path)
    val nodes = back.nodes.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(nodes === Set(("a<1>", "Customer"), ("b&2", "Order"), ("c", "Product")))
    val edges = back.edges.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(edges === Set(("a<1>", "b&2", "PURCHASED"), ("b&2", "c", "CONTAINS")))
  }
}
