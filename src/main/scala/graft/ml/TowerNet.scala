package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ColFns

/** The reference's multi-tower ARCHITECTURE trained jointly with its
  * own loop semantics — the piece `MultiTower` (MLlib flat-MLP) and
  * `AdamWTrainer` (linear scorer) each approximated from one side
  * (reference `Neural_network_multi_towered_training.py:62-150` for
  * the model, `:703-790` for the loop):
  *
  *   per tower t: z_t = relu(W1_t x_t + b1_t)   (its own hidden layer)
  *   head:        logit = w2 · concat(z_1..z_5) + b2
  *
  * trained end-to-end — head gradients flow THROUGH the tower layers
  * (∂L/∂W1_t = δ_t ⊗ x_t with δ_t = g · w2_t · 1[pre_t > 0]), which is
  * what separates a tower network from per-tower stacking. Loop
  * semantics are AdamWTrainer's, re-stated here verbatim so the two
  * trajectories stay independently auditable: AdamW (torch defaults,
  * decoupled decay on every parameter), global grad-norm clip at 1.0,
  * ReduceLROnPlateau(max, 0.5, threshold 1e-4), BCEWithLogits
  * pos_weight, strict-best checkpoint + restore.
  *
  * Size-scaled divergences (documented, same §7.4 rule as MultiTower's
  * hidden sizes): tower widths are 4 units against the engine's 7
  * features (reference: 16–128 against 137), the combined [128, 64]
  * hidden stack collapses into the final linear head, and
  * BatchNorm/Dropout are off — full-batch gradients make BatchNorm
  * plain standardization (applied to the inputs) and eval-mode Dropout
  * is the identity.
  *
  * The 100 TB shape is AdamWTrainer's: each epoch is ONE aggregate
  * pass over the cached standardized corpus computing every gradient
  * sum map-side (≈70 sum columns — W1/b1/w2/b2 — at these widths),
  * the model is a broadcast 1-row frame of ~70 doubles (plans stay
  * source-identical per epoch, one codegen compile serves the loop),
  * and the optimizer state lives on the driver. Nothing per-row ever
  * leaves the executors.
  */
object TowerNet {

  /** The reference's five towers mapped onto the engine's link
    * features (degree / temporal / structured / pricing / derived —
    * `Neural_network_multi_towered_training.py:62-116`). */
  val towers: Seq[(String, Seq[String])] = Seq(
    "tw_degree" -> Seq("cust_frequency", "part_popularity"),
    "tw_temporal" -> Seq("cust_recency"),
    "tw_value" -> Seq("acctbal", "price"),
    "tw_pricing" -> Seq("discount"),
    "tw_derived" -> Seq("bal_x_price"))
  val hidden = 4

  final case class Epoch(epoch: Int, trainLoss: Double, aucVal: Double,
                         lr: Double, gradNorm: Double, clipped: Boolean,
                         improved: Boolean)
  final case class Result(params: Array[Double], epochs: Seq[Epoch],
                          bestAuc: Double, bestEpoch: Int, nParams: Int)

  // ---- flat parameter layout: for each tower (in declared order):
  // W1 row-major (j, i), then b1; after all towers: w2 (tower order),
  // then b2. One layout function keeps the broadcast frame, the logit
  // expression, the gradient aggregate order, and the Adam state
  // walking the SAME indices.
  private def nParamsTotal: Int =
    towers.map { case (_, fs) => hidden * fs.size + hidden }.sum +
      towers.size * hidden + 1

  /** torch nn.Linear default init, deterministically seeded:
    * U(−1/√fan_in, 1/√fan_in) for weights and bias of each layer. */
  private def init(seed: Long): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    val buf = Array.newBuilder[Double]
    towers.foreach { case (_, fs) =>
      val a = 1.0 / math.sqrt(fs.size)
      (0 until hidden * fs.size + hidden).foreach(_ =>
        buf += (rnd.nextDouble() * 2 - 1) * a)
    }
    val aHead = 1.0 / math.sqrt(towers.size * hidden)
    (0 until towers.size * hidden).foreach(_ =>
      buf += (rnd.nextDouble() * 2 - 1) * aHead)
    buf += (rnd.nextDouble() * 2 - 1) * aHead // b2
    buf.result()
  }

  /** Per-unit pre-activation expressions from broadcast weight columns
    * p0..pP (consumed in flat-layout order). `x` maps feature name →
    * standardized column. These deep trees appear exactly ONCE, in the
    * stage-1 projection — every later stage references the named
    * `pre_j` columns, so the per-epoch plan (re-analyzed on every
    * action) stays hundreds of nodes smaller than inlining them into
    * each of the ~70 gradient sums. */
  private def preExprs(x: Map[String, Column]): Seq[Column] = {
    var k = 0
    def p(): Column = { val c = col(s"p$k"); k += 1; c }
    towers.flatMap { case (_, fs) =>
      val unitW = (0 until hidden).map(_ => fs.map(_ => p()))
      val unitB = (0 until hidden).map(_ => p())
      (0 until hidden).map { j =>
        fs.zip(unitW(j)).foldLeft(unitB(j)) {
          case (acc, (f, wji)) => acc + wji * x(f)
        }
      }
    }
  }

  /** The logit over named z columns: Σ w2_j·z_j + b2. */
  private def logitExpr(w2Offset: Int, nUnits: Int): Column =
    (0 until nUnits).foldLeft[Column](lit(0.0)) { (acc, j) =>
      acc + col(s"p${w2Offset + j}") * col(s"z_$j")
    } + col(s"p${w2Offset + nUnits}")

  /** Gradient-sum aggregate columns in flat-layout order — every term
    * is a product of plain named columns (delta_j, x_i, z_j, gg). */
  private def gradAggs(features: Seq[String]): Seq[Column] = {
    val fIdx = features.zipWithIndex.toMap
    val buf = Seq.newBuilder[Column]
    var unit = 0
    towers.foreach { case (_, fs) =>
      (0 until hidden).foreach(j =>
        fs.foreach(f =>
          buf += sum(col(s"delta_${unit + j}") * col(s"x${fIdx(f)}"))))
      (0 until hidden).foreach(j => buf += sum(col(s"delta_${unit + j}")))
      unit += hidden
    }
    (0 until towers.size * hidden).foreach(j =>
      buf += sum(col("gg") * col(s"z_$j")))
    buf += sum(col("gg"))
    buf.result()
  }

  /** Train on `data` (label + LinkPredict.featureNames), AdamWTrainer's
    * split/standardization/loop conventions. */
  def train(data: DataFrame, epochs: Int = 10, lr0: Double = 0.02,
            weightDecay: Double = 1e-4, clipNorm: Double = 1.0,
            lrPatience: Int = 5, lrFactor: Double = 0.5,
            seed: Long = 61L): Result = {
    val features = LinkPredict.featureNames
    val split = data.coalesce(2).withColumn("part",
      when(ColFns.pseudoUniform(
        xxhash64(col("customer"), col("product")), seed) < 0.8, "train")
        .otherwise("val"))
    val momAgg = features.flatMap(c =>
      Seq(avg(col(c)).as(s"mu_$c"), stddev_pop(col(c)).as(s"sd_$c")))
    val mom = split.filter(col("part") === "train")
      .agg(momAgg.head, momAgg.tail: _*).head()
    val mu = features.indices.map(i => mom.getDouble(2 * i)).toArray
    val sd = features.indices.map { i =>
      val s = mom.getDouble(2 * i + 1); if (s > 0) s else 1.0
    }.toArray
    val xCols = features.zipWithIndex.map { case (c, i) =>
      ((col(c) - mu(i)) / sd(i)).as(s"x$i")
    }
    val frame = split.select(xCols ++ Seq(col("label").as("y"), col("part")): _*)
      .cache()
    val trainDf = frame.filter(col("part") === "train")
    val valDf = frame.filter(col("part") === "val")
    try {
      val nPos = trainDf.filter(col("y") === 1.0).count().toDouble
      val nNeg = trainDf.count().toDouble - nPos
      val posWeight = if (nPos > 0) nNeg / nPos else 1.0
      val x = features.zipWithIndex
        .map { case (c, i) => c -> col(s"x$i") }.toMap

      val P = nParamsTotal
      val w2Offset = P - towers.size * hidden - 1
      val params = init(seed)
      val mW = new Array[Double](P); val vW = new Array[Double](P)
      val (beta1, beta2, eps) = (0.9, 0.999, 1e-8)
      var lr = lr0
      var bestAuc = 0.0; var bestEpoch = -1
      var bestP: Array[Double] = params.clone()
      var schedBest = 0.0; var plateau = 0
      val log = Seq.newBuilder[Epoch]

      val ss = data.sparkSession
      val schema = org.apache.spark.sql.types.StructType(
        (0 until P).map(i => org.apache.spark.sql.types.StructField(
          s"p$i", org.apache.spark.sql.types.DoubleType, nullable = false)).toArray)
      // Array.toSeq copies in 2.13, so each frame is an immutable
      // snapshot of the params at call time — the background val-AUC
      // job can never observe a later in-place update (same contract
      // as AdamWTrainer's WeightModel.frame)
      def weightFrame: DataFrame = ss.createDataFrame(
        java.util.Collections.singletonList(
          org.apache.spark.sql.Row.fromSeq(params.toSeq)), schema)

      val nUnits = towers.size * hidden
      // staged row-level pipeline: pre → z/logit → g/loss → delta, each
      // intermediate computed once as a named column; the aggregate
      // references only plain attributes
      def staged(df: DataFrame): DataFrame = {
        val st1 = df.select(col("*") +: preExprs(x).zipWithIndex
          .map { case (c, j) => c.as(s"pre_$j") }: _*)
        val st2 = st1.select(col("*") +: ((0 until nUnits)
          .map(j => greatest(col(s"pre_$j"), lit(0.0)).as(s"z_$j")): Seq[Column]): _*)
          .withColumn("lg", logitExpr(w2Offset, nUnits))
        val sig = lit(1.0) / (lit(1.0) + exp(-col("lg")))
        val st3 = st2
          .withColumn("gg", (lit(1.0) - col("y")) * sig -
            lit(posWeight) * col("y") * (lit(1.0) - sig))
          .withColumn("lossr", (lit(1.0) + (lit(posWeight) - 1.0) * col("y")) *
            (greatest(col("lg"), lit(0.0)) - col("lg") * col("y") +
              log1p(exp(-abs(col("lg"))))))
        st3.select(col("*") +: ((0 until nUnits).map(j =>
          (col("gg") * col(s"p${w2Offset + j}") *
            when(col(s"pre_$j") > 0.0, 1.0).otherwise(0.0)).as(s"delta_$j"))
          : Seq[Column]): _*)
      }
      val aggs = gradAggs(features) ++
        Seq(sum(col("lossr")).as("loss"), count(lit(1)).as("n"))

      def lap[T](tag: String)(f: => T): T =
        graft.core.Debug.lap("GRAFT_TOWER_DEBUG", tag)(f)

      // Pipelined evaluation: epoch e's val-AUC job and epoch e+1's
      // gradient job both depend only on the post-update weights of
      // epoch e — neither reads the other's result (the AUC feeds the
      // LR scheduler and the best-checkpoint, both consumed at the
      // NEXT update). So the AUC runs on a side thread while the next
      // gradient pass runs inline, and is awaited just before its
      // result is first needed. Per-epoch wall drops from
      // grad+auc to max(grad, auc); the trajectory is bit-identical
      // because every read still happens in the original order.
      val aucPool = java.util.concurrent.Executors.newSingleThreadExecutor(
        (r: Runnable) => {
          val th = new Thread(r, "towernet-val-auc"); th.setDaemon(true); th
        })
      val aucEc = scala.concurrent.ExecutionContext.fromExecutorService(aucPool)
      // bookkeeping for epoch e, run once its AUC arrives: strict-best
      // checkpoint (params still hold epoch e's post-update weights —
      // the await precedes epoch e+1's update), plateau scheduler, log
      var lastLoss = 0.0; var lastNorm = 0.0; var lastClipped = false
      def bookkeep(e: Int, auc: Double): Unit = {
        val improved = auc > bestAuc
        if (improved) { bestAuc = auc; bestEpoch = e; bestP = params.clone() }
        if (auc > schedBest + 1e-4) { schedBest = auc; plateau = 0 }
        else plateau += 1
        if (plateau > lrPatience) { lr *= lrFactor; plateau = 0 }
        log += Epoch(e, lastLoss, auc, lr, lastNorm, lastClipped, improved)
      }
      var pendingAuc: scala.concurrent.Future[Double] = null
      try {
        var epoch = 0
        while (epoch < epochs) {
          val row = lap(s"grad e$epoch")(
            staged(trainDf.crossJoin(broadcast(weightFrame)))
              .agg(aggs.head, aggs.tail: _*).head())
          if (pendingAuc != null)
            bookkeep(epoch - 1, scala.concurrent.Await.result(
              pendingAuc, scala.concurrent.duration.Duration.Inf))
          val n = row.getLong(P + 1).toDouble
          val grads = (0 until P).map(i => row.getDouble(i) / n).toArray
          val loss = row.getDouble(P) / n
          val norm = math.sqrt(grads.map(d => d * d).sum)
          val scale = if (norm > clipNorm) clipNorm / norm else 1.0
          val t = epoch + 1
          val bc1 = 1.0 - math.pow(beta1, t)
          val bc2 = 1.0 - math.pow(beta2, t)
          var i = 0
          while (i < P) {
            val gc = grads(i) * scale
            mW(i) = beta1 * mW(i) + (1 - beta1) * gc
            vW(i) = beta2 * vW(i) + (1 - beta2) * gc * gc
            params(i) = params(i) - lr * (mW(i) / bc1 /
              (math.sqrt(vW(i) / bc2) + eps) + weightDecay * params(i))
            i += 1
          }
          lastLoss = loss; lastNorm = norm; lastClipped = scale < 1.0
          val wf = weightFrame // frozen post-update snapshot for the side job
          val e = epoch
          pendingAuc = scala.concurrent.Future(lap(s"auc e$e")(
            Metrics.auc(staged(valDf.crossJoin(broadcast(wf)))
              .select(col("y").as("label"),
                (lit(1.0) / (lit(1.0) + exp(-col("lg")))).as("p")),
              "label", col("p"))))(aucEc)
          epoch += 1
        }
        if (pendingAuc != null)
          bookkeep(epochs - 1, scala.concurrent.Await.result(
            pendingAuc, scala.concurrent.duration.Duration.Inf))
        Result(bestP, log.result(), bestAuc, bestEpoch, P)
      } finally aucEc.shutdown()
    } finally frame.unpersist()
  }
}
