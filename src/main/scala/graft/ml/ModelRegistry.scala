package graft.ml

import java.nio.file.{Files, Paths}
import org.apache.spark.ml.classification.{GBTClassificationModel, LogisticRegressionModel}
import org.apache.spark.ml.util.MLWritable
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Model + metrics artifact management (SURVEY §2.1 S8/S9, §2.11 M6):
  * MLlib-native save/load for models, JSON for the performance history,
  * and the reference's regression-alert policy — evaluate the previous
  * model on new data before replacing it, alert when AUC drops more than
  * 0.02 (xgboost_training_for_big_data.py:858-873).
  */
object ModelRegistry {

  /** S9: persist a fitted model (MLlib writer → parquet + metadata). */
  def saveModel(model: MLWritable, path: String): Unit =
    model.write.overwrite().save(path)

  /** Serialization hygiene: drop MLlib's lazily-attached training
    * summary. The summary holds the predictions DataFrame, and through
    * it the SparkSession the model was fit on — so a model captured in a
    * task closure drags the whole session into serialization. That works
    * only while every lazily-created session field happens to be null;
    * the moment anything initializes a non-serializable one (Spark 4's
    * `ObservationManager` is created by the first `Observation()` on the
    * session), every post-fit `transform` dies with
    * NotSerializableException. Stripping the summary keeps scoring
    * closures model-only. Walks the class hierarchy because
    * HasTrainingSummary's field is a private trait var with a
    * compiler-mangled name; models without a summary pass through
    * untouched, and PipelineModel is cleaned stage-by-stage. */
  def stripSummary[M](model: M): M = {
    def clear(o: AnyRef): Unit = {
      var c: Class[_] = o.getClass
      while (c != null) {
        c.getDeclaredFields.foreach { f =>
          // name AND type gated: only Option-typed summary slots are
          // cleared, so a future Spark that renames the field (silent
          // no-op caught by SerializationHygieneSpec) or adds a non-
          // Option field containing the substring can't be corrupted
          // by an unconditional None assignment
          if (f.getName.contains("trainingSummary") &&
              classOf[Option[_]].isAssignableFrom(f.getType)) {
            f.setAccessible(true)
            f.set(o, None)
          }
        }
        c = c.getSuperclass
      }
    }
    model match {
      case p: org.apache.spark.ml.PipelineModel => p.stages.foreach(clear)
      case m: AnyRef => clear(m)
      case _ => ()
    }
    model
  }

  def loadGbt(path: String): GBTClassificationModel =
    GBTClassificationModel.load(path)

  def loadLr(path: String): LogisticRegressionModel =
    LogisticRegressionModel.load(path)

  /** S8: append a metrics snapshot to the JSON perf-history file
    * (one JSON object per line, newest last). */
  def appendHistory(path: String, metrics: Map[String, Double]): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val line = metrics.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}\n")
    Files.writeString(p, line,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }

  def readHistory(path: String): Seq[Map[String, Double]] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Seq.empty
    else Files.readAllLines(p).toArray(Array.empty[String]).toSeq
      .filter(_.trim.nonEmpty)
      .map { line =>
        line.trim.stripPrefix("{").stripSuffix("}").split(",")
          .map(_.split(":")).collect {
            case Array(k, v) => k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble
          }.toMap
      }
  }

  final case class CompatProbe(prevAuc: Option[Double], newAuc: Double,
                               drop: Double, alert: Boolean)

  /** M6: score new data with the previously saved model and compare its
    * AUC with the recorded history — the pre-retrain control evaluation.
    * Alert threshold mirrors the reference's −0.02. */
  def compatProbe(spark: SparkSession, modelPath: String, historyPath: String,
                  newData: DataFrame, threshold: Double = 0.02,
                  algo: String = "gbt"): CompatProbe = {
    val model: org.apache.spark.ml.Transformer =
      if (algo == "lr") loadLr(modelPath) else loadGbt(modelPath)
    val scored = model.transform(newData)
    val auc = new org.apache.spark.ml.evaluation.BinaryClassificationEvaluator()
      .setLabelCol("label").setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderROC").evaluate(scored)
    val prev = readHistory(historyPath).lastOption.flatMap(_.get("auc_val"))
    val drop = prev.map(_ - auc).getOrElse(0.0)
    CompatProbe(prev, auc, drop, drop > threshold)
  }
}
