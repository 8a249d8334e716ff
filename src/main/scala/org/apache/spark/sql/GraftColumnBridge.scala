package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters in Spark 4
  * (columns are connect-agnostic now, so `new Column(expr)` is gone).
  * Standard extension-library practice: a tiny shim inside the sql
  * package namespace, nothing else lives here.
  */
object GraftColumnBridge {
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Re-stamp a localCheckpoint'ed DataFrame's `LogicalRDD` with the
    * hash partitioning its build plan guaranteed. Under AQE the adaptive
    * plan reports `UnknownPartitioning` until execution finishes, so the
    * checkpoint captures Unknown and every downstream window re-shuffles
    * data the build already co-located. The caller asserts the layout it
    * created (the checkpoint materializes the build plan's output
    * partitions 1:1 — `localCheckpoint` caches the executed RDD's
    * partitions as they are); a wrong claim would mis-cluster windows,
    * so use ONLY straight after checkpointing a frame whose plan ends in
    * `repartition(n, cols…)`-established partitioning. No-op for frames
    * that are not checkpoint scans. */
  def withHashPartitioning(df: DataFrame, cols: Seq[String],
                           numParts: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.LogicalRDD
    df.queryExecution.optimizedPlan match {
      case lr: LogicalRDD =>
        val attrs = cols.map(c => lr.output.find(_.name == c).getOrElse(
          return df))
        val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
        val stamped = new LogicalRDD(lr.output, lr.rdd,
          HashPartitioning(attrs, numParts), Nil, lr.isStreaming, None)(
          spark, None, None)
        classic.Dataset.ofRows(spark, stamped)
      case _ => df
    }
  }
}
