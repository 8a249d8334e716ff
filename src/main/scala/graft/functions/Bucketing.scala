package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location (the "pre-shuffle once, join many times
  * free" piece of the 100 TB design): writing both sides of a recurring
  * equi-join bucketed and sorted by the join key lets every subsequent
  * join run shuffle-free — each task zips bucket i with bucket i.
  *
  * For the e-commerce graph the natural bucket layouts are
  * edges(src) × nodes(id) (feature injection J9) and
  * orders(o_orderkey) × lineitem(l_orderkey) (the 2-hop J3 prefix):
  * both joins recur every injection fold, so the one-time bucketed
  * write amortizes immediately.
  */
object Bucketing {

  /** Persist `df` as a bucketed, sorted managed table (overwrite).
    * Drops any existing table first and clears an orphaned managed
    * location (left behind when a previous process died between catalog
    * drop and directory cleanup) — saveAsTable refuses to reuse one. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(wh)) fs.delete(wh, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }

  /** True if the physical plan of `df` contains a shuffle exchange —
    * the assertion hook for co-location tests. */
  def hasShuffle(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan
    plan.exists(_.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
  }

  /** Join two same-bucketed tables on their bucket key. With matching
    * bucket counts Catalyst plans a sort-merge join with NO exchange on
    * either side. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
