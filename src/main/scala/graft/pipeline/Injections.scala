package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph

/** dvid-versioned incremental graph storage (SURVEY §2.10 G6, §2.12):
  * each injection appends a `dvid=N` partition to the nodes/edges
  * parquet tables — the engine's canonical checkpoint (replacing the
  * reference's whole-graph pickle between every stage, S6).
  *
  * At 100 TB this layout is the load-bearing piece: P9 dvid predicates
  * become partition pruning, injections are append-only (no rewrite of
  * history), and downstream feature folds read only the partitions they
  * need.
  */
object Injections {

  def append(g: PropertyGraph, graphDir: String): Unit = {
    g.nodes.write.mode(SaveMode.Append).partitionBy("dvid")
      .parquet(s"$graphDir/nodes")
    g.edges.write.mode(SaveMode.Append).partitionBy("dvid")
      .parquet(s"$graphDir/edges")
  }

  def load(spark: SparkSession, graphDir: String): PropertyGraph =
    PropertyGraph(
      spark.read.parquet(s"$graphDir/nodes"),
      spark.read.parquet(s"$graphDir/edges"))

  /** Small-file compaction for one table of the store: every dvid
    * partition is rewritten into one file (hash-partitioning by dvid
    * puts each version's rows in a single task). Append-only ingestion
    * accretes a file per micro-batch per partition; at 100 TB the file
    * count — not the byte count — becomes the scan bottleneck (footer
    * reads, task scheduling), so compaction is a standing maintenance
    * job. Rewrite happens to a staging dir first and swaps in, so a
    * crash never leaves a partial store. */
  def compact(spark: SparkSession, tableDir: String): Unit = {
    val staged = s"$tableDir.compacting"
    spark.read.parquet(tableDir)
      .repartition(col("dvid"))
      .write.mode(SaveMode.Overwrite).partitionBy("dvid").parquet(staged)
    val dir = new java.io.File(tableDir)
    val bak = new java.io.File(s"$tableDir.old")
    if (bak.exists()) { def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete() }; rm(bak) }
    dir.renameTo(bak)
    new java.io.File(staged).renameTo(dir)
    def rm2(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm2)); f.delete() }
    rm2(bak)
  }

  /** The injection verification report (A1 + dvid counts — the
    * reference prints this after every injection). */
  def report(g: PropertyGraph): DataFrame =
    g.nodes.groupBy("dvid").agg(count(lit(1)).as("cnt")).withColumn("kind", lit("node"))
      .unionByName(
        g.edges.groupBy("dvid").agg(count(lit(1)).as("cnt")).withColumn("kind", lit("edge")))
      .select("kind", "dvid", "cnt").orderBy("kind", "dvid")
}
