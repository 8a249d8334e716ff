package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the housekeeping operator every streaming
  * ingest path needs. Micro-batch sinks (e7/e11's foreachBatch
  * appends, any AvailableNow drop) leave a long tail of KB-sized
  * files; at 100 TB that tail dominates scan task-scheduling and
  * NameNode/listing costs long before it dominates bytes. Compaction
  * rewrites a directory to ⌈totalBytes / targetBytes⌉ files.
  *
  * The rewrite uses `coalesce`, NOT `repartition`: compaction's
  * contract is "same rows, fewer files", and coalesce merges input
  * splits with ZERO shuffle — the whole job is a read + write. (A
  * shuffle would cost a second copy of the data to fix a metadata
  * problem.) File-size balance is whatever the input splits give;
  * that is the accepted industry trade — size-targeted rebalancing is
  * what the s12 sorted-layout WRITE path is for.
  */
object Compactor {

  /** Bytes currently on disk under `dir` (data files only). */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
      .map(_.getLen).sum
  }

  /** Number of data files under `dir`. */
  def dataFiles(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(f => f.isFile && f.getPath.getName.startsWith("part-"))
  }

  /** Compact `inDir` (parquet) into `outDir` with files of roughly
    * `targetBytes`. Returns the number of output files planned. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long): Int = {
    val total = dataBytes(spark, inDir)
    val n = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir).coalesce(n)
      .write.mode("overwrite").parquet(outDir)
    n
  }

  /** Read back a compacted directory. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
