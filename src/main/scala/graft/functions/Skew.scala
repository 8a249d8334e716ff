package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins (the "salting" piece of the 100 TB
  * design, complementing AQE's runtime skew-join split — salting works
  * even where AQE can't intervene: inside a single stage feeding a
  * downstream keyed aggregation, or when one key exceeds what a split
  * can balance).
  *
  * Shape: the skewed (fact) side gets a deterministic salt in
  * [0, salts) appended to the join key; the small (dim) side is
  * exploded into `salts` replicas so every (key, salt) combination
  * matches. One hot key's single reducer becomes `salts` parallel
  * reducers; dim-side cost grows by the replication factor, which is
  * why the dim side must be the small one.
  */
object Skew {

  /** Deterministic per-row salt — hash of the whole row, so it is
    * stable under retries, AQE replans, and any partitioning (never
    * rand(): SURVEY §7.4 trap 9). */
  def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts))

  /** Inner equi-join of a skewed fact side against a small dim side,
    * salted `salts` ways on `keys`. Result equals
    * `fact.join(dim, keys)` exactly — only the physical key
    * distribution changes. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val f = fact.withColumn("__salt", rowSalt(fact, salts))
    val d = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    f.join(d, keys :+ "__salt").drop("__salt")
  }
}
