package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-sweep data generator: tiles a driver testdata SF directory
  * `copies`× with consistent key shifts, so the data-proportional
  * kernels can be measured beyond sf0.1 (VERDICT r10 #3) without
  * touching the read-only driver testdata.
  *
  * Key discipline (per copy i): every surrogate key shifts by
  * i·(max(key)+1), applied to BOTH sides of every FK edge — each copy
  * is a self-consistent universe, so joins/graphs scale linearly by
  * construction and graph components don't merge across copies.
  * Dimension tables (region, nation) are NOT tiled: FK targets stay
  * valid and group-by cardinalities stay realistic. Document text is
  * alphabet-ROTATED per copy (see the documents tile below for why a
  * token tag fails) — cross-copy shingles and gram hashes can never
  * collide, so the dedup kernels see the SAME per-copy duplicate
  * structure as the source SF instead of a pathological
  * everything-matches-everything blowup. Embedding vectors are copied
  * verbatim (vec_id shifted by the doc_id base it joins against); the
  * ANN sweep rows note this when interpreting cross-copy dup counts.
  *
  * Usage: graft.tools.ScaleUp <srcSfDir> <dstDir> <copies>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(src, dst, copiesS) = args.take(3)
    val copies = copiesS.toInt
    // input-only validation BEFORE any writes: a late failure would
    // leave a partially-tiled destination that looks like a valid SF.
    // (rotation i = 0 recurs at every multiple of 26 — copy 26 would
    // duplicate copy 0 verbatim and re-create the cross-copy collision
    // blowup the rotation exists to prevent)
    require(copies >= 1 && copies <= 26,
      s"copies=$copies out of [1, 26]: the per-copy alphabet rotation " +
        "repeats at i % 26 == 0 — pick <= 26 copies or extend the perturbation")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")
    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    // dims copied verbatim — FK targets, not fact mass
    Seq("region", "nation").foreach(n => write(n, read(n)))

    // Every key's shift base comes from the table that OWNS the key,
    // never from the referencing column's own max: an FK column whose
    // maximum referenced key happens to be unreferenced (TPC-H leaves
    // every custkey ≡ 0 mod 3 orderless) would otherwise shift by a
    // smaller base than its PK and cross-wire copies. One base per key
    // domain keeps every copy a self-consistent universe.
    def keyBase(table: String, key: String): Long =
      read(table).agg(max(col(key))).head().getLong(0) + 1L
    val custBase = keyBase("customer", "c_custkey")
    val suppBase = keyBase("supplier", "s_suppkey")
    val partBase = keyBase("part", "p_partkey")
    val orderBase = keyBase("orders", "o_orderkey")
    val eventBase = keyBase("events", "event_id")
    val docBase = keyBase("documents", "doc_id")

    /** One pass per table: crossJoin a `copies`-row frame, shift each
      * named key by i·(its domain base), preserve column order. */
    def tile(name: String, keys: Seq[(String, Long)],
             extra: DataFrame => DataFrame = identity): Unit = {
      val df0 = read(name)
      val cols = df0.columns
      val tiled0 = df0.crossJoin(
        broadcast(spark.range(copies.toLong).toDF("__c")))
      val shifted = keys.foldLeft(tiled0) { case (df, (k, m)) =>
        df.withColumn(k, col(k) + col("__c") * lit(m))
      }
      write(name, extra(shifted).select(cols.head, cols.tail: _*))
    }

    // names carry the copy tag: the fuzzy-match/ER kernels block on name
    // substrings, and 10 verbatim copies of every name would merge the
    // blocks into a 100× pair blowup no organic corpus has (distinct
    // real-world names keep blocks bounded — the tag preserves that)
    tile("customer", Seq("c_custkey" -> custBase), extra = df =>
      df.withColumn("c_name",
        when(col("__c") === 0, col("c_name"))
          .otherwise(concat(col("c_name"), lit("_c"), col("__c")))))
    tile("supplier", Seq("s_suppkey" -> suppBase), extra = df =>
      df.withColumn("s_name",
        when(col("__c") === 0, col("s_name"))
          .otherwise(concat(col("s_name"), lit("_c"), col("__c")))))
    tile("part", Seq("p_partkey" -> partBase))
    tile("orders", Seq("o_orderkey" -> orderBase, "o_custkey" -> custBase))
    tile("lineitem", Seq("l_orderkey" -> orderBase, "l_partkey" -> partBase,
      "l_suppkey" -> suppBase))
    tile("events", Seq("event_id" -> eventBase, "user_id" -> custBase))
    // vec_id lives in the doc_id DOMAIN (sql_extension_fns joins
    // embeddings.vec_id = documents.doc_id), so it must shift by the
    // document base — its own max is smaller (not every doc has a
    // vector) and would cross-wire copies
    tile("embeddings", Seq("vec_id" -> docBase))
    // documents: per-copy ALPHABET ROTATION, not token tagging. The
    // dedup kernels shingle CHARACTERS, and any uniform tag string
    // becomes a copy-wide shared shingle fabric that collapses minhash
    // signatures into giant buckets (measured: candidate pairs went
    // 591× for 10× docs under a "_c<i>" token suffix). A per-copy
    // caesar substitution is a bijection on the text: within-copy
    // similarity structure is preserved EXACTLY (isomorphic shingle
    // sets, identical dup clusters), cross-copy shingles are disjoint,
    // and n_chars/token boundaries don't move.
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val rotated = (1 until copies).foldLeft(
        when(col("__c") === 0, col("text"))) { (w, i) =>
      val r = alpha.drop(i) + alpha.take(i)
      w.when(col("__c") === i, translate(col("text"), alpha, r))
    }
    tile("documents", Seq("doc_id" -> docBase), extra = df =>
      df.withColumn("text", rotated))

    spark.stop()
  }
}
