package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. Near-dup via embedding
  * cosine lives in graft.sim.Similarity (threshold join).
  *
  * Scale design: every variant is a groupBy/join keyed by a *computed
  * signature* (content hash, band signature, simhash prefix) — the
  * shuffle moves signatures + ids, never full documents, and candidate
  * verification joins are bounded by bucket size. MinHash values use
  * md5 (not Spark's xxhash64) so the DuckDB oracle reproduces them.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the lowest doc id as the
    * canonical representative (hash-groupBy; one shuffle of (md5, id)). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** MinHash signature component j over a shingle set: the minimum
    * md5(j || shingle) hex string. String-min of hex digests is a
    * perfectly good uniform min-hash and is engine-portable. */
  def minhash(shingleCol: Column, j: Int): Column =
    array_min(transform(shingleCol, s => md5(concat(lit(j.toString), lit("|"), s))))

  /** MinHash component j derived from a PRE-HASHED shingle array: the
    * minimum of the j-th 8-hex-digit slice of each md5. One md5 per
    * shingle serves all `32/8 = 4` components (md5 bits are independent
    * across slices, which is all min-hashing needs) — vs `minhash`,
    * which pays a fresh md5 per shingle per component. `hashedCol` must
    * be a bound column (see winnow: an inlined tree re-evaluates the
    * md5 array per lambda element). */
  def minhashSlice(hashedCol: Column, j: Int): Column =
    array_min(transform(hashedCol, h => h.substr(j * 8 + 1, 8)))

  /** Explode-free shingle column used by the dedup pipelines below.
    * Normalization stays in codegen'd builtins; shingling itself is the
    * custom CharShingles expression (single pass, distinct-preserving)
    * rather than a per-character interpreted lambda chain. */
  def shingleArray(text: Column, n: Int): Column =
    graft.plans.expressions.char_shingles(
      regexp_replace(lower(trim(text)), "\\s+", " "), n)

  /** MinHash + LSH banding: `bands` bands of `rowsPerBand` minhashes;
    * documents sharing any band signature become candidate pairs.
    * Returns (band, signature, doc_a, doc_b) candidate pairs a<b.
    */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 n: Int = 5, bands: Int = 2, rowsPerBand: Int = 2): DataFrame = {
    require(bands * rowsPerBand <= 4, "slice scheme yields 4 components per md5")
    // one md5 per shingle, materialized as a bound column; every
    // signature component is then a cheap slice-min over it
    val sh = docs.select(col(idCol).as("doc"), shingleArray(col(textCol), n).as("sh"))
      .withColumn("hs", graft.plans.expressions.array_md5(col("sh")))
      // all signature components in one pass (MinhashSlices) — the
      // per-component transform+array_min interpreted a lambda per
      // shingle per component
      .withColumn("mins", graft.plans.expressions.minhash_slices(
        col("hs"), bands * rowsPerBand))
    val sigCols = (0 until bands).map { b =>
      val mins = (0 until rowsPerBand).map(r =>
        element_at(col("mins"), b * rowsPerBand + r + 1))
      concat_ws("_", mins: _*).as(s"band_$b")
    }
    // materialized: the signature table feeds BOTH sides of the
    // candidate self-join, and Spark does not share the subplan across
    // join sides — unmaterialized, every shingle md5 runs twice
    val signed = sh.select(col("doc") +: sigCols: _*).localCheckpoint(true)
    val bandDf = (0 until bands).map { b =>
      signed.select(lit(b).as("band"), col(s"band_$b").as("sig"), col("doc"))
    }.reduce(_ unionAll _)
    val a = bandDf.select(col("band"), col("sig"), col("doc").as("doc_a"))
    val b = bandDf.select(col("band"), col("sig"), col("doc").as("doc_b"))
    a.join(b, Seq("band", "sig")).filter(col("doc_a") < col("doc_b")).distinct()
  }

  /** SimHash: 16-bit signature. Bit i of a token's hash = hex digit
    * parity derived from md5; per-bit weighted vote over tokens; sign →
    * bit. Engine-portable (md5 + integer math only). */
  def simhash(text: Column, bits: Int = 16): Column = {
    val toks = array_distinct(split(lower(trim(text)), "\\s+"))
    // vote per bit: sum over tokens of ±1 (±1 from md5 hex digit parity
    // at position i); bit set if the vote is positive
    val votes = (0 until bits).map { i =>
      val vote = aggregate(toks, lit(0),
        (acc, t) => acc + when(
          substring(md5(t), i + 1, 1).isin("1", "3", "5", "7", "9", "b", "d", "f"),
          1).otherwise(-1))
      when(vote > 0, lit(1L << i)).otherwise(0L)
    }
    votes.reduce(_ + _)
  }

  /** n-gram Jaccard similarity for candidate pairs: explode distinct
    * shingles, self-join on shingle, |∩| per pair, then
    * J = |∩| / (|A|+|B|−|∩|). `bucketCol` bounds the candidate space
    * (only pairs agreeing on the bucket are compared) — at corpus scale
    * pass a coarse signature (e.g. a band or length bucket). */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   bucket: Column, n: Int = 5, minJaccard: Double = 0.0): DataFrame = {
    // materialized: `base` is consumed four times (both explode sides +
    // both size lookups); without it the shingle build runs 4×.
    // spreadForMap: the shingle build must not run at the file count's
    // parallelism (single-file trap; no-op on a well-split input)
    val base = graft.core.Tables.spreadForMap(docs, col(idCol))
      .select(col(idCol).as("doc"), bucket.as("bucket"),
        shingleArray(col(textCol), n).as("sh")).localCheckpoint(true)
    val sizes = base.select(col("doc"), col("bucket"), size(col("sh")).as("n_sh"))
    val ex = base.select(col("doc"), col("bucket"), explode(col("sh")).as("s"))
    val a = ex.select(col("bucket"), col("doc").as("doc_a"), col("s"))
    val b = ex.select(col("bucket"), col("doc").as("doc_b"), col("s"))
    val inter = a.join(b, Seq("bucket", "s"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(sizes.select(col("doc").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .withColumn("jaccard",
        round(col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "n_inter", "jaccard")
  }

  /** The 3 length buckets a probe row must visit so that every partner
    * within edit distance `maxDist` is reachable: lev ≤ τ implies
    * |len(a) − len(b)| ≤ τ, bucket floors are monotone and adjacent
    * (bucketW > τ), so the floors of len−τ / len / len+τ cover every
    * bucket a qualifying partner can live in. */
  private def probeBins(name: Column, maxDist: Int, bucketW: Int): Column =
    array_distinct(array(
      floor((length(name) - maxDist) / bucketW).cast("int"),
      floor(length(name) / bucketW).cast("int"),
      floor((length(name) + maxDist) / bucketW).cast("int")))

  /** Candidate-pair count per (blk, bin) block of `fuzzyBlockedPairs` —
    * the audit its overflow policy runs on, and the bound
    * ScaleMechanicsSpec asserts. */
  def blockPairCounts(rows: DataFrame, nameCol: String, maxDist: Int = 2,
                      bucketW: Int = 4): DataFrame = {
    val probe = rows.select(col(nameCol).as("n"))
      .withColumn("blk", substring(col("n"), -2, 2))
      .withColumn("bin", explode(probeBins(col("n"), maxDist, bucketW)))
      .groupBy("blk", "bin").agg(count(lit(1)).as("na"))
    val index = rows.select(col(nameCol).as("n"))
      .withColumn("blk", substring(col("n"), -2, 2))
      .withColumn("bin", floor(length(col("n")) / bucketW).cast("int"))
      .groupBy("blk", "bin").agg(count(lit(1)).as("nb"))
    probe.join(index, Seq("blk", "bin"))
      .select(col("blk"), col("bin"), (col("na") * col("nb")).as("cand_pairs"))
  }

  /** The blocks `fuzzyBlockedPairs` will DROP at the given cap — run
    * this alongside the pair job (or on a sample) to surface the recall
    * gap the cap traded away; logs a summary line when non-empty. */
  def overflowReport(rows: DataFrame, nameCol: String, maxDist: Int = 2,
                     bucketW: Int = 4, pairCap: Long = 1L << 22): DataFrame = {
    val over = blockPairCounts(rows, nameCol, maxDist, bucketW)
      .filter(col("cand_pairs") > pairCap)
    logOverflow(over.collect(), pairCap)
    over
  }

  // the one overflow log line, shared by overflowReport and the inline
  // audit in fuzzyBlockedPairs (never silent, never duplicated)
  private def logOverflow(over: Array[org.apache.spark.sql.Row],
                          pairCap: Long): Unit =
    if (over.nonEmpty)
      System.err.println(
        s"[graft][fuzzy-match] OVERFLOW: $pairCap-pair cap drops " +
          s"${over.length} blocks: " + over.take(5).map(r =>
          s"(blk=${r.getAs[String]("blk")},bin=${r.getAs[Int]("bin")}," +
            s"pairs=${r.getAs[Long]("cand_pairs")})").mkString(", "))

  /** Fuzzy entity-matching pairs (the ER primitive): (id_a < id_b) whose
    * names share the last-2-chars block and sit within Levenshtein
    * `maxDist`. Composite banded blocking — the equi-join key is
    * (suffix-2, length-bucket), the probe side fans out to the ≤3
    * width-`bucketW` buckets covering [len−τ, len+τ], which provably
    * loses no qualifying pair (see `probeBins`) while splitting a
    * variable-length corpus's hot suffix blocks.
    *
    * Overflow policy: the bounded block-audit table (|suffix-2| ×
    * |length bins| keys, data-size-independent) is aggregated and
    * collected at plan-construction time; blocks whose candidate-pair
    * count (na·nb) exceeds `pairCap` are logged and dropped, and the
    * under-cap keep-list broadcasts back into the pair job as a
    * semi-join. At 100 TB a degenerate key shared by millions of rows
    * becomes a surfaced recall gap (`overflowReport`), never one
    * straggler task doing billions of Levenshtein calls. */
  def fuzzyBlockedPairs(rows: DataFrame, idCol: String, nameCol: String,
                        maxDist: Int = 2, bucketW: Int = 4,
                        pairCap: Long = 1L << 22): DataFrame = {
    require(bucketW > maxDist, "bucketW must exceed maxDist for 3-bin coverage")
    val a = rows.select(col(idCol).as("id_a"), col(nameCol).as("name_a"))
      .withColumn("blk", substring(col("name_a"), -2, 2))
      .withColumn("bin", explode(probeBins(col("name_a"), maxDist, bucketW)))
    val b = rows.select(col(idCol).as("id_b"), col(nameCol).as("name_b"))
      .withColumn("blk", substring(col("name_b"), -2, 2))
      .withColumn("bin", floor(length(col("name_b")) / bucketW).cast("int"))
    // ONE audit aggregate decides the block list AND surfaces the drop:
    // the block table is bounded (|suffix-2| × |length bins|), so it
    // collects to the driver and the keep-list broadcasts from there —
    // no silent cap (the 100 TB rule: log what was dropped)
    val counts = blockPairCounts(rows, nameCol, maxDist, bucketW).collect()
    logOverflow(counts.filter(_.getAs[Long]("cand_pairs") > pairCap), pairCap)
    val sp = rows.sparkSession
    import sp.implicits._
    val ok = counts.filter(_.getAs[Long]("cand_pairs") <= pairCap)
      .map(r => (r.getAs[String]("blk"), r.getAs[Int]("bin"))).toSeq
      .toDF("blk", "bin")
    a.join(broadcast(ok), Seq("blk", "bin"), "left_semi")
      .join(b, Seq("blk", "bin"))
      .filter(col("id_a") < col("id_b") &&
        abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      // thresholded levenshtein: banded O(τ·n) with early exit instead
      // of the full O(n·m) DP — returns the exact distance when ≤ τ
      // (identical output) and −1 past the band
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist") >= 0)
      .select("id_a", "id_b", "dist")
  }
}
