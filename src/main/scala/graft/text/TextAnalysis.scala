package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the large-scale training-data pipeline:
  * language ID, quality scoring, token counting, fingerprinting.
  * All pure column expressions (codegen'd, no UDFs) so a 100 TB corpus
  * scan stays inside whole-stage codegen with predicate pushdown intact.
  */
object TextAnalysis {

  /** Small per-language stopword lists for the n-gram/stopword heuristic
    * language-ID. Deliberately tiny and deterministic — the operator's
    * value is the argmax plumbing, not lexicon quality. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "los", "que", "de", "un", "una", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des"))

  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Tokens per doc (whitespace tokenization); empty text → 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(tokens(text)))

  /** Count of tokens of `text` that appear in `words` — one tight pass
    * via the TokenHitCounts expression (the K×(split+filter) HOF
    * formulation re-split the text and interpreted a lambda per token). */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    element_at(graft.plans.expressions.token_hit_counts(text, Seq(words)), 1)

  /** Language ID: argmax over per-language stopword hit counts, ties
    * broken by language code order, 'und' (undetermined) when no list
    * scores a hit. All K lexicons are counted in ONE text pass
    * (TokenHitCounts); the argmax fold runs over the small counts array. */
  def languageId(text: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val counts = graft.plans.expressions.token_hit_counts(
      text, langs.map(stopwords))
    // fold with explicit comparison: earlier language wins ties
    // (the K element_at copies share one TokenHitCounts eval via
    // Catalyst subexpression elimination — asserted by the t8 bench)
    val scored = langs.zipWithIndex.map { case (l, i) =>
      struct(element_at(counts, i + 1).as("hits"), lit(l).as("lang"))
    }
    val best = scored.reduce { (a, b) =>
      when(b.getField("hits") > a.getField("hits"), b).otherwise(a)
    }
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality score features: char length, token count, average token
    * length, punctuation ratio, stopword ratio, and a composite [0,1]
    * quality score (length-window · low-punct · some-stopwords). */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nTok = tokenCount(t)
    val nChar = length(t)
    val punct = length(t) - length(regexp_replace(t, "[\\.,;:!\\?]", ""))
    val stops = stopwordHits(t, stopwords("en"))
    df.withColumn("n_tokens", nTok)
      .withColumn("avg_token_len",
        round(when(nTok === 0, 0.0)
          .otherwise(length(regexp_replace(t, "\\s+", "")).cast("double") / nTok), 6))
      .withColumn("punct_ratio",
        round(when(nChar === 0, 0.0).otherwise(punct.cast("double") / nChar), 6))
      .withColumn("stopword_ratio",
        round(when(nTok === 0, 0.0).otherwise(stops.cast("double") / nTok), 6))
  }

  /** Fixed-size token chunking with overlap — the training-data prep
    * step that turns documents into model-ready windows. Chunk i covers
    * tokens [i·stride, i·stride + chunkSize) with stride = chunkSize −
    * overlap; the final chunk may be short; every token is covered
    * exactly ceil-many chunks. Pure builtins (sequence → explode →
    * slice): one generator row per chunk, no UDF, no driver loop — at
    * 100 TB this is a map-only pass whose output is ~n/stride rows per
    * doc. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkSize: Int = 50, overlap: Int = 10): DataFrame = {
    require(overlap < chunkSize, "overlap must be smaller than chunkSize")
    val stride = chunkSize - overlap
    val base = df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"),
      tokenCount(col(textCol)).as("n"))
    val nChunks = when(col("n") <= chunkSize, 1)
      .otherwise(ceil((col("n") - lit(overlap)).cast("double") / stride).cast("int"))
    base.filter(col("n") > 0)
      .withColumn("chunk_no", explode(sequence(lit(0), nChunks - 1)))
      .select(col("doc_id"), col("chunk_no"),
        slice(col("toks"), col("chunk_no") * stride + 1, lit(chunkSize)).as("chunk_toks"))
      .withColumn("n_chunk_tokens", size(col("chunk_toks")))
      .withColumn("chunk_text", concat_ws(" ", col("chunk_toks")))
      .drop("chunk_toks")
  }

  /** Winnowing fingerprint selection (the MOSS scheme): hash every
    * k-gram, slide a w-window over the hash sequence, keep each window's
    * minimum — guarantees any shared substring of length ≥ k+w−1 yields
    * a shared fingerprint, with ~2/(w+1) of grams selected. All builtin
    * higher-order functions over md5 hex strings (min = lexicographic),
    * so the DuckDB mirror reproduces it exactly.
    *
    * DataFrame-shaped on purpose: the gram-hash array MUST be a bound
    * column before the window pass. Inlining it as one Column tree puts
    * the whole md5-per-position computation inside the window lambda,
    * and Catalyst re-evaluates the lambda body per window — O(n²) md5
    * calls per document (measured: a catalog query that finishes in
    * ~2 s hung for 10+ minutes). Two projections keep it O(n); the
    * multi-reference of the expensive alias also stops CollapseProject
    * from re-inlining it. */
  def winnow(df: DataFrame, textCol: String, outCol: String,
             k: Int = 5, w: Int = 4): DataFrame = {
    // norm bound as a column too: inlined, the regexp_replace would
    // re-run inside the gram lambda for every substr — O(len²) per doc
    val norm = col("__winnow_norm")
    // sequence(1,0) descends rather than being empty — guard short docs
    val gramsExpr = when(length(norm) < k, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(norm) - (k - 1)),
        i => md5(norm.substr(i, lit(k)))))
    val grams = col("__winnow_grams")
    val nWin = size(grams) - (w - 1)
    val selected =
      when(size(grams) === 0, array().cast("array<string>"))
        .when(nWin < 1, array(array_min(grams)))
        .otherwise(transform(sequence(lit(1), nWin),
          j => array_min(slice(grams, j, lit(w)))))
    df.withColumn("__winnow_norm",
        regexp_replace(lower(trim(col(textCol))), "\\s+", " "))
      .withColumn("__winnow_grams", gramsExpr)
      .withColumn(outCol, array_distinct(selected))
      .drop("__winnow_grams", "__winnow_norm")
  }

  /** Document fingerprint: position-weighted character sum (a rolling-
    * hash-style signature that is order-sensitive, unlike a bag-of-chars
    * sum) modulo 1e9+7, plus md5 for exactness. Pure integer math —
    * identical in any engine. */
  def fingerprint(text: Column): Column =
    // empty-text guard: Spark's sequence(1, 0) yields a *descending*
    // [1,0] rather than an empty array, so the zero-length case is pinned
    when(length(text) === 0, 0L).otherwise(
      pmod(
        aggregate(
          zip_with(
            split(text, ""),
            sequence(lit(1), length(text)),
            (ch, i) => i.cast("long") * ascii(ch)),
          lit(0L), (acc, v) => acc + v),
        lit(1000000007L)))
}
