package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.text.{Dedup, TextAnalysis}

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  test("chunking covers every token exactly once plus the declared overlap") {
    import graft.text.TextAnalysis
    val docs = graft.core.Tables.documents(spark, sfDir)
    val chunks = TextAnalysis.chunk(docs, "doc_id", "text", chunkSize = 50, overlap = 10)
    assert(chunks.filter($"n_chunk_tokens" > 50 || $"n_chunk_tokens" < 1).count() === 0)
    // coverage identity: Σ chunk lens = n_tokens + overlap·(chunks − 1)
    val agg = chunks.groupBy("doc_id")
      .agg(sum("n_chunk_tokens").as("s"), count(lit(1)).as("c"))
    val toks = docs.select($"doc_id", TextAnalysis.tokenCount($"text").as("n"))
    val bad = agg.join(toks, "doc_id")
      .filter($"s" =!= $"n" + lit(10) * ($"c" - 1)).count()
    assert(bad === 0)
  }

  test("exact dedup groups identical texts under one canonical id") {
    val docs = Seq((1L, "hello world"), (2L, "hello world"), (3L, "unique text"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(docs, "doc_id", "text").collect()
    assert(out.length === 2)
    val dup = out.find(_.getLong(2) === 2L).get
    assert(dup.getLong(1) === 1L) // keeps the min id
  }

  test("minhash LSH pairs identical and near-identical docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different content with no overlap at all zzz qqq"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text")
      .select("doc_a", "doc_b").distinct().as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("simhash: identical texts equal; disjoint texts differ") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "xx yy zz ww vv uu")).toDF("doc_id", "text")
    val h = df.select($"doc_id", Dedup.simhash($"text").as("h"))
      .as[(Long, Long)].collect().toMap
    assert(h(1L) === h(2L))
    assert(h(1L) !== h(3L))
  }

  test("ngram jaccard: identical docs score 1.0 within a bucket") {
    val docs = Seq((1L, "abcdefghij klmnopqrst", 21L), (2L, "abcdefghij klmnopqrst", 21L),
      (3L, "zzzzzzzzzz yyyyyyyyyy", 21L)).toDF("doc_id", "text", "n_chars")
    val out = Dedup.ngramJaccard(docs, "doc_id", "text", col("n_chars"), 5, 0.0)
      .filter($"doc_a" === 1 && $"doc_b" === 2).head()
    assert(out.getDouble(3) === 1.0)
  }

  test("language id picks the language with most stopword hits") {
    val df = Seq(
      (1L, "the cat and the dog went to the house"),
      (2L, "der hund und die katze ist nicht da"),
      (3L, "xyzzy plugh")).toDF("doc_id", "text")
    val out = df.select($"doc_id", TextAnalysis.languageId($"text").as("l"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "en")
    assert(out(2L) === "de")
    assert(out(3L) === "und")
  }

  test("tokenCount handles empty and multi-space text") {
    val df = Seq("", "  ", "one", "two  words").toDF("t")
    val out = df.select(TextAnalysis.tokenCount($"t").as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(out === Seq(0, 0, 1, 2))
  }

  test("winnowing: shared substring ≥ k+w−1 chars ⇒ shared fingerprint; short docs still fingerprinted") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different text with quick brown fox inside it"),
      (3L, "zzzz"), // shorter than k → no grams
      (4L, "abcdef") // grams < w → single min fingerprint
    ).toDF("doc_id", "text")
    val fps = graft.text.TextAnalysis.winnow(docs, "text", "fps", k = 5, w = 4)
      .select("doc_id", "fps").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    // "quick brown fox" (15 chars ≥ k+w−1 = 8) appears in docs 1 and 2
    assert((fps(1L) intersect fps(2L)).nonEmpty)
    assert(fps(3L).isEmpty)
    assert(fps(4L).size === 1)
    // selection is a subset of all gram hashes and non-empty for real text
    assert(fps(1L).nonEmpty && fps(2L).nonEmpty)
  }

  test("fingerprint is order-sensitive (rolling-hash property)") {
    val df = Seq("abc", "cba", "abc").toDF("t")
    val fp = df.select(TextAnalysis.fingerprint($"t").as("f"))
      .collect().map(_.getLong(0)).toSeq
    assert(fp(0) === fp(2))
    assert(fp(0) !== fp(1))
  }

  test("t12 packing: offsets are the exact running token sum; packs hold the budget") {
    val out = SparkEntry.queries("t12_pack_sequences")(spark, sfDir)
      .select("doc_id", "n_tokens", "offset", "pack_id", "offset_in_pack")
      .as[(Long, Int, Long, Long, Long)].collect().sortBy(_._1)
    var running = 0L
    out.foreach { case (_, n, off, pack, inPack) =>
      assert(off === running, s"offset drift at $off vs $running")
      assert(pack === off / 256 && inPack === off % 256)
      running += n
    }
    assert(running > 0)
  }

  test("t13 quality rules: passes is exactly the conjunction of the four flags") {
    val df = SparkEntry.queries("t13_quality_rules")(spark, sfDir)
    val bad = df.filter(
      col("passes") =!= (col("flag_word_count") * col("flag_word_len") *
        col("flag_symbol") * col("flag_stopword"))).count()
    assert(bad === 0)
    // both outcomes occur on the synthetic corpus (the filter filters)
    assert(df.filter(col("passes") === 1).count() > 0)
  }

  test("t14 PII redaction: no emails or long digit runs survive masking") {
    val df = SparkEntry.queries("t14_pii_redact")(spark, sfDir)
    assert(df.filter(col("redacted").rlike("@")).count() === 0)
    assert(df.filter(col("redacted").rlike("[0-9]{4,}")).count() === 0)
    assert(df.filter(col("n_emails") =!= 1).count() === 0)
    assert(df.filter(!col("redacted").contains("[EMAIL]")).count() === 0)
  }

  test("d10 contamination: pairs cross the benchmark boundary with ≥3 shared grams") {
    val df = SparkEntry.queries("d10_contamination")(spark, sfDir)
    assert(df.filter(col("train_doc") % 10 === 0).count() === 0)
    assert(df.filter(col("bench_doc") % 10 =!= 0).count() === 0)
    assert(df.filter(col("n_shared") < 3).count() === 0)
    assert(df.count() > 0)
  }

  test("t15 repetition: ratio bounded in [0,1) and distinct ≤ total") {
    val df = SparkEntry.queries("t15_repetition")(spark, sfDir)
    assert(df.filter(col("n_distinct") > col("n_grams")).count() === 0)
    assert(df.filter(col("rep_ratio") < 0.0 || col("rep_ratio") >= 1.0).count() === 0)
    assert(df.filter(
      col("flag_repetitive") =!= (col("rep_ratio") > 0.2).cast("int")).count() === 0)
  }

  test("sim_filtered_ivf: neighbors share the query's label; pre-filter reaches past post-filter") {
    val e = graft.core.Tables.embeddings(spark, sfDir)
    val f = graft.catalog.TextSim.queries("sim_filtered_ivf")(spark, sfDir)
    // every returned neighbor carries the QUERY's label
    val srcLbl = e.select($"vec_id".as("src"), $"label".as("src_label"))
    assert(f.join(srcLbl, "src").filter($"label" =!= $"src_label").count() === 0)
    // pre-filtering the list scan must surface same-label pairs that
    // post-filtering the unfiltered top-5 would never see — otherwise
    // the entry degenerates to the recall-losing post-filter
    val post = graft.catalog.TextSim.queries("sim_ivf_persisted")(spark, sfDir)
      .join(srcLbl, "src")
      .join(e.select($"vec_id".as("dst"), $"label".as("dst_label")), "dst")
      .filter($"dst_label" === $"src_label")
      .select("src", "dst")
    val extra = f.select("src", "dst").except(post)
    assert(extra.count() > 0,
      "filtered ANN returned exactly the post-filtered set — pre-filter not effective")
  }

  test("sim_ivf_incremental routes exactly the arrival batch, one list each") {
    val df = SparkEntry.queries("sim_ivf_incremental")(spark, sfDir)
    val nArrivals = graft.core.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 5 === 0).count()
    assert(df.count() === nArrivals)
    assert(df.select("vec_id").distinct().count() === nArrivals)
    assert(df.filter(col("vec_id") % 5 =!= 0).count() === 0)
    // list ids live in [1, nlist] where nlist is corpus-adaptive
    // (scaleNLists of the STANDING corpus — the same sizing the entry
    // uses), not the pre-adaptive fixed 16
    val nStanding = graft.core.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 5 =!= 0).count()
    val nLists = graft.sim.Similarity.scaleNLists(nStanding)
    assert(df.filter(col("list") < 1 || col("list") > nLists).count() === 0)
  }

  test("d11 keeps exactly one member per cluster, and it is the max-quality one") {
    val df = SparkEntry.queries("d11_quality_dedup")(spark, sfDir).cache()
    // exactly one kept_best per canonical cluster
    val bad = df.groupBy("canonical")
      .agg(sum("kept_best").as("n_kept")).filter(col("n_kept") =!= 1).count()
    assert(bad === 0)
    // the kept member's quality is the cluster max (ties → lower id,
    // which the window order already encodes)
    val maxQ = df.groupBy("canonical").agg(max("quality").as("max_q"))
    assert(df.filter(col("kept_best") === 1).join(maxQ, "canonical")
      .filter(col("quality") =!= col("max_q")).count() === 0)
    // same universe and clustering as d6
    val d6 = SparkEntry.queries("d6_dedup_clusters")(spark, sfDir)
    assert(df.select("vec_id", "canonical").exceptAll(
      d6.select("vec_id", "canonical")).count() === 0)
  }

  test("r9 reports only eval docs, and every leak verifies past the Jaccard threshold") {
    val df = SparkEntry.queries("r9_split_leakage")(spark, sfDir).cache()
    import graft.functions.ColFns
    // the report covers exactly the eval side of the 90/10 hash split
    val evalN = graft.core.Tables.documents(spark, sfDir)
      .filter(ColFns.pseudoUniform(col("doc_id"), 71L) >= 0.9).count()
    assert(df.count() === evalN)
    assert(df.filter(ColFns.pseudoUniform(col("doc_id"), 71L) < 0.9).count() === 0)
    // flags are consistent: leaked ⇔ n_leaks > 0 ⇔ leak_of set; a
    // leak's partner is on the TRAIN side
    assert(df.filter(col("leaked") =!= (col("n_leaks") > 0).cast("int")).count() === 0)
    assert(df.filter(col("n_leaks") > 0 && col("leak_of") === -1L).count() === 0)
    assert(df.filter(col("leak_of") =!= -1L)
      .filter(ColFns.pseudoUniform(col("leak_of"), 71L) >= 0.9).count() === 0)
    // leaks never exceed surviving band candidates
    assert(df.filter(col("n_leaks") > col("n_candidates")).count() === 0)
  }

  test("d12 removes exactly d10's flagged train docs, nothing else") {
    val kept = SparkEntry.queries("d12_decontaminate")(spark, sfDir).cache()
    val flagged = SparkEntry.queries("d10_contamination")(spark, sfDir)
      .select(col("train_doc").as("doc_id")).distinct()
    val trainN = graft.core.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 =!= 0).count()
    // kept ∪ flagged = train side, kept ∩ flagged = ∅
    assert(kept.count() === trainN - flagged.count())
    assert(kept.select("doc_id").join(flagged, "doc_id").count() === 0)
    // no benchmark doc survives into the train corpus
    assert(kept.filter(col("doc_id") % 10 === 0).count() === 0)
  }

  test("t16 domain mix: shares sum to 1 and weights rebalance to uniform") {
    val rows = SparkEntry.queries("t16_domain_mix")(spark, sfDir)
      .select("source", "n_tokens", "token_share", "mix_weight")
      .as[(String, Long, Double, Double)].collect()
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    // weight × share = target share (uniform) for every source
    val target = 1.0 / rows.length
    rows.foreach { case (s, _, share, w) =>
      assert(math.abs(w * share - target) < 1e-4, s"source $s off-target")
    }
    // weights move each source TOWARD uniform: below-target sources
    // are up-weighted, above-target down-weighted
    rows.foreach { case (s, _, share, w) =>
      if (share < target) assert(w > 1.0, s"$s should up-weight")
      else if (share > target) assert(w < 1.0, s"$s should down-weight")
    }
  }

  test("r8 temperature mix: probabilities normalize and flatten the head") {
    val rows = SparkEntry.queries("r8_temperature_mix")(spark, sfDir)
      .select("lang", "n_docs", "p")
      .as[(String, Long, Double)].collect()
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    // α=0.5 compresses the ratio: p-ratio between any two langs is the
    // sqrt of their count-ratio, strictly flatter than proportional
    val byCount = rows.sortBy(_._2)
    val (lo, hi) = (byCount.head, byCount.last)
    if (hi._2 > lo._2) {
      val pRatio = hi._3 / lo._3
      val cRatio = hi._2.toDouble / lo._2
      assert(pRatio < cRatio && pRatio > 1.0 - 1e-9)
    }
  }

  /** Non-overlapping k-word blocks recomputed independently of the
    * catalog's private helper — (doc_id, blk, btext) rows. */
  private def blocksOf(k: Int) = {
    val toks = split(trim(col("text")), "\\s+")
    graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(when(size(toks) >= k,
        transform(sequence(lit(1), (size(toks) / k).cast("int")), i =>
          struct(i.as("blk"),
            concat_ws(" ", slice(toks, (i - lit(1)) * k + 1, lit(k))).as("btext"))))
        .otherwise(array().cast("array<struct<blk:int,btext:string>>"))).as("b"))
      .select(col("doc_id"), col("b.blk").as("blk"), col("b.btext").as("btext"))
  }

  test("d14 span dedup: every distinct block survives exactly once globally") {
    val df = SparkEntry.queries("d14_span_dedup")(spark, sfDir)
    assert(df.filter(col("n_kept") > col("n_blocks")).count() === 0)
    // a FULL duplicate doc legitimately loses every block (ratio 1.0)
    assert(df.filter(col("drop_ratio") < 0.0 || col("drop_ratio") > 1.0).count() === 0)
    val blocks = blocksOf(8)
    // keep-first semantics: total kept occurrences == distinct block texts
    val kept = df.agg(sum("n_kept")).as[Long].head()
    val distinctBlocks = blocks.select("btext").distinct().count()
    assert(kept === distinctBlocks)
    // the corpus really contains cross-duplicated spans (planted dups)
    assert(df.filter(col("n_kept") < col("n_blocks")).count() > 0)
    // zero-block docs (< 8 words) hash the empty stream
    assert(df.filter(col("n_blocks") === 0 &&
      col("kept_md5") =!= md5(lit(""))).count() === 0)
  }

  test("t19 boilerplate spans: frequency rule strikes ALL occurrences, d14 strikes later ones") {
    val df = SparkEntry.queries("t19_boilerplate_spans")(spark, sfDir)
    assert(df.filter(col("n_boiler") > col("n_blocks")).count() === 0)
    val blocks = blocksOf(4)
    // independent recount: occurrences of block texts spanning ≥2 docs
    val expected = blocks.groupBy("btext")
      .agg(countDistinct("doc_id").as("dfr"), count(lit(1)).as("occ"))
      .filter(col("dfr") >= 2).agg(sum("occ")).as[Long].head()
    assert(df.agg(sum("n_boiler")).as[Long].head() === expected)
    assert(expected > 0, "corpus has no cross-doc repeated 4-word spans")
  }

  test("t20 LM perplexity: ppl = exp(nll), buckets ordered and all populated") {
    val df = SparkEntry.queries("t20_lm_perplexity")(spark, sfDir).cache()
    try {
      assert(df.filter(abs(col("ppl") - exp(col("nll"))) > 1e-4).count() === 0)
      val byBucket = df.groupBy("bucket").agg(
          count(lit(1)).as("n"), min("nll").as("lo"), max("nll").as("hi"))
        .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
      assert(byBucket.keySet === Set("head", "middle", "tail"))
      // buckets partition the nll axis in order
      assert(byBucket("head")._4 <= byBucket("middle")._3)
      assert(byBucket("middle")._4 <= byBucket("tail")._3)
      // percentile cuts put roughly a third in each (ties can shift a few)
      val n = df.count()
      byBucket.values.foreach(b => assert(b._2 > n / 5, s"skewed bucket: $b"))
    } finally df.unpersist()
  }

  test("t21 token budget: per-language caps hold and temperature flattens the mix") {
    val df = SparkEntry.queries("t21_token_budget")(spark, sfDir).cache()
    try {
      val byLang = df.groupBy("lang").agg(
          sum("n_toks").as("tok"),
          sum(when(col("selected") === 1, col("n_toks")).otherwise(0L)).as("sel"))
        .as[(String, Long, Long)].collect()
      val tot = byLang.map(_._2).sum.toDouble
      val sel = byLang.map(_._3).sum.toDouble
      // global fill lands just under the 20% target (partial docs are
      // never split)
      assert(sel / tot > 0.10 && sel / tot <= 0.20, s"fill ${sel / tot}")
      // α=0.5 rebalancing: every language's share of the SELECTED
      // tokens is strictly flatter than its share of the corpus —
      // majority compressed, minority boosted
      val maj = byLang.maxBy(_._2); val min0 = byLang.minBy(_._2)
      assert(maj._3 / sel < maj._2 / tot, "majority lang not compressed")
      assert(min0._3 / sel > min0._2 / tot, "minority lang not boosted")
      // per-language budget recomputed independently is never exceeded
      val wsum = byLang.map(l => math.sqrt(l._2 / tot)).sum
      byLang.foreach { case (lang, tok, s) =>
        val budget = math.floor(0.2 * tot * (math.sqrt(tok / tot) / wsum)).toLong
        assert(s <= budget, s"$lang selected $s > budget $budget")
      }
    } finally df.unpersist()
  }

  test("r10 cluster split: no near-dup cluster spans train/eval; fixes a real leak") {
    val df = SparkEntry.queries("r10_cluster_split")(spark, sfDir).cache()
    try {
      // the guarantee: every cluster is wholly train or wholly eval
      assert(df.groupBy("canonical").agg(countDistinct("is_eval").as("d"))
        .filter(col("d") > 1).count() === 0)
      // both sides populated at the 90/10 rate (loose bounds)
      val n = df.count().toDouble
      val ev = df.filter(col("is_eval") === 1).count().toDouble
      assert(ev / n > 0.02 && ev / n < 0.3, s"eval fraction ${ev / n}")
      // and the op is not vacuous here: under per-DOCUMENT hashing
      // (r9's rule) at least one multi-member cluster would have been
      // split across sides — the leak this operator exists to prevent
      val perDoc = df.withColumn("doc_eval",
        (graft.functions.ColFns.pseudoUniform(col("vec_id"), 71L) >= 0.9)
          .cast("int"))
      val leaky = perDoc.groupBy("canonical").agg(
          count(lit(1)).as("sz"), countDistinct("doc_eval").as("d"))
        .filter(col("sz") > 1 && col("d") > 1).count()
      assert(leaky > 0, "corpus has no cluster that per-doc hashing would split")
    } finally df.unpersist()
  }

  test("sim_mmr_rerank: rank-1 is the ANN best; picks diverge from plain top-3 somewhere") {
    val mmr = SparkEntry.queries("sim_mmr_rerank")(spark, sfDir).cache()
    try {
      val ann = graft.sim.KnnCache.topk(spark, sfDir, 5)
      // 3 distinct picks per query
      assert(mmr.groupBy("src").agg(countDistinct("dst").as("d"))
        .filter(col("d") =!= 3).count() === 0)
      // relevance anchors the first pick: MMR rank 1 == ANN rank 1
      val a1 = ann.filter(col("rn") === 1).select(col("src"), col("dst").as("a"))
      assert(mmr.filter(col("rnk") === 1).join(a1, "src")
        .filter(col("dst") =!= col("a")).count() === 0)
      // and the diversity term actually changes something: for at least
      // one query the MMR set differs from the plain top-3
      val top3 = ann.filter(col("rn") <= 3).select("src", "dst")
      val diff = mmr.select("src", "dst").except(top3).count()
      assert(diff > 0, "MMR degenerated to plain relevance ranking")
    } finally mmr.unpersist()
  }

  test("a23 count-min: estimate never undercounts, cells conserve total mass") {
    val df = SparkEntry.queries("a23_countmin_ngrams")(spark, sfDir).cache()
    try {
      assert(df.count() === 10)
      // the count-min guarantee — hash-gated, here asserted directly
      assert(df.filter(col("est_cnt") < col("exact_cnt")).count() === 0)
      assert(df.filter(col("tight") =!= (col("est_cnt") === col("exact_cnt"))
        .cast("int")).count() === 0)
    } finally df.unpersist()
  }

  test("t22 BPE merges: greedy order, no pair repeats, counts non-increasing") {
    val rows = SparkEntry.queries("t22_bpe_merges")(spark, sfDir)
      .as[(Int, String, String, Long)].collect()
    assert(rows.map(_._1).toSeq === (1 to 8))
    assert(rows.forall(_._4 > 0))
    // a merged pair's adjacency is consumed — it can never win again
    assert(rows.map(r => (r._2, r._3)).distinct.length === rows.length)
    // greedy argmax: later winners never beat earlier ones (new pairs
    // born from a merge are bounded by the merged pair's count)
    rows.sliding(2).foreach { case Array(x, y) =>
      assert(y._4 <= x._4, s"step ${y._1} count ${y._4} > ${x._4}")
    }
    // at least one learned symbol is itself reused in a later merge
    // (the whole point of BPE over plain bigram counting)
    val learned = rows.map(r => r._2 + r._3).toSet
    assert(rows.exists(r => learned.contains(r._2) || learned.contains(r._3)) ||
      rows.length < 8)
  }

  test("t22 BPE: dense merge kernel and per-round shuffle loop learn identical merges") {
    val dense = graft.catalog.TextSim.bpeMerges(spark, sfDir,
      nMerges = 5, denseMaxVocab = 2000000L)
      .as[(Int, String, String, Long)].collect().toSeq
    val shuffled = graft.catalog.TextSim.bpeMerges(spark, sfDir,
      nMerges = 5, denseMaxVocab = 0L)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(dense === shuffled)
  }

  test("t22 BPE stop rules: targetVocab and minPairFreq truncate the merge table, both legs") {
    // unbounded reference run: the greedy sequence is deterministic, so
    // every stop rule must yield an exact PREFIX of this table
    val full = graft.catalog.TextSim.bpeMerges(spark, sfDir,
      nMerges = 6, denseMaxVocab = 2000000L)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(full.size === 6, "corpus too small for a 6-merge reference run")
    // vocab-size stop: each merge mints one symbol, so target =
    // |alphabet| + 3 admits exactly 3 merges (same alphabet derivation
    // as the engine's budget)
    val alpha = graft.core.Tables.documents(spark, sfDir)
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .select(explode(split(col("w"), "")).as("c"))
      .filter(length(col("c")) > 0) // split(w,"") keeps a trailing ""
      .agg(count_distinct(col("c")).as("n")).head().getLong(0)
    for (denseMax <- Seq(2000000L, 0L)) {
      val byVocab = graft.catalog.TextSim.bpeMerges(spark, sfDir,
        nMerges = 6, denseMaxVocab = denseMax,
        targetVocab = Some(alpha + 3))
        .as[(Int, String, String, Long)].collect().toSeq
      assert(byVocab === full.take(3), s"targetVocab leg denseMax=$denseMax")
    }
    // frequency-floor stop: counts are non-increasing (asserted above),
    // so floor = min count + 1 truncates at the first under-floor round
    val floor = full.map(_._4).min + 1
    val expected = full.takeWhile(_._4 >= floor)
    assert(expected.size < full.size, "floor must actually truncate")
    for (denseMax <- Seq(2000000L, 0L)) {
      val byFreq = graft.catalog.TextSim.bpeMerges(spark, sfDir,
        nMerges = 6, denseMaxVocab = denseMax, minPairFreq = floor)
        .as[(Int, String, String, Long)].collect().toSeq
      assert(byFreq === expected, s"minPairFreq leg denseMax=$denseMax")
    }
  }

  test("t22b BPE apply: learned merges compress, bounded by training pair counts") {
    val merges = SparkEntry.queries("t22_bpe_merges")(spark, sfDir)
      .agg(sum("pair_count")).head().getLong(0)
    val df = SparkEntry.queries("t22b_bpe_apply")(spark, sfDir).cache()
    try {
      assert(df.count() === 500)
      // a word is at least one symbol, a symbol at least one char
      assert(df.filter(col("bpe_tokens") < col("ws_tokens")).count() === 0)
      assert(df.filter(col("bpe_tokens") > col("char_tokens")).count() === 0)
      // the merges actually fire: corpus-wide symbol reduction is
      // positive and can't exceed the adjacency counts seen in training
      val Row(chars: Long, syms: Long) = df
        .agg(sum("char_tokens"), sum("bpe_tokens")).head()
      assert(chars > syms, "8 merges must compress the corpus")
      assert(chars - syms <= merges,
        "reduction can't exceed training-time pair occurrences")
    } finally df.unpersist()
  }

  test("t23 curriculum: positions dense per (bucket, shard), buckets ordered by difficulty") {
    val df = SparkEntry.queries("t23_curriculum_order")(spark, sfDir).cache()
    try {
      // pos is a dense 0..n-1 enumeration within each (bucket, shard)
      val holes = df.groupBy("bucket", "shard").agg(
          count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"),
          countDistinct("pos").as("d"))
        .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1 ||
          col("d") =!= col("n")).count()
      assert(holes === 0)
      // the curriculum is ordered: every head doc is easier (lower nll)
      // than every tail doc
      val lo = df.filter(col("bucket") === "head").agg(max("nll")).head().getDouble(0)
      val hi = df.filter(col("bucket") === "tail").agg(min("nll")).head().getDouble(0)
      assert(lo <= hi)
      // pure hash math: a second evaluation replays the same order
      val again = SparkEntry.queries("t23_curriculum_order")(spark, sfDir)
      assert(df.except(again).count() === 0 && again.except(df).count() === 0)
    } finally df.unpersist()
  }

  test("t24 dataset card foots to its per-doc sources exactly") {
    import org.apache.spark.sql.functions._
    val card = SparkEntry.queries("t24_dataset_card")(spark, sfDir).cache()
    val docs = graft.core.Tables.documents(spark, sfDir)
    // every doc counted exactly once across card cells
    assert(card.agg(sum("n_docs")).head().getLong(0) === docs.count())
    // quality mass = t13's per-doc verdicts summed
    val t13 = SparkEntry.queries("t13_quality_rules")(spark, sfDir)
    assert(card.agg(sum("n_quality_pass")).head().getLong(0) ===
      t13.agg(sum("passes")).head().getLong(0))
    // dup mass = d1's canonical rule: total copies minus one keeper per hash
    val d1 = SparkEntry.queries("d1_exact_dedup")(spark, sfDir)
    assert(card.agg(sum("n_exact_dups")).head().getLong(0) ===
      d1.agg(sum(col("dup_count") - 1)).head().getLong(0))
    card.unpersist(); ()
  }

  test("t18 NB quality classifier: distillation tracks the rule gate without collapsing") {
    val df = SparkEntry.queries("t18_quality_nb")(spark, sfDir).cache()
    try {
      val n = df.count()
      // the distilled model must actually agree with its teacher far
      // above chance, but a 100% score would mean it memorized the gate
      val agree = df.filter(col("agree") === 1).count()
      assert(agree.toDouble / n > 0.6, s"agreement $agree/$n")
      // non-degenerate: both predicted classes occur
      assert(df.filter(col("pred_good") === 1).count() > 0)
      assert(df.filter(col("pred_good") === 0).count() > 0)
      // agree column is consistent with pred/label
      assert(df.filter(col("agree") =!=
        (col("pred_good") === col("weak_label")).cast("int")).count() === 0)
    } finally df.unpersist()
  }
}
