package graft

/** Smoke-level invariants for every catalog entry: runs at sf0.001,
  * asserts non-empty results (except operators that may legitimately
  * find nothing) and that an oracle exists for each query. */
class CatalogSpec extends SparkSpec {

  // Operators whose result can legitimately be empty on tiny data
  private val mayBeEmpty = Set("d2_minhash_lsh", "d4_ngram_jaccard",
    "d5_embedding_neardup", "d13_semantic_dedup")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"catalog/$name runs and is non-trivial") {
      val df = fn(spark, sfDir)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
      assert(df.columns.nonEmpty)
    }
  }

  test("every query has an oracle (or is explicitly rows-only)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // keep the rows-only set deliberate and small: graph/ML training
    // outputs plus the KMeans-quantized ANN (no SQL mirror for the
    // quantizer; pair-level parity asserted in SimilaritySpec)
    assert(rowsOnly.forall(n =>
      n.startsWith("g") || n.startsWith("m") ||
        Set("sim_ivf_topk", "a16_approx_sketches")(n)),
      s"unexpected rows-only queries: $rowsOnly")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
