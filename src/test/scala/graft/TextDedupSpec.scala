package graft

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
}
