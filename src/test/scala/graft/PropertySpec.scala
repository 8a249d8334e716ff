package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.ColFns

/** Property tests (SURVEY §5 plan item 1): invariants that must hold
  * for arbitrary generated inputs, not just the fixture rows. Uses raw
  * ScalaCheck generators with a fixed seed (no scalatestplus bridge in
  * the offline dependency set).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("normalizeName: idempotent, no spaces/dashes survive") {
    samples(Gen.asciiPrintableStr, 100).foreach { s =>
      val n = ColFns.normalizeName(s)
      assert(ColFns.normalizeName(n) === n)
      assert(!n.contains(" ") && !n.contains("-"))
      assert(n === n.toLowerCase)
    }
  }

  test("pseudoUniform: bounded, deterministic, salt-sensitive for any key") {
    val keys = samples(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue), 200)
    val df = keys.toDF("k").cache()
    val u1 = df.select(ColFns.pseudoUniform($"k", 1L).as("u")).as[Double].collect()
    assert(u1.forall(v => v >= 0.0 && v < 1.0))
    val u1b = df.select(ColFns.pseudoUniform($"k", 1L).as("u")).as[Double].collect()
    assert(u1.sameElements(u1b))
    val u2 = df.select(ColFns.pseudoUniform($"k", 2L).as("u")).as[Double].collect()
    assert(u1.zip(u2).count { case (a, b) => a != b } > 150)
  }

  test("shingles: every shingle has length n (or whole short string), distinct") {
    val cases = for {
      s <- samples(Gen.alphaNumStr.map(_.take(120)), 60)
      n <- Seq(3, 5)
    } yield (s, n)
    val df = cases.toDF("t", "n")
    Seq(3, 5).foreach { n =>
      val rows = df.filter($"n" === n)
        .select(lower(trim($"t")).as("norm"),
          graft.plans.expressions.char_shingles(lower(trim($"t")), n).as("sh"))
        .collect()
      rows.foreach { r =>
        val norm = r.getString(0)
        val sh = r.getSeq[String](1)
        if (norm.length <= n) assert(sh === Seq(norm))
        else {
          assert(sh.forall(_.length === n))
          assert(sh.length <= norm.length - n + 1)
          assert(sh.distinct.length === sh.length)
        }
      }
    }
  }

  test("sigmoid/logit are inverses on (0,1)") {
    val ps = samples(Gen.chooseNum(0.01, 0.99), 50)
    val rows = ps.toDF("p")
      .select($"p", ColFns.sigmoid(ColFns.logit($"p")).as("q")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(1) - r.getDouble(0)) < 1e-9))
  }

  test("dot product: symmetric, Cauchy-Schwarz holds") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-10.0, 10.0)).map(_.toArray)
    val pairs = samples(Gen.zip(vecGen, vecGen), 40)
    val rows = pairs.toDF("a", "b").select(
      graft.sim.Similarity.dot($"a", $"b").as("ab"),
      graft.sim.Similarity.dot($"b", $"a").as("ba"),
      graft.sim.Similarity.dot($"a", $"a").as("aa"),
      graft.sim.Similarity.dot($"b", $"b").as("bb")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1))
      assert(r.getDouble(0) * r.getDouble(0) <=
        r.getDouble(2) * r.getDouble(3) + 1e-6)
    }
  }

  test("multiFormatTs: any formatted whole-day date round-trips") {
    val dayGen = Gen.chooseNum(0L, 47000L) // days since epoch, < ~2098
    val stamps = samples(dayGen, 60).map(d => new java.sql.Timestamp(d * 86400000L))
    val rows = stamps.toDF("ts")
      .select($"ts", date_format($"ts", "MM/dd/yyyy").as("s"))
      .select($"ts", ColFns.multiFormatTs($"s",
        Seq("MM-dd-yy", "MM/dd/yyyy", "yyyy-MM-dd"),
        lit(null).cast("timestamp")).as("t"))
      .collect()
    rows.foreach(r => assert(r.getTimestamp(1) === r.getTimestamp(0)))
  }

  test("wordBlocks: blocks + tail reconstruct the doc; every block exactly k words") {
    val word = Gen.oneOf("aa", "b", "ccc", "dd", "e")
    val docGen = Gen.chooseNum(0, 25).flatMap(n => Gen.listOfN(n, word))
    val docs = samples(docGen, 60).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    val df = docs.toDF("doc_id", "text")
    val k = 4
    val rows = df.select($"doc_id",
        graft.catalog.TextSim.wordBlocks(split(trim($"text"), "\\s+"), k).as("b"))
      .as[(Long, Seq[(Int, String)])].collect().toMap
    docs.foreach { case (id, text) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      val blocks = rows(id)
      if (toks.length < k) assert(blocks.isEmpty)
      else {
        // 1-indexed, contiguous, each block exactly k words
        assert(blocks.map(_._1) === (1 to toks.length / k))
        blocks.foreach { case (_, b) => assert(b.split(" ").length === k) }
        // blocks + tail reconstruct the token stream verbatim
        val rebuilt = blocks.map(_._2).mkString(" ") +
          (if (toks.length % k == 0) ""
           else " " + toks.drop(toks.length / k * k).mkString(" "))
        assert(rebuilt.trim === toks.mkString(" "))
      }
    }
  }

  test("BPE merge: sentinel-string replace ≡ array scan for any symbol run") {
    // the two production merge primitives (t22's shuffle path uses a
    // literal replace on '_a__b_' sentinels; the dense kernel scans the
    // symbol array left-to-right) must agree on adversarial runs:
    // self-overlap (a,a,a), a==b, interleavings
    val sym = Gen.oneOf("a", "b", "ab", "c")
    val symsGen = Gen.chooseNum(0, 10).flatMap(n => Gen.listOfN(n, sym))
    val pairGen = for { a <- sym; b <- sym } yield (a, b)
    val cases = samples(Gen.zip(symsGen, pairGen), 120)
    def scanMerge(syms: List[String], a: String, b: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += a + b; i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toList
    }
    val df = cases.zipWithIndex
      .map { case ((syms, (a, b)), i) =>
        (i, "_" + syms.mkString("__") + "_", s"_${a}__${b}_", s"_$a${b}_")
      }
      .toDF("i", "s", "find", "repl")
    val got = df.select($"i", replace($"s", $"find", $"repl").as("m"))
      .as[(Int, String)].collect().toMap
    cases.zipWithIndex.foreach { case ((syms, (a, b)), i) =>
      val expect =
        if (syms.isEmpty) "__" // '_' ++ '_' with no symbols between
        else "_" + scanMerge(syms, a, b).mkString("__") + "_"
      assert(got(i) === expect, s"case $i: syms=$syms pair=($a,$b)")
    }
  }

  test("personalized PageRank: dense/shuffle parity on random directed graphs") {
    val v = Gen.oneOf("s", "t", "u", "v", "w", "x")
    val edgeGen = Gen.zip(v, v).suchThat { case (a, b) => a != b }
    val graphGen = Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, edgeGen))
    samples(graphGen, 12).zipWithIndex.foreach { case (es0, gi) =>
      // ensure the seed exists as a source so both paths accept it
      val es = (("s", "t") :: es0).distinct
      val edges = es.toDF("src", "dst")
      def run(thresh: Long) = graft.graph.GraphXAnalytics
        .personalizedPageRank(spark, edges, "s", iters = 4, seqMaxEdges = thresh)
        .select($"id", round($"rank", 6).as("r"))
        .as[(String, Double)].collect().toMap
      val dense = run(1000000L)
      val shuffled = run(0L)
      assert(dense === shuffled, s"graph $gi: $es")
      // mass never exceeds the restart budget; dangling vertices leak
      // their inflow (identically on both paths), so ≤ 1, not = 1
      val mass = dense.values.sum
      assert(mass > 0.0 && mass <= 1.0 + 1e-9, s"graph $gi mass $mass")
    }
  }
}
