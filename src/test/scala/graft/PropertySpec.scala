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
}
