package graft

import org.apache.spark.sql.functions._
import graft.functions.ColFns

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeName matches the reference's header normalization") {
    assert(ColFns.normalizeName(" GROSS AMT ") === "gross_amt")
    assert(ColFns.normalizeName("Design No.") === "design_no.")
    assert(ColFns.normalizeName("SKU-Code") === "sku_code")
  }

  test("pseudoUniform is in [0,1), deterministic, and partition-independent") {
    val df = (1L to 1000L).toDF("k")
    val u = df.select(ColFns.pseudoUniform($"k", 42L).as("u"))
    val vals = u.collect().map(_.getDouble(0))
    assert(vals.forall(v => v >= 0.0 && v < 1.0))
    val repartitioned = df.repartition(7)
      .select(ColFns.pseudoUniform($"k", 42L).as("u"))
      .collect().map(_.getDouble(0)).sorted
    assert(vals.sorted.sameElements(repartitioned))
    // roughly uniform: mean near 0.5
    val mean = vals.sum / vals.length
    assert(math.abs(mean - 0.5) < 0.05)
  }

  test("multiFormatTs walks the fallback chain and defaults on failure") {
    val df = Seq("06/01/2022", "06-01-2022", "2022-06-01", "garbage").toDF("s")
    val parsed = df.select(ColFns.multiFormatTs($"s",
      Seq("MM/dd/yyyy", "MM-dd-yyyy", "yyyy-MM-dd"),
      lit(java.sql.Timestamp.valueOf("1999-09-09 00:00:00"))).as("t"))
      .collect().map(_.getTimestamp(0).toString)
    assert(parsed.take(3).forall(_.startsWith("2022-06-01")))
    assert(parsed(3).startsWith("1999-09-09"))
  }

  test("safeZScore pins zero-stddev groups to 0.0") {
    val df = Seq((1.0, 1.0, 0.0), (2.0, 1.0, 0.5)).toDF("x", "m", "s")
    val z = df.select(ColFns.safeZScore($"x", $"m", $"s").as("z"))
      .collect().map(_.getDouble(0))
    assert(z(0) === 0.0)
    assert(z(1) === 2.0)
  }
}
