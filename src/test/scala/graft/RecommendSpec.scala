package graft

import org.apache.spark.sql.functions._
import graft.recommend.Recommend

class RecommendSpec extends SparkSpec {
  import spark.implicits._

  test("each strategy yields ≤ topN rows per customer with probs in (0,1]") {
    Recommend.strategies.keys.foreach { s =>
      val out = Recommend.topK(spark, sfDir, s,
        pmod(col("c_custkey"), lit(50)) === 1, queryMonth = 12, topN = 3).cache()
      val over = out.groupBy("customer").count().filter($"count" > 3).count()
      assert(over === 0, s"strategy $s exceeded topN")
      val badProb = out.filter($"prob" <= 0 || $"prob" > 1).count()
      assert(badProb === 0, s"strategy $s produced out-of-range prob")
      assert(out.count() > 0)
    }
  }

  test("category diversity cap holds (diverse: 1 per category)") {
    val out = Recommend.topK(spark, sfDir, "diverse",
      pmod(col("c_custkey"), lit(50)) === 1, queryMonth = 12, topN = 3)
    val dupCat = out.groupBy("customer", "category").count().filter($"count" > 1).count()
    assert(dupCat === 0)
  }

  test("recommendations exclude already-purchased products") {
    val out = Recommend.topK(spark, sfDir, "softmax",
      pmod(col("c_custkey"), lit(50)) === 1, queryMonth = 12, topN = 3)
    val purchased = graft.core.Tables.orders(spark, sfDir)
      .join(graft.core.Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("customer"), col("l_partkey").as("product")).distinct()
    assert(out.join(purchased, Seq("customer", "product"), "inner").count() === 0)
  }

  test("seasonal discount bands are within their documented ranges") {
    val df = (1L to 200L).toDF("pk")
    val dec = df.select(Recommend.seasonalDiscount($"pk", lit(12)).as("d"))
      .agg(min("d"), max("d")).head()
    assert(dec.getDouble(0) >= 0.30 && dec.getDouble(1) <= 0.50)
    val reg = df.select(Recommend.seasonalDiscount($"pk", lit(4)).as("d"))
      .agg(min("d"), max("d")).head()
    assert(reg.getDouble(0) >= 0.0 && reg.getDouble(1) <= 0.05)
  }
}
