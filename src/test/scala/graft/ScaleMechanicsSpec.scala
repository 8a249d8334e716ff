package graft

import org.apache.spark.sql.functions._

/** The explicit 100 TB scale mechanics: skew salting and bucketed
  * co-location, each asserted for result-equivalence and (for
  * bucketing) shuffle elimination. */
class ScaleMechanicsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join") {
    import graft.functions.Skew
    // heavy skew: 90% of facts share one key
    val fact = spark.range(2000).toDF("i")
      .withColumn("k", when($"i" % 10 < 9, 1L).otherwise($"i" % 50))
      .withColumn("x", $"i" * 2)
    val dim = spark.range(50).toDF("k").withColumn("name", concat(lit("d"), $"k"))
    val plain = fact.join(dim, Seq("k")).select("k", "i", "x", "name")
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), salts = 8)
      .select("k", "i", "x", "name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("bucketed tables join without a shuffle; result matches plain join") {
    import graft.functions.Bucketing
    val orders = graft.core.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val li = graft.core.Tables.lineitem(spark, sfDir)
      .select($"l_orderkey".as("o_orderkey"), $"l_partkey", $"l_quantity")
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(li, "b_lineitem", "o_orderkey", 4)
    val bj = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
    assert(!Bucketing.hasShuffle(bj), "bucketed join still shuffles:\n" +
      bj.queryExecution.executedPlan.toString.take(2000))
    assert(bj.count() === orders.join(li, "o_orderkey").count())
  }
}
