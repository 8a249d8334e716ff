package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the rec_q1 candidate build (not part of the
  * catalog; run manually: runMain graft.tools.RecProfile <sfDir>). */
object RecProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("rec-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }
    // warm JVM/codegen
    graft.core.Tables.customer(spark, dir).count()

    val cust = t("cust scan+filter") {
      val c = graft.core.Tables.customer(spark, dir)
        .filter(pmod(col("c_custkey"), lit(50)) === 1)
        .select(col("c_custkey").as("customer"), col("c_acctbal").as("acctbal"))
      c.count(); c
    }
    val parts = t("parts scan") {
      val p = graft.recommend.Recommend.validProducts(graft.core.Tables.part(spark, dir))
        .select(col("p_partkey").as("product"), col("p_brand").as("category"),
          col("p_retailprice").as("price"))
      p.count(); p
    }
    t("purchasePairs (j-family warm)") {
      graft.graph.Links.purchasePairsNumeric(spark, dir).count()
    }
    t("candidates full") {
      graft.recommend.Recommend.candidates(spark, dir,
        pmod(col("c_custkey"), lit(50)) === 1, 2000).count()
    }
    t("rec_q1 downstream") {
      graft.recommend.Recommend.topK(spark, dir, "diverse",
        pmod(col("c_custkey"), lit(50)) === 1, 12, 3, 2000).count()
    }
    spark.stop()
  }
}
