package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ColFns
import graft.graph.PropertyGraph

/** Ingest of the reference's own CSV sources (SURVEY §2.1 S1–S3,
  * §3.1), preserving its cleaning semantics exactly:
  *
  *  - header normalization strip/replace/lower
  *    (First_Data_injection.py:37,59,88);
  *  - intl: customer lowercased, rows whose `customer` is one of the
  *    literal month tokens dropped — this is how the reference survives
  *    the CSV's column-shifted tail rows (P3, First_Data_injection.py:
  *    62-66; data/International-sale-Report.csv:37428+), so we must NOT
  *    "fix" them schema-side (SURVEY §7.4 trap 6);
  *  - dropna across all columns (P1), coerced date parse + dropna(date)
  *    (P2/F6), training cutoff 2022-12-31 (P4);
  *  - catalog renamed to the graph schema. (The reference's own rename
  *    uses pre-normalization keys and silently no-ops — we implement the
  *    declared intent, not the bug.)
  *
  * Graph build mirrors knowledge_graph_creation.py:45-68: intl customers
  * keyed `intl_cust_{customer}`, orders keyed by row index, products by
  * SKU; PURCHASED/CONTAINS edges carry the timestamp and dvid.
  */
object ReferenceIngest {

  val monthNames: Seq[String] = Seq("aug-21", "dec-21", "feb-22", "jan-22",
    "jul-21", "mar-22", "nov-21", "oct-21", "sep-21", "jun-21")

  val trainingCutoff: java.sql.Timestamp =
    java.sql.Timestamp.valueOf("2022-12-31 00:00:00")

  private def readNormalized(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("header", "true").option("inferSchema", "true")
      .option("mode", "PERMISSIVE").csv(path)
    raw.toDF(raw.columns.map(ColFns.normalizeName): _*)
  }

  /** S2: International-sale-Report.csv → cleaned transactions. */
  def intlSales(spark: SparkSession, path: String, dvid: Int = 1): DataFrame =
    readNormalized(spark, path)
      .withColumn("customer", lower(col("customer").cast("string")))
      .filter(!col("customer").isin(monthNames: _*))
      .na.drop("any")
      .withColumn("date", ColFns.multiFormatTs(col("date").cast("string"),
        Seq("MM-dd-yy", "MM/dd/yy", "MM-dd-yyyy", "MM/dd/yyyy", "yyyy-MM-dd"),
        lit(null).cast("timestamp")))
      .na.drop(Seq("date"))
      .filter(col("date") <= lit(trainingCutoff))
      .withColumn("source", lit("international"))
      .withColumn("dvid", lit(dvid))

  /** S3: Sale-Report.csv → product attribute catalog. */
  def productCatalog(spark: SparkSession, path: String): DataFrame =
    readNormalized(spark, path)
      .na.drop("any")
      .withColumnRenamed("sku_code", "sku")
      .withColumnRenamed("design_no.", "design_no")

  /** Graph build from the cleaned intl transactions + catalog
    * (knowledge_graph_creation.py:45-68,121-166). Row index for order
    * ids comes from the CSV's own `index` column (stable, unlike a
    * nondeterministic zipWithIndex). */
  def buildGraph(intl: DataFrame, catalog: DataFrame): PropertyGraph = {
    val custNodes = intl.select(
        concat(lit("intl_cust_"), col("customer")).as("id"),
        lit("Customer").as("label"), col("customer").as("name"))
      .groupBy("id", "label").agg(first("name").as("name"))
    val orderNodes = intl.select(
      concat(lit("intl_order_"), col("index")).as("id"),
      lit("Order").as("label"), col("customer").as("name"))
    val productNodes = intl.select(col("sku").as("id"))
      .union(catalog.select(col("sku").as("id"))).distinct()
      .select(col("id"), lit("Product").as("label"), col("id").as("name"))
    val nodes = custNodes.unionByName(orderNodes).unionByName(productNodes)

    val purchased = intl.select(
      concat(lit("intl_cust_"), col("customer")).as("src"),
      concat(lit("intl_order_"), col("index")).as("dst"),
      lit("PURCHASED").as("type"), col("date").as("ts"),
      lit(null).cast("double").as("qty"), col("dvid"))
    val contains = intl.select(
      concat(lit("intl_order_"), col("index")).as("src"),
      col("sku").as("dst"),
      lit("CONTAINS").as("type"), col("date").as("ts"),
      col("pcs").cast("double").as("qty"), col("dvid"))
    PropertyGraph(nodes, purchased.unionByName(contains))
  }
}
