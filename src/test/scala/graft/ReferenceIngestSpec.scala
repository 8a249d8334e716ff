package graft

import org.apache.spark.sql.functions._
import graft.sources.ReferenceIngest

/** Pipeline golden tests over the reference's own CSVs (SURVEY §5.3).
  * Expected numbers were derived independently by replaying the
  * reference's pandas cleaning steps (dropna/month-filter/coerce/cutoff)
  * over the same files.
  */
class ReferenceIngestSpec extends SparkSpec {

  private val dataDir = "/root/reference/data"

  lazy val intl = ReferenceIngest.intlSales(
    spark, s"$dataDir/International-sale-Report.csv").cache()
  lazy val catalog = ReferenceIngest.productCatalog(
    spark, s"$dataDir/Sale-Report.csv").cache()

  test("intl cleaning matches the reference's pandas pipeline") {
    assert(intl.count() === 17218)
    assert(intl.select("customer").distinct().count() === 125)
    assert(intl.select("sku").distinct().count() === 4590)
    // the column-shifted tail rows are gone via the month-name filter
    assert(intl.filter(col("customer").isin(ReferenceIngest.monthNames: _*)).count() === 0)
    val dates = intl.agg(min("date"), max("date")).head()
    assert(dates.getTimestamp(0).toString.startsWith("2021-06-05"))
    assert(dates.getTimestamp(1).toString.startsWith("2022-03-31"))
  }

  test("catalog cleaning matches (dropna over fully-null rows)") {
    assert(catalog.count() === 9188)
    assert(catalog.select("sku").distinct().count() === 9170)
    assert(catalog.columns.contains("design_no") && catalog.columns.contains("sku"))
  }

  test("graph build: per-row orders, deduped customers/products, edge counts") {
    val g = ReferenceIngest.buildGraph(intl, catalog)
    val byLabel = g.nodes.groupBy("label").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel("Customer") === 125)
    assert(byLabel("Order") === 17218)
    // products = skus in transactions ∪ catalog
    assert(byLabel("Product") >= 9170)
    val byType = g.edges.groupBy("type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("PURCHASED") === 17218)
    assert(byType("CONTAINS") === 17218)
    assert(g.edges.filter(col("ts").isNull).count() === 0)
  }
}
