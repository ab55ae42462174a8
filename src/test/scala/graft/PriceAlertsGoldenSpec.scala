package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.operators.PriceAlerts

/** The reference's four golden scenarios (FIXTURES.md §A), batch form:
  * dsl/PriceAlertsAppTest.java:58-110 and
  * processor/PriceAlertsAppTest.java:59-115.
  */
class PriceAlertsGoldenSpec extends SparkSpec {
  import spark.implicits._

  // ts = 2024-01-01 00:02:30 UTC; window floor = 00:02:00
  private val ts = Timestamp.valueOf("2024-01-01 00:02:30")
  private val windowStart = Timestamp.valueOf("2024-01-01 00:02:00")

  private def products(price: Double): DataFrame =
    Seq((1L, "prod", "desc", price)).toDF("id", "name", "description", "price")

  private def purchases(rows: Seq[(Long, Long)]): DataFrame =
    rows.map { case (id, qty) => (id, qty, 1L, ts) }
      .toDF("id", "quantity", "productid", "ts")

  test("many small purchases: 6 x qty 2 x price 300 -> one alert 3600.0") {
    val out = PriceAlerts.dslPipeline(
      purchases((1L to 6L).map(i => (i, 2L))), products(300.0)).collect()
    assert(out.length == 1)
    val row = out.head
    assert(row.getAs[String]("product_id") == "1")
    assert(row.getAs[Timestamp]("window_start") == windowStart)
    assert(row.getAs[Double]("total_sum_per_minute") == 3600.0)
  }

  test("one big purchase: qty 100 x price 31 -> one alert 3100.0") {
    val out = PriceAlerts.dslPipeline(
      purchases(Seq((1L, 100L))), products(31.0)).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("total_sum_per_minute") == 3100.0)
  }

  test("below threshold -> no alert") {
    val out = PriceAlerts.dslPipeline(
      purchases(Seq((1L, 1L))), products(31.0)).collect()
    assert(out.isEmpty)
  }

  test("purchases in different minutes aggregate separately") {
    val p = Seq(
      (1L, 2L, 1L, Timestamp.valueOf("2024-01-01 00:02:10")),
      (2L, 2L, 1L, Timestamp.valueOf("2024-01-01 00:02:50")),
      (3L, 2L, 1L, Timestamp.valueOf("2024-01-01 00:03:10")))
      .toDF("id", "quantity", "productid", "ts")
    val rev = PriceAlerts.windowedRevenue(
      PriceAlerts.purchasesWithProducts(p, products(300.0)))
    val byWindow = rev.collect().map(r =>
      r.getAs[Timestamp]("window_start") -> r.getAs[Double]("total_sum_per_minute")).toMap
    assert(byWindow(Timestamp.valueOf("2024-01-01 00:02:00")) == 1200.0)
    assert(byWindow(Timestamp.valueOf("2024-01-01 00:03:00")) == 600.0)
  }

  test("inner-join semantics: purchase with unknown product is dropped (J2)") {
    val p = Seq((1L, 2L, 99L, ts)).toDF("id", "quantity", "productid", "ts")
    assert(PriceAlerts.purchasesWithProducts(p, products(300.0)).count() == 0)
  }

  test("closed-windows-only drops the open (max) window (W4)") {
    val p = Seq(
      (1L, 2L, 1L, Timestamp.valueOf("2024-01-01 00:02:10")),
      (2L, 2L, 1L, Timestamp.valueOf("2024-01-01 00:03:10")))
      .toDF("id", "quantity", "productid", "ts")
    val rev = PriceAlerts.windowedRevenue(
      PriceAlerts.purchasesWithProducts(p, products(300.0)))
    val closed = PriceAlerts.closedWindowsOnly(rev, p).collect()
    assert(closed.length == 1)
    assert(closed.head.getAs[Timestamp]("window_start") ==
      Timestamp.valueOf("2024-01-01 00:02:00"))
  }
}
