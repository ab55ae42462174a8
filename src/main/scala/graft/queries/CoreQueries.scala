package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{AsOfJoin, Dedup, EntityResolution, GraphOps, Multimodal, PriceAlerts, Relational, Similarity, Sketches, TextAnalysis, TimeSeries}
import graft.QueryHelpers._

/** The reference pipeline itself: price alerts (DSL + processor twin), join projection, latest-per-key compaction.
  *
  * Registry split out of SparkEntry (round 9): the maps below are
  * merged back into `SparkEntry.queries` / `SparkEntry.oracleSql`,
  * so names, semantics, and the DuckDB-oracle pairing are unchanged.
  */
object CoreQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── Reference parity (SURVEY.md §2) ────────────────────────────────
    // J1+P1+G1+W1+A1+P2+P4+P5+P6+P7: the DSL price-alerts pipeline.
    "q01_price_alerts_dsl" -> ((s, dir) => {
      PriceAlerts.dslPipeline(Tables.purchases(s, dir), Tables.products(s, dir))
        .select(col("product_id"), tsStr(col("window_start")).as("window_start"),
          r2(col("total_sum_per_minute")).as("total_sum_per_minute"))
        .orderBy("product_id", "window_start")
    }),


    // P3+W4: processor variant — threshold 10, closed windows only
    // (wall-clock punctuator never scans the still-open minute,
    // PurchaseQuantityAlertTrasformer.java:63).
    "q02_price_alerts_processor" -> ((s, dir) => {
      val purchases = Tables.purchases(s, dir)
      val revenue = PriceAlerts.windowedRevenue(
        PriceAlerts.purchasesWithProducts(purchases, Tables.products(s, dir)))
      PriceAlerts.alerts(PriceAlerts.closedWindowsOnly(revenue, purchases),
        PriceAlerts.ProcessorThreshold)
        .select(col("product_id"), tsStr(col("window_start")).as("window_start"),
          r2(col("total_sum_per_minute")).as("total_sum_per_minute"))
        .orderBy("product_id", "window_start")
    }),


    // J1/P1 in isolation: the 5-field PurchaseWithProduct projection
    // (dsl/PriceAlertsApp.java:139-157).
    "q03_join_project" -> ((s, dir) => {
      PriceAlerts.purchasesWithProducts(Tables.purchases(s, dir), Tables.products(s, dir))
        .select(col("purchase_id"), col("purchase_quantity"), col("product_id"),
          col("product_name"), r2(col("product_price")).as("product_price"))
        .orderBy("purchase_id", "product_id", "purchase_quantity", "product_name",
          "product_price")
    }),


    // A3: latest-per-key compaction (GlobalKTable upsert semantics,
    // StateUpdateSupplier.java:36) — latest event per user, deterministic
    // tie-break on event_id.
    "q04_dim_latest_per_key" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          r2(col("value")).as("value"))
        .orderBy("user_id", "event_id", "event_type", "value")
    }),
  )

  /** DuckDB oracle SQL for every query above (same keys). */
  val oracleSql: Map[String, String] = Map(
    "q01_price_alerts_dsl" ->
      """SELECT CAST(l_partkey AS VARCHAR) AS product_id,
        |       strftime(date_trunc('minute', l_shipdate), '%Y-%m-%d %H:%M:%S') AS window_start,
        |       floor((SUM(l_quantity * p_retailprice)) * 100 + 0.5) / 100 AS total_sum_per_minute
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2
        |HAVING SUM(l_quantity * p_retailprice) > 3000.0
        |ORDER BY 1, 2""".stripMargin,


    "q02_price_alerts_processor" ->
      """WITH revenue AS (
        |  SELECT CAST(l_partkey AS VARCHAR) AS product_id,
        |         date_trunc('minute', l_shipdate) AS w,
        |         SUM(l_quantity * p_retailprice) AS total
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2)
        |SELECT product_id,
        |       strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start,
        |       floor((total) * 100 + 0.5) / 100 AS total_sum_per_minute
        |FROM revenue
        |WHERE total > 10.0 AND w < (SELECT max(w) FROM revenue)
        |ORDER BY 1, 2""".stripMargin,


    "q03_join_project" ->
      """SELECT l_orderkey AS purchase_id,
        |       l_quantity AS purchase_quantity,
        |       l_partkey AS product_id,
        |       p_name AS product_name,
        |       floor((p_retailprice) * 100 + 0.5) / 100 AS product_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY 1, 3, 2, 4, 5""".stripMargin,


    "q04_dim_latest_per_key" ->
      """SELECT user_id, event_id, event_type, floor((value) * 100 + 0.5) / 100 AS value
        |FROM (SELECT user_id, event_id, event_type, value,
        |             row_number() OVER (PARTITION BY user_id
        |                                ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1
        |ORDER BY 1, 2, 3, 4""".stripMargin,
  )
}
