package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.PriceAlerts

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query returns a DETERMINISTIC result: timestamps are emitted as
  * UTC strings, float aggregates are rounded, and rows carry a total
  * ORDER BY over all output columns, so the DuckDB-oracle hash compare
  * is stable (SURVEY.md §7.5 items 5-6).
  */
object SparkEntry {

  /** Render a timestamp column as a canonical UTC string — sidesteps
    * parquet timestamp physical-type (ns/us/INT96) mismatches between
    * Spark output and DuckDB oracle output.
    */
  private def tsStr(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_price_alerts_dsl")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── Reference parity (SURVEY.md §2) ────────────────────────────────
    // J1+P1+G1+W1+A1+P2+P4+P5+P6+P7: the DSL price-alerts pipeline.
    "q01_price_alerts_dsl" -> ((s, dir) => {
      PriceAlerts.dslPipeline(Tables.purchases(s, dir), Tables.products(s, dir))
        .select(col("product_id"), tsStr(col("window_start")).as("window_start"),
          round(col("total_sum_per_minute"), 2).as("total_sum_per_minute"))
        .orderBy("product_id", "window_start")
    }),

    // P3+W4: processor variant — threshold 10, closed windows only
    // (wall-clock punctuator never scans the still-open minute,
    // PurchaseQuantityAlertTrasformer.java:63).
    "q02_price_alerts_processor" -> ((s, dir) => {
      val revenue = PriceAlerts.windowedRevenue(
        PriceAlerts.purchasesWithProducts(Tables.purchases(s, dir), Tables.products(s, dir)))
      PriceAlerts.alerts(PriceAlerts.closedWindowsOnly(revenue), PriceAlerts.ProcessorThreshold)
        .select(col("product_id"), tsStr(col("window_start")).as("window_start"),
          round(col("total_sum_per_minute"), 2).as("total_sum_per_minute"))
        .orderBy("product_id", "window_start")
    }),

    // J1/P1 in isolation: the 5-field PurchaseWithProduct projection
    // (dsl/PriceAlertsApp.java:139-157).
    "q03_join_project" -> ((s, dir) => {
      PriceAlerts.purchasesWithProducts(Tables.purchases(s, dir), Tables.products(s, dir))
        .select(col("purchase_id"), col("purchase_quantity"), col("product_id"),
          col("product_name"), round(col("product_price"), 2).as("product_price"))
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
          round(col("value"), 2).as("value"))
        .orderBy("user_id", "event_id", "event_type", "value")
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_price_alerts_dsl" ->
      """SELECT CAST(l_partkey AS VARCHAR) AS product_id,
        |       strftime(date_trunc('minute', l_shipdate), '%Y-%m-%d %H:%M:%S') AS window_start,
        |       round(SUM(l_quantity * p_retailprice), 2) AS total_sum_per_minute
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
        |       round(total, 2) AS total_sum_per_minute
        |FROM revenue
        |WHERE total > 10.0 AND w < (SELECT max(w) FROM revenue)
        |ORDER BY 1, 2""".stripMargin,

    "q03_join_project" ->
      """SELECT l_orderkey AS purchase_id,
        |       l_quantity AS purchase_quantity,
        |       l_partkey AS product_id,
        |       p_name AS product_name,
        |       round(p_retailprice, 2) AS product_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY 1, 3, 2, 4, 5""".stripMargin,

    "q04_dim_latest_per_key" ->
      """SELECT user_id, event_id, event_type, round(value, 2) AS value
        |FROM (SELECT user_id, event_id, event_type, value,
        |             row_number() OVER (PARTITION BY user_id
        |                                ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1
        |ORDER BY 1, 2, 3, 4""".stripMargin,
  )
}
