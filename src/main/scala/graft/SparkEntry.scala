package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{PriceAlerts, Relational}

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
    // ── Relational breadth (SURVEY.md §2.11 "not present" list) ────────
    // Multi-aggregate (sum/avg/count) grouped summary.
    "q05_pricing_summary" -> ((s, dir) => {
      Relational.pricingSummary(Tables.lineitem(s, dir))
        .select(col("l_returnflag"), col("l_linestatus"),
          round(col("sum_qty"), 2).as("sum_qty"),
          round(col("sum_base_price"), 2).as("sum_base_price"),
          round(col("sum_disc_price"), 2).as("sum_disc_price"),
          round(col("avg_qty"), 4).as("avg_qty"),
          round(col("avg_price"), 4).as("avg_price"),
          col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Top-k: ORDER BY + LIMIT → TakeOrderedAndProject (bounded heaps).
    "q06_topk_orders" -> ((s, dir) => {
      Relational.topOrders(Tables.orders(s, dir), 100)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
    }),

    // Set operations: UNION (distinct) + EXCEPT.
    "q07_set_ops" -> ((s, dir) => {
      Relational.customerSetOps(Tables.customer(s, dir), Tables.orders(s, dir))
        .orderBy("custkey")
    }),

    // Exact distinct aggregation.
    "q08_distinct_users" -> ((s, dir) => {
      Relational.distinctUsersPerType(Tables.events(s, dir))
        .orderBy("event_type")
    }),

    // Semi + anti joins (EXISTS / NOT EXISTS) + UNION ALL.
    "q09_semi_anti" -> ((s, dir) => {
      Relational.customersByOrderExistence(Tables.customer(s, dir), Tables.orders(s, dir))
        .orderBy("c_custkey", "tag")
    }),

    // ROLLUP grouping sets.
    "q10_rollup" -> ((s, dir) => {
      Relational.quantityRollup(Tables.lineitem(s, dir))
        .select(col("returnflag"), col("linestatus"),
          round(col("sum_qty"), 2).as("sum_qty"), col("n"))
        .orderBy("returnflag", "linestatus")
    }),

    // Analytic window functions: row_number, lag, running sum.
    "q11_order_analytics" -> ((s, dir) => {
      Relational.orderHistoryAnalytics(Tables.orders(s, dir))
        .select(col("o_custkey"), col("o_orderkey"), col("rn"),
          round(col("prev_price"), 2).as("prev_price"),
          round(col("running_total"), 2).as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Star-schema multi-join with broadcast dims.
    "q12_revenue_per_region" -> ((s, dir) => {
      Relational.revenuePerRegion(Tables.region(s, dir), Tables.nation(s, dir),
          Tables.customer(s, dir), Tables.orders(s, dir))
        .select(col("r_name"), round(col("revenue"), 2).as("revenue"), col("n_orders"))
        .orderBy("r_name")
    }),

    // Generator/explode (UDTF-shaped): token frequency top-100.
    "q13_token_frequency" -> ((s, dir) => {
      Relational.tokenFrequency(Tables.documents(s, dir), 100)
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

    "q05_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(SUM(l_quantity), 2) AS sum_qty,
        |       round(SUM(l_extendedprice), 2) AS sum_base_price,
        |       round(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |       round(AVG(l_quantity), 4) AS avg_qty,
        |       round(AVG(l_extendedprice), 4) AS avg_price,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q06_topk_orders" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        |FROM orders
        |ORDER BY orders.o_totalprice DESC, o_orderkey ASC
        |LIMIT 100""".stripMargin,

    "q07_set_ops" ->
      """(SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        | UNION
        | SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000.0)
        |EXCEPT
        |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0.0
        |ORDER BY 1""".stripMargin,

    "q08_distinct_users" ->
      """SELECT event_type,
        |       COUNT(DISTINCT user_id) AS n_users,
        |       COUNT(*) AS n_events
        |FROM events
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q09_semi_anti" ->
      """SELECT c_custkey, 'has_orders' AS tag FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT c_custkey, 'no_orders' AS tag FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY 1, 2""".stripMargin,

    "q10_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS linestatus,
        |       round(SUM(l_quantity), 2) AS sum_qty,
        |       COUNT(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin,

    "q11_order_analytics" ->
      """SELECT o_custkey, o_orderkey,
        |       row_number() OVER w AS rn,
        |       round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
        |       round(SUM(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |                                       AND CURRENT ROW), 2) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY 1, 2""".stripMargin,

    "q12_revenue_per_region" ->
      """SELECT r_name, round(SUM(o_totalprice), 2) AS revenue, COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q13_token_frequency" ->
      """SELECT token, COUNT(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE length(token) > 0
        |GROUP BY 1
        |ORDER BY 2 DESC, 1 ASC
        |LIMIT 100""".stripMargin,
  )
}
