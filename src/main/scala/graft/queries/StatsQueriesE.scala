package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{AsOfJoin, Dedup, EntityResolution, GraphOps, Multimodal, PriceAlerts, Relational, Similarity, Sketches, TextAnalysis, TimeSeries}
import graft.QueryHelpers._

/** Inline analytics, q300-q342: conformance-tier statistics over the TPC-H schema.
  *
  * Registry split out of SparkEntry (round 9): the maps below are
  * merged back into `SparkEntry.queries` / `SparkEntry.oracleSql`,
  * so names, semantics, and the DuckDB-oracle pairing are unchanged.
  */
object StatsQueriesE {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Business health one-pager: the headline KPIs as (metric,
    // value) rows — totals, repeat share, top-nation concentration,
    // median order value — each the already-audited exact form,
    // composed into ONE certified report (the analytics capstone;
    // q89 is the corpus-side card).
    "q300_health_card" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, dir)
      def row1(name: String, v: org.apache.spark.sql.DataFrame) =
        v.select(lit(name).as("metric"),
          col(v.columns.head).cast("double").as("value"))
      val totalRev = row1("total_revenue_usd",
        o.agg((sum(floor(col("o_totalprice") * 100 + lit(0.5))
          .cast("long")) / 100.0).as("v")))
      val nOrders = row1("n_orders", o.agg(count(lit(1)).as("v")))
      val nCust = row1("n_ordering_customers",
        o.agg(countDistinct(col("o_custkey")).as("v")))
      val repeat = row1("repeat_customer_permille",
        o.groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
          .agg(expr("sum(case when n > 1 then 1 else 0 end)" +
            " * 1000L div count(1)").as("v")))
      // Exact median by selection over value-grain counts: the only
      // window (cumulative count) runs over the distinct cent-value
      // frame — bounded by the price domain — never the order rows.
      val median = row1("median_order_value_usd", {
        val counts = o.select(floor(col("o_totalprice") * 100 +
          lit(0.5)).cast("long").as("v_c"))
          .groupBy(col("v_c")).agg(count(lit(1)).as("t"))
        val total = counts.agg(sum(col("t")).as("n"))
        counts
          .withColumn("cum", sum(col("t")).over(
            Window.orderBy(col("v_c"))))
          .crossJoin(broadcast(total))
          .filter(col("cum") >= ((col("n") + 1) / lit(2)).cast("long"))
          .agg((min(col("v_c")) / 100.0).as("v"))
      })
      val topNation = row1("top_nation_rev_permille",
        o.join(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5))
            .cast("long")).as("r"))
          .agg(expr("cast(max(r) as decimal(38,0)) * 1000" +
            " div cast(sum(r) as decimal(38,0))").as("v")))
      totalRev.unionAll(nOrders).unionAll(nCust).unionAll(repeat)
        .unionAll(median).unionAll(topNation)
        .orderBy("metric")
    }),


    // Arrival overdispersion test per weekday: the variance-to-mean
    // ratio of daily order counts (Poisson arrivals ⇒ ratio ≈ 1;
    // campaign/batch-driven feeds run hot). Moments are exact
    // integers over the |days| aggregate (q178's identity at the
    // daily-count grain); the ratio is one terminal division.
    "q301_arrival_dispersion" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy((weekday(col("o_orderdate")) + 1).cast("long")
          .as("isodow"), col("o_orderdate"))
        .agg(count(lit(1)).as("c"))
      daily.groupBy(col("isodow"))
        .agg(count(lit(1)).as("n_days"), sum(col("c")).as("sc"),
          sum(col("c") * col("c")).as("sc2"))
        .filter(col("n_days") >= 2L && col("sc") > 0L)
        .select(col("isodow"), col("n_days"),
          expr("sc div n_days").as("mean_daily_orders"),
          // var/mean = (nΣc²−(Σc)²) / ((n−1)·Σc) exact until ÷
          r4((col("n_days") * col("sc2") - col("sc") * col("sc"))
            .cast("double") /
            ((col("n_days") - 1) * col("sc")).cast("double"))
            .as("dispersion_index"))
        .orderBy("isodow")
    }),


    // Jackknife top-k stability: drop each of 16 md5 corpus slices
    // in turn, recompute the top-10 token list, and report the
    // agreement with the full-corpus top-10 — a headline ranking
    // that flips when 6% of data vanishes isn't a finding, it's
    // noise. All 17 rankings run over ONE (token, slice) aggregate;
    // agreement is exact |∩| out of 10.
    "q302_topk_stability" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val perSlice = Tables.documents(s, dir)
        .select(substring(md5(col("doc_id").cast("string")), 1, 1)
          .as("slice"),
          explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy(col("token"), col("slice"))
        .agg(count(lit(1)).as("c"))
      val totals = perSlice.groupBy(col("token"))
        .agg(sum(col("c")).as("c_all"))
      // Full-corpus top-10 via orderBy().limit(): the token-vocabulary
      // frame is unbounded at corpus scale (Zipf tail), so no
      // single-partition window — TakeOrderedAndProject keeps a 10-row
      // heap per partition. (The per-fold windows below stay: they are
      // partitioned by drop_slice, bounded at 16 folds by the
      // jackknife design — see SCALING.md.)
      val fullTop = totals
        .orderBy(col("c_all").desc, col("token"))
        .limit(10)
        .select(col("token").as("full_token"))
      // per fold: counts minus the dropped slice, rank, keep top-10
      val folds = perSlice.select(col("slice")).distinct()
        .select(col("slice").as("drop_slice"))
      val foldTop = totals
        .crossJoin(broadcast(folds))
        .join(perSlice.select(col("token").as("tok_s"),
          col("slice"), col("c").as("c_s")),
          col("token") === col("tok_s") &&
            col("slice") === col("drop_slice"), "left")
        .select(col("drop_slice"), col("token"),
          (col("c_all") - coalesce(col("c_s"), lit(0L))).as("c_minus"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("drop_slice"))
            .orderBy(col("c_minus").desc, col("token"))))
        .filter(col("rk") <= 10)
      foldTop
        .join(broadcast(fullTop),
          col("token") === col("full_token"), "left")
        .groupBy(col("drop_slice"))
        .agg(sum(when(col("full_token").isNotNull, 1L).otherwise(0L))
          .as("n_agree"))
        .select(col("drop_slice"), col("n_agree"),
          expr("n_agree * 100L div 10").as("agreement_pct"))
        .orderBy("drop_slice")
    }),


    // Trailing-12-month revenue index: each month against the mean
    // of its preceding 12 (the deseasonalized trend readout; q239's
    // rolling-median sibling with an exact-integer mean — sum over
    // the bounded ROWS window, one integer division). Warm-up months
    // (fewer than 12 predecessors) are excluded, stated.
    "q303_trailing_index" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w12 = Window.orderBy(col("mon")).rowsBetween(-12, -1)
      Tables.orders(s, dir)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
        .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5))
          .cast("long")).as("rev_c"))
        .withColumn("t12_sum", sum(col("rev_c")).over(w12))
        .withColumn("t12_n", count(col("rev_c")).over(w12))
        .filter(col("t12_n") === 12L)
        .select(col("mon"), (col("rev_c") / 100.0).as("revenue"),
          expr("cast(rev_c as decimal(38,0)) * 12000" +
            " div cast(t12_sum as decimal(38,0))")
            .as("trailing_index_permille"))
        .orderBy("mon")
    }),


    // Token-stutter detection: the longest CONSECUTIVE-repeat run of
    // a token per document, rolled to per-source maxima and the ppm
    // of documents with a run ≥ 3 — the looping-generator signature
    // (models and broken crawlers stutter; prose doesn't). Runs are
    // gaps-and-islands over the exploded token sequence, one
    // doc-keyed exchange.
    "q304_token_stutter" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = Tables.documents(s, dir)
        .select(col("source"), col("doc_id"),
          posexplode(expr("filter(split(text, ' '), " +
            "t -> length(t) > 0)")).as(Seq("pos", "tok")))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val runs = toks
        .withColumn("brk",
          when(col("tok") === lag(col("tok"), 1).over(w), 0L)
            .otherwise(1L))
        .withColumn("grp", sum(col("brk")).over(w))
        .groupBy(col("source"), col("doc_id"), col("grp"))
        .agg(count(lit(1)).as("run_len"))
        .groupBy(col("source"), col("doc_id"))
        .agg(max(col("run_len")).as("max_run"))
      runs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          max(col("max_run")).as("worst_run"),
          sum(when(col("max_run") >= 3L, 1L).otherwise(0L))
            .as("n_stutter"))
        .select(col("source"), col("n_docs"), col("worst_run"),
          expr("n_stutter * 1000000L div n_docs").as("stutter_ppm"))
        .orderBy("source")
    }),


    // Hourly error-rate SLO: error share per hour-of-day in exact
    // permille with the hour's traffic — the availability heat strip
    // (errors clustering in one hour point at a batch job, not
    // load). One events scan.
    "q305_error_slo" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(hour(col("ts")).cast("long").as("hr"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("n_errors"))
        .select(col("hr"), col("n_events"), col("n_errors"),
          expr("n_errors * 1000L div n_events").as("error_permille"))
        .orderBy("hr")
    }),


    // Revenue-weighted ship delay per priority: Σ(delay·value) /
    // Σvalue in exact integers — a day late on a big order hurts
    // more than on a small one, which the unweighted mean (q234's
    // grain) hides. One joined scan, one integer division.
    "q306_weighted_ship_delay" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(to_date(col("l_shipdate")), col("o_orderdate"))
            .cast("long").as("delay_d"),
          (floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long") *
            (lit(100L) - floor(col("l_discount") * 100 + lit(0.5))
              .cast("long"))).as("rev_u"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("delay_d")).as("sd"),
          sum(col("delay_d").cast(dec) * col("rev_u")).as("swd"),
          sum(col("rev_u")).cast(dec).as("sw"))
        .select(col("o_orderpriority"), col("n_lines"),
          expr("sd div n_lines").as("mean_delay_d"),
          r4(col("swd").cast("double") / col("sw").cast("double"))
            .as("weighted_delay_d"))
        .orderBy("o_orderpriority")
    }),


    // Cadence acceleration bands per segment: is each customer's
    // LAST inter-order gap shorter or longer than their mean gap
    // (accelerating / steady / decelerating, compared by integer
    // cross-multiplication — last·(n−1) vs span, no division)?
    // Early-warning sibling of the q259 overdue ranking.
    "q307_cadence_acceleration" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      // the last gap rides the same window pass as the aggregate via
      // a rank-1 conditional max — no self-join
      val withGaps = Tables.orders(s, dir)
        .withColumn("gap_d",
          datediff(col("o_orderdate"),
            lag(col("o_orderdate"), 1).over(w)).cast("long"))
        .withColumn("rk_desc", row_number().over(
          Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_orderdate")).as("first_d"),
          max(col("o_orderdate")).as("last_d"),
          max(when(col("rk_desc") === 1, col("gap_d")))
            .as("last_gap_d"))
        .filter(col("n_orders") >= 4L && col("last_gap_d").isNotNull)
        .select(col("o_custkey"),
          datediff(col("last_d"), col("first_d")).cast("long")
            .as("span_d"),
          (col("n_orders") - 1).as("n_gaps"), col("last_gap_d"))
        .filter(col("span_d") > 0L)
      val banded = withGaps
        .join(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"),
          // last·n_gaps vs span, 20% dead band via ±span/5
          when(col("last_gap_d") * col("n_gaps") * 5 <
            col("span_d") * 4, "a_accelerating")
            .when(col("last_gap_d") * col("n_gaps") * 5 >
              col("span_d") * 6, "c_decelerating")
            .otherwise("b_steady").as("cadence"))
      banded.groupBy(col("c_mktsegment"), col("cadence"))
        .agg(count(lit(1)).as("n_customers"))
        .withColumn("share_permille", expr("n_customers * 1000L div " +
          "sum(n_customers) over (partition by c_mktsegment)"))
        .orderBy("c_mktsegment", "cadence")
    }),


    // Brand-concentration HHI per part type: Σ share² as exact ppm
    // (Σc²·10⁶ div (Σc)² — the Herfindahl index without a single
    // float), plus the brand count — the antitrust-standard
    // concentration measure joining Gini (q179) and Simpson (q194)
    // in the inequality family.
    "q308_brand_hhi" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_type"), col("p_brand"))),
          col("p_partkey") === col("l_partkey"))
        .groupBy(col("p_type"), col("p_brand"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
        .groupBy(col("p_type"))
        .agg(count(lit(1)).as("n_brands"),
          sum(col("q")).cast(dec).as("sq"),
          sum(col("q").cast(dec) * col("q").cast(dec)).as("sq2"))
        .select(col("p_type"), col("n_brands"),
          expr("sq2 * 1000000 div (sq * sq)").as("hhi_ppm"))
        .orderBy("p_type")
    }),


    // Tax-band conformance: line-level tax rates outside the
    // configured [0%, 8%] legal band, per rate point — rates are
    // exact integer percent points; out-of-band lines are the
    // misconfiguration audit.
    "q309_tax_band_audit" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select(floor(col("l_tax") * 100 + lit(0.5)).cast("long")
          .as("tax_pct"))
        .groupBy(col("tax_pct"))
        .agg(count(lit(1)).as("n_lines"))
        .withColumn("in_band",
          when(col("tax_pct") >= 0L && col("tax_pct") <= 8L, 1L)
            .otherwise(0L))
        .withColumn("share_permille",
          expr("n_lines * 1000L div sum(n_lines) over ()"))
        .orderBy("tax_pct")
    }),


    // Ops health one-pager: the operations KPIs as (metric, value)
    // rows — p90 fulfillment days, open orders at the pinned cutoff,
    // inversion ppm, mean order width — each in its already-audited
    // exact form; q300's business card's operations sibling.
    "q310_ops_health_card" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      def row1(name: String, v: org.apache.spark.sql.DataFrame) =
        v.select(lit(name).as("metric"),
          col(v.columns.head).cast("double").as("value"))
      val perOrder = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(max(to_date(col("l_shipdate"))).as("last_ship"),
          count(lit(1)).as("n_lines"))
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"),
          datediff(col("last_ship"), col("o_orderdate")).cast("long")
            .as("gap_d"), col("n_lines"), col("last_ship"),
          col("o_orderdate"))
      // Exact p90 by selection over value-grain counts: the gap_d
      // domain is ~hundreds of distinct day values, so the cumulative
      // window runs over that bounded frame, never the order-grain rows.
      val p90 = row1("fulfillment_p90_days", {
        val counts = perOrder.groupBy(col("gap_d"))
          .agg(count(lit(1)).as("t"))
        val total = counts.agg(sum(col("t")).as("n"))
        counts
          .withColumn("cum", sum(col("t")).over(
            Window.orderBy(col("gap_d"))))
          .crossJoin(broadcast(total))
          .filter(col("cum") >= ((col("n") * 9 + 9) / lit(10))
            .cast("long"))
          .agg(min(col("gap_d")).as("v"))
      })
      val openAt = row1("open_orders_at_cutoff",
        perOrder.filter(col("o_orderdate") <= lit("1998-07-01") &&
          col("last_ship") > lit("1998-07-01"))
          .agg(count(lit(1)).as("v")))
      val meanWidth = row1("mean_lines_per_order_permille",
        perOrder.agg(expr("sum(n_lines) * 1000L div count(1)")
          .as("v")))
      val invPpm = row1("ship_inversion_ppm", {
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_linenumber"), col("sd"), col("l_partkey"))
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), to_date(col("l_shipdate")).as("sd"))
          .withColumn("prev_sd", lag(col("sd"), 1).over(w))
          .filter(col("prev_sd").isNotNull)
          .agg(expr("sum(case when sd < prev_sd then 1 else 0 end)" +
            " * 1000000L div count(1)").as("v"))
      })
      p90.unionAll(openAt).unionAll(meanWidth).unionAll(invPpm)
        .orderBy("metric")
    }),


    // Seasonality stability: each calendar month's revenue share
    // per year, summarized as the min/max share spread across years
    // — a stable season plans inventory, a drifting one doesn't.
    // Shares are exact permille of each year's total; only complete
    // years (12 distinct months) enter.
    "q311_seasonality_stability" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dec = "decimal(38,0)"
      val ym = Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("moy"))
        .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5))
          .cast("long")).as("rev_c"))
        .withColumn("yr_tot", sum(col("rev_c")).over(
          Window.partitionBy(col("yr"))))
        .withColumn("n_months", count(lit(1)).over(
          Window.partitionBy(col("yr"))))
        .filter(col("n_months") === 12L)
        .select(col("yr"), col("moy"),
          expr(s"cast(rev_c as $dec) * 1000" +
            s" div cast(yr_tot as $dec)").as("share_permille"))
      ym.groupBy(col("moy"))
        .agg(count(lit(1)).as("n_years"),
          min(col("share_permille")).as("min_share_permille"),
          max(col("share_permille")).as("max_share_permille"))
        .select(col("moy").cast("long").as("month"), col("n_years"),
          col("min_share_permille"), col("max_share_permille"),
          (col("max_share_permille") - col("min_share_permille"))
            .as("spread_permille"))
        .orderBy("month")
    }),


    // Nation supply dependence: each nation's top supplier share of
    // its shipped value (exact permille off supplier aggregates) —
    // the single-point-of-failure readout at the geography grain
    // (q275's part-grain sibling).
    "q312_nation_supplier_dependence" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dec = "decimal(38,0)"
      val perSupp = Tables.lineitem(s, dir)
        .join(Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("n_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"), col("l_suppkey"))
        .agg(sum((floor(col("l_extendedprice") * 100 + lit(0.5))
          .cast("long") *
          (lit(100L) - floor(col("l_discount") * 100 + lit(0.5))
            .cast("long")))).as("rev_u"))
      val w = Window.partitionBy(col("n_name"))
      perSupp
        .withColumn("tot", sum(col("rev_u")).over(w))
        .withColumn("n_suppliers", count(lit(1)).over(w))
        .withColumn("rk", row_number().over(
          w.orderBy(col("rev_u").desc, col("l_suppkey"))))
        .filter(col("rk") === 1)
        .select(col("n_name"), col("n_suppliers").cast("long")
          .as("n_suppliers"),
          expr(s"cast(rev_u as $dec) * 1000 div cast(tot as $dec)")
            .as("top_supplier_permille"))
        .orderBy("n_name")
    }),


    // Positional token-length profile: mean token length (permille
    // exact) by relative document position quintile — generated or
    // truncated text degrades toward the tail; prose doesn't. The
    // quintile is pure integer arithmetic on (pos, n_tokens).
    "q313_positional_profile" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(expr("filter(split(text, ' '), t -> length(t) > 0)")
          .as("toks"))
        .select(expr("size(toks)").cast("long").as("n"),
          posexplode(col("toks")).as(Seq("pos", "tok")))
        .filter(col("n") >= 5L)
        .select(expr("(pos * 5) div n").cast("long").as("quintile"),
          length(col("tok")).cast("long").as("len"))
      toks.groupBy(col("quintile"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("len")).as("sl"))
        .select(col("quintile"), col("n_tokens"),
          expr("sl * 1000L div n_tokens").as("mean_len_permille"))
        .orderBy("quintile")
    }),


    // Import diversity: how many distinct supplier NATIONS each
    // customer buys from, banded — single-nation buyers are
    // tariff/disruption exposed. One joined scan to (customer,
    // supplier-nation) grain, then two rollups.
    "q314_import_diversity" -> ((s, dir) => {
      val perCust = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("o_custkey"))
        .agg(countDistinct(col("s_nationkey")).as("n_nations"))
      perCust
        .select(
          when(col("n_nations") === 1L, "a_single")
            .when(col("n_nations") <= 3L, "b_2_3")
            .when(col("n_nations") <= 6L, "c_4_6")
            .otherwise("d_7_plus").as("diversity_band"))
        .groupBy(col("diversity_band"))
        .agg(count(lit(1)).as("n_customers"))
        .withColumn("share_permille",
          expr("n_customers * 1000L div sum(n_customers) over ()"))
        .orderBy("diversity_band")
    }),


    // Footer-duplicate families: documents sharing their LAST five
    // tokens — the template/boilerplate signature prefix dedup
    // misses (footers anchor at the tail). Families with more than
    // one member, per source: family count and member ppm.
    "q315_footer_families" -> ((s, dir) => {
      val fp = Tables.documents(s, dir)
        .select(col("source"), col("doc_id"),
          expr("filter(split(text, ' '), t -> length(t) > 0)")
            .as("toks"))
        .filter(expr("size(toks) >= 5"))
        .select(col("source"), col("doc_id"),
          expr("concat_ws(' ', slice(toks, -5, 5))").as("footer"))
      val fams = fp.groupBy(col("source"), col("footer"))
        .agg(count(lit(1)).as("sz"))
      fams.groupBy(col("source"))
        .agg(count(lit(1)).as("n_footers"),
          sum(when(col("sz") > 1L, 1L).otherwise(0L))
            .as("n_families"),
          sum(when(col("sz") > 1L, col("sz")).otherwise(0L))
            .as("n_docs_in_families"),
          sum(col("sz")).as("n_docs"))
        .select(col("source"), col("n_footers"), col("n_families"),
          expr("n_docs_in_families * 1000000L div n_docs")
            .as("family_doc_ppm"))
        .orderBy("source")
    }),


    // Forecaster bake-off: trailing-3-month mean vs seasonal-naive
    // (same month last year) on monthly revenue — per-forecaster
    // mean APE in ppm and head-to-head wins, only on months where
    // BOTH have a forecast. The model-selection readout behind
    // q248/q303; every error is exact integer ppm.
    "q316_forecast_bakeoff" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wOrd = Window.orderBy(col("mon"))
      val m = Tables.orders(s, dir)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
        .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5))
          .cast("long")).as("rev_c"))
        .withColumn("t3_sum", sum(col("rev_c")).over(
          wOrd.rowsBetween(-3, -1)))
        .withColumn("t3_n", count(col("rev_c")).over(
          wOrd.rowsBetween(-3, -1)))
        .withColumn("sn", lag(col("rev_c"), 12).over(wOrd))
        .filter(col("t3_n") === 3L && col("sn").isNotNull &&
          col("sn") > 0L && col("rev_c") > 0L)
        .select(col("mon"), col("rev_c"),
          expr("t3_sum div 3").as("f_t3"), col("sn"))
        .select(col("mon"),
          expr("abs(rev_c - f_t3) * 1000000L div rev_c").as("ape_t3"),
          expr("abs(rev_c - sn) * 1000000L div rev_c").as("ape_sn"))
      m.agg(count(lit(1)).as("n_months"),
        expr("sum(ape_t3) div count(1)").as("trailing3_mape_ppm"),
        expr("sum(ape_sn) div count(1)").as("seasonal_mape_ppm"),
        sum(when(col("ape_t3") < col("ape_sn"), 1L).otherwise(0L))
          .as("trailing3_wins"),
        sum(when(col("ape_sn") < col("ape_t3"), 1L).otherwise(0L))
          .as("seasonal_wins"))
    }),


    // Spend-growth mix per segment 1996→1997: the share of customers
    // active both years whose spend grew — the expansion/contraction
    // balance behind q281's aggregate mix shift. One scan,
    // year-conditional sums, integer compares.
    "q317_spend_growth_mix" -> ((s, dir) => {
      Tables.orders(s, dir)
        .filter(year(col("o_orderdate")).isin(1996, 1997))
        .join(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_custkey"))
        .agg(
          sum(when(year(col("o_orderdate")) === 1996,
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
            .otherwise(0L)).as("s96"),
          sum(when(year(col("o_orderdate")) === 1997,
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
            .otherwise(0L)).as("s97"))
        .filter(col("s96") > 0L && col("s97") > 0L)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_both_years"),
          sum(when(col("s97") > col("s96"), 1L).otherwise(0L))
            .as("n_growing"))
        .select(col("c_mktsegment"), col("n_both_years"),
          col("n_growing"),
          expr("n_growing * 1000L div n_both_years")
            .as("growing_permille"))
        .orderBy("c_mktsegment")
    }),


    // On-time trend: monthly share of line items shipping within 7
    // days of their order — the fulfillment-quality time series
    // (q230's latency bands collapsed to one SLA number per month).
    "q318_ontime_trend" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(datediff(to_date(col("l_shipdate")),
            col("o_orderdate")) <= 7, 1L).otherwise(0L))
            .as("n_ontime"))
        .select(col("mon"), col("n_lines"),
          expr("n_ontime * 1000L div n_lines").as("ontime_permille"))
        .orderBy("mon")
    }),


    // Does catalog naming correlate with demand? Spearman rank
    // correlation between part-name length and total quantity sold —
    // q235's exact tie-broken-rank machinery at the catalog grain
    // (the null result is the point: a near-zero rho certifies the
    // fixture's name lengths are demand-independent).
    "q319_name_demand_spearman" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val per = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_quantity").cast("long")).as("qty"))
        .join(Tables.part(s, dir)
          .select(col("p_partkey"), length(col("p_name")).cast("long")
            .as("name_len")),
          col("l_partkey") === col("p_partkey"))
        // chained-rank seam: the first rank pass executes its input
        // twice (range sampling + shuffle map) — checkpoint so the
        // lineitem aggregate + part join runs once, not twice
        .localCheckpoint(true)
      // Spearman needs both full rank VECTORS over the part grain —
      // two ScaleOps.distributedRank passes (range shuffle + partition
      // offsets) replace the two single-partition row_number windows;
      // identical tie-broken ranks, no task ever holds the |parts|
      // frame. The second call range-shuffles the first's output.
      val ranked = graft.operators.ScaleOps.distributedRank(
        graft.operators.ScaleOps.distributedRank(per,
          Seq(col("name_len"), col("l_partkey")), "r1"),
        Seq(col("qty"), col("l_partkey")), "r2")
      ranked.agg(count(lit(1)).cast(dec).as("n"),
        sum(((col("r1") - col("r2")) * (col("r1") - col("r2")))
          .cast(dec)).as("sd2"))
        .select(col("n").cast("long").as("n_parts"),
          r4(lit(1.0) - (col("sd2") * 6).cast("double") /
            (col("n") * col("n") * col("n") - col("n")).cast("double"))
            .as("spearman_rho"))
    }),


    // Session-grain type affinity: which event types co-occur in the
    // SAME session (q276's user-grain affinity tightened to the
    // 30-minute behavioral unit — "do people who error then view in
    // one sitting"). Session sets via the exact-µs sessionizer; the
    // pair space rides the distinct (session, type) self-join;
    // Jaccard from the union identity.
    "q320_session_type_affinity" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val st = Tables.events(s, dir)
        .withColumn("brk",
          when(unix_micros(col("ts")) -
            unix_micros(lag(col("ts"), 1).over(w)) <= 1800000000L, 0L)
            .otherwise(1L))
        .withColumn("sess_id", sum(col("brk")).over(w))
        .select(concat(col("user_id"), lit("#"), col("sess_id"))
          .as("sid"), col("event_type")).distinct()
      val sizes = st.groupBy(col("event_type"))
        .agg(count(lit(1)).as("ns"))
      val inter = st.select(col("sid"), col("event_type").as("ta"))
        .join(st.select(col("sid").as("sid_b"),
          col("event_type").as("tb")),
          col("sid") === col("sid_b") && col("ta") < col("tb"))
        .groupBy(col("ta"), col("tb"))
        .agg(count(lit(1)).as("n_both"))
      inter
        .join(sizes.select(col("event_type").as("ta"),
          col("ns").as("na")), "ta")
        .join(sizes.select(col("event_type").as("tb"),
          col("ns").as("nb")), "tb")
        .select(col("ta").as("type_a"), col("tb").as("type_b"),
          col("n_both"),
          r4(col("n_both").cast("double") /
            (col("na") + col("nb") - col("n_both")).cast("double"))
            .as("session_jaccard"))
        .orderBy("type_a", "type_b")
    }),


    // Returns by discount depth: do discounted lines come back more?
    // Return permille per exact discount point — the
    // promotion-quality check (deep discounts that boomerang as
    // returns are negative-margin twice). One scan.
    "q321_returns_by_discount" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(floor(col("l_discount") * 100 + lit(0.5)).cast("long")
          .as("discount_pct"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("n_returns"))
        .select(col("discount_pct"), col("n_lines"),
          expr("n_returns * 1000L div n_lines").as("return_permille"))
        .orderBy("discount_pct")
    }),


    // Quantity-integrality audit: l_quantity is documented integral;
    // count the lines where floor(q) ≠ q per status — the
    // type-conformance check (zeros are the healthy report, the
    // q227 discipline on a value column).
    "q322_quantity_integrality" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(expr("l_quantity != floor(l_quantity)"), 1L)
            .otherwise(0L)).as("n_fractional"))
        .orderBy("l_linestatus")
    }),


    // Growth decomposition 1996→1997 per region: the revenue delta
    // split into a VOLUME effect (quantity change valued at 1996
    // unit prices, Laspeyres) and the residual PRICE/MIX effect —
    // the FP&A bridge, in exact integers (per-part 1996 unit value
    // is an integer division, stated as the decomposition's
    // definition). Parts absent in 1996 contribute wholly to
    // price/mix, as the convention goes.
    "q323_growth_decomposition" -> ((s, dir) => {
      val base = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate"),
            col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .filter(year(col("o_orderdate")).isin(1996, 1997))
        .join(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_regionkey"))),
          col("n_nationkey") === col("c_nationkey"))
        .join(broadcast(Tables.region(s, dir)),
          col("r_regionkey") === col("n_regionkey"))
        .groupBy(col("r_name"), col("l_partkey"))
        .agg(
          sum(when(year(col("o_orderdate")) === 1996,
            col("l_quantity").cast("long")).otherwise(0L)).as("q96"),
          sum(when(year(col("o_orderdate")) === 1997,
            col("l_quantity").cast("long")).otherwise(0L)).as("q97"),
          sum(when(year(col("o_orderdate")) === 1996,
            floor(col("l_extendedprice") * 100 + lit(0.5))
              .cast("long")).otherwise(0L)).as("r96"),
          sum(when(year(col("o_orderdate")) === 1997,
            floor(col("l_extendedprice") * 100 + lit(0.5))
              .cast("long")).otherwise(0L)).as("r97"))
      base
        .select(col("r_name"), col("r96"), col("r97"),
          when(col("q96") > 0L,
            (col("q97") - col("q96")) * expr("r96 div q96"))
            .otherwise(0L).as("vol_effect_c"))
        .groupBy(col("r_name"))
        .agg((sum(col("r96")) / 100.0).as("rev_1996"),
          (sum(col("r97")) / 100.0).as("rev_1997"),
          (sum(col("vol_effect_c")) / 100.0).as("volume_effect"),
          (sum(col("r97") - col("r96") - col("vol_effect_c")) / 100.0)
            .as("price_mix_effect"))
        .orderBy("r_name")
    }),


    // Event-value concentration ladder: the share of total event
    // value produced by the top 1% / 10% of users — q232's
    // whale-dependence readout on the behavioral axis. Exact ceil
    // thresholds over the |users| aggregate, decimal ppm.
    "q324_user_value_concentration" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val per = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
          .as("v_c"))
      // users are the largest entity grain in the schema, so this is
      // the exemplar wiring of ScaleOps.distributedRank: global spend
      // ranks via range-shuffle + partition offsets (no single-
      // partition window), and the n/tot scalars come from one
      // broadcast 1-row aggregate instead of two unpartitioned windows
      val ranked = graft.operators.ScaleOps.distributedRank(per,
        Seq(col("v_c").desc, col("user_id")), "rk")
      // totals come from the RANKED frame: its RDD's shuffle files are
      // already materialized, so this 1-row aggregate skips the whole
      // upstream scan+aggregate via stage reuse
      val totals = ranked
        .agg(count(lit(1)).as("n"), sum(col("v_c")).as("tot"))
      ranked
        .crossJoin(broadcast(totals))
        .select(col("rk"), col("n"), col("tot"), col("v_c"),
          explode(array(lit(10), lit(100))).as("pct_permille"))
        .filter(col("rk") <=
          ((col("n") * col("pct_permille") + 999) / lit(1000))
            .cast("long"))
        .groupBy(col("pct_permille"))
        .agg(count(lit(1)).as("n_users"),
          expr(s"cast(sum(v_c) as $dec) * 1000000" +
            s" div cast(max(tot) as $dec)").as("share_ppm"))
        .orderBy("pct_permille")
    }),


    // Realized-vs-catalog price gap per brand: total transacted
    // value against quantity-at-retail value, the signed ppm gap —
    // persistent negative gaps mean the catalog price is fiction.
    // Exact integer value totals; one joined scan.
    "q325_realized_vs_catalog" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand"),
            floor(col("p_retailprice") * 100 + lit(0.5)).cast("long")
              .as("retail_c"))),
          col("p_partkey") === col("l_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_lines"),
          sum(floor(col("l_extendedprice") * 100 + lit(0.5))
            .cast("long")).as("real_c"),
          sum(col("l_quantity").cast("long") * col("retail_c"))
            .as("catalog_c"))
        .filter(col("catalog_c") > 0L)
        .select(col("p_brand"), col("n_lines"),
          (col("real_c") / 100.0).as("realized_value"),
          (col("catalog_c") / 100.0).as("catalog_value"),
          expr(s"cast(real_c - catalog_c as $dec) * 1000000" +
            s" div cast(catalog_c as $dec)").as("gap_ppm"))
        .orderBy("p_brand")
    }),


    // Hamilton (largest-remainder) sampling allocation: split a
    // 10 000-row sampling budget across nations proportional to
    // their order counts — floor quotas first, then the leftover
    // seats go to the largest remainders (region tie-break). The
    // survey-sampling / apportionment algorithm in exact integers;
    // quotas provably sum to the budget.
    "q326_hamilton_allocation" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val budget = 10000L
      val counts = Tables.orders(s, dir)
        .join(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("n_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"))
        .withColumn("tot", sum(col("n_orders")).over(
          Window.partitionBy()))
      val quotas = counts
        .select(col("n_name"), col("n_orders"),
          expr(s"n_orders * ${budget}L div tot").as("base"),
          expr(s"n_orders * ${budget}L % tot").as("rem"),
          col("tot"))
        .withColumn("leftover",
          lit(budget) - sum(col("base")).over(Window.partitionBy()))
        .withColumn("rrk", row_number().over(Window.orderBy(
          col("rem").desc, col("n_name"))))
        .select(col("n_name"), col("n_orders"),
          (col("base") +
            when(col("rrk") <= col("leftover"), 1L).otherwise(0L))
            .as("quota"))
      quotas.orderBy("n_name")
    }),


    // Value-threshold CDF ladder: the share of orders (and of
    // revenue) under $100k / $200k / $300k — fixed-point CDF reads
    // without a sort, the affordability-band readout. One scan,
    // conditional integer sums.
    "q327_value_cdf_ladder" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      Tables.orders(s, dir)
        .select(floor(col("o_totalprice") * 100 + lit(0.5))
          .cast("long").as("v_c"))
        .select(col("v_c"),
          explode(array(lit(10000000L), lit(20000000L),
            lit(30000000L))).as("threshold_c"))
        .groupBy(col("threshold_c"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("v_c") < col("threshold_c"), 1L).otherwise(0L))
            .as("n_under"),
          sum(col("v_c")).as("tot_c"),
          sum(when(col("v_c") < col("threshold_c"), col("v_c"))
            .otherwise(0L)).as("under_c"))
        .select((col("threshold_c") / 100.0).as("threshold"),
          expr("n_under * 1000L div n_total")
            .as("order_share_permille"),
          expr(s"cast(under_c as $dec) * 1000" +
            s" div cast(tot_c as $dec)").as("revenue_share_permille"))
        .orderBy("threshold")
    }),


    // Same-day fulfillment: the share of multi-line orders whose
    // lines ALL ship on one day (consolidated) vs split shipments,
    // per priority — the packaging-efficiency readout. One per-order
    // distinct count.
    "q328_sameday_fulfillment" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_lines"),
          countDistinct(to_date(col("l_shipdate"))).as("n_ship_days"))
        .filter(col("n_lines") >= 2L)
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_multiline_orders"),
          sum(when(col("n_ship_days") === 1L, 1L).otherwise(0L))
            .as("n_consolidated"))
        .select(col("o_orderpriority"), col("n_multiline_orders"),
          expr("n_consolidated * 1000L div n_multiline_orders")
            .as("consolidated_permille"))
        .orderBy("o_orderpriority")
    }),


    // Novelty effect: value per event in each user's FIRST week vs
    // later — fresh users click differently; the readout that
    // decides whether week-one telemetry can calibrate long-run
    // models. Exact cents-per-event in two bands off one scan.
    "q329_novelty_effect" -> ((s, dir) => {
      val firstTs = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(min(unix_micros(col("ts"))).as("first_us"))
      Tables.events(s, dir)
        .join(firstTs, "user_id")
        .select(
          when(unix_micros(col("ts")) - col("first_us") <
            604800000000L, "a_first_week")
            .otherwise("b_later").as("age_band"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("v_c"))
        .groupBy(col("age_band"))
        .agg(count(lit(1)).as("n_events"),
          expr("sum(v_c) div count(1)").as("cents_per_event"))
        .orderBy("age_band")
    }),


    // Data-quality scorecard: the conformance KPIs as (metric,
    // value) rows — FK/PK violations, fractional quantities, status
    // mismatches, out-of-band tax lines, ship inversions — each in
    // its audited exact form; the third capstone next to q300
    // (business) and q310 (ops). Zeros are the passing grade.
    "q330_quality_scorecard" -> ((s, dir) => {
      def row1(name: String, v: org.apache.spark.sql.DataFrame) =
        v.select(lit(name).as("metric"),
          col(v.columns.head).cast("long").as("value"))
      val li = Tables.lineitem(s, dir); val o = Tables.orders(s, dir)
      val fkOrphans = row1("fk_orphan_rows", li
        .select(col("l_orderkey"))
        .join(o.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left")
        .agg(sum(when(col("o_orderkey").isNull, 1L).otherwise(0L))
          .as("v")))
      val fracQty = row1("fractional_quantities", li
        .agg(sum(when(expr("l_quantity != floor(l_quantity)"), 1L)
          .otherwise(0L)).as("v")))
      val statusMismatch = row1("status_mismatch_orders", {
        val derived = li.groupBy(col("l_orderkey"))
          .agg(min(col("l_linestatus")).as("mn"),
            max(col("l_linestatus")).as("mx"))
          .select(col("l_orderkey"),
            when(col("mn") === "F" && col("mx") === "F", "F")
              .when(col("mn") === "O" && col("mx") === "O", "O")
              .otherwise("P").as("derived"))
        o.select(col("o_orderkey"), col("o_orderstatus"))
          .join(derived, col("o_orderkey") === col("l_orderkey"))
          .agg(sum(when(col("o_orderstatus") =!= col("derived"), 1L)
            .otherwise(0L)).as("v"))
      })
      val taxOut = row1("tax_out_of_band_lines", li
        .agg(sum(when(
          floor(col("l_tax") * 100 + lit(0.5)).cast("long") > 8L, 1L)
          .otherwise(0L)).as("v")))
      val dupLn = row1("dup_linenumber_orders", li
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("l_linenumber")).as("nd"))
        .agg(sum(when(col("nd") =!= col("n"), 1L).otherwise(0L))
          .as("v")))
      fkOrphans.unionAll(fracQty).unionAll(statusMismatch)
        .unionAll(taxOut).unionAll(dupLn)
        .orderBy("metric")
    }),


    // Stored-metadata accuracy: the documents table CLAIMS n_chars —
    // recompute length(text) and count drift per source (exact match
    // / off-by-small / badly wrong). Stored-column drift is how
    // stale pipelines lie to downstream filters.
    "q331_metadata_accuracy" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("source"),
          (col("n_chars").cast("long") -
            length(col("text")).cast("long")).as("delta"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("delta") === 0L, 1L).otherwise(0L))
            .as("n_exact"),
          sum(when(abs(col("delta")) > 0L &&
            abs(col("delta")) <= 5L, 1L).otherwise(0L))
            .as("n_near"),
          sum(when(abs(col("delta")) > 5L, 1L).otherwise(0L))
            .as("n_wrong"),
          max(abs(col("delta"))).as("max_abs_delta"))
        .orderBy("source")
    }),


    // Event-stream duplicate audit: repeated event_ids (PK breach)
    // and byte-identical (user, ts, type, value) rows under DIFFERENT
    // ids (the producer-retry signature watermark dedup targets) —
    // one report row each.
    "q332_event_dedup_audit" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val dupIds = e.groupBy(col("event_id"))
        .agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(when(col("c") > 1L, col("c")).otherwise(0L)),
          lit(0L)).as("v"))
        .select(lit("duplicate_event_id_rows").as("metric"),
          col("v").cast("long").as("value"))
      val retries = e.groupBy(col("user_id"), col("ts"),
        col("event_type"), col("value"))
        .agg(count(lit(1)).as("c"),
          countDistinct(col("event_id")).as("nid"))
        .agg(coalesce(sum(when(col("c") > 1L && col("nid") > 1L,
          col("c") - 1L).otherwise(0L)), lit(0L)).as("v"))
        .select(lit("retry_duplicate_rows").as("metric"),
          col("v").cast("long").as("value"))
      dupIds.unionAll(retries).orderBy("metric")
    }),


    // Time-travel audit: line items shipped BEFORE their order date
    // — the causality violation that breaks every latency metric
    // downstream (q230/q306 assume it's zero; this query PROVES it,
    // per priority, with the worst violation in days).
    "q333_time_travel_audit" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(to_date(col("l_shipdate")), col("o_orderdate"))
            .cast("long").as("gap_d"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("gap_d") < 0L, 1L).otherwise(0L))
            .as("n_violations"),
          min(col("gap_d")).as("worst_gap_d"))
        .orderBy("o_orderpriority")
    }),


    // Order size by customer tenure: mean order cents in tenure
    // bands (days since the customer's FIRST order, at order time) —
    // does loyalty grow baskets? The first-order date rides one
    // customer-keyed min window; bands are integer day compares.
    "q334_tenure_order_size" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      Tables.orders(s, dir)
        .withColumn("first_d", min(col("o_orderdate")).over(
          Window.partitionBy(col("o_custkey"))))
        .select(
          when(datediff(col("o_orderdate"), col("first_d")) === 0,
            "a_first")
            .when(datediff(col("o_orderdate"), col("first_d")) <= 365,
              "b_year1")
            .when(datediff(col("o_orderdate"), col("first_d")) <= 1095,
              "c_year2_3")
            .otherwise("d_veteran").as("tenure_band"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
            .as("v_c"))
        .groupBy(col("tenure_band"))
        .agg(count(lit(1)).as("n_orders"),
          expr("sum(v_c) div count(1)").as("mean_order_cents"))
        .orderBy("tenure_band")
    }),


    // Part demand peak-month distribution: in which calendar month
    // does each part's quantity peak (rank window, earliest-month
    // tie-break), counted per month — uniform peaks mean no real
    // seasonality; a clustered month means capacity planning.
    "q335_peak_month_distribution" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val pm = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_partkey"),
          month(col("o_orderdate")).cast("long").as("moy"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
      pm.withColumn("rk", row_number().over(
        Window.partitionBy(col("l_partkey"))
          .orderBy(col("q").desc, col("moy").asc)))
        .filter(col("rk") === 1)
        .groupBy(col("moy").as("peak_month"))
        .agg(count(lit(1)).as("n_parts"))
        .withColumn("share_permille",
          expr("n_parts * 1000L div sum(n_parts) over ()"))
        .orderBy("peak_month")
    }),


    // Segment × priority mix: does any customer segment
    // systematically order urgent? Priority share within segment,
    // exact permille — the service-level segmentation readout.
    "q336_segment_priority_mix" -> ((s, dir) => {
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .withColumn("share_permille", expr("n_orders * 1000L div " +
          "sum(n_orders) over (partition by c_mktsegment)"))
        .orderBy("c_mktsegment", "o_orderpriority")
    }),


    // Dormant-rich suppliers: above-average account balance but
    // below-median shipped volume — q174's rich-inactive-customer
    // shape on the supply side. The balance threshold is an exact
    // integer cross-multiplication against the broadcast global
    // moment; the volume median is a nearest-rank pick off
    // ScaleOps.distributedRank (1-row broadcast — no
    // single-partition window over the supplier frame).
    "q337_dormant_rich_suppliers" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val vol = Tables.lineitem(s, dir)
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("long")).as("qty"))
      val su = Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          floor(col("s_acctbal") * 100 + lit(0.5)).cast("long")
            .as("bal_c"))
        .join(vol, col("s_suppkey") === col("l_suppkey"), "left")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          col("bal_c"), coalesce(col("qty"), lit(0L)).as("qty"))
      val mom = su.agg(sum(col("bal_c")).cast(dec).as("sb"),
        count(lit(1)).as("n"))
      val rankedQ = graft.operators.ScaleOps.distributedRank(
        su.select(col("qty"), col("s_suppkey")),
        Seq(col("qty"), col("s_suppkey")), "qrk")
      val medQ = rankedQ
        .crossJoin(broadcast(mom.select(col("n"))))
        .filter(col("qrk") === ((col("n") + 1) / lit(2)).cast("long"))
        .select(col("qty").as("med_q"))
      su.crossJoin(broadcast(mom))
        .crossJoin(broadcast(medQ))
        .filter(col("bal_c").cast(dec) * col("n") > col("sb") &&
          col("qty") < col("med_q"))
        .join(broadcast(Tables.nation(s, dir)),
          col("n_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          (sum(col("bal_c")) / 100.0).as("idle_balance"))
        .orderBy("n_name")
    }),


    // Same-weekday reorder habit: consecutive orders landing on the
    // SAME ISO weekday, permille per segment against the ~1/7
    // uniform baseline (143‰) — subscription-like behavior without
    // needing q213's full CV. One customer-keyed lag.
    "q338_weekday_habit" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("dow", (weekday(col("o_orderdate")) + 1))
        .withColumn("prev_dow", lag(col("dow"), 1).over(w))
        .filter(col("prev_dow").isNotNull)
        .join(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("dow") === col("prev_dow"), 1L).otherwise(0L))
            .as("n_same_dow"))
        .select(col("c_mktsegment"), col("n_pairs"),
          expr("n_same_dow * 1000L div n_pairs")
            .as("same_dow_permille"))
        .orderBy("c_mktsegment")
    }),


    // Cross-tier baskets: orders containing BOTH a top-quartile and
    // a bottom-quartile retail-price part — barbell shopping, the
    // assortment-planning signal. Part tiers are exact SQL-ntile
    // quartiles reconstructed from ScaleOps.distributedRank +
    // ntileOfRank (no single-partition ntile window over the
    // catalog); the order flags are two conditional maxima.
    "q339_cross_tier_baskets" -> ((s, dir) => {
      import graft.operators.ScaleOps.{distributedRank, ntileOfRank}
      val rankedP = distributedRank(Tables.part(s, dir)
        .select(col("p_partkey"),
          floor(col("p_retailprice") * 100 + lit(0.5)).cast("long")
            .as("rp_c")),
        Seq(col("rp_c"), col("p_partkey")), "prk")
      val nP = rankedP.agg(count(lit(1)).as("np"))
      val tiers = rankedP.crossJoin(broadcast(nP))
        .select(col("p_partkey"),
          ntileOfRank(col("prk"), col("np"), 4).as("tier"))
      Tables.lineitem(s, dir)
        .join(broadcast(tiers), col("p_partkey") === col("l_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(max(when(col("tier") === 1, 1L).otherwise(0L))
          .as("has_budget"),
          max(when(col("tier") === 4, 1L).otherwise(0L))
            .as("has_premium"),
          count(lit(1)).as("n_lines"))
        .filter(col("n_lines") >= 2L)
        .agg(count(lit(1)).as("n_multiline_orders"),
          sum(when(col("has_budget") === 1L &&
            col("has_premium") === 1L, 1L).otherwise(0L))
            .as("n_cross_tier"))
        .select(col("n_multiline_orders"), col("n_cross_tier"),
          expr("n_cross_tier * 1000L div n_multiline_orders")
            .as("cross_tier_permille"))
    }),


    // Movers & shakers: the 15 parts with the largest absolute
    // quantity swing between the corpus' LAST month and the one
    // before — the demand-shift alert list. The two months derive
    // from the data's own max (reproducible), deltas are exact
    // integers, rank ties to the part key.
    "q340_movers_shakers" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // NOTE (r17, measured): pm feeds both the lastMon 1-row aggregate
      // and the delta branch (the plan scans lineitem+orders twice), but
      // a localCheckpoint(true) here measured SLOWER at BOTH probes —
      // sf0.1 2.33 s vs 2.21 s, 10× 10.70 s vs 9.27 s — because the
      // lastMon copy is a broadcast subtree that overlaps with the main
      // branch inside one job, while the checkpoint serializes the
      // pipeline into materialize-then-consume. Left unmaterialized.
      val pm = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_partkey"),
          date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
      val lastMon = pm.agg(max(col("mon")).as("m1"))
        .select(col("m1"),
          date_format(add_months(to_date(concat(col("m1"),
            lit("-01"))), -1), "yyyy-MM").as("m0"))
      // Top-15 via orderBy().limit(): TakeOrderedAndProject keeps a
      // 15-row heap per partition + one driver merge — no global sort,
      // no single-partition window over the part-grain delta frame.
      // Ranks are assigned afterwards on the 15-row result.
      pm.crossJoin(broadcast(lastMon))
        .filter(col("mon") === col("m1") || col("mon") === col("m0"))
        .groupBy(col("l_partkey"))
        .agg(
          sum(when(col("mon") === col("m0"), col("q")).otherwise(0L))
            .as("q_prior"),
          sum(when(col("mon") === col("m1"), col("q")).otherwise(0L))
            .as("q_last"))
        .select(col("l_partkey"), col("q_prior"), col("q_last"),
          (col("q_last") - col("q_prior")).as("delta"))
        .orderBy(abs(col("delta")).desc, col("l_partkey"))
        .limit(15)
        .withColumn("rank", row_number().over(Window.orderBy(
          abs(col("delta")).desc, col("l_partkey"))).cast("long"))
        .select(col("rank"), col("l_partkey"),
          col("q_prior"), col("q_last"), col("delta"))
        .orderBy("rank")
    }),


    // Regional lead-time comparison by rank-sum: EUROPE vs ASIA ship
    // delays through the q269 Mann-Whitney machinery — is one
    // geography's fulfillment distribution genuinely shifted, not
    // just noisier? Day-granularity delays tie heavily, so ranks are
    // MIDRANKS computed from value-grain cumulative counts (the only
    // window runs over the ~120-value delay domain, never the
    // lineitem-grain rows) and the variance carries the standard tie
    // correction Σ(t³−t)/(n(n−1)) — without it the z here would be
    // inflated by the massive tie groups.
    "q341_region_delay_ranksum" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dec = "decimal(38,0)"
      val vg = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate"),
            col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_regionkey"))),
          col("n_nationkey") === col("c_nationkey"))
        .join(broadcast(Tables.region(s, dir)),
          col("r_regionkey") === col("n_regionkey"))
        .filter(col("r_name").isin("EUROPE", "ASIA"))
        .select(col("r_name").as("grp"),
          datediff(to_date(col("l_shipdate")), col("o_orderdate"))
            .cast("long").as("v"))
        .groupBy(col("v"))
        .agg(count(lit(1)).as("t"),
          sum(when(col("grp") === "ASIA", 1L).otherwise(0L)).as("c1"))
        .withColumn("cum", sum(col("t")).over(
          Window.orderBy(col("v"))))
      vg.agg(
        sum(col("c1")).as("n1"),
        sum(col("t") - col("c1")).as("n2"),
        sum(col("c1").cast(dec) *
          (lit(2) * col("cum") - col("t") + 1).cast(dec))
          .as("r1x2"),
        sum((col("t").cast(dec) * col("t") * col("t") - col("t"))
          .cast(dec)).as("tiesum"))
        .select(col("n1"), col("n2"),
          ((col("r1x2") - col("n1").cast(dec) *
            (col("n1").cast(dec) + 1)).cast("double") / 2.0).as("u1"),
          ((col("n1").cast(dec) * col("n2").cast(dec)).cast("double")
            / 2.0).as("u_null_mean"),
          col("r1x2"), col("tiesum"))
        .select(col("n1"), col("n2"), col("u1"), col("u_null_mean"),
          r4((col("u1") - col("u_null_mean")) /
            sqrt((col("n1").cast(dec) * col("n2").cast(dec))
              .cast("double") / 12.0 *
              ((col("n1") + col("n2") + 1).cast("double") -
                col("tiesum").cast("double") /
                  ((col("n1") + col("n2")).cast("double") *
                    (col("n1") + col("n2") - 1).cast("double")))))
            .as("z"))
    }),


    // Returns seasonality: return permille by calendar month — is
    // the return rate a constant or a season? One joined scan,
    // exact integer shares.
    "q342_returns_by_month" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(month(col("o_orderdate")).cast("long").as("moy"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("n_returns"))
        .select(col("moy"), col("n_lines"),
          expr("n_returns * 1000L div n_lines").as("return_permille"))
        .orderBy("moy")
    }),
  )

  /** DuckDB oracle SQL for every query above (same keys). */
  val oracleSql: Map[String, String] = Map(

    // q300: identical composed KPIs, each in its exact form.
    "q300_health_card" ->
      """SELECT * FROM (
        |  SELECT 'total_revenue_usd' AS metric,
        |         (sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |          / 100.0)::DOUBLE AS value
        |  FROM orders
        |  UNION ALL
        |  SELECT 'n_orders', count(*)::DOUBLE FROM orders
        |  UNION ALL
        |  SELECT 'n_ordering_customers',
        |         count(DISTINCT o_custkey)::DOUBLE FROM orders
        |  UNION ALL
        |  SELECT 'repeat_customer_permille',
        |         (sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) * 1000
        |          // count(*))::DOUBLE
        |  FROM (SELECT count(*) AS n FROM orders GROUP BY o_custkey)
        |  UNION ALL
        |  SELECT 'median_order_value_usd', (v_c / 100.0)::DOUBLE
        |  FROM (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |               AS v_c,
        |               row_number() OVER (ORDER BY
        |                 CAST(floor(o_totalprice * 100 + 0.5)
        |                      AS BIGINT), o_orderkey) AS rk,
        |               count(*) OVER () AS n
        |        FROM orders)
        |  WHERE rk = (n + 1) // 2
        |  UNION ALL
        |  SELECT 'top_nation_rev_permille',
        |         ((max(r)::HUGEINT * 1000 // sum(r)::HUGEINT))::DOUBLE
        |  FROM (SELECT c_nationkey,
        |               sum(CAST(floor(o_totalprice * 100 + 0.5)
        |                        AS BIGINT))::BIGINT AS r
        |        FROM orders JOIN customer ON o_custkey = c_custkey
        |        GROUP BY 1)
        |) ORDER BY metric""".stripMargin,


    // q301: identical exact-moment dispersion index.
    "q301_arrival_dispersion" ->
      """WITH d AS (
        |  SELECT date_part('isodow', o_orderdate)::BIGINT AS isodow,
        |         o_orderdate, count(*)::BIGINT AS c
        |  FROM orders GROUP BY 1, 2),
        |a AS (
        |  SELECT isodow, count(*)::BIGINT AS n_days,
        |         sum(c)::BIGINT AS sc, sum(c * c)::BIGINT AS sc2
        |  FROM d GROUP BY 1)
        |SELECT isodow, n_days, (sc // n_days)::BIGINT
        |         AS mean_daily_orders,
        |       floor((n_days * sc2 - sc * sc)::DOUBLE
        |             / ((n_days - 1) * sc)::DOUBLE * 10000 + 0.5)
        |         / 10000 AS dispersion_index
        |FROM a WHERE n_days >= 2 AND sc > 0
        |ORDER BY isodow""".stripMargin,


    // q302: identical slice counts, fold rankings, exact agreement.
    "q302_topk_stability" ->
      """WITH ps AS (
        |  SELECT token, substr(md5(doc_id::VARCHAR), 1, 1) AS slice,
        |         count(*)::BIGINT AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  WHERE length(token) > 0
        |  GROUP BY 1, 2),
        |t AS (SELECT token, sum(c)::BIGINT AS c_all
        |      FROM ps GROUP BY 1),
        |ft AS (
        |  SELECT token AS full_token
        |  FROM (SELECT token,
        |               row_number() OVER (ORDER BY c_all DESC, token)
        |                 AS rk
        |        FROM t)
        |  WHERE rk <= 10),
        |folds AS (SELECT DISTINCT slice AS drop_slice FROM ps),
        |fm AS (
        |  SELECT f.drop_slice, t.token,
        |         t.c_all - COALESCE(p.c, 0) AS c_minus
        |  FROM t CROSS JOIN folds f
        |  LEFT JOIN ps p
        |    ON p.token = t.token AND p.slice = f.drop_slice),
        |fr AS (
        |  SELECT drop_slice, token,
        |         row_number() OVER (PARTITION BY drop_slice
        |                            ORDER BY c_minus DESC, token)
        |           AS rk
        |  FROM fm)
        |SELECT drop_slice,
        |       sum(CASE WHEN ft.full_token IS NOT NULL THEN 1 ELSE 0
        |           END)::BIGINT AS n_agree,
        |       (sum(CASE WHEN ft.full_token IS NOT NULL THEN 1 ELSE 0
        |            END) * 100 // 10)::BIGINT AS agreement_pct
        |FROM fr LEFT JOIN ft ON fr.token = ft.full_token
        |WHERE fr.rk <= 10
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // q303: identical trailing ROWS window and integer index.
    "q303_trailing_index" ->
      """WITH m AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS mon,
        |         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           ::BIGINT AS rev_c
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT mon, rev_c,
        |         sum(rev_c) OVER (ORDER BY mon
        |                          ROWS BETWEEN 12 PRECEDING
        |                          AND 1 PRECEDING) AS t12_sum,
        |         count(rev_c) OVER (ORDER BY mon
        |                            ROWS BETWEEN 12 PRECEDING
        |                            AND 1 PRECEDING) AS t12_n
        |  FROM m)
        |SELECT mon, (rev_c / 100.0)::DOUBLE AS revenue,
        |       (rev_c::HUGEINT * 12000 // t12_sum::HUGEINT)::BIGINT
        |         AS trailing_index_permille
        |FROM w WHERE t12_n = 12 ORDER BY mon""".stripMargin,


    // q304: identical islands over the token sequence.
    "q304_token_stutter" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |         generate_subscripts(toks, 1) AS pos,
        |         unnest(toks) AS tok
        |  FROM (SELECT source, doc_id,
        |               list_filter(string_split(text, ' '),
        |                           x -> length(x) > 0) AS toks
        |        FROM documents)),
        |b AS (
        |  SELECT source, doc_id, pos,
        |         CASE WHEN tok = lag(tok) OVER w THEN 0 ELSE 1 END
        |           AS brk
        |  FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |g AS (
        |  SELECT source, doc_id,
        |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |                        ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM b),
        |r AS (
        |  SELECT source, doc_id, max(run_len) AS max_run
        |  FROM (SELECT source, doc_id, grp, count(*)::BIGINT AS run_len
        |        FROM g GROUP BY 1, 2, 3)
        |  GROUP BY 1, 2)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |       max(max_run)::BIGINT AS worst_run,
        |       (sum(CASE WHEN max_run >= 3 THEN 1 ELSE 0 END)
        |        * 1000000 // count(*))::BIGINT AS stutter_ppm
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,


    // q305: identical hourly error permille.
    "q305_error_slo" ->
      """SELECT date_part('hour', ts)::BIGINT AS hr,
        |       count(*)::BIGINT AS n_events,
        |       sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |         ::BIGINT AS n_errors,
        |       (sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |        * 1000 // count(*))::BIGINT AS error_permille
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,


    // q306: identical HUGEINT weighted mean.
    "q306_weighted_ship_delay" ->
      """WITH l AS (
        |  SELECT o_orderpriority,
        |         date_diff('day', o_orderdate,
        |                   CAST(l_shipdate AS DATE))::BIGINT AS delay_d,
        |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |           * (100 - CAST(floor(l_discount * 100 + 0.5)
        |                         AS BIGINT)) AS rev_u
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |a AS (
        |  SELECT o_orderpriority, count(*)::BIGINT AS n_lines,
        |         sum(delay_d)::BIGINT AS sd,
        |         sum(delay_d::HUGEINT * rev_u::HUGEINT) AS swd,
        |         sum(rev_u)::HUGEINT AS sw
        |  FROM l GROUP BY 1)
        |SELECT o_orderpriority, n_lines,
        |       (sd // n_lines)::BIGINT AS mean_delay_d,
        |       floor(swd::DOUBLE / sw::DOUBLE * 10000 + 0.5) / 10000
        |         AS weighted_delay_d
        |FROM a ORDER BY o_orderpriority""".stripMargin,


    // q307: identical rank-1 last gap, cross-multiplied bands with
    // the 20% dead band.
    "q307_cadence_acceleration" ->
      """WITH g AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey,
        |         date_diff('day', lag(o_orderdate) OVER w, o_orderdate)
        |           ::BIGINT AS gap_d,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate DESC,
        |                                     o_orderkey DESC) AS rk_desc
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_orderdate, o_orderkey)),
        |p AS (
        |  SELECT o_custkey, count(*)::BIGINT AS n_orders,
        |         min(o_orderdate) AS first_d, max(o_orderdate) AS last_d,
        |         max(CASE WHEN rk_desc = 1 THEN gap_d END) AS last_gap_d
        |  FROM g GROUP BY 1),
        |f AS (
        |  SELECT o_custkey,
        |         date_diff('day', first_d, last_d)::BIGINT AS span_d,
        |         n_orders - 1 AS n_gaps, last_gap_d
        |  FROM p
        |  WHERE n_orders >= 4 AND last_gap_d IS NOT NULL),
        |b AS (
        |  SELECT c_mktsegment,
        |         CASE WHEN last_gap_d * n_gaps * 5 < span_d * 4
        |                THEN 'a_accelerating'
        |              WHEN last_gap_d * n_gaps * 5 > span_d * 6
        |                THEN 'c_decelerating'
        |              ELSE 'b_steady' END AS cadence
        |  FROM f JOIN customer ON o_custkey = c_custkey
        |  WHERE span_d > 0),
        |gg AS (
        |  SELECT c_mktsegment, cadence, count(*)::BIGINT AS n_customers
        |  FROM b GROUP BY 1, 2)
        |SELECT c_mktsegment, cadence, n_customers,
        |       (n_customers * 1000 //
        |        sum(n_customers) OVER (PARTITION BY c_mktsegment))
        |         ::BIGINT AS share_permille
        |FROM gg ORDER BY c_mktsegment, cadence""".stripMargin,


    // q308: identical HUGEINT HHI.
    "q308_brand_hhi" ->
      """WITH tb AS (
        |  SELECT p_type, p_brand, sum(l_quantity::BIGINT)::BIGINT AS q
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  GROUP BY 1, 2),
        |a AS (
        |  SELECT p_type, count(*)::BIGINT AS n_brands,
        |         sum(q)::HUGEINT AS sq,
        |         sum(q::HUGEINT * q::HUGEINT) AS sq2
        |  FROM tb GROUP BY 1)
        |SELECT p_type, n_brands,
        |       (sq2 * 1000000 // (sq * sq))::BIGINT AS hhi_ppm
        |FROM a ORDER BY p_type""".stripMargin,


    // q309: identical integer rate points and band flag.
    "q309_tax_band_audit" ->
      """WITH t AS (
        |  SELECT CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tax_pct,
        |         count(*)::BIGINT AS n_lines
        |  FROM lineitem GROUP BY 1)
        |SELECT tax_pct, n_lines,
        |       (CASE WHEN tax_pct BETWEEN 0 AND 8 THEN 1 ELSE 0 END)
        |         ::BIGINT AS in_band,
        |       (n_lines * 1000 // sum(n_lines) OVER ())::BIGINT
        |         AS share_permille
        |FROM t ORDER BY tax_pct""".stripMargin,


    // q310: identical composed ops KPIs.
    "q310_ops_health_card" ->
      """WITH po AS (
        |  SELECT l_orderkey, last_ship, n_lines, o_orderdate,
        |         date_diff('day', o_orderdate, last_ship)::BIGINT
        |           AS gap_d
        |  FROM (SELECT l_orderkey, max(CAST(l_shipdate AS DATE))
        |               AS last_ship, count(*)::BIGINT AS n_lines
        |        FROM lineitem GROUP BY 1)
        |  JOIN orders ON l_orderkey = o_orderkey)
        |SELECT * FROM (
        |  SELECT 'fulfillment_p90_days' AS metric, gap_d::DOUBLE
        |           AS value
        |  FROM (SELECT gap_d,
        |               row_number() OVER (ORDER BY gap_d, l_orderkey)
        |                 AS rk,
        |               count(*) OVER () AS n
        |        FROM po)
        |  WHERE rk = (n * 9 + 9) // 10
        |  UNION ALL
        |  SELECT 'open_orders_at_cutoff', count(*)::DOUBLE
        |  FROM po WHERE o_orderdate <= DATE '1998-07-01'
        |    AND last_ship > DATE '1998-07-01'
        |  UNION ALL
        |  SELECT 'mean_lines_per_order_permille',
        |         (sum(n_lines) * 1000 // count(*))::DOUBLE
        |  FROM po
        |  UNION ALL
        |  SELECT 'ship_inversion_ppm',
        |         (sum(CASE WHEN sd < prev_sd THEN 1 ELSE 0 END)
        |          * 1000000 // count(*))::DOUBLE
        |  FROM (SELECT CAST(l_shipdate AS DATE) AS sd,
        |               lag(CAST(l_shipdate AS DATE)) OVER w AS prev_sd
        |        FROM lineitem
        |        WINDOW w AS (PARTITION BY l_orderkey
        |                     ORDER BY l_linenumber,
        |                              CAST(l_shipdate AS DATE),
        |                              l_partkey))
        |  WHERE prev_sd IS NOT NULL
        |) ORDER BY metric""".stripMargin,


    // q311: identical complete-year shares and spread.
    "q311_seasonality_stability" ->
      """WITH ym AS (
        |  SELECT date_part('year', o_orderdate)::INT AS yr,
        |         date_part('month', o_orderdate)::INT AS moy,
        |         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           ::BIGINT AS rev_c
        |  FROM orders GROUP BY 1, 2),
        |w AS (
        |  SELECT yr, moy, rev_c,
        |         sum(rev_c) OVER (PARTITION BY yr) AS yr_tot,
        |         count(*) OVER (PARTITION BY yr) AS n_months
        |  FROM ym),
        |s AS (
        |  SELECT yr, moy,
        |         (rev_c::HUGEINT * 1000 // yr_tot::HUGEINT)::BIGINT
        |           AS share_permille
        |  FROM w WHERE n_months = 12)
        |SELECT moy::BIGINT AS month, count(*)::BIGINT AS n_years,
        |       min(share_permille)::BIGINT AS min_share_permille,
        |       max(share_permille)::BIGINT AS max_share_permille,
        |       (max(share_permille) - min(share_permille))::BIGINT
        |         AS spread_permille
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,


    // q312: identical top-supplier permille per nation.
    "q312_nation_supplier_dependence" ->
      """WITH ps AS (
        |  SELECT n_name, l_suppkey,
        |         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |             * (100 - CAST(floor(l_discount * 100 + 0.5)
        |                           AS BIGINT)))::BIGINT AS rev_u
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT n_name, rev_u,
        |         sum(rev_u) OVER (PARTITION BY n_name) AS tot,
        |         count(*) OVER (PARTITION BY n_name) AS n_suppliers,
        |         row_number() OVER (PARTITION BY n_name
        |                            ORDER BY rev_u DESC, l_suppkey)
        |           AS rk
        |  FROM ps)
        |SELECT n_name, n_suppliers::BIGINT AS n_suppliers,
        |       (rev_u::HUGEINT * 1000 // tot::HUGEINT)::BIGINT
        |         AS top_supplier_permille
        |FROM w WHERE rk = 1 ORDER BY n_name""".stripMargin,


    // q313: identical integer quintiles and permille means.
    "q313_positional_profile" ->
      """WITH t AS (
        |  SELECT length(toks)::BIGINT AS n,
        |         generate_subscripts(toks, 1) - 1 AS pos,
        |         unnest(toks) AS tok
        |  FROM (SELECT list_filter(string_split(text, ' '),
        |                           x -> length(x) > 0) AS toks
        |        FROM documents)),
        |q AS (
        |  SELECT ((pos * 5) // n)::BIGINT AS quintile,
        |         length(tok)::BIGINT AS len
        |  FROM t WHERE n >= 5)
        |SELECT quintile, count(*)::BIGINT AS n_tokens,
        |       (sum(len) * 1000 // count(*))::BIGINT
        |         AS mean_len_permille
        |FROM q GROUP BY 1 ORDER BY 1""".stripMargin,


    // q314: identical supplier-nation counts and bands.
    "q314_import_diversity" ->
      """WITH pc AS (
        |  SELECT o_custkey,
        |         count(DISTINCT s_nationkey)::BIGINT AS n_nations
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1),
        |b AS (
        |  SELECT CASE WHEN n_nations = 1 THEN 'a_single'
        |              WHEN n_nations <= 3 THEN 'b_2_3'
        |              WHEN n_nations <= 6 THEN 'c_4_6'
        |              ELSE 'd_7_plus' END AS diversity_band
        |  FROM pc)
        |SELECT diversity_band, count(*)::BIGINT AS n_customers,
        |       (count(*) * 1000 // sum(count(*)) OVER ())::BIGINT
        |         AS share_permille
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,


    // q315: identical last-5-token footers (≥5-token docs).
    "q315_footer_families" ->
      """WITH fp AS (
        |  SELECT source, doc_id,
        |         array_to_string(toks[-5:], ' ') AS footer
        |  FROM (SELECT source, doc_id,
        |               list_filter(string_split(text, ' '),
        |                           t -> length(t) > 0) AS toks
        |        FROM documents)
        |  WHERE length(toks) >= 5),
        |f AS (
        |  SELECT source, footer, count(*)::BIGINT AS sz
        |  FROM fp GROUP BY 1, 2)
        |SELECT source, count(*)::BIGINT AS n_footers,
        |       sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END)::BIGINT
        |         AS n_families,
        |       (sum(CASE WHEN sz > 1 THEN sz ELSE 0 END) * 1000000
        |        // sum(sz))::BIGINT AS family_doc_ppm
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,


    // q316: identical trailing/seasonal forecasts and exact ppm
    // errors.
    "q316_forecast_bakeoff" ->
      """WITH m AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS mon,
        |         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           ::BIGINT AS rev_c
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT mon, rev_c,
        |         sum(rev_c) OVER (ORDER BY mon ROWS BETWEEN 3
        |                          PRECEDING AND 1 PRECEDING) AS t3_sum,
        |         count(rev_c) OVER (ORDER BY mon ROWS BETWEEN 3
        |                            PRECEDING AND 1 PRECEDING) AS t3_n,
        |         lag(rev_c, 12) OVER (ORDER BY mon) AS sn
        |  FROM m),
        |e AS (
        |  SELECT mon,
        |         abs(rev_c - t3_sum // 3) * 1000000 // rev_c AS ape_t3,
        |         abs(rev_c - sn) * 1000000 // rev_c AS ape_sn
        |  FROM w
        |  WHERE t3_n = 3 AND sn IS NOT NULL AND sn > 0 AND rev_c > 0)
        |SELECT count(*)::BIGINT AS n_months,
        |       (sum(ape_t3) // count(*))::BIGINT AS trailing3_mape_ppm,
        |       (sum(ape_sn) // count(*))::BIGINT AS seasonal_mape_ppm,
        |       sum(CASE WHEN ape_t3 < ape_sn THEN 1 ELSE 0 END)
        |         ::BIGINT AS trailing3_wins,
        |       sum(CASE WHEN ape_sn < ape_t3 THEN 1 ELSE 0 END)
        |         ::BIGINT AS seasonal_wins
        |FROM e""".stripMargin,


    // q317: identical both-year filter and growth compare.
    "q317_spend_growth_mix" ->
      """WITH pc AS (
        |  SELECT c_mktsegment, o_custkey,
        |         sum(CASE WHEN date_part('year', o_orderdate) = 1996
        |             THEN CAST(floor(o_totalprice * 100 + 0.5)
        |                       AS BIGINT) ELSE 0 END)::BIGINT AS s96,
        |         sum(CASE WHEN date_part('year', o_orderdate) = 1997
        |             THEN CAST(floor(o_totalprice * 100 + 0.5)
        |                       AS BIGINT) ELSE 0 END)::BIGINT AS s97
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE date_part('year', o_orderdate) IN (1996, 1997)
        |  GROUP BY 1, 2)
        |SELECT c_mktsegment, count(*)::BIGINT AS n_both_years,
        |       sum(CASE WHEN s97 > s96 THEN 1 ELSE 0 END)::BIGINT
        |         AS n_growing,
        |       (sum(CASE WHEN s97 > s96 THEN 1 ELSE 0 END) * 1000
        |        // count(*))::BIGINT AS growing_permille
        |FROM pc WHERE s96 > 0 AND s97 > 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // q318: identical 7-day SLA permille per month.
    "q318_ontime_trend" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS mon,
        |       count(*)::BIGINT AS n_lines,
        |       (sum(CASE WHEN date_diff('day', o_orderdate,
        |                                 CAST(l_shipdate AS DATE)) <= 7
        |                 THEN 1 ELSE 0 END) * 1000 // count(*))::BIGINT
        |         AS ontime_permille
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // q319: identical tie-broken ranks, exact closed form.
    "q319_name_demand_spearman" ->
      """WITH per AS (
        |  SELECT l_partkey, sum(l_quantity::BIGINT)::BIGINT AS qty,
        |         length(p_name)::BIGINT AS name_len
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 3),
        |r AS (
        |  SELECT row_number() OVER (ORDER BY name_len, l_partkey)
        |           AS r1,
        |         row_number() OVER (ORDER BY qty, l_partkey) AS r2
        |  FROM per),
        |a AS (
        |  SELECT count(*)::HUGEINT AS n,
        |         sum(((r1 - r2) * (r1 - r2))::HUGEINT) AS sd2
        |  FROM r)
        |SELECT n::BIGINT AS n_parts,
        |       floor((1.0 - (sd2 * 6)::DOUBLE / (n * n * n - n)::DOUBLE)
        |             * 10000 + 0.5) / 10000 AS spearman_rho
        |FROM a""".stripMargin,


    // q320: identical sessionizer, session sets, union identity.
    "q320_session_type_affinity" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
        |                   <= 1800000000 THEN 0 ELSE 1 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |st AS (
        |  SELECT DISTINCT
        |         user_id || '#' || sum(brk) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
        |           AS sid,
        |         event_type
        |  FROM e),
        |sz AS (
        |  SELECT event_type, count(*)::BIGINT AS ns
        |  FROM st GROUP BY 1),
        |i AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |         count(*)::BIGINT AS n_both
        |  FROM st a JOIN st b
        |    ON a.sid = b.sid AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, n_both,
        |       floor(n_both::DOUBLE
        |             / (sa.ns + sb.ns - n_both)::DOUBLE * 10000 + 0.5)
        |         / 10000 AS session_jaccard
        |FROM i
        |JOIN sz sa ON sa.event_type = type_a
        |JOIN sz sb ON sb.event_type = type_b
        |ORDER BY type_a, type_b""".stripMargin,


    // q321: identical discount points and return permille.
    "q321_returns_by_discount" ->
      """SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
        |         AS discount_pct,
        |       count(*)::BIGINT AS n_lines,
        |       (sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |        * 1000 // count(*))::BIGINT AS return_permille
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,


    // q322: identical integrality predicate.
    "q322_quantity_integrality" ->
      """SELECT l_linestatus, count(*)::BIGINT AS n_lines,
        |       sum(CASE WHEN l_quantity <> floor(l_quantity)
        |                THEN 1 ELSE 0 END)::BIGINT AS n_fractional
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,


    // q323: identical Laspeyres split with the integer-div unit
    // value convention.
    "q323_growth_decomposition" ->
      """WITH b AS (
        |  SELECT r_name, l_partkey,
        |         sum(CASE WHEN date_part('year', o_orderdate) = 1996
        |             THEN l_quantity::BIGINT ELSE 0 END)::BIGINT AS q96,
        |         sum(CASE WHEN date_part('year', o_orderdate) = 1997
        |             THEN l_quantity::BIGINT ELSE 0 END)::BIGINT AS q97,
        |         sum(CASE WHEN date_part('year', o_orderdate) = 1996
        |             THEN CAST(floor(l_extendedprice * 100 + 0.5)
        |                       AS BIGINT) ELSE 0 END)::BIGINT AS r96,
        |         sum(CASE WHEN date_part('year', o_orderdate) = 1997
        |             THEN CAST(floor(l_extendedprice * 100 + 0.5)
        |                       AS BIGINT) ELSE 0 END)::BIGINT AS r97
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON n_nationkey = c_nationkey
        |  JOIN region ON r_regionkey = n_regionkey
        |  WHERE date_part('year', o_orderdate) IN (1996, 1997)
        |  GROUP BY 1, 2),
        |v AS (
        |  SELECT r_name, r96, r97,
        |         CASE WHEN q96 > 0
        |              THEN (q97 - q96) * (r96 // q96) ELSE 0 END
        |           AS vol_effect_c
        |  FROM b)
        |SELECT r_name, (sum(r96) / 100.0)::DOUBLE AS rev_1996,
        |       (sum(r97) / 100.0)::DOUBLE AS rev_1997,
        |       (sum(vol_effect_c) / 100.0)::DOUBLE AS volume_effect,
        |       (sum(r97 - r96 - vol_effect_c) / 100.0)::DOUBLE
        |         AS price_mix_effect
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,


    // q324: identical ceil thresholds and HUGEINT ppm shares.
    "q324_user_value_concentration" ->
      """WITH pu AS (
        |  SELECT user_id,
        |         sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::BIGINT
        |           AS v_c
        |  FROM events GROUP BY 1),
        |r AS (
        |  SELECT v_c,
        |         row_number() OVER (ORDER BY v_c DESC, user_id) AS rk,
        |         count(*) OVER () AS n, sum(v_c) OVER () AS tot
        |  FROM pu),
        |e AS (
        |  SELECT r.*, p.pct_permille
        |  FROM r CROSS JOIN (VALUES (10), (100)) AS p(pct_permille))
        |SELECT pct_permille, count(*)::BIGINT AS n_users,
        |       (sum(v_c)::HUGEINT * 1000000 // max(tot)::HUGEINT)
        |         ::BIGINT AS share_ppm
        |FROM e WHERE rk <= (n * pct_permille + 999) // 1000
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // q325: identical cent totals and signed gap.
    "q325_realized_vs_catalog" ->
      """WITH b AS (
        |  SELECT p_brand, count(*)::BIGINT AS n_lines,
        |         sum(CAST(floor(l_extendedprice * 100 + 0.5)
        |                  AS BIGINT))::BIGINT AS real_c,
        |         sum(l_quantity::BIGINT
        |             * CAST(floor(p_retailprice * 100 + 0.5)
        |                    AS BIGINT))::BIGINT AS catalog_c
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  GROUP BY 1)
        |SELECT p_brand, n_lines,
        |       (real_c / 100.0)::DOUBLE AS realized_value,
        |       (catalog_c / 100.0)::DOUBLE AS catalog_value,
        |       ((real_c::HUGEINT - catalog_c::HUGEINT) * 1000000
        |        // catalog_c::HUGEINT)::BIGINT AS gap_ppm
        |FROM b WHERE catalog_c > 0 ORDER BY p_brand""".stripMargin,


    // q326: identical floor quotas, largest-remainder top-up.
    "q326_hamilton_allocation" ->
      """WITH c AS (
        |  SELECT n_name, count(*)::BIGINT AS n_orders
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON n_nationkey = c_nationkey
        |  GROUP BY 1),
        |t AS (
        |  SELECT c.*, sum(n_orders) OVER () AS tot FROM c),
        |q AS (
        |  SELECT n_name, n_orders,
        |         (n_orders * 10000 // tot)::BIGINT AS base,
        |         (n_orders * 10000 % tot)::BIGINT AS rem
        |  FROM t),
        |l AS (
        |  SELECT q.*, 10000 - sum(base) OVER () AS leftover,
        |         row_number() OVER (ORDER BY rem DESC, n_name) AS rrk
        |  FROM q)
        |SELECT n_name, n_orders,
        |       (base + CASE WHEN rrk <= leftover THEN 1 ELSE 0 END)
        |         ::BIGINT AS quota
        |FROM l ORDER BY n_name""".stripMargin,


    // q327: identical fixed thresholds and conditional sums.
    "q327_value_cdf_ladder" ->
      """WITH v AS (
        |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v_c
        |  FROM orders),
        |e AS (
        |  SELECT v_c, t.threshold_c
        |  FROM v CROSS JOIN (VALUES (10000000), (20000000),
        |                            (30000000)) AS t(threshold_c)),
        |g AS (
        |  SELECT threshold_c, count(*)::BIGINT AS n_total,
        |         sum(CASE WHEN v_c < threshold_c THEN 1 ELSE 0 END)
        |           ::BIGINT AS n_under,
        |         sum(v_c)::BIGINT AS tot_c,
        |         sum(CASE WHEN v_c < threshold_c THEN v_c ELSE 0 END)
        |           ::BIGINT AS under_c
        |  FROM e GROUP BY 1)
        |SELECT (threshold_c / 100.0)::DOUBLE AS threshold,
        |       (n_under * 1000 // n_total)::BIGINT
        |         AS order_share_permille,
        |       (under_c::HUGEINT * 1000 // tot_c::HUGEINT)::BIGINT
        |         AS revenue_share_permille
        |FROM g ORDER BY threshold""".stripMargin,


    // q328: identical multi-line filter and consolidation share.
    "q328_sameday_fulfillment" ->
      """WITH po AS (
        |  SELECT l_orderkey, count(*)::BIGINT AS n_lines,
        |         count(DISTINCT CAST(l_shipdate AS DATE))::BIGINT
        |           AS n_ship_days
        |  FROM lineitem GROUP BY 1),
        |j AS (
        |  SELECT o_orderpriority, n_ship_days
        |  FROM po JOIN orders ON l_orderkey = o_orderkey
        |  WHERE n_lines >= 2)
        |SELECT o_orderpriority, count(*)::BIGINT AS n_multiline_orders,
        |       (sum(CASE WHEN n_ship_days = 1 THEN 1 ELSE 0 END)
        |        * 1000 // count(*))::BIGINT AS consolidated_permille
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,


    // q329: identical first-week µs window and integer intensity.
    "q329_novelty_effect" ->
      """WITH f AS (
        |  SELECT user_id, min(epoch_us(ts)) AS first_us
        |  FROM events GROUP BY 1),
        |b AS (
        |  SELECT CASE WHEN epoch_us(e.ts) - f.first_us < 604800000000
        |              THEN 'a_first_week' ELSE 'b_later' END
        |           AS age_band,
        |         CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS v_c
        |  FROM events e JOIN f ON e.user_id = f.user_id)
        |SELECT age_band, count(*)::BIGINT AS n_events,
        |       (sum(v_c) // count(*))::BIGINT AS cents_per_event
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,


    // q330: identical audited forms composed to (metric, value).
    "q330_quality_scorecard" ->
      """SELECT * FROM (
        |  SELECT 'fk_orphan_rows' AS metric,
        |         (SELECT count(*) FROM lineitem l
        |          WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                            WHERE o.o_orderkey = l.l_orderkey))
        |           ::BIGINT AS value
        |  UNION ALL
        |  SELECT 'fractional_quantities',
        |         sum(CASE WHEN l_quantity <> floor(l_quantity)
        |                  THEN 1 ELSE 0 END)::BIGINT
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'status_mismatch_orders',
        |         sum(CASE WHEN o_orderstatus <> derived THEN 1 ELSE 0
        |             END)::BIGINT
        |  FROM orders JOIN (
        |    SELECT l_orderkey,
        |           CASE WHEN min(l_linestatus) = 'F'
        |                     AND max(l_linestatus) = 'F' THEN 'F'
        |                WHEN min(l_linestatus) = 'O'
        |                     AND max(l_linestatus) = 'O' THEN 'O'
        |                ELSE 'P' END AS derived
        |    FROM lineitem GROUP BY 1) d ON o_orderkey = l_orderkey
        |  UNION ALL
        |  SELECT 'tax_out_of_band_lines',
        |         sum(CASE WHEN CAST(floor(l_tax * 100 + 0.5) AS BIGINT)
        |                       > 8 THEN 1 ELSE 0 END)::BIGINT
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'dup_linenumber_orders',
        |         sum(CASE WHEN nd <> n THEN 1 ELSE 0 END)::BIGINT
        |  FROM (SELECT count(*) AS n,
        |               count(DISTINCT l_linenumber) AS nd
        |        FROM lineitem GROUP BY l_orderkey)
        |) ORDER BY metric""".stripMargin,


    // q331: identical recomputed-length drift bands.
    "q331_metadata_accuracy" ->
      """WITH d AS (
        |  SELECT source,
        |         n_chars::BIGINT - length(text)::BIGINT AS delta
        |  FROM documents)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |       sum(CASE WHEN delta = 0 THEN 1 ELSE 0 END)::BIGINT
        |         AS n_exact,
        |       sum(CASE WHEN abs(delta) > 0 AND abs(delta) <= 5
        |                THEN 1 ELSE 0 END)::BIGINT AS n_near,
        |       sum(CASE WHEN abs(delta) > 5 THEN 1 ELSE 0 END)::BIGINT
        |         AS n_wrong,
        |       max(abs(delta))::BIGINT AS max_abs_delta
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,


    // q332: identical duplicate classes.
    "q332_event_dedup_audit" ->
      """SELECT * FROM (
        |  SELECT 'duplicate_event_id_rows' AS metric,
        |         COALESCE(sum(CASE WHEN c > 1 THEN c ELSE 0 END), 0)
        |           ::BIGINT AS value
        |  FROM (SELECT count(*) AS c FROM events GROUP BY event_id)
        |  UNION ALL
        |  SELECT 'retry_duplicate_rows',
        |         COALESCE(sum(CASE WHEN c > 1 AND nid > 1
        |                      THEN c - 1 ELSE 0 END), 0)::BIGINT
        |  FROM (SELECT count(*) AS c,
        |               count(DISTINCT event_id) AS nid
        |        FROM events GROUP BY user_id, ts, event_type, value)
        |) ORDER BY metric""".stripMargin,


    // q333: identical negative-gap counts.
    "q333_time_travel_audit" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS n_lines,
        |       sum(CASE WHEN date_diff('day', o_orderdate,
        |                                CAST(l_shipdate AS DATE)) < 0
        |                THEN 1 ELSE 0 END)::BIGINT AS n_violations,
        |       min(date_diff('day', o_orderdate,
        |                     CAST(l_shipdate AS DATE)))::BIGINT
        |         AS worst_gap_d
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // q334: identical tenure bands and integer means.
    "q334_tenure_order_size" ->
      """WITH f AS (
        |  SELECT o_custkey, o_orderdate, o_totalprice,
        |         min(o_orderdate) OVER (PARTITION BY o_custkey)
        |           AS first_d
        |  FROM orders),
        |b AS (
        |  SELECT CASE WHEN date_diff('day', first_d, o_orderdate) = 0
        |                THEN 'a_first'
        |              WHEN date_diff('day', first_d, o_orderdate)
        |                   <= 365 THEN 'b_year1'
        |              WHEN date_diff('day', first_d, o_orderdate)
        |                   <= 1095 THEN 'c_year2_3'
        |              ELSE 'd_veteran' END AS tenure_band,
        |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v_c
        |  FROM f)
        |SELECT tenure_band, count(*)::BIGINT AS n_orders,
        |       (sum(v_c) // count(*))::BIGINT AS mean_order_cents
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,


    // q335: identical argmax month with earliest tie-break.
    "q335_peak_month_distribution" ->
      """WITH pm AS (
        |  SELECT l_partkey,
        |         date_part('month', o_orderdate)::BIGINT AS moy,
        |         sum(l_quantity::BIGINT)::BIGINT AS q
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT l_partkey, moy,
        |         row_number() OVER (PARTITION BY l_partkey
        |                            ORDER BY q DESC, moy) AS rk
        |  FROM pm),
        |g AS (
        |  SELECT moy AS peak_month, count(*)::BIGINT AS n_parts
        |  FROM r WHERE rk = 1 GROUP BY 1)
        |SELECT peak_month, n_parts,
        |       (n_parts * 1000 // sum(n_parts) OVER ())::BIGINT
        |         AS share_permille
        |FROM g ORDER BY peak_month""".stripMargin,


    // q336: identical crosstab permilles.
    "q336_segment_priority_mix" ->
      """WITH g AS (
        |  SELECT c_mktsegment, o_orderpriority,
        |         count(*)::BIGINT AS n_orders
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2)
        |SELECT c_mktsegment, o_orderpriority, n_orders,
        |       (n_orders * 1000 //
        |        sum(n_orders) OVER (PARTITION BY c_mktsegment))::BIGINT
        |         AS share_permille
        |FROM g ORDER BY c_mktsegment, o_orderpriority""".stripMargin,


    // q337: identical cross-multiplied threshold and volume median.
    "q337_dormant_rich_suppliers" ->
      """WITH v AS (
        |  SELECT l_suppkey, sum(l_quantity::BIGINT)::BIGINT AS qty
        |  FROM lineitem GROUP BY 1),
        |su AS (
        |  SELECT s_suppkey, s_name, s_nationkey,
        |         CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS bal_c,
        |         COALESCE(qty, 0) AS qty
        |  FROM supplier LEFT JOIN v ON s_suppkey = l_suppkey),
        |m AS (
        |  SELECT sum(bal_c)::HUGEINT AS sb, count(*)::BIGINT AS n
        |  FROM su),
        |r AS (
        |  SELECT su.*, m.sb, m.n,
        |         row_number() OVER (ORDER BY qty, s_suppkey) AS qrk
        |  FROM su CROSS JOIN m),
        |w AS (
        |  SELECT r.*, min(CASE WHEN qrk = (n + 1) // 2 THEN qty END)
        |           OVER () AS med_q
        |  FROM r)
        |SELECT n_name, count(*)::BIGINT AS n_suppliers,
        |       (sum(bal_c) / 100.0)::DOUBLE AS idle_balance
        |FROM w JOIN nation ON n_nationkey = s_nationkey
        |WHERE bal_c::HUGEINT * n > sb AND qty < med_q
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // q338: identical consecutive-weekday compare.
    "q338_weekday_habit" ->
      """WITH g AS (
        |  SELECT o_custkey,
        |         date_part('isodow', o_orderdate)::BIGINT AS dow,
        |         lag(date_part('isodow', o_orderdate)::BIGINT)
        |           OVER (PARTITION BY o_custkey
        |                 ORDER BY o_orderdate, o_orderkey) AS prev_dow
        |  FROM orders)
        |SELECT c_mktsegment, count(*)::BIGINT AS n_pairs,
        |       (sum(CASE WHEN dow = prev_dow THEN 1 ELSE 0 END)
        |        * 1000 // count(*))::BIGINT AS same_dow_permille
        |FROM g JOIN customer ON o_custkey = c_custkey
        |WHERE prev_dow IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // q339: identical catalog quartiles and barbell flags.
    "q339_cross_tier_baskets" ->
      """WITH t AS (
        |  SELECT p_partkey,
        |         ntile(4) OVER (ORDER BY
        |           CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT),
        |           p_partkey) AS tier
        |  FROM part),
        |o AS (
        |  SELECT l_orderkey,
        |         max(CASE WHEN tier = 1 THEN 1 ELSE 0 END) AS has_budget,
        |         max(CASE WHEN tier = 4 THEN 1 ELSE 0 END)
        |           AS has_premium,
        |         count(*)::BIGINT AS n_lines
        |  FROM lineitem JOIN t ON p_partkey = l_partkey
        |  GROUP BY 1)
        |SELECT count(*)::BIGINT AS n_multiline_orders,
        |       sum(CASE WHEN has_budget = 1 AND has_premium = 1
        |                THEN 1 ELSE 0 END)::BIGINT AS n_cross_tier,
        |       (sum(CASE WHEN has_budget = 1 AND has_premium = 1
        |                 THEN 1 ELSE 0 END) * 1000 // count(*))::BIGINT
        |         AS cross_tier_permille
        |FROM o WHERE n_lines >= 2""".stripMargin,


    // q340: identical data-derived last two months and swing rank.
    "q340_movers_shakers" ->
      """WITH pm AS (
        |  SELECT l_partkey, strftime(o_orderdate, '%Y-%m') AS mon,
        |         sum(l_quantity::BIGINT)::BIGINT AS q
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |lm AS (
        |  SELECT max(mon) AS m1,
        |         strftime(CAST(max(mon) || '-01' AS DATE)
        |                  - INTERVAL 1 MONTH, '%Y-%m') AS m0
        |  FROM pm),
        |d AS (
        |  SELECT l_partkey,
        |         sum(CASE WHEN mon = m0 THEN q ELSE 0 END)::BIGINT
        |           AS q_prior,
        |         sum(CASE WHEN mon = m1 THEN q ELSE 0 END)::BIGINT
        |           AS q_last
        |  FROM pm CROSS JOIN lm
        |  WHERE mon = m1 OR mon = m0
        |  GROUP BY 1),
        |r AS (
        |  SELECT l_partkey, q_prior, q_last,
        |         q_last - q_prior AS delta,
        |         row_number() OVER (ORDER BY abs(q_last - q_prior)
        |                            DESC, l_partkey) AS rk
        |  FROM d)
        |SELECT rk::BIGINT AS rank, l_partkey, q_prior, q_last,
        |       delta::BIGINT AS delta
        |FROM r WHERE rk <= 15 ORDER BY rank""".stripMargin,


    // q341: identical value-grain midranks and tie-corrected variance.
    "q341_region_delay_ranksum" ->
      """WITH b AS (
        |  SELECT r_name AS grp,
        |         date_diff('day', o_orderdate,
        |                   CAST(l_shipdate AS DATE))::BIGINT AS v
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON n_nationkey = c_nationkey
        |  JOIN region ON r_regionkey = n_regionkey
        |  WHERE r_name IN ('EUROPE', 'ASIA')),
        |vg AS (
        |  SELECT v, count(*)::BIGINT AS t,
        |         sum(CASE WHEN grp = 'ASIA' THEN 1 ELSE 0 END)
        |           ::BIGINT AS c1
        |  FROM b GROUP BY 1),
        |cw AS (
        |  SELECT v, t, c1,
        |         sum(t) OVER (ORDER BY v)::BIGINT AS cum
        |  FROM vg),
        |a AS (
        |  SELECT sum(c1)::HUGEINT AS n1,
        |         sum(t - c1)::HUGEINT AS n2,
        |         sum(c1::HUGEINT * (2 * cum - t + 1)::HUGEINT)
        |           ::HUGEINT AS r1x2,
        |         sum(t::HUGEINT * t * t - t)::HUGEINT AS tiesum
        |  FROM cw)
        |SELECT n1::BIGINT AS n1, n2::BIGINT AS n2,
        |       (r1x2 - n1 * (n1 + 1))::DOUBLE / 2.0 AS u1,
        |       (n1 * n2)::DOUBLE / 2.0 AS u_null_mean,
        |       floor(((r1x2 - n1 * (n1 + 1))::DOUBLE / 2.0
        |              - (n1 * n2)::DOUBLE / 2.0)
        |             / sqrt((n1 * n2)::DOUBLE / 12.0
        |                    * ((n1 + n2 + 1)::DOUBLE
        |                       - tiesum::DOUBLE
        |                         / ((n1 + n2)::DOUBLE
        |                            * (n1 + n2 - 1)::DOUBLE)))
        |             * 10000 + 0.5) / 10000 AS z
        |FROM a""".stripMargin,


    // q342: identical monthly return shares.
    "q342_returns_by_month" ->
      """SELECT date_part('month', o_orderdate)::BIGINT AS moy,
        |       count(*)::BIGINT AS n_lines,
        |       (sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |        * 1000 // count(*))::BIGINT AS return_permille
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
