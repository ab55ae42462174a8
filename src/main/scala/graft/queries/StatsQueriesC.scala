package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{AsOfJoin, Dedup, EntityResolution, GraphOps, Multimodal, PriceAlerts, Relational, Similarity, Sketches, TextAnalysis, TimeSeries}
import graft.QueryHelpers._

/** Inline analytics, q230-q264: conformance-tier statistics over the TPC-H schema.
  *
  * Registry split out of SparkEntry (round 9): the maps below are
  * merged back into `SparkEntry.queries` / `SparkEntry.oracleSql`,
  * so names, semantics, and the DuckDB-oracle pairing are unchanged.
  */
object StatsQueriesC {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Order-fulfillment latency buckets by priority: days from order
    // date to the LAST line shipment (order completion), banded
    // 0-7 / 8-30 / 31-60 / 61+, with each band's permille share
    // within its priority. One per-order max + one rollup; the band
    // is pure integer comparison.
    "q230_fulfillment_latency" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val perOrder = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate")).as("last_ship"))
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(to_date(col("last_ship")), col("o_orderdate"))
            .cast("long").as("gap_d"))
      perOrder
        .select(col("o_orderpriority"),
          when(col("gap_d") <= 7L, "a_0_7")
            .when(col("gap_d") <= 30L, "b_8_30")
            .when(col("gap_d") <= 60L, "c_31_60")
            .otherwise("d_61_plus").as("band"))
        .groupBy(col("o_orderpriority"), col("band"))
        .agg(count(lit(1)).as("n_orders"))
        .withColumn("share_permille", expr("n_orders * 1000L div " +
          "sum(n_orders) over (partition by o_orderpriority)"))
        .orderBy("o_orderpriority", "band")
    }),


    // Pricing-chaos leaderboard: the 50 parts with the widest
    // quartile coefficient of dispersion (Q3−Q1)/(Q3+Q1) of unit
    // price. Unit price is an exact integer (1e-4-dollar floor-div
    // by quantity); quartiles are nearest-rank picks off ONE
    // part-keyed window (no per-part arrays, so a part's line count
    // can grow with the corpus without blowing memory); the ranking
    // runs over the |parts| aggregate.
    "q231_price_dispersion" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val unit = Tables.lineitem(s, dir)
        .select(col("l_partkey"),
          expr("(cast(floor(l_extendedprice * 100 + 0.5) as bigint)" +
            " * 100) div cast(l_quantity as bigint)").as("u"))
      val w = Window.partitionBy(col("l_partkey"))
      val ranked = unit
        .withColumn("rk", row_number().over(w.orderBy(col("u"))))
        .withColumn("n", count(lit(1)).over(w))
      val quart = ranked
        .groupBy(col("l_partkey"), col("n"))
        .agg(
          min(when(col("rk") === ((col("n") + 3) / lit(4)).cast("long")
            .cast("int"), col("u"))).as("q1_u"),
          min(when(col("rk") === ((col("n") * 3 + 3) / lit(4)).cast("long")
            .cast("int"), col("u"))).as("q3_u"))
        .filter(col("n") >= 8L && (col("q1_u") + col("q3_u")) > 0L)
        .select(col("l_partkey"), col("n").as("n_lines"),
          (col("q1_u") / 10000.0).as("q1_price"),
          (col("q3_u") / 10000.0).as("q3_price"),
          r4((col("q3_u") - col("q1_u")).cast("double") /
            (col("q3_u") + col("q1_u")).cast("double")).as("qcd"))
      quart
        .orderBy(col("qcd").desc, col("l_partkey"))
        .limit(50)
    }),


    // Revenue-concentration ladder: the share of total revenue held
    // by the top 1% / 5% / 10% of customers (ppm integers) — the
    // whale-dependence readout that complements q179's Gini.
    // Thresholds are exact ceil-index integers; ranks come from
    // ScaleOps.distributedRank (range shuffle + partition offsets —
    // q324's exemplar wiring), and the n/tot scalars from ONE
    // broadcast 1-row aggregate, so no single-partition window ever
    // holds the |customers| frame.
    "q232_revenue_concentration" -> ((s, dir) => {
      val perCust = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5))
          .cast("long")).as("rev_c"))
      val rankedR = graft.operators.ScaleOps.distributedRank(perCust,
        Seq(col("rev_c").desc, col("o_custkey")), "rk")
      // totals read the ranked frame: its shuffle files are already
      // materialized, so the 1-row aggregate rides stage reuse
      val totals = rankedR
        .agg(count(lit(1)).as("n"), sum(col("rev_c")).as("tot"))
      val ranked = rankedR.crossJoin(broadcast(totals))
      ranked
        .select(col("rk"), col("n"), col("tot"), col("rev_c"),
          explode(array(lit(10), lit(50), lit(100))).as("pct_permille"))
        .filter(col("rk") <=
          ((col("n") * col("pct_permille") + 999) / lit(1000))
            .cast("long"))
        .groupBy(col("pct_permille"))
        .agg(count(lit(1)).as("n_customers"),
          // decimal(38,0): cents × 1e6 would wrap a long at extreme SF
          expr("cast(sum(rev_c) as decimal(38,0)) * 1000000" +
            " div cast(max(tot) as decimal(38,0))").as("share_ppm"))
        .orderBy("pct_permille")
    }),


    // Year-over-year growth by calendar month: each (year, month)
    // revenue against the same month a year earlier — the
    // seasonality-adjusted growth view. One orders scan, one
    // month-partitioned lag window, growth as exact ppm integers.
    "q233_yoy_growth" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"))
        .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5))
          .cast("long")).as("rev_c"))
        .withColumn("prev_c", lag(col("rev_c"), 1).over(
          Window.partitionBy(col("mo")).orderBy(col("yr"))))
        .filter(col("prev_c").isNotNull && col("prev_c") > 0L)
        .select(col("yr").cast("long").as("yr"),
          col("mo").cast("long").as("mo"),
          (col("rev_c") / 100.0).as("revenue"),
          (col("prev_c") / 100.0).as("prev_revenue"),
          expr("cast(rev_c - prev_c as decimal(38,0)) * 1000000" +
            " div cast(prev_c as decimal(38,0))").as("growth_ppm"))
        .orderBy("yr", "mo")
    }),


    // Supplier-consistency leaderboard: the 10 steadiest suppliers by
    // coefficient of variation of order→ship lag (exact integer
    // day-gaps, variance from the n·Σg²−(Σg)² identity, one IEEE
    // sqrt + division at the end; n ≥ 20 so the CV is meaningful).
    // Rank-based top-N over the |suppliers| aggregate — never
    // vacuous, never a fact-row sort.
    "q234_supplier_consistency" -> ((s, dir) => {
      val gaps = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey"),
          datediff(to_date(col("l_shipdate")), col("o_orderdate"))
            .cast("long").as("g"))
      gaps.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n"), sum(col("g")).as("sg"),
          sum(col("g") * col("g")).as("sg2"))
        .filter(col("n") >= 20L && col("sg") > 0L)
        .join(broadcast(Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_name"))),
          col("s_suppkey") === col("l_suppkey"))
        .select(col("s_name"), col("n").as("n_shipments"),
          r4(col("sg").cast("double") / col("n").cast("double"))
            .as("mean_lag_d"),
          r4(sqrt((col("n") * col("sg2") - col("sg") * col("sg"))
            .cast("double")) / col("sg").cast("double")).as("cv"))
        .orderBy(col("cv").asc, col("s_name").asc)
        .limit(10)
    }),


    // Spearman rank correlation between document length and token
    // count, per language. row_number ranks with a doc_id tie-break
    // make both rankings permutation-free, so the classic
    // 1 − 6Σd²/(n(n²−1)) closed form is EXACT integers until the one
    // final division (Σd² and n³ ride decimal(38,0) — n³ wraps a
    // long near n=2M). Both rankings ride ScaleOps.groupedRank (the
    // q319 two-rank shape, grouped): the pre-r11 lang-partitioned
    // windows sorted each language's WHOLE doc frame in one task —
    // a handful of schema-bounded partitions over entity-grain rows.
    "q235_spearman_len_tokens" -> ((s, dir) => {
      import graft.operators.ScaleOps.groupedRank
      val dec = "decimal(38,0)"
      val base = Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"),
          col("n_chars").cast("long").as("len"),
          expr("cast(size(filter(split(text, ' '), " +
            "t -> length(t) > 0)) as bigint)").as("ntok"))
        // chained-rank seam: the first rank pass executes its input
        // twice (range sampling + shuffle map) — checkpoint so the
        // tokenizing documents scan runs once, not twice
        .localCheckpoint(true)
      val ranked = groupedRank(
        groupedRank(base, Seq("lang"),
          Seq(col("len").asc, col("doc_id").asc), rankCol = "r1")
          .drop("n_grp"),
        Seq("lang"), Seq(col("ntok").asc, col("doc_id").asc),
        rankCol = "r2").drop("n_grp")
      ranked.groupBy(col("lang"))
        .agg(count(lit(1)).cast(dec).as("n"),
          sum(((col("r1") - col("r2")) * (col("r1") - col("r2")))
            .cast(dec)).as("sd2"))
        .filter(col("n") >= 3)
        .select(col("lang"), col("n").cast("long").as("n_docs"),
          r4(lit(1.0) - (col("sd2") * 6).cast("double") /
            (col("n") * col("n") * col("n") - col("n")).cast("double"))
            .as("spearman_rho"))
        .orderBy("lang")
    }),


    // Keyword-in-context corpus stats: for a fixed keyword list, how
    // many documents mention it, the ppm document share, and the
    // mean 1-based first position — the "where does the corpus talk
    // about X" readout. ONE documents scan (keywords explode
    // per-row); positions are exact integers, the mean is one
    // division.
    "q236_keyword_contexts" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("text"),
          explode(array(lit("spark"), lit("vector"), lit("merge")))
            .as("keyword"))
        .select(col("keyword"),
          expr("cast(position(keyword, text) as bigint)").as("pos"))
        .groupBy(col("keyword"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("pos") > 0L, 1L).otherwise(0L)).as("n_docs"),
          sum(when(col("pos") > 0L, col("pos")).otherwise(0L))
            .as("sum_pos"))
        .select(col("keyword"), col("n_docs"),
          expr("n_docs * 1000000L div n_total").as("share_ppm"),
          r4(col("sum_pos").cast("double") / col("n_docs").cast("double"))
            .as("mean_first_pos"))
        .orderBy("keyword")
    }),


    // Session-depth conversion: sessionize clickstreams with a
    // 30-minute inactivity gap (cumulative break counter — the
    // gaps-and-islands idiom, one user-keyed exchange), band
    // sessions by event depth, report each band's purchase
    // conversion in exact permille. The depth→conversion curve is
    // the standard engagement diagnostic.
    "q237_session_depth_conversion" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val sess = Tables.events(s, dir)
        .withColumn("brk",
          when(unix_micros(col("ts")) -
            unix_micros(lag(col("ts"), 1).over(w)) <= 1800000000L, 0L)
            .otherwise(1L))
        .withColumn("sess_id", sum(col("brk")).over(w))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("depth"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("converted"))
      sess
        .select(
          when(col("depth") === 1L, "a_1")
            .when(col("depth") === 2L, "b_2")
            .when(col("depth") <= 5L, "c_3_5")
            .when(col("depth") <= 10L, "d_6_10")
            .otherwise("e_11_plus").as("depth_band"),
          col("converted"))
        .groupBy(col("depth_band"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("converted")).as("n_converting"))
        .select(col("depth_band"), col("n_sessions"), col("n_converting"),
          expr("n_converting * 1000L div n_sessions").as("conv_permille"))
        .orderBy("depth_band")
    }),


    // Order-total reconciliation: the stated o_totalprice against
    // the total recomputed from line items (ext·(1−disc)·(1+tax)),
    // both in exact 1e-6-dollar integers — the cross-table
    // conformance audit. Deviations band into exact / <1% / ≥1%;
    // the worst deviation is reported per band in HUGEINT-safe ppm.
    "q238_order_reconciliation" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val comp = Tables.lineitem(s, dir)
        .select(col("l_orderkey"),
          (floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long") *
            (lit(100L) - floor(col("l_discount") * 100 + lit(0.5))
              .cast("long")) *
            (lit(100L) + floor(col("l_tax") * 100 + lit(0.5))
              .cast("long"))).as("line_u"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("line_u")).as("comp_u"))
      val recon = comp
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"),
            (floor(col("o_totalprice") * 100 + lit(0.5)).cast("long") *
              lit(10000L)).as("stated_u")),
          col("l_orderkey") === col("o_orderkey"))
        .select(
          (abs(col("comp_u") - col("stated_u")).cast(dec) * 1000000)
            .cast(dec).as("dev_num"), col("stated_u"))
        .select(expr("dev_num div cast(stated_u as decimal(38,0))")
          .as("dev_ppm"))
      recon
        .select(when(col("dev_ppm") === 0L, "a_exact")
          .when(col("dev_ppm") < 10000L, "b_under_1pct")
          .otherwise("c_over_1pct").as("band"), col("dev_ppm"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_orders"),
          max(col("dev_ppm")).as("max_dev_ppm"))
        .orderBy("band")
    }),


    // Rolling 7-day median of global daily revenue — the robust
    // trend smoother (a one-day spike moves a 7-day MEAN for a week;
    // it never moves the median). The window buffer is the ROLLING
    // WIDTH (≤7 integers), bounded by construction; the median is a
    // nearest-rank pick from the sorted in-row array, so nothing
    // float-accumulates.
    "q239_rolling_median_revenue" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w7 = Window.orderBy(col("d")).rowsBetween(-6, 0)
      Tables.orders(s, dir)
        .groupBy(col("o_orderdate").as("d"))
        .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5))
          .cast("long")).as("rev_c"))
        .withColumn("win", collect_list(col("rev_c")).over(w7))
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          (col("rev_c") / 100.0).as("revenue"),
          size(col("win")).cast("long").as("n_window"),
          // divide in SCALA column arithmetic: a `/ 100.0` literal
          // inside the expr string parses as DECIMAL, making the output
          // decimal(27,6) while the oracle emits DOUBLE (r9's one red
          // row — values agreed, the type hash didn't)
          (expr("element_at(array_sort(win)," +
            " cast((size(win) + 1) div 2 as int))") / lit(100.0))
            .as("median7_revenue"))
        .orderBy("day")
    }),


    // New-vs-returning revenue split by month: each order classed by
    // whether its month is the customer's FIRST order month — the
    // acquisition-vs-retention revenue mix. ONE orders scan: the
    // first-order month rides a customer-keyed min window; shares
    // are exact ppm integers.
    "q240_new_vs_returning" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      Tables.orders(s, dir)
        .select(col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy-MM").as("mon"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
            .as("rev_c"))
        .withColumn("first_mon", min(col("mon")).over(
          Window.partitionBy(col("o_custkey"))))
        .groupBy(col("mon"))
        .agg(
          sum(when(col("mon") === col("first_mon"), col("rev_c"))
            .otherwise(0L)).as("new_c"),
          sum(when(col("mon") =!= col("first_mon"), col("rev_c"))
            .otherwise(0L)).as("ret_c"))
        .select(col("mon"), (col("new_c") / 100.0).as("new_revenue"),
          (col("ret_c") / 100.0).as("returning_revenue"),
          expr("cast(new_c as decimal(38,0)) * 1000000" +
            " div cast(new_c + ret_c as decimal(38,0))")
            .as("new_share_ppm"))
        .orderBy("mon")
    }),


    // Activation-delay profile per signup cohort day: users' first
    // signup → first purchase delay, the cohort's conversion
    // permille and its exact nearest-rank median delay in seconds
    // (the synthetic feed spans one month, so day is the grain).
    // One events scan (conditional min aggregates per user), one
    // cohort-keyed rank window over the |users| aggregate.
    "q241_activation_delay" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val perUser = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "signup",
            unix_micros(col("ts")))).as("su_us"),
          min(when(col("event_type") === "purchase",
            unix_micros(col("ts")))).as("pu_us"))
        .filter(col("su_us").isNotNull)
        .select(col("user_id"),
          date_format(expr("timestamp_micros(su_us)"), "yyyy-MM-dd")
            .as("cohort"),
          when(col("pu_us") >= col("su_us"),
            expr("(pu_us - su_us) div 1000000")).as("delay_s"))
      val wRk = Window.partitionBy(col("cohort"))
        .orderBy(col("delay_s").asc_nulls_last, col("user_id"))
      val wC = Window.partitionBy(col("cohort"))
      perUser
        .withColumn("rk", row_number().over(wRk))
        .withColumn("m", count(col("delay_s")).over(wC))
        .groupBy(col("cohort"))
        .agg(count(lit(1)).as("n_users"),
          count(col("delay_s")).as("n_converted"),
          min(when(col("delay_s").isNotNull &&
            col("rk") === floor((col("m") + lit(1L)) / 2).cast("long"),
            col("delay_s"))).as("median_delay_s"))
        .select(col("cohort"), col("n_users"), col("n_converted"),
          expr("n_converted * 1000L div n_users").as("conv_permille"),
          col("median_delay_s"))
        .orderBy("cohort")
    }),


    // Decontamination ladder: test-in-train overlap rate at THREE
    // n-gram sizes in one report (the k-sweep that motivates the
    // "13-gram" convention — too small over-flags natural reuse, too
    // large misses paraphrase). Test/train split by md5(doc_id)
    // bucket; grams are literal token strings (engine-identical, no
    // hash seeds in the gate); train grams dedup BEFORE the join so
    // the test side never fans out; per-(k, doc) hit flags collapse
    // with max — two corpus scans total, the honest shape (train and
    // benchmark are different tables in production).
    "q242_contamination_ladder" -> ((s, dir) => {
      val splitHex = substring(md5(col("doc_id").cast("string")), 1, 1)
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
      def grams(df: org.apache.spark.sql.DataFrame) = df
        .select(col("doc_id"),
          expr("filter(split(text, ' '), t -> length(t) > 0)")
            .as("toks"))
        .select(col("doc_id"),
          explode(array(lit(3), lit(5), lit(8))).as("k"), col("toks"))
        .select(col("doc_id"), col("k"),
          explode(expr(
            """CASE WHEN size(toks) >= k THEN
              |  transform(sequence(1, size(toks) - k + 1),
              |    i -> concat_ws(' ', slice(toks, i, k)))
              |ELSE array() END""".stripMargin)).as("gram"))
      val test = grams(docs.filter(splitHex.isin("0", "1"))).distinct()
      val train = grams(docs.filter(!splitHex.isin("0", "1")))
        .select(col("k").as("k2"), col("gram").as("gram2")).distinct()
      test
        .join(train,
          col("k") === col("k2") && col("gram") === col("gram2"), "left")
        .groupBy(col("k"), col("doc_id"))
        .agg(max(when(col("gram2").isNotNull, 1L).otherwise(0L))
          .as("hit"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_test_docs"),
          sum(col("hit")).as("n_contaminated"))
        .select(col("k").cast("long").as("k"), col("n_test_docs"),
          col("n_contaminated"),
          expr("n_contaminated * 1000L div n_test_docs")
            .as("rate_permille"))
        .orderBy("k")
    }),


    // Activity-bitmask engagement profile: each user's month of
    // activity as ONE 31-bit integer (bit_or of 1<<(day−1)) — the
    // roaring-bitmap idea at its smallest. Engagement then reads off
    // bit arithmetic: active-day count is a popcount, weekend-only
    // is one mask intersection ((mask & W) = mask against the
    // calendar's weekend literal) — no per-day rows survive the
    // aggregate, so the shuffle carries one long per user.
    "q243_activity_bitmask" -> ((s, dir) => {
      // Jan 2024 weekends (6,7,13,14,20,21,27,28) as bits day−1
      val weekendMask = 202911840L
      Tables.events(s, dir)
        .select(col("user_id"),
          expr("shiftleft(1L, day(ts) - 1)").as("daybit"))
        .groupBy(col("user_id"))
        .agg(expr("bit_or(daybit)").as("mask"))
        .select(bit_count(col("mask")).cast("long").as("active_days"),
          when((col("mask").bitwiseAND(lit(weekendMask))) === col("mask"),
            1L).otherwise(0L).as("weekend_only"))
        .groupBy(col("active_days"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("weekend_only")).as("n_weekend_only"))
        .orderBy("active_days")
    }),


    // Join-skew audit: for each candidate join key (lineitem part +
    // supplier keys off ONE stacked scan, orders customer key,
    // events user key), the hot-key share and the p99 key frequency
    // — the "will this join need salting / AQE skew handling" report
    // a 100 TB planner consults BEFORE shuffling. Ranks run over the
    // |keys| aggregate — which is ENTITY-sized (customers, users), so
    // the pre-r11 key_col-partitioned window (4 schema-bounded
    // partitions) sorted each key population in one task;
    // ScaleOps.groupedRank range-shuffles it instead. Hot-key
    // multiples ride decimal(38,0).
    "q244_join_skew_audit" -> ((s, dir) => {
      def profile(freq: org.apache.spark.sql.DataFrame) = {
        graft.operators.ScaleOps.groupedRank(freq, Seq("key_col"),
            Seq(col("f").asc, col("key").asc),
            rankCol = "rk", countCol = "nk")
          .groupBy(col("key_col"))
          .agg(sum(col("f")).as("n_rows"),
            max(col("nk")).as("n_keys"),
            max(col("f")).as("max_freq"),
            min(when(col("rk") ===
              ((col("nk") * 99 + 99) / lit(100)).cast("long"),
              col("f"))).as("p99_freq"))
          .select(col("key_col"), col("n_rows"), col("n_keys"),
            col("max_freq"), col("p99_freq"),
            expr("cast(max_freq as decimal(38,0)) * 1000000" +
              " div cast(n_rows as decimal(38,0))").as("max_share_ppm"),
            expr("cast(max_freq as decimal(38,0)) * n_keys * 1000" +
              " div cast(n_rows as decimal(38,0))")
              .as("skew_x_permille"))
      }
      val liFreq = Tables.lineitem(s, dir)
        .select(expr("stack(2, 'lineitem.l_partkey'," +
          " cast(l_partkey as string), 'lineitem.l_suppkey'," +
          " cast(l_suppkey as string)) as (key_col, key)"))
        .groupBy(col("key_col"), col("key"))
        .agg(count(lit(1)).as("f"))
      val oFreq = Tables.orders(s, dir)
        .select(lit("orders.o_custkey").as("key_col"),
          col("o_custkey").cast("string").as("key"))
        .groupBy(col("key_col"), col("key"))
        .agg(count(lit(1)).as("f"))
      val eFreq = Tables.events(s, dir)
        .select(lit("events.user_id").as("key_col"),
          col("user_id").cast("string").as("key"))
        .groupBy(col("key_col"), col("key"))
        .agg(count(lit(1)).as("f"))
      profile(liFreq.unionAll(oFreq).unionAll(eFreq))
        .orderBy("key_col")
    }),


    // Out-of-vocabulary ladder: per source, the ppm of token
    // occurrences falling outside the top-5 / top-15 / top-25 global
    // vocabulary ranks — the tokenizer-sizing readout (how much tail
    // a vocab cutoff abandons), three cutoffs in ONE pass. The
    // global vocab ranks over the |distinct tokens| aggregate with a
    // (count desc, token) tie-break; per-source counts join it on
    // the token key.
    "q245_oov_ladder" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tok = Tables.documents(s, dir)
        .select(col("source"),
          explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) > 0)
      // only ranks <= 25 decide OOV membership, so the vocabulary is a
      // TakeOrderedAndProject top-25 (bounded), ranked locally; every
      // token OUTSIDE it is OOV at all ladder levels (left join, rank
      // coalesced past the deepest cut) — identical to ranking the full
      // vocabulary, without the global token sort
      val vocab = tok.groupBy(col("token"))
        .agg(count(lit(1)).as("tc"))
        .orderBy(col("tc").desc, col("token"))
        .limit(25)
        .withColumn("r", row_number().over(
          Window.orderBy(col("tc").desc, col("token"))))
        .select(col("token").as("vtoken"), col("r"))
      tok.groupBy(col("source"), col("token"))
        .agg(count(lit(1)).as("c"))
        .join(vocab, col("token") === col("vtoken"), "left")
        .withColumn("r", coalesce(col("r"), lit(999999)))
        .groupBy(col("source"))
        .agg(sum(col("c")).as("n_tokens"),
          sum(when(col("r") > 5, col("c")).otherwise(0L)).as("oov5"),
          sum(when(col("r") > 15, col("c")).otherwise(0L)).as("oov15"),
          sum(when(col("r") > 25, col("c")).otherwise(0L)).as("oov25"))
        .select(col("source"), col("n_tokens"),
          expr("oov5 * 1000000L div n_tokens").as("oov_top5_ppm"),
          expr("oov15 * 1000000L div n_tokens").as("oov_top15_ppm"),
          expr("oov25 * 1000000L div n_tokens").as("oov_top25_ppm"))
        .orderBy("source")
    }),


    // ABC×XYZ inventory matrix: parts classed by cumulative revenue
    // share (A ≤ 80%, B ≤ 95%, C rest — rev-desc rank with a partkey
    // tie-break) × demand variability (CV of monthly quantity over
    // the part's ACTIVE months: X < 0.5, Y < 1.0, Z, sparse when
    // under 6 months). ONE fact scan feeds both axes: (part, month)
    // grain first, then the |parts| aggregate carries revenue and
    // the exact quantity moments together; the cumulative walk is
    // ScaleOps.distributedCumSum (distributed prefix sum over the
    // part grain — q206's wiring), and tot_c one broadcast 1-row
    // aggregate, so no single-partition window anywhere.
    "q246_abc_xyz_matrix" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val perPart = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        // ONE exchange on l_partkey serves BOTH aggregates (r17, guide
        // §2.4): hash(l_partkey) satisfies the (l_partkey, mon)
        // clustering (subset rule) and the l_partkey rollup — the
        // default plan shuffled twice ((l_partkey, mon) grain, then
        // l_partkey), and the month grain is ~1 row per map partition
        // per key, so the first shuffle's map-side combine bought
        // nothing. partkey is high-cardinality: parallelism unharmed.
        .repartition(col("l_partkey"))
        .groupBy(col("l_partkey"),
          date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
        .agg(sum(col("l_quantity").cast("long")).as("q_m"),
          sum(floor(col("l_extendedprice") * 100 + lit(0.5))
            .cast("long")).as("rev_m"))
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_m"), sum(col("q_m")).as("sq"),
          sum(col("q_m") * col("q_m")).as("sq2"),
          sum(col("rev_m")).as("rev_c"))
      val cum = graft.operators.ScaleOps.distributedCumSum(perPart,
        Seq(col("rev_c").desc, col("l_partkey")), "rev_c",
        cumCol = "cum_c", rankCol = "rk_p")
      val tot = cum.agg(sum(col("rev_c")).as("tot_c"))
      val classed = cum
        .crossJoin(broadcast(tot))
        .withColumn("abc",
          when(expr(s"cast(cum_c as $dec) * 1000000" +
            s" div cast(tot_c as $dec)") <= 800000L, "A")
            .when(expr(s"cast(cum_c as $dec) * 1000000" +
              s" div cast(tot_c as $dec)") <= 950000L, "B")
            .otherwise("C"))
        .withColumn("cv",
          sqrt((col("n_m") * col("sq2") - col("sq") * col("sq"))
            .cast("double")) / col("sq").cast("double"))
        .withColumn("xyz",
          when(col("n_m") < 6L, "S")
            .when(col("cv") < 0.5, "X")
            .when(col("cv") < 1.0, "Y")
            .otherwise("Z"))
      classed.groupBy(col("abc"), col("xyz"))
        .agg(count(lit(1)).as("n_parts"),
          expr(s"cast(sum(rev_c) as $dec) * 1000000" +
            s" div cast(max(tot_c) as $dec)").as("rev_share_ppm"))
        .orderBy("abc", "xyz")
    }),


    // Duplicate-family size distribution: how big exact-dup clusters
    // get — the dedup diagnostic that distinguishes "each page copied
    // once" from "one boilerplate page copied 10 000 times" (the
    // skew q17's LSH caps exist for). Two aggregates, no window.
    "q247_dup_cluster_sizes" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      Tables.documents(s, dir)
        .groupBy(col("text"))
        .agg(count(lit(1)).as("sz"))
        .groupBy(col("sz"))
        .agg(count(lit(1)).as("n_clusters"))
        .withColumn("n_docs", col("sz") * col("n_clusters"))
        .withColumn("doc_share_ppm",
          expr(s"cast(n_docs as $dec) * 1000000 div" +
            s" cast(sum(n_docs) over () as $dec)"))
        .orderBy("sz")
    }),


    // Seasonal-naive forecast backtest: predict each day's per-type
    // event value with the SAME WEEKDAY a week earlier, then report
    // the error profile — mean and exact nearest-rank median absolute
    // percentage error in ppm. The 7-step lag is validated against
    // the calendar (a gap day breaks the pairing rather than silently
    // comparing wrong weekdays).
    "q248_seasonal_naive_mape" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wd = Window.partitionBy(col("event_type")).orderBy(col("d"))
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
          .as("v_c"))
      val scored = daily
        .withColumn("f_c", lag(col("v_c"), 7).over(wd))
        .withColumn("f_d", lag(col("d"), 7).over(wd))
        .filter(col("f_c").isNotNull && col("f_c") > 0L &&
          datediff(col("d"), col("f_d")) === 7)
        .select(col("event_type"), col("d"),
          expr("abs(v_c - f_c) * 1000000L div f_c").as("ape_ppm"))
      val wRk = Window.partitionBy(col("event_type"))
        .orderBy(col("ape_ppm"), col("d"))
      scored
        .withColumn("rk", row_number().over(wRk))
        .withColumn("m", count(lit(1)).over(
          Window.partitionBy(col("event_type"))))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_points"),
          expr("sum(ape_ppm) div count(1)").as("mean_ape_ppm"),
          min(when(col("rk") === floor((col("m") + lit(1L)) / 2)
            .cast("long"), col("ape_ppm"))).as("median_ape_ppm"))
        .orderBy("event_type")
    }),


    // Functional-dependency audit: does A determine B in the data the
    // way the schema claims? One row per candidate FD with the count
    // of A-values bound to MORE THAN ONE distinct B — a schema-design
    // / denormalization-drift check (nation→region must hold;
    // custkey→nationkey must hold; orderdate→priority must NOT).
    // Each FD is one two-level aggregate on its own table; nothing
    // joins.
    "q249_functional_dependencies" -> ((s, dir) => {
      def fd(df: org.apache.spark.sql.DataFrame, a: String, b: String,
             name: String) =
        df.groupBy(col(a)).agg(countDistinct(col(b)).as("nb"))
          .agg(count(lit(1)).as("n_keys"),
            sum(when(col("nb") > 1L, 1L).otherwise(0L))
              .as("n_violating"))
          .select(lit(name).as("fd"), col("n_keys"), col("n_violating"))
      fd(Tables.nation(s, dir), "n_nationkey", "n_regionkey",
        "nation->region")
        .unionAll(fd(Tables.customer(s, dir), "c_custkey", "c_nationkey",
          "custkey->nationkey"))
        .unionAll(fd(Tables.orders(s, dir), "o_custkey", "o_orderstatus",
          "custkey->orderstatus"))
        .unionAll(fd(Tables.orders(s, dir), "o_orderdate",
          "o_orderpriority", "orderdate->priority"))
        .unionAll(fd(Tables.lineitem(s, dir), "l_partkey", "l_suppkey",
          "partkey->suppkey"))
        .orderBy("fd")
    }),


    // Round-number bias audit: the cents distribution of order totals
    // (.00 / .50 / .99 / other) per priority in exact permille — the
    // Benford sibling for detecting hand-entered or synthetic
    // amounts (organic totals land on .00 at ~1%, human-priced feeds
    // at 10-40%). Pure integer mod arithmetic on one scan.
    "q250_round_number_bias" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderpriority"),
          expr("cast(floor(o_totalprice * 100 + 0.5) as bigint) % 100")
            .as("cents"))
        .select(col("o_orderpriority"),
          when(col("cents") === 0L, "a_00")
            .when(col("cents") === 50L, "b_50")
            .when(col("cents") === 99L, "c_99")
            .otherwise("d_other").as("ending"))
        .groupBy(col("o_orderpriority"), col("ending"))
        .agg(count(lit(1)).as("n_orders"))
        .withColumn("share_permille", expr("n_orders * 1000L div " +
          "sum(n_orders) over (partition by o_orderpriority)"))
        .orderBy("o_orderpriority", "ending")
    }),


    // Effective sample size of the per-source importance weights
    // (Kish's ESS = (Σw)²/Σw²): how many "real" samples a weighted
    // corpus behaves like — the health metric for any importance-
    // sampled mixture (q43/q74/q152). Weights are the exact integer
    // doc lengths; ESS is one IEEE division of decimal(38,0) exact
    // moments; the utilization ratio is exact ppm.
    "q251_effective_sample_size" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      Tables.documents(s, dir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars").cast("long")).cast(dec).as("sw"),
          sum(col("n_chars").cast(dec) * col("n_chars").cast(dec))
            .as("sw2"))
        .filter(col("sw2") > 0)
        .select(col("source"), col("n_docs"),
          r4((col("sw") * col("sw")).cast("double") /
            col("sw2").cast("double")).as("ess"),
          expr(s"(cast(sw as $dec) * cast(sw as $dec) * 1000000)" +
            s" div (cast(sw2 as $dec) * n_docs)").as("ess_ratio_ppm"))
        .orderBy("source")
    }),


    // Shard-balance preview: how evenly md5(doc_id) hex-bucket
    // sharding would spread the corpus over 16 writers — row and
    // byte share per shard in exact permille, plus each shard's
    // hot-vs-average multiple. The pre-write planning readout for
    // the shard-manifest path (q157); one scan, |shards| output
    // rows.
    "q252_shard_balance" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      Tables.documents(s, dir)
        .select(substring(md5(col("doc_id").cast("string")), 1, 1)
          .as("shard"), col("n_chars").cast("long").as("b"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("b")).as("n_bytes"))
        .withColumn("tot_docs", sum(col("n_docs")).over(
          Window.partitionBy()))
        .withColumn("tot_bytes", sum(col("n_bytes")).over(
          Window.partitionBy()))
        .select(col("shard"), col("n_docs"), col("n_bytes"),
          expr("n_docs * 1000L div tot_docs").as("doc_share_permille"),
          expr("cast(n_bytes as decimal(38,0)) * 1000" +
            " div cast(tot_bytes as decimal(38,0))")
            .as("byte_share_permille"),
          expr("cast(n_bytes as decimal(38,0)) * 16000" +
            " div cast(tot_bytes as decimal(38,0))")
            .as("hot_x_permille"))
        .orderBy("shard")
    }),


    // Three-source UpSet overlap: every membership combination of the
    // three largest sources over normalized-text fingerprints — the
    // exact k-set generalization of a pairwise overlap matrix
    // (which combination cells a Venn diagram hides is exactly what
    // dedup planning needs). Membership collapses to ONE bitmask per
    // fingerprint before counting; the top-3 pick is rank-based with
    // a name tie-break.
    "q253_source_overlap_upset" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
        .select(col("source"), md5(lower(trim(col("text")))).as("fp"))
      val top3 = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("nd"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("nd").desc, col("source"))))
        .filter(col("rk") <= 3)
        .select(col("source").as("src"), col("rk"))
      docs.join(broadcast(top3), col("source") === col("src"))
        .groupBy(col("fp"))
        .agg(expr("bit_or(shiftleft(1L, cast(rk as int) - 1))")
          .as("mask"))
        .groupBy(col("mask"))
        .agg(count(lit(1)).as("n_fingerprints"))
        .orderBy("mask")
    }),


    // Per-label centroid drift: cosine of each label's embedding
    // centroid to the GLOBAL centroid — the embedding-space balance
    // check (a label whose centroid drifts from the corpus mean is
    // over-clustered or mis-labeled). Components quantize to exact
    // 1e-4 integers BEFORE any reduction, so the per-dimension sums
    // are order-free (float centroids would hash differently per
    // partitioning); dims are bounded (64), so the per-label frame
    // is |labels|×dims and the one window rides the dim key. The
    // scale factors cancel in the cosine.
    "q254_centroid_drift" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dec = "decimal(38,0)"
      val perLD = Tables.embeddings(s, dir)
        .select(col("label"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("label"), col("dim"),
          floor(col("x").cast("double") * 10000 + lit(0.5))
            .cast("long").as("qv"))
        .groupBy(col("label"), col("dim"))
        .agg(sum(col("qv")).cast(dec).as("sq"),
          count(lit(1)).as("c"))
      perLD
        .withColumn("gq", sum(col("sq")).over(
          Window.partitionBy(col("dim"))))
        .groupBy(col("label"))
        .agg(max(col("c")).as("n_vecs"),
          sum(col("sq") * col("gq")).as("dot"),
          sum(col("sq") * col("sq")).as("a2"),
          sum(col("gq") * col("gq")).as("b2"))
        .select(col("label").cast("long").as("label"), col("n_vecs"),
          r4(col("dot").cast("double") /
            (sqrt(col("a2").cast("double")) *
              sqrt(col("b2").cast("double")))).as("cos_to_global"))
        .orderBy("label")
    }),


    // Substitution candidates: for the 20 most-demanded parts, the
    // cheapest same-(type, size) alternative from a DIFFERENT brand
    // — the alternative-sourcing lookup. The part↔part join keys on
    // (type, size), whose group sizes are CATALOG-bounded (brands
    // per spec), never order-volume-bounded; demand ranks over the
    // |parts| aggregate; prices compare as exact cents with a
    // partkey tie-break.
    "q255_substitution_candidates" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val parts = Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size"),
          floor(col("p_retailprice") * 100 + lit(0.5)).cast("long")
            .as("price_c"))
      val demand = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_quantity").cast("long")).as("qty"))
      // top-20 via orderBy().limit(): TakeOrderedAndProject keeps
      // 20-row heaps per partition — no global sort of the part frame;
      // ranks are assigned afterwards on the 20-row result
      val top20 = parts
        .join(demand, col("p_partkey") === col("l_partkey"))
        .orderBy(col("qty").desc, col("p_partkey"))
        .limit(20)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("qty").desc, col("p_partkey"))))
      val alts = parts.select(col("p_partkey").as("alt_key"),
        col("p_brand").as("alt_brand"), col("p_type").as("alt_type"),
        col("p_size").as("alt_size"), col("price_c").as("alt_price_c"))
      top20
        .join(alts,
          col("p_type") === col("alt_type") &&
            col("p_size") === col("alt_size") &&
            col("p_brand") =!= col("alt_brand"), "left")
        .withColumn("ark", row_number().over(
          Window.partitionBy(col("p_partkey"))
            .orderBy(col("alt_price_c").asc_nulls_last, col("alt_key"))))
        .filter(col("ark") === 1)
        .select(col("rk").cast("long").as("demand_rank"),
          col("p_partkey"), col("qty"),
          (col("price_c") / 100.0).as("price"),
          col("alt_key").as("alt_partkey"),
          (col("alt_price_c") / 100.0).as("alt_price"))
        .orderBy("demand_rank")
    }),


    // Line-number contiguity audit: per-order l_linenumber must be
    // exactly 1..n with no gaps or repeats — the writer-correctness
    // check for multi-line fact feeds. n·(n+1)/2 sum identity +
    // distinct-count, one aggregate; one report row.
    "q256_linenumber_contiguity" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("l_linenumber")).as("nd"),
          sum(col("l_linenumber").cast("long")).as("sln"),
          max(col("l_linenumber").cast("long")).as("mx"))
        .select(
          when(col("nd") =!= col("n"), lit("dup_linenumber"))
            .when(col("mx") =!= col("n"), lit("gap_or_offset"))
            .when(expr("sln != n * (n + 1) div 2"), lit("gap_or_offset"))
            .otherwise(lit("contiguous")).as("status"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("status")
    }),


    // Weighted Jaccard between sources' token histograms
    // (Σmin/Σmax over counts) — the multiset cousin of q218's
    // cosine: robust to one source being a longer copy of another
    // (cosine saturates at 1, weighted Jaccard stays below it until
    // the HISTOGRAMS match). Σmin joins only tokens present in both
    // (sparse); Σmax = |A|+|B|−Σmin, all exact integers.
    "q257_weighted_jaccard_sources" -> ((s, dir) => {
      val counts = Tables.documents(s, dir)
        .select(col("source"),
          explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy(col("source"), col("token"))
        .agg(count(lit(1)).as("c"))
      val totals = counts.groupBy(col("source"))
        .agg(sum(col("c")).as("tot"))
      val a = counts.select(col("source").as("src_a"), col("token"),
        col("c").as("ca"))
      val b = counts.select(col("source").as("src_b"),
        col("token").as("token_b"), col("c").as("cb"))
      val inter = a.join(b,
        col("token") === col("token_b") && col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(sum(least(col("ca"), col("cb"))).as("smin"))
      inter
        .join(totals.select(col("source").as("src_a"),
          col("tot").as("tot_a")), "src_a")
        .join(totals.select(col("source").as("src_b"),
          col("tot").as("tot_b")), "src_b")
        .select(col("src_a"), col("src_b"),
          r4(col("smin").cast("double") /
            (col("tot_a") + col("tot_b") - col("smin")).cast("double"))
            .as("wjaccard"))
        .orderBy("src_a", "src_b")
    }),


    // Bigram redundancy per source: 1 − distinct/total token-bigram
    // ratio in ppm — the compressibility proxy (a looping crawler
    // or boilerplate-heavy source repeats bigrams; clean prose
    // doesn't). Bigrams come from one in-row zip of the token array
    // with its own tail; counts are exact.
    "q258_bigram_redundancy" -> ((s, dir) => {
      val grams = Tables.documents(s, dir)
        .select(col("source"),
          expr("filter(split(text, ' '), t -> length(t) > 0)")
            .as("toks"))
        .select(col("source"), explode(expr(
          """CASE WHEN size(toks) >= 2 THEN
            |  transform(sequence(1, size(toks) - 1),
            |    i -> concat(toks[i - 1], ' ', toks[i]))
            |ELSE array() END""".stripMargin)).as("bg"))
      grams.groupBy(col("source"))
        .agg(count(lit(1)).as("n_bigrams"),
          countDistinct(col("bg")).as("n_distinct"))
        .select(col("source"), col("n_bigrams"), col("n_distinct"),
          expr("(n_bigrams - n_distinct) * 1000000L div n_bigrams")
            .as("redundancy_ppm"))
        .orderBy("source")
    }),


    // Overdue-customer churn risk: the 20 customers furthest past
    // their own cadence (days since last order vs mean inter-order
    // gap, compared by exact integer cross-multiplication — no
    // division enters the ranking). "Now" is the corpus max date, so
    // the report is reproducible; requires ≥5 orders so the cadence
    // is real.
    "q259_overdue_customers" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val mx = Tables.orders(s, dir)
        .agg(max(col("o_orderdate")).as("now_d"))
      val per = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_orderdate")).as("first_d"),
          max(col("o_orderdate")).as("last_d"))
        .filter(col("n_orders") >= 5L)
        .crossJoin(broadcast(mx))
        // mean gap = (last-first)/(n-1); overdue_x = since/mean
        .select(col("o_custkey"), col("n_orders"),
          datediff(col("now_d"), col("last_d")).cast("long")
            .as("since_d"),
          datediff(col("last_d"), col("first_d")).cast("long")
            .as("span_d"))
        .filter(col("span_d") > 0L)
        .select(col("o_custkey"), col("n_orders"), col("since_d"),
          expr("span_d div (n_orders - 1)").as("mean_gap_d"),
          expr("since_d * (n_orders - 1) * 1000L div span_d")
            .as("overdue_x_permille"))
      // Top-20 via orderBy().limit(): TakeOrderedAndProject keeps a
      // 20-row heap per partition + one driver merge — no
      // single-partition window over the customer-grain frame
      // (~O(10^8-10^9) customers at 100 TB). Ranks are assigned
      // afterwards on the 20-row result.
      per
        .orderBy(col("overdue_x_permille").desc, col("o_custkey"))
        .limit(20)
        .withColumn("rank", row_number().over(Window.orderBy(
          col("overdue_x_permille").desc, col("o_custkey"))).cast("long"))
        .select(col("rank"), col("o_custkey"),
          col("n_orders"), col("since_d"), col("mean_gap_d"),
          col("overdue_x_permille"))
        .orderBy("rank")
    }),


    // Status-consistency conformance matrix: o_orderstatus against
    // the status DERIVED from the order's line statuses (all-F → F,
    // all-O → O, mixed → P — the documented TPC-H invariant). The
    // fixture's feed is deliberately inconsistent, so the matrix is
    // the informative 3×3 rather than a diagonal — exactly what the
    // audit exists to surface before anyone trusts a status filter.
    // One lineitem aggregate + one key join.
    "q260_status_consistency" -> ((s, dir) => {
      val derived = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(min(col("l_linestatus")).as("mn"),
          max(col("l_linestatus")).as("mx"))
        .select(col("l_orderkey"),
          when(col("mn") === "F" && col("mx") === "F", "F")
            .when(col("mn") === "O" && col("mx") === "O", "O")
            .otherwise("P").as("derived"))
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"))
        .join(derived, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"), col("derived"))
        .agg(count(lit(1)).as("n_orders"))
        .withColumn("is_match",
          when(col("o_orderstatus") === col("derived"), 1L)
            .otherwise(0L))
        .orderBy("o_orderstatus", "derived")
    }),


    // Winsorization preview per event type: exact nearest-rank
    // p01/p99 of the integer cent values, the row counts outside
    // them, and the ppm of VALUE MASS a p01/p99 clamp would move —
    // the preprocessing dial (clip vs drop) read off exact integers
    // before anyone mutates the feed. The pre-r11 type-partitioned
    // rank window sorted each type's WHOLE fact frame in one task
    // (schema-bounded partition count over fact-grain rows);
    // ScaleOps.groupedRank range-shuffles instead, and the p01/p99
    // cuts come back as a |types|-row broadcast.
    "q261_winsorization_preview" -> ((s, dir) => {
      val vals = Tables.events(s, dir)
        .select(col("event_type"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("v"),
          col("event_id"))
      val ranked = graft.operators.ScaleOps.groupedRank(vals,
        Seq("event_type"), Seq(col("v").asc, col("event_id").asc),
        rankCol = "rk", countCol = "n")
      def rkP01 = ((col("n") + 99) / lit(100)).cast("long")
      def rkP99 = ((col("n") * 99 + 99) / lit(100)).cast("long")
      val cuts = ranked
        .filter(col("rk") === rkP01 || col("rk") === rkP99)
        .groupBy(col("event_type"))
        .agg(min(when(col("rk") === rkP01, col("v"))).as("p01"),
          min(when(col("rk") === rkP99, col("v"))).as("p99"))
      ranked.join(broadcast(cuts), "event_type")
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n_events"),
          max(col("p01")).as("p01_cents"),
          max(col("p99")).as("p99_cents"),
          sum(when(col("v") < col("p01"), 1L).otherwise(0L))
            .as("n_below"),
          sum(when(col("v") > col("p99"), 1L).otherwise(0L))
            .as("n_above"),
          sum(col("v")).as("raw_sum"),
          sum(greatest(least(col("v"), col("p99")), col("p01")))
            .as("clamped_sum"))
        .select(col("event_type"), col("n_events"), col("p01_cents"),
          col("p99_cents"), col("n_below"), col("n_above"),
          expr("abs(raw_sum - clamped_sum) * 1000000L div raw_sum")
            .as("moved_mass_ppm"))
        .orderBy("event_type")
    }),


    // Hour-of-day uniformity test per event type: chi-squared
    // goodness-of-fit against the uniform 1/24 expectation — the
    // timezone-sanity alarm (a feed whose "hours" all collapse to
    // one bucket was written with a stripped or double-converted
    // timestamp). q223's fold discipline: per-type hour counts
    // collapse to one sorted cell array, the statistic is a
    // deterministic left fold, 24 cells by construction.
    "q262_hour_uniformity" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"), hour(col("ts")).as("hr"))
        .agg(count(lit(1)).as("o"))
        .groupBy(col("event_type"))
        .agg(sum(col("o")).as("n"),
          count(lit(1)).as("n_hours"),
          sort_array(collect_list(col("o").cast("double"))).as("cs"))
        .select(col("event_type"), col("n"), col("n_hours"),
          r4(expr(
            """aggregate(cs, cast(0.0 as double), (a, x) ->
              |  a + pow(x - cast(n as double) / 24.0, 2.0)
              |      / (cast(n as double) / 24.0))""".stripMargin) +
            // hours with ZERO events contribute (0-E)^2/E = E each
            (lit(24) - col("n_hours")).cast("double") *
              (col("n").cast("double") / 24.0)).as("chi2"))
        .orderBy("event_type")
    }),


    // Cohort retention half-life: for each first-seen-day cohort,
    // the first day offset where distinct active users fall below
    // HALF of the cohort size — the one-number retention summary
    // (the full curve is q79). Integer 2·active < size crossing,
    // min-when pick; activity grain is (cohort, offset, user)
    // distinct.
    "q263_retention_half_life" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val firstDay = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("cohort_d"))
      val activity = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d"))
        .join(firstDay, "user_id")
        .select(col("user_id"), col("cohort_d"),
          datediff(col("d"), col("cohort_d")).cast("long").as("off"))
        .distinct()
      val curve = activity.groupBy(col("cohort_d"), col("off"))
        .agg(countDistinct(col("user_id")).as("active"))
      val size = Window.partitionBy(col("cohort_d"))
      curve
        .withColumn("cohort_size",
          max(when(col("off") === 0L, col("active"))).over(size))
        .groupBy(col("cohort_d"))
        .agg(max(col("cohort_size")).as("cohort_size"),
          min(when(col("active") * 2 < col("cohort_size"), col("off")))
            .as("half_life_days"))
        .select(date_format(col("cohort_d"), "yyyy-MM-dd").as("cohort"),
          col("cohort_size"), col("half_life_days"))
        .orderBy("cohort")
    }),


    // Growth accounting: each active day decomposed into the classic
    // quadrant — new (first appearance), retained (also active the
    // previous calendar day), resurrected (returning after a gap) —
    // plus churned (active yesterday, silent today) recovered from
    // the identity churned(d) = active(d−1) − retained(d). One
    // distinct (user, day) frame, one user-keyed lag, one |days|
    // rollup; every class is an exact integer. The lag that recovers
    // active(d−1) is CALENDAR-validated (r13 review): over a feed
    // with an all-silent day, the raw lag reads the last OBSERVED
    // day's actives as "yesterday's", overstating churn — if the
    // previous row isn't calendar-adjacent, active(d−1) is zero by
    // construction. (A day with no actives at all emits no row; its
    // own churn line is out of scope for this per-active-day report.)
    "q264_growth_accounting" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val act = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d"))
        .distinct()
      val wU = Window.partitionBy(col("user_id")).orderBy(col("d"))
      val classed = act
        .withColumn("prev", lag(col("d"), 1).over(wU))
        .select(col("d"),
          when(col("prev").isNull, "new")
            .when(datediff(col("d"), col("prev")) === 1, "retained")
            .otherwise("resurrected").as("cls"))
      classed.groupBy(col("d"))
        .agg(count(lit(1)).as("n_active"),
          sum(when(col("cls") === "new", 1L).otherwise(0L)).as("n_new"),
          sum(when(col("cls") === "retained", 1L).otherwise(0L))
            .as("n_retained"),
          sum(when(col("cls") === "resurrected", 1L).otherwise(0L))
            .as("n_resurrected"))
        .withColumn("n_churned",
          coalesce(
            when(datediff(col("d"),
              lag(col("d"), 1).over(Window.orderBy(col("d")))) === 1,
              lag(col("n_active"), 1).over(Window.orderBy(col("d")))),
            lit(0L)) - col("n_retained"))
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("n_active"), col("n_new"), col("n_retained"),
          col("n_resurrected"), col("n_churned"))
        .orderBy("day")
    }),
  )

  /** DuckDB oracle SQL for every query above (same keys). */
  val oracleSql: Map[String, String] = Map(

    // q230: same per-order completion gap and integer bands.
    "q230_fulfillment_latency" ->
      """WITH po AS (
        |  SELECT o_orderpriority,
        |         date_diff('day', o_orderdate,
        |                   CAST(last_ship AS DATE))::BIGINT AS gap_d
        |  FROM (SELECT l_orderkey, max(l_shipdate) AS last_ship
        |        FROM lineitem GROUP BY 1)
        |  JOIN orders ON l_orderkey = o_orderkey),
        |b AS (
        |  SELECT o_orderpriority,
        |         CASE WHEN gap_d <= 7 THEN 'a_0_7'
        |              WHEN gap_d <= 30 THEN 'b_8_30'
        |              WHEN gap_d <= 60 THEN 'c_31_60'
        |              ELSE 'd_61_plus' END AS band
        |  FROM po),
        |g AS (
        |  SELECT o_orderpriority, band, count(*)::BIGINT AS n_orders
        |  FROM b GROUP BY 1, 2)
        |SELECT o_orderpriority, band, n_orders,
        |       (n_orders * 1000 //
        |        sum(n_orders) OVER (PARTITION BY o_orderpriority))
        |         ::BIGINT AS share_permille
        |FROM g ORDER BY o_orderpriority, band""".stripMargin,


    // q231: identical integer unit prices, identical nearest-rank
    // quartile indices ((n+3)//4, (3n+3)//4).
    "q231_price_dispersion" ->
      """WITH u AS (
        |  SELECT l_partkey,
        |         (CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * 100)
        |           // CAST(l_quantity AS BIGINT) AS u
        |  FROM lineitem),
        |r AS (
        |  SELECT l_partkey, u,
        |         row_number() OVER (PARTITION BY l_partkey ORDER BY u)
        |           AS rk,
        |         count(*) OVER (PARTITION BY l_partkey) AS n
        |  FROM u),
        |q AS (
        |  SELECT l_partkey, n,
        |         min(CASE WHEN rk = (n + 3) // 4 THEN u END) AS q1_u,
        |         min(CASE WHEN rk = (n * 3 + 3) // 4 THEN u END) AS q3_u
        |  FROM r GROUP BY 1, 2)
        |SELECT l_partkey, n AS n_lines,
        |       (q1_u / 10000.0)::DOUBLE AS q1_price,
        |       (q3_u / 10000.0)::DOUBLE AS q3_price,
        |       floor((q3_u - q1_u)::DOUBLE / (q3_u + q1_u)::DOUBLE
        |             * 10000 + 0.5) / 10000 AS qcd
        |FROM q WHERE n >= 8 AND q1_u + q3_u > 0
        |ORDER BY qcd DESC, l_partkey
        |LIMIT 50""".stripMargin,


    // q232: identical ceil-index thresholds and HUGEINT ppm shares.
    "q232_revenue_concentration" ->
      """WITH pc AS (
        |  SELECT o_custkey,
        |         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           ::BIGINT AS rev_c
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT rev_c,
        |         row_number() OVER (ORDER BY rev_c DESC, o_custkey) AS rk,
        |         count(*) OVER () AS n,
        |         sum(rev_c) OVER () AS tot
        |  FROM pc),
        |e AS (
        |  SELECT r.*, p.pct_permille
        |  FROM r CROSS JOIN (VALUES (10), (50), (100)) AS p(pct_permille))
        |SELECT pct_permille, count(*)::BIGINT AS n_customers,
        |       ((sum(rev_c)::HUGEINT * 1000000) // max(tot)::HUGEINT)
        |         ::BIGINT AS share_ppm
        |FROM e WHERE rk <= (n * pct_permille + 999) // 1000
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // q233: identical month-partitioned lag and HUGEINT ppm growth
    // (both engines truncate integral division toward zero).
    "q233_yoy_growth" ->
      """WITH m AS (
        |  SELECT date_part('year', o_orderdate)::BIGINT AS yr,
        |         date_part('month', o_orderdate)::BIGINT AS mo,
        |         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           ::BIGINT AS rev_c
        |  FROM orders GROUP BY 1, 2),
        |l AS (
        |  SELECT yr, mo, rev_c,
        |         lag(rev_c) OVER (PARTITION BY mo ORDER BY yr) AS prev_c
        |  FROM m)
        |SELECT yr, mo, (rev_c / 100.0)::DOUBLE AS revenue,
        |       (prev_c / 100.0)::DOUBLE AS prev_revenue,
        |       ((rev_c::HUGEINT - prev_c::HUGEINT) * 1000000
        |        // prev_c::HUGEINT)::BIGINT AS growth_ppm
        |FROM l WHERE prev_c IS NOT NULL AND prev_c > 0
        |ORDER BY yr, mo""".stripMargin,


    // q234: identical exact-moment CV and rank-based top-10.
    "q234_supplier_consistency" ->
      """WITH g AS (
        |  SELECT l_suppkey,
        |         date_diff('day', o_orderdate,
        |                   CAST(l_shipdate AS DATE))::BIGINT AS g
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |a AS (
        |  SELECT l_suppkey, count(*)::BIGINT AS n, sum(g)::BIGINT AS sg,
        |         sum(g * g)::BIGINT AS sg2
        |  FROM g GROUP BY 1)
        |SELECT s_name, n AS n_shipments,
        |       floor(sg::DOUBLE / n::DOUBLE * 10000 + 0.5) / 10000
        |         AS mean_lag_d,
        |       floor(sqrt((n * sg2 - sg * sg)::DOUBLE) / sg::DOUBLE
        |             * 10000 + 0.5) / 10000 AS cv
        |FROM a JOIN supplier ON s_suppkey = l_suppkey
        |WHERE n >= 20 AND sg > 0
        |ORDER BY cv, s_name
        |LIMIT 10""".stripMargin,


    // q235: identical tie-broken ranks, identical exact closed form
    // in HUGEINT.
    "q235_spearman_len_tokens" ->
      """WITH b AS (
        |  SELECT lang, doc_id, n_chars::BIGINT AS llen,
        |         length(list_filter(string_split(text, ' '),
        |                            t -> length(t) > 0))::BIGINT AS ntok
        |  FROM documents),
        |r AS (
        |  SELECT lang,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY llen, doc_id) AS r1,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY ntok, doc_id) AS r2
        |  FROM b),
        |a AS (
        |  SELECT lang, count(*)::HUGEINT AS n,
        |         sum(((r1 - r2) * (r1 - r2))::HUGEINT) AS sd2
        |  FROM r GROUP BY 1)
        |SELECT lang, n::BIGINT AS n_docs,
        |       floor((1.0 - (sd2 * 6)::DOUBLE / (n * n * n - n)::DOUBLE)
        |             * 10000 + 0.5) / 10000 AS spearman_rho
        |FROM a WHERE n >= 3 ORDER BY lang""".stripMargin,


    // q236: strpos ≡ position (1-based, 0 when absent).
    "q236_keyword_contexts" ->
      """WITH k AS (
        |  SELECT unnest(['spark', 'vector', 'merge']) AS keyword),
        |d AS (
        |  SELECT keyword, strpos(text, keyword)::BIGINT AS pos
        |  FROM documents CROSS JOIN k)
        |SELECT keyword,
        |       sum(CASE WHEN pos > 0 THEN 1 ELSE 0 END)::BIGINT AS n_docs,
        |       (sum(CASE WHEN pos > 0 THEN 1 ELSE 0 END) * 1000000
        |        // count(*))::BIGINT AS share_ppm,
        |       floor(sum(CASE WHEN pos > 0 THEN pos ELSE 0 END)::DOUBLE
        |             / sum(CASE WHEN pos > 0 THEN 1 ELSE 0 END)::DOUBLE
        |             * 10000 + 0.5) / 10000 AS mean_first_pos
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,


    // q237: identical exact-microsecond session breaks and depth
    // bands.
    "q237_session_depth_conversion" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
        |                   <= 1800000000 THEN 0 ELSE 1 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, event_type,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM e),
        |g AS (
        |  SELECT user_id, sess_id, count(*)::BIGINT AS depth,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           ::BIGINT AS converted
        |  FROM s GROUP BY 1, 2),
        |bnd AS (
        |  SELECT CASE WHEN depth = 1 THEN 'a_1'
        |              WHEN depth = 2 THEN 'b_2'
        |              WHEN depth <= 5 THEN 'c_3_5'
        |              WHEN depth <= 10 THEN 'd_6_10'
        |              ELSE 'e_11_plus' END AS depth_band, converted
        |  FROM g)
        |SELECT depth_band, count(*)::BIGINT AS n_sessions,
        |       sum(converted)::BIGINT AS n_converting,
        |       (sum(converted) * 1000 // count(*))::BIGINT
        |         AS conv_permille
        |FROM bnd GROUP BY 1 ORDER BY 1""".stripMargin,


    // q238: identical 1e-6-dollar integer recomputation and bands.
    "q238_order_reconciliation" ->
      """WITH comp AS (
        |  SELECT l_orderkey,
        |         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |             * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
        |             * (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT)))
        |           ::BIGINT AS comp_u
        |  FROM lineitem GROUP BY 1),
        |recon AS (
        |  SELECT (abs(comp_u - CAST(floor(o_totalprice * 100 + 0.5)
        |                            AS BIGINT) * 10000)::HUGEINT
        |          * 1000000)
        |         // (CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |            * 10000)::HUGEINT AS dev_ppm
        |  FROM comp JOIN orders ON l_orderkey = o_orderkey),
        |b AS (
        |  SELECT CASE WHEN dev_ppm = 0 THEN 'a_exact'
        |              WHEN dev_ppm < 10000 THEN 'b_under_1pct'
        |              ELSE 'c_over_1pct' END AS band, dev_ppm
        |  FROM recon)
        |SELECT band, count(*)::BIGINT AS n_orders,
        |       max(dev_ppm)::BIGINT AS max_dev_ppm
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,


    // q239: identical ≤7-value rolling window, sorted nearest-rank
    // pick.
    "q239_rolling_median_revenue" ->
      """WITH d AS (
        |  SELECT o_orderdate AS d,
        |         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           ::BIGINT AS rev_c
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT d, rev_c,
        |         list(rev_c) OVER (ORDER BY d
        |                           ROWS BETWEEN 6 PRECEDING
        |                           AND CURRENT ROW) AS win
        |  FROM d)
        |SELECT strftime(d, '%Y-%m-%d') AS day,
        |       (rev_c / 100.0)::DOUBLE AS revenue,
        |       length(win)::BIGINT AS n_window,
        |       (list_sort(win)[(length(win) + 1) // 2] / 100.0)::DOUBLE
        |         AS median7_revenue
        |FROM w ORDER BY day""".stripMargin,


    // q240: identical first-month window and ppm split.
    "q240_new_vs_returning" ->
      """WITH o AS (
        |  SELECT o_custkey, strftime(o_orderdate, '%Y-%m') AS mon,
        |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS rev_c
        |  FROM orders),
        |f AS (
        |  SELECT o_custkey, mon, rev_c,
        |         min(mon) OVER (PARTITION BY o_custkey) AS first_mon
        |  FROM o),
        |a AS (
        |  SELECT mon,
        |         sum(CASE WHEN mon = first_mon THEN rev_c ELSE 0 END)
        |           ::BIGINT AS new_c,
        |         sum(CASE WHEN mon <> first_mon THEN rev_c ELSE 0 END)
        |           ::BIGINT AS ret_c
        |  FROM f GROUP BY 1)
        |SELECT mon, (new_c / 100.0)::DOUBLE AS new_revenue,
        |       (ret_c / 100.0)::DOUBLE AS returning_revenue,
        |       (new_c::HUGEINT * 1000000 // (new_c + ret_c)::HUGEINT)
        |         ::BIGINT AS new_share_ppm
        |FROM a ORDER BY mon""".stripMargin,


    // q241: identical per-user conditional minima, NULLS LAST rank,
    // nearest-rank median.
    "q241_activation_delay" ->
      """WITH pu AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'signup'
        |                  THEN epoch_us(ts) END) AS su_us,
        |         min(CASE WHEN event_type = 'purchase'
        |                  THEN epoch_us(ts) END) AS pu_us
        |  FROM events GROUP BY 1),
        |d AS (
        |  SELECT user_id,
        |         strftime(make_timestamp(su_us), '%Y-%m-%d') AS cohort,
        |         CASE WHEN pu_us >= su_us
        |              THEN (pu_us - su_us) // 1000000 END AS delay_s
        |  FROM pu WHERE su_us IS NOT NULL),
        |r AS (
        |  SELECT cohort, user_id, delay_s,
        |         row_number() OVER (PARTITION BY cohort
        |                            ORDER BY delay_s ASC NULLS LAST,
        |                                     user_id) AS rk,
        |         count(delay_s) OVER (PARTITION BY cohort) AS m
        |  FROM d)
        |SELECT cohort, count(*)::BIGINT AS n_users,
        |       count(delay_s)::BIGINT AS n_converted,
        |       (count(delay_s) * 1000 // count(*))::BIGINT
        |         AS conv_permille,
        |       min(CASE WHEN delay_s IS NOT NULL
        |                AND rk = (m + 1) // 2 THEN delay_s END)
        |         ::BIGINT AS median_delay_s
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,


    // q242: identical md5 split, literal-string grams, deduped train
    // side, per-(k, doc) max-hit collapse.
    "q242_contamination_ladder" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, ' '),
        |                     t -> length(t) > 0) AS toks,
        |         substr(md5(doc_id::VARCHAR), 1, 1) AS hx
        |  FROM documents),
        |ks AS (SELECT unnest([3, 5, 8]) AS k),
        |tg0 AS (
        |  SELECT doc_id, k,
        |         unnest(CASE WHEN length(toks) >= k THEN
        |           list_transform(range(1, length(toks) - k + 2),
        |             i -> array_to_string(list_slice(toks, i, i + k - 1),
        |                                  ' '))
        |           ELSE [] END) AS gram
        |  FROM docs CROSS JOIN ks WHERE hx IN ('0', '1')),
        |tg AS (SELECT DISTINCT doc_id, k, gram FROM tg0),
        |tr0 AS (
        |  SELECT k,
        |         unnest(CASE WHEN length(toks) >= k THEN
        |           list_transform(range(1, length(toks) - k + 2),
        |             i -> array_to_string(list_slice(toks, i, i + k - 1),
        |                                  ' '))
        |           ELSE [] END) AS gram
        |  FROM docs CROSS JOIN ks WHERE hx NOT IN ('0', '1')),
        |tr AS (SELECT DISTINCT k, gram FROM tr0),
        |hit AS (
        |  SELECT t.k, t.doc_id,
        |         max(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END)
        |           AS hit
        |  FROM tg t LEFT JOIN tr ON t.k = tr.k AND t.gram = tr.gram
        |  GROUP BY 1, 2)
        |SELECT k::BIGINT AS k, count(*)::BIGINT AS n_test_docs,
        |       sum(hit)::BIGINT AS n_contaminated,
        |       (sum(hit) * 1000 // count(*))::BIGINT AS rate_permille
        |FROM hit GROUP BY 1 ORDER BY 1""".stripMargin,


    // q243: identical day bits, popcount, weekend-mask intersection.
    "q243_activity_bitmask" ->
      """WITH m AS (
        |  SELECT user_id,
        |         bit_or(1::BIGINT << (date_part('day', ts)::INT - 1))
        |           AS mask
        |  FROM events GROUP BY 1),
        |c AS (
        |  SELECT bit_count(mask)::BIGINT AS active_days,
        |         CASE WHEN (mask & 202911840) = mask THEN 1 ELSE 0 END
        |           AS weekend_only
        |  FROM m)
        |SELECT active_days, count(*)::BIGINT AS n_users,
        |       sum(weekend_only)::BIGINT AS n_weekend_only
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,


    // q244: identical stacked key frequencies, ceil-index p99,
    // HUGEINT hot-key multiples.
    "q244_join_skew_audit" ->
      """WITH f AS (
        |  SELECT key_col, key, count(*)::BIGINT AS f
        |  FROM (
        |    SELECT 'lineitem.l_partkey' AS key_col,
        |           l_partkey::VARCHAR AS key FROM lineitem
        |    UNION ALL
        |    SELECT 'lineitem.l_suppkey', l_suppkey::VARCHAR
        |    FROM lineitem
        |    UNION ALL
        |    SELECT 'orders.o_custkey', o_custkey::VARCHAR FROM orders
        |    UNION ALL
        |    SELECT 'events.user_id', user_id::VARCHAR FROM events)
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT key_col, f,
        |         row_number() OVER (PARTITION BY key_col
        |                            ORDER BY f, key) AS rk,
        |         count(*) OVER (PARTITION BY key_col) AS nk
        |  FROM f),
        |a AS (
        |  SELECT key_col, sum(f)::BIGINT AS n_rows,
        |         max(nk)::BIGINT AS n_keys, max(f)::BIGINT AS max_freq,
        |         min(CASE WHEN rk = (nk * 99 + 99) // 100 THEN f END)
        |           ::BIGINT AS p99_freq
        |  FROM r GROUP BY 1)
        |SELECT key_col, n_rows, n_keys, max_freq, p99_freq,
        |       (max_freq::HUGEINT * 1000000 // n_rows::HUGEINT)::BIGINT
        |         AS max_share_ppm,
        |       (max_freq::HUGEINT * n_keys::HUGEINT * 1000
        |        // n_rows::HUGEINT)::BIGINT AS skew_x_permille
        |FROM a ORDER BY key_col""".stripMargin,


    // q245: identical global vocab ranks and single-pass cutoffs.
    "q245_oov_ladder" ->
      """WITH tok AS (
        |  SELECT source, token
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  WHERE length(token) > 0),
        |v AS (
        |  SELECT token, count(*)::BIGINT AS tc FROM tok GROUP BY 1),
        |vr AS (
        |  SELECT token,
        |         row_number() OVER (ORDER BY tc DESC, token) AS r
        |  FROM v),
        |sc AS (
        |  SELECT source, token, count(*)::BIGINT AS c
        |  FROM tok GROUP BY 1, 2),
        |a AS (
        |  SELECT source, sum(c)::BIGINT AS n_tokens,
        |         sum(CASE WHEN r > 5 THEN c ELSE 0 END)::BIGINT AS oov5,
        |         sum(CASE WHEN r > 15 THEN c ELSE 0 END)::BIGINT AS oov15,
        |         sum(CASE WHEN r > 25 THEN c ELSE 0 END)::BIGINT AS oov25
        |  FROM sc JOIN vr USING (token) GROUP BY 1)
        |SELECT source, n_tokens,
        |       (oov5 * 1000000 // n_tokens)::BIGINT AS oov_top5_ppm,
        |       (oov15 * 1000000 // n_tokens)::BIGINT AS oov_top15_ppm,
        |       (oov25 * 1000000 // n_tokens)::BIGINT AS oov_top25_ppm
        |FROM a ORDER BY source""".stripMargin,


    // q246: identical (part, month) grain, cumulative ppm bands,
    // exact-moment CV bands.
    "q246_abc_xyz_matrix" ->
      """WITH pm AS (
        |  SELECT l_partkey, strftime(o_orderdate, '%Y-%m') AS mon,
        |         sum(l_quantity::BIGINT)::BIGINT AS q_m,
        |         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |           ::BIGINT AS rev_m
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |pp AS (
        |  SELECT l_partkey, count(*)::BIGINT AS n_m,
        |         sum(q_m)::BIGINT AS sq, sum(q_m * q_m)::BIGINT AS sq2,
        |         sum(rev_m)::BIGINT AS rev_c
        |  FROM pm GROUP BY 1),
        |cl AS (
        |  SELECT l_partkey, n_m, sq, sq2, rev_c,
        |         sum(rev_c) OVER (ORDER BY rev_c DESC, l_partkey
        |                          ROWS UNBOUNDED PRECEDING) AS cum_c,
        |         sum(rev_c) OVER () AS tot_c
        |  FROM pp),
        |cls AS (
        |  SELECT rev_c, tot_c,
        |         CASE WHEN cum_c::HUGEINT * 1000000 // tot_c::HUGEINT
        |                   <= 800000 THEN 'A'
        |              WHEN cum_c::HUGEINT * 1000000 // tot_c::HUGEINT
        |                   <= 950000 THEN 'B'
        |              ELSE 'C' END AS abc,
        |         CASE WHEN n_m < 6 THEN 'S'
        |              WHEN sqrt((n_m * sq2 - sq * sq)::DOUBLE)
        |                   / sq::DOUBLE < 0.5 THEN 'X'
        |              WHEN sqrt((n_m * sq2 - sq * sq)::DOUBLE)
        |                   / sq::DOUBLE < 1.0 THEN 'Y'
        |              ELSE 'Z' END AS xyz
        |  FROM cl)
        |SELECT abc, xyz, count(*)::BIGINT AS n_parts,
        |       (sum(rev_c)::HUGEINT * 1000000 // max(tot_c)::HUGEINT)
        |         ::BIGINT AS rev_share_ppm
        |FROM cls GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // q247: identical two-level aggregate and ppm share.
    "q247_dup_cluster_sizes" ->
      """WITH g AS (
        |  SELECT count(*)::BIGINT AS sz FROM documents GROUP BY text),
        |d AS (
        |  SELECT sz, count(*)::BIGINT AS n_clusters,
        |         (sz * count(*))::BIGINT AS n_docs
        |  FROM g GROUP BY 1)
        |SELECT sz, n_clusters, n_docs,
        |       (n_docs::HUGEINT * 1000000
        |        // sum(n_docs) OVER ()::HUGEINT)::BIGINT
        |         AS doc_share_ppm
        |FROM d ORDER BY sz""".stripMargin,


    // q248: identical calendar-validated 7-day lag and ppm errors.
    "q248_seasonal_naive_mape" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |         sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::BIGINT
        |           AS v_c
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT event_type, d, v_c,
        |         lag(v_c, 7) OVER w AS f_c, lag(d, 7) OVER w AS f_d
        |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY d)),
        |s AS (
        |  SELECT event_type, d,
        |         (abs(v_c - f_c) * 1000000 // f_c)::BIGINT AS ape_ppm
        |  FROM l
        |  WHERE f_c IS NOT NULL AND f_c > 0
        |    AND date_diff('day', f_d, d) = 7),
        |r AS (
        |  SELECT event_type, ape_ppm,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY ape_ppm, d) AS rk,
        |         count(*) OVER (PARTITION BY event_type) AS m
        |  FROM s)
        |SELECT event_type, count(*)::BIGINT AS n_points,
        |       (sum(ape_ppm) // count(*))::BIGINT AS mean_ape_ppm,
        |       min(CASE WHEN rk = (m + 1) // 2 THEN ape_ppm END)
        |         ::BIGINT AS median_ape_ppm
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,


    // q249: same FD set, same two-level aggregates.
    "q249_functional_dependencies" ->
      """SELECT * FROM (
        |  SELECT 'nation->region' AS fd, count(*)::BIGINT AS n_keys,
        |         sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END)::BIGINT
        |           AS n_violating
        |  FROM (SELECT n_nationkey, count(DISTINCT n_regionkey) AS nb
        |        FROM nation GROUP BY 1)
        |  UNION ALL
        |  SELECT 'custkey->nationkey', count(*)::BIGINT,
        |         sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END)::BIGINT
        |  FROM (SELECT c_custkey, count(DISTINCT c_nationkey) AS nb
        |        FROM customer GROUP BY 1)
        |  UNION ALL
        |  SELECT 'custkey->orderstatus', count(*)::BIGINT,
        |         sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END)::BIGINT
        |  FROM (SELECT o_custkey, count(DISTINCT o_orderstatus) AS nb
        |        FROM orders GROUP BY 1)
        |  UNION ALL
        |  SELECT 'orderdate->priority', count(*)::BIGINT,
        |         sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END)::BIGINT
        |  FROM (SELECT o_orderdate, count(DISTINCT o_orderpriority) AS nb
        |        FROM orders GROUP BY 1)
        |  UNION ALL
        |  SELECT 'partkey->suppkey', count(*)::BIGINT,
        |         sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END)::BIGINT
        |  FROM (SELECT l_partkey, count(DISTINCT l_suppkey) AS nb
        |        FROM lineitem GROUP BY 1)
        |) ORDER BY fd""".stripMargin,


    // q250: identical integer cents classes and permille shares.
    "q250_round_number_bias" ->
      """WITH c AS (
        |  SELECT o_orderpriority,
        |         CASE WHEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |                   % 100 = 0 THEN 'a_00'
        |              WHEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |                   % 100 = 50 THEN 'b_50'
        |              WHEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |                   % 100 = 99 THEN 'c_99'
        |              ELSE 'd_other' END AS ending
        |  FROM orders),
        |g AS (
        |  SELECT o_orderpriority, ending, count(*)::BIGINT AS n_orders
        |  FROM c GROUP BY 1, 2)
        |SELECT o_orderpriority, ending, n_orders,
        |       (n_orders * 1000 //
        |        sum(n_orders) OVER (PARTITION BY o_orderpriority))
        |         ::BIGINT AS share_permille
        |FROM g ORDER BY o_orderpriority, ending""".stripMargin,


    // q251: identical HUGEINT moments, one IEEE division.
    "q251_effective_sample_size" ->
      """WITH a AS (
        |  SELECT source, count(*)::BIGINT AS n_docs,
        |         sum(n_chars::HUGEINT) AS sw,
        |         sum(n_chars::HUGEINT * n_chars::HUGEINT) AS sw2
        |  FROM documents GROUP BY 1)
        |SELECT source, n_docs,
        |       floor((sw * sw)::DOUBLE / sw2::DOUBLE * 10000 + 0.5)
        |         / 10000 AS ess,
        |       ((sw * sw * 1000000) // (sw2 * n_docs::HUGEINT))::BIGINT
        |         AS ess_ratio_ppm
        |FROM a WHERE sw2 > 0 ORDER BY source""".stripMargin,


    // q252: identical hex shard, permille shares, hot multiple.
    "q252_shard_balance" ->
      """WITH s AS (
        |  SELECT substr(md5(doc_id::VARCHAR), 1, 1) AS shard,
        |         count(*)::BIGINT AS n_docs,
        |         sum(n_chars::BIGINT)::BIGINT AS n_bytes
        |  FROM documents GROUP BY 1),
        |t AS (
        |  SELECT shard, n_docs, n_bytes,
        |         sum(n_docs) OVER () AS tot_docs,
        |         sum(n_bytes) OVER () AS tot_bytes
        |  FROM s)
        |SELECT shard, n_docs, n_bytes,
        |       (n_docs * 1000 // tot_docs)::BIGINT AS doc_share_permille,
        |       (n_bytes::HUGEINT * 1000 // tot_bytes::HUGEINT)::BIGINT
        |         AS byte_share_permille,
        |       (n_bytes::HUGEINT * 16000 // tot_bytes::HUGEINT)::BIGINT
        |         AS hot_x_permille
        |FROM t ORDER BY shard""".stripMargin,


    // q253: identical top-3 pick, bitmask collapse, cell counts.
    "q253_source_overlap_upset" ->
      """WITH d AS (
        |  SELECT source, md5(lower(trim(text))) AS fp FROM documents),
        |t3 AS (
        |  SELECT source AS src,
        |         row_number() OVER (ORDER BY count(*) DESC, source)
        |           AS rk
        |  FROM d GROUP BY source
        |  QUALIFY rk <= 3),
        |m AS (
        |  SELECT fp, bit_or(1::BIGINT << (rk::INT - 1)) AS mask
        |  FROM d JOIN t3 ON source = src
        |  GROUP BY 1)
        |SELECT mask, count(*)::BIGINT AS n_fingerprints
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,


    // q254: identical 1e-4 quantization (forced DOUBLE before the
    // floor on both engines), per-dim HUGEINT sums, same cosine.
    "q254_centroid_drift" ->
      """WITH e AS (
        |  SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
        |         unnest(embedding) AS x
        |  FROM embeddings),
        |q AS (
        |  SELECT label, dim,
        |         CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)
        |           AS qv
        |  FROM e),
        |ld AS (
        |  SELECT label, dim, sum(qv)::HUGEINT AS sq,
        |         count(*)::BIGINT AS c
        |  FROM q GROUP BY 1, 2),
        |g AS (
        |  SELECT label, dim, sq, c,
        |         sum(sq) OVER (PARTITION BY dim) AS gq
        |  FROM ld),
        |a AS (
        |  SELECT label, max(c)::BIGINT AS n_vecs,
        |         sum(sq * gq) AS dot, sum(sq * sq) AS a2,
        |         sum(gq * gq) AS b2
        |  FROM g GROUP BY 1)
        |SELECT label::BIGINT AS label, n_vecs,
        |       floor(dot::DOUBLE / (sqrt(a2::DOUBLE) * sqrt(b2::DOUBLE))
        |             * 10000 + 0.5) / 10000 AS cos_to_global
        |FROM a ORDER BY label""".stripMargin,


    // q255: identical demand ranks, (type, size) alternates, price
    // tie-break.
    "q255_substitution_candidates" ->
      """WITH p AS (
        |  SELECT p_partkey, p_brand, p_type, p_size,
        |         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
        |           AS price_c
        |  FROM part),
        |d AS (
        |  SELECT l_partkey, sum(l_quantity::BIGINT)::BIGINT AS qty
        |  FROM lineitem GROUP BY 1),
        |t AS (
        |  SELECT p.*, d.qty,
        |         row_number() OVER (ORDER BY d.qty DESC, p.p_partkey)
        |           AS rk
        |  FROM p JOIN d ON p_partkey = l_partkey
        |  QUALIFY rk <= 20),
        |alt AS (
        |  SELECT t.rk, t.p_partkey, t.qty, t.price_c,
        |         a.p_partkey AS alt_key, a.price_c AS alt_price_c,
        |         row_number() OVER (PARTITION BY t.p_partkey
        |                            ORDER BY a.price_c ASC NULLS LAST,
        |                                     a.p_partkey) AS ark
        |  FROM t LEFT JOIN p a
        |    ON t.p_type = a.p_type AND t.p_size = a.p_size
        |   AND t.p_brand <> a.p_brand)
        |SELECT rk::BIGINT AS demand_rank, p_partkey, qty,
        |       (price_c / 100.0)::DOUBLE AS price,
        |       alt_key AS alt_partkey,
        |       (alt_price_c / 100.0)::DOUBLE AS alt_price
        |FROM alt WHERE ark = 1
        |ORDER BY demand_rank""".stripMargin,


    // q256: identical sum-identity + distinct-count checks.
    "q256_linenumber_contiguity" ->
      """WITH o AS (
        |  SELECT l_orderkey, count(*)::BIGINT AS n,
        |         count(DISTINCT l_linenumber)::BIGINT AS nd,
        |         sum(l_linenumber::BIGINT)::BIGINT AS sln,
        |         max(l_linenumber::BIGINT)::BIGINT AS mx
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT CASE WHEN nd <> n THEN 'dup_linenumber'
        |              WHEN mx <> n THEN 'gap_or_offset'
        |              WHEN sln <> n * (n + 1) // 2 THEN 'gap_or_offset'
        |              ELSE 'contiguous' END AS status
        |  FROM o)
        |SELECT status, count(*)::BIGINT AS n_orders
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,


    // q257: identical sparse Σmin join and Σmax identity.
    "q257_weighted_jaccard_sources" ->
      """WITH c AS (
        |  SELECT source, token, count(*)::BIGINT AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  WHERE length(token) > 0
        |  GROUP BY 1, 2),
        |t AS (
        |  SELECT source, sum(c)::BIGINT AS tot FROM c GROUP BY 1),
        |i AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |         sum(least(a.c, b.c))::BIGINT AS smin
        |  FROM c a JOIN c b
        |    ON a.token = b.token AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b,
        |       floor(smin::DOUBLE / (ta.tot + tb.tot - smin)::DOUBLE
        |             * 10000 + 0.5) / 10000 AS wjaccard
        |FROM i
        |JOIN t ta ON ta.source = src_a
        |JOIN t tb ON tb.source = src_b
        |ORDER BY src_a, src_b""".stripMargin,


    // q258: identical in-row bigram expansion and exact counts.
    "q258_bigram_redundancy" ->
      """WITH d AS (
        |  SELECT source,
        |         list_filter(string_split(text, ' '),
        |                     t -> length(t) > 0) AS toks
        |  FROM documents),
        |g0 AS (
        |  SELECT source,
        |         unnest(CASE WHEN length(toks) >= 2 THEN
        |           list_transform(range(1, length(toks)),
        |             i -> toks[i] || ' ' || toks[i + 1])
        |           ELSE [] END) AS bg
        |  FROM d),
        |a AS (
        |  SELECT source, count(*)::BIGINT AS n_bigrams,
        |         count(DISTINCT bg)::BIGINT AS n_distinct
        |  FROM g0 GROUP BY 1)
        |SELECT source, n_bigrams, n_distinct,
        |       ((n_bigrams - n_distinct) * 1000000 // n_bigrams)::BIGINT
        |         AS redundancy_ppm
        |FROM a ORDER BY source""".stripMargin,


    // q259: identical integer cadence cross-multiplication ranking.
    "q259_overdue_customers" ->
      """WITH mx AS (SELECT max(o_orderdate) AS now_d FROM orders),
        |p AS (
        |  SELECT o_custkey, count(*)::BIGINT AS n_orders,
        |         min(o_orderdate) AS first_d, max(o_orderdate) AS last_d
        |  FROM orders GROUP BY 1),
        |e AS (
        |  SELECT o_custkey, n_orders,
        |         date_diff('day', last_d, now_d)::BIGINT AS since_d,
        |         date_diff('day', first_d, last_d)::BIGINT AS span_d
        |  FROM p CROSS JOIN mx
        |  WHERE n_orders >= 5),
        |s AS (
        |  SELECT o_custkey, n_orders, since_d,
        |         span_d // (n_orders - 1) AS mean_gap_d,
        |         (since_d * (n_orders - 1) * 1000) // span_d
        |           AS overdue_x_permille
        |  FROM e WHERE span_d > 0),
        |r AS (
        |  SELECT s.*, row_number() OVER (ORDER BY overdue_x_permille
        |                                 DESC, o_custkey) AS rk
        |  FROM s)
        |SELECT rk::BIGINT AS rank, o_custkey, n_orders, since_d,
        |       mean_gap_d::BIGINT AS mean_gap_d,
        |       overdue_x_permille::BIGINT AS overdue_x_permille
        |FROM r WHERE rk <= 20 ORDER BY rank""".stripMargin,


    // q260: identical derived-status rule and matrix.
    "q260_status_consistency" ->
      """WITH d AS (
        |  SELECT l_orderkey,
        |         CASE WHEN min(l_linestatus) = 'F'
        |                   AND max(l_linestatus) = 'F' THEN 'F'
        |              WHEN min(l_linestatus) = 'O'
        |                   AND max(l_linestatus) = 'O' THEN 'O'
        |              ELSE 'P' END AS derived
        |  FROM lineitem GROUP BY 1)
        |SELECT o_orderstatus, derived, count(*)::BIGINT AS n_orders,
        |       (CASE WHEN o_orderstatus = derived THEN 1 ELSE 0 END)
        |         ::BIGINT AS is_match
        |FROM orders JOIN d ON o_orderkey = l_orderkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // q261: identical ceil-index cuts and clamp identity.
    "q261_winsorization_preview" ->
      """WITH v AS (
        |  SELECT event_type,
        |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
        |         event_id
        |  FROM events),
        |r AS (
        |  SELECT event_type, v,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY v, event_id) AS rk,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM v),
        |c AS (
        |  SELECT event_type, v, n,
        |         min(CASE WHEN rk = (n + 99) // 100 THEN v END)
        |           OVER (PARTITION BY event_type) AS p01,
        |         min(CASE WHEN rk = (n * 99 + 99) // 100 THEN v END)
        |           OVER (PARTITION BY event_type) AS p99
        |  FROM r)
        |SELECT event_type, max(n)::BIGINT AS n_events,
        |       max(p01)::BIGINT AS p01_cents,
        |       max(p99)::BIGINT AS p99_cents,
        |       sum(CASE WHEN v < p01 THEN 1 ELSE 0 END)::BIGINT
        |         AS n_below,
        |       sum(CASE WHEN v > p99 THEN 1 ELSE 0 END)::BIGINT
        |         AS n_above,
        |       (abs(sum(v) - sum(greatest(least(v, p99), p01)))
        |        * 1000000 // sum(v))::BIGINT AS moved_mass_ppm
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,


    // q262: identical sorted fold plus the zero-hour correction term
    // appended AFTER the fold in the same order.
    "q262_hour_uniformity" ->
      """WITH h AS (
        |  SELECT event_type, date_part('hour', ts)::INT AS hr,
        |         count(*)::BIGINT AS o
        |  FROM events GROUP BY 1, 2),
        |a AS (
        |  SELECT event_type, sum(o)::BIGINT AS n,
        |         count(*)::BIGINT AS n_hours,
        |         list_sort(list(o::DOUBLE)) AS cs
        |  FROM h GROUP BY 1)
        |SELECT event_type, n, n_hours,
        |       floor((list_reduce(list_prepend(0.0, cs), (acc, x) ->
        |                acc + pow(x - n::DOUBLE / 24.0, 2.0)
        |                      / (n::DOUBLE / 24.0))
        |              + (24 - n_hours)::DOUBLE * (n::DOUBLE / 24.0))
        |             * 10000 + 0.5) / 10000 AS chi2
        |FROM a ORDER BY event_type""".stripMargin,


    // q263: identical first-seen cohorts and integer half crossing.
    "q263_retention_half_life" ->
      """WITH f AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_d
        |  FROM events GROUP BY 1),
        |act AS (
        |  SELECT DISTINCT e.user_id, f.cohort_d,
        |         date_diff('day', f.cohort_d, CAST(e.ts AS DATE))
        |           ::BIGINT AS off
        |  FROM events e JOIN f ON e.user_id = f.user_id),
        |c AS (
        |  SELECT cohort_d, off, count(DISTINCT user_id)::BIGINT
        |           AS active
        |  FROM act GROUP BY 1, 2),
        |s AS (
        |  SELECT cohort_d, off, active,
        |         max(CASE WHEN off = 0 THEN active END)
        |           OVER (PARTITION BY cohort_d) AS cohort_size
        |  FROM c)
        |SELECT strftime(cohort_d, '%Y-%m-%d') AS cohort,
        |       max(cohort_size)::BIGINT AS cohort_size,
        |       min(CASE WHEN active * 2 < cohort_size THEN off END)
        |         ::BIGINT AS half_life_days
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,


    // q264: identical quadrant classes and calendar-validated churn
    // identity.
    "q264_growth_accounting" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |cl AS (
        |  SELECT d,
        |         CASE WHEN prev IS NULL THEN 'new'
        |              WHEN date_diff('day', prev, d) = 1 THEN 'retained'
        |              ELSE 'resurrected' END AS cls
        |  FROM (SELECT d, lag(d) OVER (PARTITION BY user_id
        |                               ORDER BY d) AS prev
        |        FROM act)),
        |g AS (
        |  SELECT d, count(*)::BIGINT AS n_active,
        |         sum(CASE WHEN cls = 'new' THEN 1 ELSE 0 END)::BIGINT
        |           AS n_new,
        |         sum(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END)
        |           ::BIGINT AS n_retained,
        |         sum(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END)
        |           ::BIGINT AS n_resurrected
        |  FROM cl GROUP BY 1)
        |SELECT strftime(d, '%Y-%m-%d') AS day, n_active, n_new,
        |       n_retained, n_resurrected,
        |       (COALESCE(CASE WHEN date_diff('day',
        |                        lag(d) OVER (ORDER BY d), d) = 1
        |                 THEN lag(n_active) OVER (ORDER BY d) END, 0)
        |        - n_retained)::BIGINT AS n_churned
        |FROM g ORDER BY day""".stripMargin,
  )
}
