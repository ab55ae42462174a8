package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{AsOfJoin, Dedup, EntityResolution, GraphOps, Multimodal, PriceAlerts, Relational, Similarity, Sketches, TextAnalysis, TimeSeries}
import graft.QueryHelpers._

/** Inline analytics, q265-q299: conformance-tier statistics over the TPC-H schema.
  *
  * Registry split out of SparkEntry (round 9): the maps below are
  * merged back into `SparkEntry.queries` / `SparkEntry.oracleSql`,
  * so names, semantics, and the DuckDB-oracle pairing are unchanged.
  */
object StatsQueriesD {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Token-rank drift: the top-15 tokens of the corpus' first half
    // (by doc_id) against their rank in the second half — entered /
    // left / moved, with the permille frequency both sides. The
    // vocabulary-drift readout between two snapshots; both rankings
    // run over |vocab| aggregates off one scan each half (FULL outer
    // join keeps tokens that vanished). A top-15 token's OTHER-half
    // rank can sit anywhere in that vocabulary, so the full rank
    // vector is needed as VALUES — ScaleOps.distributedRank (range
    // shuffle + partition offsets) supplies it without a
    // single-partition window; each half's token total is one
    // broadcast 1-row aggregate.
    "q265_token_rank_drift" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val mid = docs.agg(expr("(min(doc_id) + max(doc_id)) div 2")
        .as("mid"))
      def ranked(half: org.apache.spark.sql.DataFrame,
                 pfx: String) = {
        val counts = half
          .select(explode(split(col("text"), " ")).as("token"))
          .filter(length(col("token")) > 0)
          .groupBy(col("token"))
          .agg(count(lit(1)).as(s"${pfx}_n"))
        val rk = graft.operators.ScaleOps.distributedRank(counts,
          Seq(col(s"${pfx}_n").desc, col("token")), s"${pfx}_rank")
        // total reads the ranked frame: shuffle files already
        // materialized, so the 1-row aggregate rides stage reuse
        rk.crossJoin(broadcast(
          rk.agg(sum(col(s"${pfx}_n")).as(s"${pfx}_tot"))))
      }
      val a = ranked(docs.crossJoin(broadcast(mid))
        .filter(col("doc_id") <= col("mid")), "h1")
      val b = ranked(docs.crossJoin(broadcast(mid))
        .filter(col("doc_id") > col("mid")), "h2")
        .withColumnRenamed("token", "token_b")
      a.join(b, col("token") === col("token_b"), "full_outer")
        .filter(col("h1_rank") <= 15 || col("h2_rank") <= 15)
        .select(coalesce(col("token"), col("token_b")).as("token"),
          col("h1_rank"), col("h2_rank"),
          expr("coalesce(h1_n, 0L) * 1000L div h1_tot")
            .as("h1_permille"),
          expr("coalesce(h2_n, 0L) * 1000L div h2_tot")
            .as("h2_permille"))
        .orderBy(coalesce(col("h1_rank"), lit(999)).asc,
          col("token").asc)
    }),


    // Two-sample Q-Q table: 1996 vs 1997 order-total deciles side by
    // side with the ppm ratio — the distribution-shift readout a
    // mean hides (chi² says "different"; the Q-Q table says WHERE).
    // Exact nearest-rank boundaries via ScaleOps.groupedRank — the
    // pre-r11 year-partitioned rank window pushed each year's WHOLE
    // order frame through one task (2 schema-bounded partitions over
    // fact-grain rows, the hidden twin of the unpartitioned class);
    // now one range-shuffled global rank + a 2-row offset broadcast.
    "q266_qq_deciles" -> ((s, dir) => {
      val ranked = graft.operators.ScaleOps.groupedRank(
        Tables.orders(s, dir)
          .filter(year(col("o_orderdate")).isin(1996, 1997))
          .select(year(col("o_orderdate")).as("yr"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
              .as("v"), col("o_orderkey")),
        Seq("yr"), Seq(col("v").asc, col("o_orderkey").asc),
        rankCol = "rk", countCol = "n")
      val cuts = ranked
        .select(col("yr"), col("rk"), col("n"), col("v"),
          explode(expr("sequence(1, 9)")).as("dec"))
        .filter(col("rk") ===
          ((col("n") * col("dec") + 9) / lit(10)).cast("long"))
        .groupBy(col("dec"))
        .agg(min(when(col("yr") === 1996, col("v"))).as("v96"),
          min(when(col("yr") === 1997, col("v"))).as("v97"))
      cuts
        .select(col("dec").cast("long").as("decile"),
          (col("v96") / 100.0).as("p1996"),
          (col("v97") / 100.0).as("p1997"),
          expr("cast(v97 as decimal(38,0)) * 1000000" +
            " div cast(v96 as decimal(38,0))").as("ratio_ppm"))
        .orderBy("decile")
    }),


    // Hash-sample calibration: per-nation revenue estimated from the
    // deterministic 1/16 md5(orderkey) sample (×16 scale-up) against
    // the full aggregate, with the signed error in ppm — certifying
    // the cheap-estimate path a 100 TB profiler would use before
    // committing to a full scan. ONE scan: the sample rides a
    // conditional sum next to the full sum.
    "q267_sample_calibration" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val inSample =
        substring(md5(col("o_orderkey").cast("string")), 1, 1) === "0"
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("n_nationkey") === col("c_nationkey"))
        .select(col("n_name"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
            .as("rev_c"),
          when(inSample, 1L).otherwise(0L).as("s"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("s")).as("n_sampled"),
          sum(col("rev_c")).as("full_c"),
          sum(col("rev_c") * col("s")).as("samp_c"))
        .select(col("n_name"), col("n_orders"), col("n_sampled"),
          (col("full_c") / 100.0).as("full_revenue"),
          (col("samp_c") * 16 / 100.0).as("est_revenue"),
          expr(s"(cast(samp_c as $dec) * 16 - full_c) * 1000000" +
            s" div cast(full_c as $dec)").as("err_ppm"))
        .orderBy("n_name")
    }),


    // Cross-feed freshness audit: each time-bearing feed's newest
    // record against the snapshot's global high-water mark, with the
    // staleness in days — the "is one upstream stuck" check run
    // before every incremental load. Three 1-row min/max aggregates,
    // no joins wider than the 3-row union.
    "q268_freshness_audit" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      def feed(df: org.apache.spark.sql.DataFrame, c: String,
               name: String) =
        df.agg(max(to_date(col(c))).as("max_d"),
          min(to_date(col(c))).as("min_d"))
          .select(lit(name).as("feed"), col("min_d"), col("max_d"))
      val feeds = feed(Tables.orders(s, dir), "o_orderdate", "orders")
        .unionAll(feed(Tables.lineitem(s, dir), "l_shipdate",
          "lineitem_shipments"))
        .unionAll(feed(Tables.events(s, dir), "ts", "events"))
      feeds
        .withColumn("hwm", max(col("max_d")).over(Window.partitionBy()))
        .select(col("feed"),
          date_format(col("min_d"), "yyyy-MM-dd").as("oldest"),
          date_format(col("max_d"), "yyyy-MM-dd").as("newest"),
          datediff(col("hwm"), col("max_d")).cast("long")
            .as("staleness_days"))
        .orderBy("feed")
    }),


    // Mann-Whitney rank-sum comparison of order values, URGENT vs
    // 5-LOW — the nonparametric "is one distribution shifted" test
    // that ignores outliers a t-test would chase. Ranks are MIDRANKS
    // computed from value-grain cumulative counts (midrank·2 =
    // 2·cum − t + 1, exact half-integers carried as doubles), so U and
    // its null mean are half-integer doubles and the variance carries
    // the standard tie correction Σ(t³−t)/(n(n−1)); the z-score is one
    // IEEE sqrt. One orders scan.
    "q269_rank_sum_test" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dec = "decimal(38,0)"
      // Mann–Whitney needs only value-ordered cumulative counts, never
      // per-row ranks: aggregate the fact rows to (value → total count t,
      // group-1 count c1), then rank the DISTINCT-VALUE frame (bounded by
      // the cent-price domain, not the row count — the only unpartitioned
      // window runs over that bounded frame). Midranks are exact from the
      // cumulative count: midrank·2 = 2·cum − t + 1, all integer; the
      // variance carries the standard tie correction Σ(t³−t)/(n(n−1)).
      val vg = Tables.orders(s, dir)
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(col("o_orderpriority").as("grp"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
            .as("v"))
        .groupBy(col("v"))
        .agg(count(lit(1)).as("t"),
          sum(when(col("grp") === "1-URGENT", 1L).otherwise(0L))
            .as("c1"))
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


    // Singleton-tail sparsity report: per entity axis, how much of
    // the keyspace is single-occurrence — the long-tail readout that
    // decides whether per-key state (joins, personalization, GDPR
    // erasure) is worth its overhead. One aggregate per axis over
    // its own table; permille exact.
    "q270_singleton_tail" -> ((s, dir) => {
      def axis(freq: org.apache.spark.sql.DataFrame, name: String) =
        freq.agg(count(lit(1)).as("n_keys"),
          sum(when(col("f") === 1L, 1L).otherwise(0L))
            .as("n_singletons"))
          .select(lit(name).as("axis"), col("n_keys"),
            col("n_singletons"),
            expr("n_singletons * 1000L div n_keys")
              .as("singleton_permille"))
      axis(Tables.orders(s, dir).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("f")), "customer_orders")
        .unionAll(axis(Tables.lineitem(s, dir).groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("f")), "part_lines"))
        .unionAll(axis(Tables.events(s, dir).groupBy(col("user_id"))
          .agg(count(lit(1)).as("f")), "user_events"))
        .unionAll(axis(Tables.documents(s, dir).groupBy(col("source"))
          .agg(count(lit(1)).as("f")), "source_docs"))
        .orderBy("axis")
    }),


    // Wald–Wolfowitz runs test on daily-revenue direction: is the
    // up/down sequence random, trending (too few runs) or
    // oscillating (too many)? Signs are exact integer compares, the
    // run count one island aggregate, expectation 2·n₁·n₂/(n₁+n₂)+1
    // and its variance exact rationals until one sqrt. Flat days
    // (exact ties) are excluded, counted in the report.
    "q271_runs_test" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wd = Window.orderBy(col("d"))
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").as("d"))
        .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5))
          .cast("long")).as("rev"))
        .withColumn("prev", lag(col("rev"), 1).over(wd))
        .filter(col("prev").isNotNull)
        .select(col("d"),
          when(col("rev") > col("prev"), 1L)
            .when(col("rev") < col("prev"), -1L)
            .otherwise(0L).as("sgn"))
      val moves = daily.filter(col("sgn") =!= 0L)
        .withColumn("prev_sgn", lag(col("sgn"), 1).over(wd))
        .withColumn("newrun",
          when(col("prev_sgn").isNull ||
            col("sgn") =!= col("prev_sgn"), 1L).otherwise(0L))
      moves.agg(
        sum(when(col("sgn") === 1L, 1L).otherwise(0L)).as("n_up"),
        sum(when(col("sgn") === -1L, 1L).otherwise(0L)).as("n_down"),
        sum(col("newrun")).as("n_runs"))
        .select(col("n_up"), col("n_down"), col("n_runs"),
          r4(lit(1.0) + (col("n_up") * col("n_down") * 2).cast("double")
            / (col("n_up") + col("n_down")).cast("double"))
            .as("expected_runs"),
          r4((col("n_runs").cast("double") -
            (lit(1.0) + (col("n_up") * col("n_down") * 2).cast("double")
              / (col("n_up") + col("n_down")).cast("double"))) /
            sqrt((col("n_up") * col("n_down") * 2).cast("double") *
              ((col("n_up") * col("n_down") * 2).cast("double") -
                (col("n_up") + col("n_down")).cast("double")) /
              ((col("n_up") + col("n_down")).cast("double") *
                (col("n_up") + col("n_down")).cast("double") *
                ((col("n_up") + col("n_down")).cast("double") - 1.0))))
            .as("z"))
    }),


    // Exact total-variation distance between source token
    // distributions: ½·Σ|pₐ−p_b| rewritten as Σ|cₐ·t_b − c_b·tₐ| over
    // 2·tₐ·t_b so the whole sum is exact decimal integers and only
    // the final division is IEEE — a true bounded [0,1] metric,
    // unlike q218's cosine or KL. Mass a side lacks enters via a
    // closed-form complement, so only co-occurring tokens ever join;
    // pair grain bounded by |sources|².
    "q272_tv_distance" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val counts = Tables.documents(s, dir)
        .select(col("source"),
          explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy(col("source"), col("token"))
        .agg(count(lit(1)).as("c"))
      val totals = counts.groupBy(col("source"))
        .agg(sum(col("c")).as("tot"))
      val a = counts.join(totals, "source")
        .select(col("source").as("src_a"), col("token"),
          col("c").as("ca"), col("tot").as("ta"))
      val b = counts.join(totals, "source")
        .select(col("source").as("src_b"), col("token").as("token_b"),
          col("c").as("cb"), col("tot").as("tb"))
      // union-of-tokens mass via the identity
      //   Σ_union |ca·tb − cb·ta| = Σ_common |ca·tb − cb·ta|
      //     + (ta − Σ_common ca)·tb + (tb − Σ_common cb)·ta
      // so the COMMON-token equi-join alone suffices — no outer join,
      // no dense token×pair frame.
      val common = a.join(b,
        col("token") === col("token_b") && col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"), col("ta"), col("tb"))
        .agg(
          sum(abs(col("ca").cast(dec) * col("tb") -
            col("cb").cast(dec) * col("ta"))).as("s_common"),
          sum(col("ca")).as("ca_common"),
          sum(col("cb")).as("cb_common"))
      common
        .select(col("src_a"), col("src_b"),
          r4(((col("s_common") +
            (col("ta") - col("ca_common")).cast(dec) * col("tb") +
            (col("tb") - col("cb_common")).cast(dec) * col("ta"))
            .cast("double")) /
            ((col("ta").cast(dec) * col("tb")).cast("double") * 2.0))
            .as("tv_distance"))
        .orderBy("src_a", "src_b")
    }),


    // Bounce rate by session ENTRY event type: of sessions that open
    // with X, how many end after that single event — the
    // landing-quality readout. Reuses the 30-minute exact-µs
    // sessionization; the entry event is the rank-1 row of each
    // session, bounce = depth 1; permille exact.
    "q273_bounce_by_entry" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val sess = Tables.events(s, dir)
        .withColumn("brk",
          when(unix_micros(col("ts")) -
            unix_micros(lag(col("ts"), 1).over(w)) <= 1800000000L, 0L)
            .otherwise(1L))
        .withColumn("sess_id", sum(col("brk")).over(w))
      val wS = Window.partitionBy(col("user_id"), col("sess_id"))
      sess
        .withColumn("rk", row_number().over(
          wS.orderBy(col("ts"), col("event_id"))))
        .withColumn("depth", count(lit(1)).over(wS))
        .filter(col("rk") === 1)
        .groupBy(col("event_type").as("entry_type"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("depth") === 1L, 1L).otherwise(0L))
            .as("n_bounces"))
        .select(col("entry_type"), col("n_sessions"), col("n_bounces"),
          expr("n_bounces * 1000L div n_sessions")
            .as("bounce_permille"))
        .orderBy("entry_type")
    }),


    // 2-D density of order value × basket width: the joint histogram
    // over (bit-length of total cents, lines-per-order) cells — the
    // shape readout a pair of 1-D histograms hides (are big orders
    // big because of MANY lines or EXPENSIVE lines?). Pure integer
    // bucketing (q219's libm-free log2), cells bounded by
    // construction (~40 bits × ~7 line counts).
    "q274_value_width_density" -> ((s, dir) => {
      val width = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_lines"))
      Tables.orders(s, dir)
        .join(width, col("o_orderkey") === col("l_orderkey"))
        .select(
          length(bin(floor(col("o_totalprice") * 100 + lit(0.5))
            .cast("long"))).cast("long").as("value_bits"),
          col("n_lines"))
        .groupBy(col("value_bits"), col("n_lines"))
        .agg(count(lit(1)).as("n_orders"))
        .withColumn("share_ppm", expr(
          "n_orders * 1000000L div sum(n_orders) over ()"))
        .orderBy("value_bits", "n_lines")
    }),


    // Supply-base risk profile: the distribution of distinct
    // suppliers per part, with each band's share of parts AND of
    // revenue — single-sourced revenue is the concentration risk
    // number. One fact scan carries both the supplier set size and
    // the revenue; bands roll over the |parts| aggregate.
    "q275_supply_risk" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val perPart = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
          sum((floor(col("l_extendedprice") * 100 + lit(0.5))
            .cast("long") *
            (lit(100L) - floor(col("l_discount") * 100 + lit(0.5))
              .cast("long")))).as("rev_u"))
      perPart
        .groupBy(col("n_suppliers"))
        .agg(count(lit(1)).as("n_parts"), sum(col("rev_u")).as("rev"))
        .withColumn("part_share_permille", expr(
          "n_parts * 1000L div sum(n_parts) over ()"))
        .withColumn("rev_share_permille", expr(
          "cast(rev as decimal(38,0)) * 1000" +
            " div cast(sum(rev) over () as decimal(38,0))"))
        .select(col("n_suppliers"), col("n_parts"),
          col("part_share_permille"), col("rev_share_permille"))
        .orderBy("n_suppliers")
    }),


    // Event-type affinity matrix: Jaccard of the USER SETS of each
    // type pair — do the people who do X also do Y? Intersections
    // ride one self-join of the distinct (user, type) frame; union
    // sizes come from |A|+|B|−|A∩B|, so no outer join and no
    // user-level pair rows beyond co-occurrence.
    "q276_type_affinity" -> ((s, dir) => {
      val ut = Tables.events(s, dir)
        .select(col("user_id"), col("event_type")).distinct()
      val sizes = ut.groupBy(col("event_type"))
        .agg(count(lit(1)).as("nu"))
      val inter = ut.select(col("user_id"), col("event_type").as("ta"))
        .join(ut.select(col("user_id").as("uid_b"),
          col("event_type").as("tb")),
          col("user_id") === col("uid_b") && col("ta") < col("tb"))
        .groupBy(col("ta"), col("tb"))
        .agg(count(lit(1)).as("n_both"))
      inter
        .join(sizes.select(col("event_type").as("ta"),
          col("nu").as("na")), "ta")
        .join(sizes.select(col("event_type").as("tb"),
          col("nu").as("nb")), "tb")
        .select(col("ta").as("type_a"), col("tb").as("type_b"),
          col("n_both"),
          r4(col("n_both").cast("double") /
            (col("na") + col("nb") - col("n_both")).cast("double"))
            .as("user_jaccard"))
        .orderBy("type_a", "type_b")
    }),


    // Price-drift leaderboard: the 20 parts whose unit price moved
    // most between their FIRST and LAST sale (signed ppm drift,
    // exact integer unit prices, first/last picked by ship date with
    // a line tie-break via one part-keyed window pass each way).
    "q277_price_drift" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dec = "decimal(38,0)"
      val unit = Tables.lineitem(s, dir)
        .select(col("l_partkey"),
          expr("(cast(floor(l_extendedprice * 100 + 0.5) as bigint)" +
            " * 100) div cast(l_quantity as bigint)").as("u"),
          col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      val w = Window.partitionBy(col("l_partkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"))
      val wAll = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      unit
        .withColumn("rk", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("l_partkey"))))
        .withColumn("first_u", first(col("u")).over(wAll))
        .withColumn("last_u", last(col("u")).over(wAll))
        .filter(col("rk") === 1 && col("n") >= 5L && col("first_u") > 0L)
        .select(col("l_partkey"), col("n").as("n_sales"),
          (col("first_u") / 10000.0).as("first_price"),
          (col("last_u") / 10000.0).as("last_price"),
          expr(s"cast(last_u - first_u as $dec) * 1000000" +
            s" div cast(first_u as $dec)").as("drift_ppm"))
        .orderBy(abs(col("drift_ppm")).desc, col("l_partkey"))
        .limit(20)
        .withColumn("rk2", row_number().over(Window.orderBy(
          abs(col("drift_ppm")).desc, col("l_partkey"))))
        .select(col("rk2").cast("long").as("rank"), col("l_partkey"),
          col("n_sales"), col("first_price"), col("last_price"),
          col("drift_ppm"))
        .orderBy("rank")
    }),


    // Int8-quantization error audit per label: the cosine between
    // each vector and its symmetric-max-abs int8 reconstruction,
    // quantized to exact ppm integers PER ROW (index-ordered in-row
    // folds are deterministic; averaging raw doubles across rows is
    // not) — the "is int8 good enough for this corpus" readout
    // behind q47's quantizer. The scale cancels, so the cosine
    // compares float components against their integer codes
    // directly.
    "q278_quantization_error" -> ((s, dir) => {
      val qexpr = expr(
        """aggregate(embedding, named_struct(
          |    'dot', cast(0.0 as double), 'a2', cast(0.0 as double),
          |    'b2', cast(0.0 as double),
          |    'mx', aggregate(embedding, cast(0.0 as double),
          |            (m, y) -> greatest(m, abs(cast(y as double))))),
          |  (acc, x) -> named_struct(
          |    'dot', acc.dot + cast(x as double) *
          |      cast(floor(cast(x as double) / acc.mx * 127.0 + 0.5)
          |           as double),
          |    'a2', acc.a2 + cast(x as double) * cast(x as double),
          |    'b2', acc.b2 +
          |      cast(floor(cast(x as double) / acc.mx * 127.0 + 0.5)
          |           as double) *
          |      cast(floor(cast(x as double) / acc.mx * 127.0 + 0.5)
          |           as double),
          |    'mx', acc.mx),
          |  acc -> CASE WHEN acc.a2 > 0.0 AND acc.b2 > 0.0 THEN
          |    cast(floor(acc.dot / (sqrt(acc.a2) * sqrt(acc.b2))
          |               * 1000000 + 0.5) as bigint) ELSE 0L END)
          |""".stripMargin)
      Tables.embeddings(s, dir)
        .select(col("label"), qexpr.as("cos_ppm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          expr("sum(cos_ppm) div count(1)").as("mean_cos_ppm"),
          min(col("cos_ppm")).as("min_cos_ppm"))
        .select(col("label").cast("long").as("label"), col("n_vecs"),
          col("mean_cos_ppm"), col("min_cos_ppm"))
        .orderBy("label")
    }),


    // K-fold assignment balance audit: md5(doc_id) mod 5 folds —
    // fold sizes, each fold's share, and the worst per-language
    // deviation from the language's corpus share (the "is fold 3
    // accidentally all-French" check run before cross-validation).
    // Exact integer shares; deviations cross-multiplied.
    "q279_kfold_balance" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val folded = Tables.documents(s, dir)
        .select(col("lang"),
          (conv(substring(md5(col("doc_id").cast("string")), 1, 4),
            16, 10).cast("long") % 5).as("fold"))
      val cell = folded.groupBy(col("fold"), col("lang"))
        .agg(count(lit(1)).as("c"))
      cell
        .withColumn("fold_n", sum(col("c")).over(
          Window.partitionBy(col("fold"))))
        .withColumn("lang_n", sum(col("c")).over(
          Window.partitionBy(col("lang"))))
        .withColumn("tot", sum(col("c")).over(Window.partitionBy()))
        // |c/fold_n − lang_n/tot| in ppm via cross-multiplication
        .select(col("fold"), col("fold_n"),
          expr("abs(c * tot - lang_n * fold_n) * 1000000L" +
            " div (fold_n * tot)").as("dev_ppm"))
        .groupBy(col("fold"))
        .agg(max(col("fold_n")).as("n_docs"),
          max(col("dev_ppm")).as("worst_lang_dev_ppm"))
        .orderBy("fold")
    }),


    // Distinctive terms per language: the 5 tokens most
    // over-represented vs the rest of the corpus, ranked by the
    // exact cross-multiplied rate ratio (c_in·t_out vs c_out·t_in —
    // no logs, no division until the reported r4 ratio), minimum
    // support 5. The keyness extraction behind corpus cards.
    "q280_distinctive_terms" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tok = Tables.documents(s, dir)
        .select(col("lang"),
          explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) > 0)
      val cell = tok.groupBy(col("lang"), col("token"))
        .agg(count(lit(1)).as("c_in"))
      val tokTot = tok.groupBy(col("token"))
        .agg(count(lit(1)).as("c_all"))
      val langTot = tok.groupBy(col("lang"))
        .agg(count(lit(1)).as("t_in"))
      val tot = tok.agg(count(lit(1)).as("t_all"))
      val scored = cell
        .join(tokTot, "token")
        .join(langTot, "lang")
        .crossJoin(broadcast(tot))
        .filter(col("c_in") >= 5L)
        .select(col("lang"), col("token"), col("c_in"),
          (col("c_all") - col("c_in")).as("c_out"),
          (col("t_all") - col("t_in")).as("t_out"), col("t_in"))
        // ratio = (c_in/t_in) / ((c_out+1)/t_out); +1 smooths zero
        .select(col("lang"), col("token"), col("c_in"),
          r4((col("c_in") * col("t_out")).cast("double") /
            ((col("c_out") + 1) * col("t_in")).cast("double"))
            .as("keyness"))
      scored
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(col("keyness").desc, col("token"))))
        .filter(col("rk") <= 5)
        .select(col("lang"), col("rk").cast("long").as("rank"),
          col("token"), col("c_in"), col("keyness"))
        .orderBy("lang", "rank")
    }),


    // Market-segment revenue mix shift 1996→1997: each segment's
    // revenue share both years plus the SIGNED share delta in ppm —
    // mix-shift is the composition question a totals comparison
    // hides (total can grow while a segment collapses). One orders
    // scan with year-conditional sums; shares in exact decimal ppm.
    "q281_segment_mix_shift" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dec = "decimal(38,0)"
      Tables.orders(s, dir)
        .filter(year(col("o_orderdate")).isin(1996, 1997))
        .join(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          sum(when(year(col("o_orderdate")) === 1996,
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
            .otherwise(0L)).as("r96"),
          sum(when(year(col("o_orderdate")) === 1997,
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
            .otherwise(0L)).as("r97"))
        .withColumn("t96", sum(col("r96")).over(Window.partitionBy()))
        .withColumn("t97", sum(col("r97")).over(Window.partitionBy()))
        .select(col("c_mktsegment"),
          expr(s"cast(r96 as $dec) * 1000000 div cast(t96 as $dec)")
            .as("share96_ppm"),
          expr(s"cast(r97 as $dec) * 1000000 div cast(t97 as $dec)")
            .as("share97_ppm"))
        .withColumn("shift_ppm", col("share97_ppm") - col("share96_ppm"))
        .orderBy("c_mktsegment")
    }),


    // Customer equity quadrants per segment: median-split on balance
    // (asset) × total spend (activity) — HIGH/HIGH is the core book,
    // LOW/HIGH the credit risk, HIGH/LOW the upsell pool. Medians
    // are exact nearest-rank picks off ScaleOps.distributedRank
    // (range shuffle + partition offsets; spend sums are near-unique,
    // so the value-grain cumulative trick would degenerate) — two
    // 1-row broadcasts, no single-partition window. The quadrant is
    // two integer compares.
    "q282_equity_quadrants" -> ((s, dir) => {
      import graft.operators.ScaleOps.distributedRank
      val per = Tables.customer(s, dir)
        .join(Tables.orders(s, dir)
          .groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5))
            .cast("long")).as("spend_c")),
          col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_mktsegment"),
          floor(col("c_acctbal") * 100 + lit(0.5)).cast("long")
            .as("bal_c"), col("spend_c"))
      def medianOf(valCol: String): org.apache.spark.sql.DataFrame = {
        val r = distributedRank(
          per.select(col(valCol), col("c_custkey")),
          Seq(col(valCol), col("c_custkey")), "mrk")
        val n = r.agg(count(lit(1)).as("n"))
        r.crossJoin(broadcast(n))
          .filter(col("mrk") === ((col("n") + 1) / lit(2)).cast("long"))
          .select(col(valCol).as("med_" + valCol.take(1)))
      }
      val ranked = per
        .crossJoin(broadcast(medianOf("bal_c")))
        .crossJoin(broadcast(medianOf("spend_c")))
      ranked
        .select(col("c_mktsegment"),
          concat(
            when(col("bal_c") > col("med_b"), "hi_bal")
              .otherwise("lo_bal"),
            lit("/"),
            when(col("spend_c") > col("med_s"), "hi_spend")
              .otherwise("lo_spend")).as("quadrant"))
        .groupBy(col("c_mktsegment"), col("quadrant"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment", "quadrant")
    }),


    // Catalog name↔type consistency: does a part's name share a
    // token with its declared type? The schema-drift check for
    // denormalized text attributes; pure in-row set intersection,
    // rolled to a permille per brand.
    "q283_name_type_consistency" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(col("p_brand"),
          when(expr(
            "size(array_intersect(split(lower(p_name), ' '), " +
              "split(lower(p_type), ' '))) > 0"), 1L)
            .otherwise(0L).as("consistent"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("consistent")).as("n_consistent"))
        .select(col("p_brand"), col("n_parts"), col("n_consistent"),
          expr("n_consistent * 1000L div n_parts")
            .as("consistency_permille"))
        .orderBy("p_brand")
    }),


    // Transition-latency matrix: median seconds between ADJACENT
    // events per (from → to) type pair within a user — q94's
    // transition counts with the timing dimension (the "how long
    // does error→view recovery take" readout). Gaps are exact
    // integer seconds off one user-keyed lag; medians are
    // nearest-rank per pair.
    "q284_transition_latency" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wU = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val trans = Tables.events(s, dir)
        .withColumn("prev_type", lag(col("event_type"), 1).over(wU))
        .withColumn("gap_s",
          ((unix_micros(col("ts")) -
            unix_micros(lag(col("ts"), 1).over(wU))) / 1000000L)
            .cast("long"))
        .filter(col("prev_type").isNotNull)
        .select(col("prev_type").as("from_type"),
          col("event_type").as("to_type"), col("gap_s"),
          col("event_id"))
      // median ranks per (from → to) pair via ScaleOps.groupedRank:
      // the pair-partitioned window (≤ |types|² schema-bounded
      // partitions) sorted fact-grain transition rows one-per-task
      graft.operators.ScaleOps.groupedRank(trans,
          Seq("from_type", "to_type"),
          Seq(col("gap_s").asc, col("event_id").asc),
          rankCol = "rk", countCol = "m")
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n_transitions"),
          min(when(col("rk") === floor((col("m") + lit(1L)) / 2)
            .cast("long"), col("gap_s"))).as("median_gap_s"))
        .orderBy("from_type", "to_type")
    }),


    // Open-order aging snapshot: work-in-progress at a FIXED as-of
    // date (1998-07-01) — orders placed but not fully shipped by
    // then, banded by age. The point-in-time WIP inventory every ops
    // dashboard opens with; reproducible because the cutoff is
    // pinned, exact because bands are integer day compares.
    "q285_open_order_aging" -> ((s, dir) => {
      val cutoff = lit("1998-07-01")
      val lastShip = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(max(to_date(col("l_shipdate"))).as("last_ship"))
      Tables.orders(s, dir)
        .filter(col("o_orderdate") <= cutoff)
        .join(lastShip, col("o_orderkey") === col("l_orderkey"))
        .filter(col("last_ship") > cutoff)
        .select(col("o_orderpriority"),
          datediff(to_date(cutoff), col("o_orderdate")).cast("long")
            .as("age_d"))
        .select(col("o_orderpriority"),
          when(col("age_d") <= 30L, "a_0_30")
            .when(col("age_d") <= 90L, "b_31_90")
            .otherwise("c_91_plus").as("age_band"))
        .groupBy(col("o_orderpriority"), col("age_band"))
        .agg(count(lit(1)).as("n_open"))
        .orderBy("o_orderpriority", "age_band")
    }),


    // Discount depth by basket width: do wide orders get deeper
    // discounts? Mean discount permille per lines-band, the
    // pricing-policy readout — all exact integer sums and divides.
    "q286_discount_by_width" -> ((s, dir) => {
      val width = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_lines"),
          sum(floor(col("l_discount") * 100 + lit(0.5)).cast("long"))
            .as("disc_pct_sum"))
      width
        .select(
          when(col("n_lines") <= 2L, "a_1_2")
            .when(col("n_lines") <= 4L, "b_3_4")
            .when(col("n_lines") <= 6L, "c_5_6")
            .otherwise("d_7_plus").as("width_band"),
          col("n_lines"), col("disc_pct_sum"))
        .groupBy(col("width_band"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("n_lines")).as("n_lines"),
          expr("sum(disc_pct_sum) * 10L div sum(n_lines)")
            .as("mean_disc_permille"))
        .orderBy("width_band")
    }),


    // Average lifetime-value curve by user age: cumulative event
    // value per day-offset since each user's first event, divided by
    // the user base — LTV(k) as exact integer cents-per-user. The
    // curve is a running sum over the |offsets| aggregate; nothing
    // user-level survives the first rollup.
    "q287_ltv_curve" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val firstD = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("first_d"))
      val perOff = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("v_c"))
        .join(firstD, "user_id")
        .groupBy(datediff(col("d"), col("first_d")).cast("long")
          .as("age_d"))
        .agg(sum(col("v_c")).as("day_value_c"))
      val nUsers = firstD.agg(count(lit(1)).as("n_users"))
      perOff
        .crossJoin(broadcast(nUsers))
        .withColumn("cum_c", sum(col("day_value_c")).over(
          Window.orderBy(col("age_d"))))
        .select(col("age_d"),
          (col("day_value_c") / 100.0).as("day_value"),
          expr("cum_c * 100L div n_users").as("ltv_cents_per_user"))
        .orderBy("age_d")
    }),


    // Ship-sequence inversion audit: line items shipping OUT of
    // line-number order (adjacent inversions per order, rolled to a
    // permille per priority) — the fulfillment-sequencing check; an
    // inversion-heavy feed breaks FIFO assumptions downstream. One
    // order-keyed lag window, integer compares.
    "q288_ship_inversions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("sd"), col("l_partkey"))
      val inv = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          to_date(col("l_shipdate")).as("sd"))
        .withColumn("prev_sd", lag(col("sd"), 1).over(w))
        .filter(col("prev_sd").isNotNull)
        .select(col("l_orderkey"),
          when(col("sd") < col("prev_sd"), 1L).otherwise(0L)
            .as("inverted"))
      inv
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_adjacent_pairs"),
          sum(col("inverted")).as("n_inversions"))
        .select(col("o_orderpriority"), col("n_adjacent_pairs"),
          col("n_inversions"),
          expr("n_inversions * 1000L div n_adjacent_pairs")
            .as("inversion_permille"))
        .orderBy("o_orderpriority")
    }),


    // Procurement-arbitrage spread: for multi-supplier parts, the
    // gap between the cheapest and dearest supplier's mean unit
    // price, top 20 by spread ppm. The cheapest/dearest pick orders
    // by the IEEE double su/n with a suppkey tie-break — one
    // deterministic division per (part, supplier), spelled
    // identically in the oracle (both engines order the same
    // doubles); the REPORTED means and the spread are integer
    // arithmetic (su div n, ppm by decimal division). The
    // sourcing-optimization readout.
    "q289_procurement_arbitrage" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dec = "decimal(38,0)"
      val perSupp = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey"),
          expr("(cast(floor(l_extendedprice * 100 + 0.5) as bigint)" +
            " * 100) div cast(l_quantity as bigint)").as("u"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(count(lit(1)).as("n"), sum(col("u")).as("su"))
      val w = Window.partitionBy(col("l_partkey"))
      val picked = perSupp
        .withColumn("lo_rk", row_number().over(w.orderBy(
          (col("su").cast("double") / col("n").cast("double")).asc,
          col("l_suppkey"))))
        .withColumn("hi_rk", row_number().over(w.orderBy(
          (col("su").cast("double") / col("n").cast("double")).desc,
          col("l_suppkey"))))
        .withColumn("n_supp", count(lit(1)).over(w))
        .filter(col("n_supp") >= 2 &&
          (col("lo_rk") === 1 || col("hi_rk") === 1))
        .groupBy(col("l_partkey"), col("n_supp"))
        .agg(
          min(when(col("lo_rk") === 1,
            expr("su div n"))).as("lo_mean_u"),
          min(when(col("hi_rk") === 1,
            expr("su div n"))).as("hi_mean_u"))
        .filter(col("lo_mean_u") > 0L)
      picked
        .select(col("l_partkey"), col("n_supp").cast("long")
          .as("n_suppliers"),
          (col("lo_mean_u") / 10000.0).as("lo_mean_price"),
          (col("hi_mean_u") / 10000.0).as("hi_mean_price"),
          expr(s"cast(hi_mean_u - lo_mean_u as $dec) * 1000000" +
            s" div cast(lo_mean_u as $dec)").as("spread_ppm"))
        .orderBy(col("spread_ppm").desc, col("l_partkey"))
        .limit(20)
        .withColumn("rk", row_number().over(Window.orderBy(
          col("spread_ppm").desc, col("l_partkey"))))
        .select(col("rk").cast("long").as("rank"), col("l_partkey"),
          col("n_suppliers"), col("lo_mean_price"),
          col("hi_mean_price"), col("spread_ppm"))
        .orderBy("rank")
    }),


    // Basket-diversity bands: each order's EFFECTIVE number of part
    // types (inverse Simpson (Σc)²/Σc² — the ESS identity at basket
    // grain, no entropy logs), banded and counted. Distinguishes
    // "6 lines of one type" from a genuinely mixed basket.
    "q290_basket_diversity" -> ((s, dir) => {
      val perType = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_type"))),
          col("p_partkey") === col("l_partkey"))
        .groupBy(col("l_orderkey"), col("p_type"))
        .agg(count(lit(1)).as("c"))
      val perOrder = perType.groupBy(col("l_orderkey"))
        .agg(sum(col("c")).as("sc"),
          sum(col("c") * col("c")).as("sc2"))
        // effective types in permille: (Σc)²·1000 div Σc²
        .select(expr("sc * sc * 1000L div sc2").as("eff_permille"))
      perOrder
        .select(
          when(col("eff_permille") < 1500L, "a_1x")
            .when(col("eff_permille") < 2500L, "b_2x")
            .when(col("eff_permille") < 4500L, "c_3_4x")
            .otherwise("d_5x_plus").as("diversity_band"))
        .groupBy(col("diversity_band"))
        .agg(count(lit(1)).as("n_orders"))
        .withColumn("share_permille",
          expr("n_orders * 1000L div sum(n_orders) over ()"))
        .orderBy("diversity_band")
    }),


    // Source × language coverage gaps: which cells of the corpus
    // grid are EMPTY (a source that never produced language X) — the
    // completeness complement of the mix reports. The dense grid is
    // |sources|×|langs| by construction; present cells come from one
    // aggregate, the grid from a tiny cross join of the two key
    // lists.
    "q291_coverage_gaps" -> ((s, dir) => {
      val present = Tables.documents(s, dir)
        .groupBy(col("source").as("src_p"), col("lang").as("lang_p"))
        .agg(count(lit(1)).as("c"))
      val sources = Tables.documents(s, dir)
        .select(col("source")).distinct()
      val langs = Tables.documents(s, dir)
        .select(col("lang").as("lang_g")).distinct()
      sources.crossJoin(broadcast(langs))
        .join(present,
          col("source") === col("src_p") &&
            col("lang_g") === col("lang_p"), "left_anti")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_missing_langs"),
          sort_array(collect_list(col("lang_g"))).as("missing"))
        .select(col("source"), col("n_missing_langs"),
          concat_ws(",", col("missing")).as("missing_langs"))
        .orderBy("source")
    }),


    // Day-of-month revenue profile: each calendar day-of-month's
    // share of revenue and its index against the uniform expectation
    // (payday / billing-cycle spike detection — the q229 idiom on
    // the monthly axis; day 31 legitimately indexes low). Exact
    // permille integers, one orders scan.
    "q292_dom_profile" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      Tables.orders(s, dir)
        .groupBy(dayofmonth(col("o_orderdate")).cast("long").as("dom"))
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
            .as("rev_c"))
        .withColumn("tot_n", sum(col("n_orders")).over(
          Window.partitionBy()))
        .withColumn("tot_r", sum(col("rev_c")).over(
          Window.partitionBy()))
        .select(col("dom"), col("n_orders"),
          expr("n_orders * 1000L div tot_n").as("order_share_permille"),
          expr("cast(rev_c as decimal(38,0)) * 31000" +
            " div cast(tot_r as decimal(38,0))").as("rev_index_permille"))
        .orderBy("dom")
    }),


    // Value intensity by hour: events per hour AND cents per event —
    // the two curves diverge when high-value activity clusters off-
    // peak (fraud, batch jobs). Exact integer cents-per-event.
    "q293_value_by_hour" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(hour(col("ts")).cast("long").as("hr"))
        .agg(count(lit(1)).as("n_events"),
          sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
            .as("v_c"))
        .select(col("hr"), col("n_events"),
          expr("v_c div n_events").as("cents_per_event"))
        .orderBy("hr")
    }),


    // Does a big first order predict loyalty? Customers banded by
    // FIRST-order value quartile, each band's median lifetime order
    // count and repeat share — the acquisition-quality readout.
    // First order picked by (date, orderkey). The quartile is
    // ScaleOps.distributedRank + ntileOfRank (exact SQL ntile bucket
    // from rank and count, no single-partition ntile window); the
    // band medians come from VALUE-GRAIN cumulative counts (q300's
    // technique, partitioned by band over the bounded order-count
    // domain) — no per-row rank window over customers anywhere.
    "q294_first_order_predictor" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import graft.operators.ScaleOps.{distributedRank, ntileOfRank}
      val wC = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val per = Tables.orders(s, dir)
        .withColumn("rk", row_number().over(wC))
        .withColumn("n_orders", count(lit(1)).over(
          Window.partitionBy(col("o_custkey"))))
        .filter(col("rk") === 1)
        .select(col("o_custkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
            .as("first_c"), col("n_orders"))
      val ranked = distributedRank(per,
        Seq(col("first_c"), col("o_custkey")), "frk")
      val nRows = ranked.agg(count(lit(1)).as("n"))
      val banded = ranked.crossJoin(broadcast(nRows))
        .select(ntileOfRank(col("frk"), col("n"), 4).as("band"),
          col("n_orders"))
      // value-grain: (band, n_orders) counts; the cumulative window
      // is partitioned by band and bounded by the order-count domain
      val vg = banded.groupBy(col("band"), col("n_orders"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(
          Window.partitionBy(col("band")).orderBy(col("n_orders"))))
        .withColumn("m", sum(col("cnt")).over(
          Window.partitionBy(col("band"))))
      vg
        .groupBy(col("band"))
        .agg(max(col("m")).as("n_customers"),
          min(when(col("cum") >= floor((col("m") + lit(1L)) / 2)
            .cast("long"), col("n_orders"))).as("median_orders"),
          sum(when(col("n_orders") > 1L, col("cnt")).otherwise(0L))
            .as("n_repeat"))
        .select(col("band").cast("long").as("first_value_quartile"),
          col("n_customers"), col("median_orders"),
          expr("n_repeat * 1000L div n_customers")
            .as("repeat_permille"))
        .orderBy("first_value_quartile")
    }),


    // Casing profile per source: upper-initial and all-caps token
    // shares in ppm — a crawler that lost casing (or shouts) shows
    // up immediately. Pure per-token string predicates, one scan.
    "q295_casing_profile" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("source"),
          explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(expr("substring(tok, 1, 1) rlike '^[A-Z]$'"), 1L)
            .otherwise(0L)).as("n_upper_initial"),
          sum(when(expr("tok rlike '^[A-Z]+$'") &&
            length(col("tok")) >= 2, 1L).otherwise(0L))
            .as("n_all_caps"))
        .select(col("source"), col("n_tokens"),
          expr("n_upper_initial * 1000000L div n_tokens")
            .as("upper_initial_ppm"),
          expr("n_all_caps * 1000000L div n_tokens")
            .as("all_caps_ppm"))
        .orderBy("source")
    }),


    // Booked-vs-shipped revenue timing by month: the accrual gap
    // between revenue BOOKED (order date) and revenue SHIPPED (ship
    // date) each month — the recognition-timing readout finance
    // reconciles monthly. Two conditional aggregates off ONE
    // lineitem scan via a stacked (month-kind) key; signed gap ppm.
    "q296_booked_vs_shipped" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val lines = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(
          date_format(col("o_orderdate"), "yyyy-MM").as("book_m"),
          date_format(to_date(col("l_shipdate")), "yyyy-MM")
            .as("ship_m"),
          (floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long") *
            (lit(100L) - floor(col("l_discount") * 100 + lit(0.5))
              .cast("long"))).as("rev_u"))
      lines
        .select(expr("stack(2, 'booked', book_m, rev_u," +
          " 'shipped', ship_m, rev_u) as (kind, mon, rev_u)"))
        .groupBy(col("mon"))
        .agg(
          sum(when(col("kind") === "booked", col("rev_u"))
            .otherwise(0L)).as("booked_u"),
          sum(when(col("kind") === "shipped", col("rev_u"))
            .otherwise(0L)).as("shipped_u"))
        .filter(col("booked_u") > 0L)
        .select(col("mon"),
          (col("booked_u") / 10000.0).as("booked_revenue"),
          (col("shipped_u") / 10000.0).as("shipped_revenue"),
          expr(s"cast(shipped_u - booked_u as $dec) * 1000000" +
            s" div cast(booked_u as $dec)").as("timing_gap_ppm"))
        .orderBy("mon")
    }),


    // User specialization: each user's dominant event-type share,
    // banded — a bot does ONE thing; organic users mix. Dominant
    // share is exact permille off one user-type aggregate + a
    // user-keyed max.
    "q297_user_specialization" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val perType = Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("user_id"))
      perType
        .withColumn("tot", sum(col("c")).over(w))
        .withColumn("mx", max(col("c")).over(w))
        .filter(col("c") === col("mx"))
        .groupBy(col("user_id"))
        .agg(max(expr("mx * 1000L div tot")).as("dom_permille"),
          max(col("tot")).as("n_events"))
        .filter(col("n_events") >= 10L)
        .select(
          when(col("dom_permille") < 400L, "a_mixed")
            .when(col("dom_permille") < 700L, "b_leaning")
            .when(col("dom_permille") < 950L, "c_specialized")
            .otherwise("d_single_track").as("specialization"))
        .groupBy(col("specialization"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("specialization")
    }),


    // Order weekday × priority mix: is URGENT work placed on
    // weekends? Share of each priority within its weekday, exact
    // permille — the staffing-calendar readout.
    "q298_weekday_priority_mix" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      Tables.orders(s, dir)
        .groupBy((weekday(col("o_orderdate")) + 1).cast("long")
          .as("isodow"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .withColumn("share_permille", expr(
          "n_orders * 1000L div sum(n_orders)" +
            " over (partition by isodow)"))
        .orderBy("isodow", "o_orderpriority")
    }),


    // Always-on supply coverage: the share of suppliers active in
    // EVERY month of the corpus (and the distribution of covered
    // months) — supply continuity, the q263 retention idea on the
    // vendor axis. Month universe from one aggregate; per-supplier
    // distinct-month counts off the same scan.
    "q299_supplier_coverage" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val perSupp = Tables.lineitem(s, dir)
        .select(col("l_suppkey"),
          date_format(to_date(col("l_shipdate")), "yyyy-MM").as("mon"))
        .groupBy(col("l_suppkey"))
        .agg(countDistinct(col("mon")).as("n_months"))
      perSupp
        .withColumn("all_months", max(col("n_months")).over(
          Window.partitionBy()))
        .select(
          when(col("n_months") === col("all_months"), "a_always_on")
            .when(col("n_months") * 4 >= col("all_months") * 3,
              "b_mostly_on")
            .when(col("n_months") * 2 >= col("all_months"), "c_half")
            .otherwise("d_sporadic").as("coverage_band"))
        .groupBy(col("coverage_band"))
        .agg(count(lit(1)).as("n_suppliers"))
        .withColumn("share_permille",
          expr("n_suppliers * 1000L div sum(n_suppliers) over ()"))
        .orderBy("coverage_band")
    }),
  )

  /** DuckDB oracle SQL for every query above (same keys). */
  val oracleSql: Map[String, String] = Map(

    // q265: identical integer midpoint split, per-half ranks, full
    // outer top-15 union.
    "q265_token_rank_drift" ->
      """WITH mid AS (
        |  SELECT (min(doc_id) + max(doc_id)) // 2 AS mid
        |  FROM documents),
        |h1 AS (
        |  SELECT token, count(*)::BIGINT AS h1_n,
        |         row_number() OVER (ORDER BY count(*) DESC, token)
        |           AS h1_rank,
        |         sum(count(*)) OVER ()::BIGINT AS h1_tot
        |  FROM (SELECT unnest(string_split(text, ' ')) AS token
        |        FROM documents, mid WHERE doc_id <= mid)
        |  WHERE length(token) > 0 GROUP BY token),
        |h2 AS (
        |  SELECT token AS token_b, count(*)::BIGINT AS h2_n,
        |         row_number() OVER (ORDER BY count(*) DESC, token)
        |           AS h2_rank,
        |         sum(count(*)) OVER ()::BIGINT AS h2_tot
        |  FROM (SELECT unnest(string_split(text, ' ')) AS token
        |        FROM documents, mid WHERE doc_id > mid)
        |  WHERE length(token) > 0 GROUP BY token)
        |SELECT COALESCE(token, token_b) AS token,
        |       h1_rank::BIGINT AS h1_rank, h2_rank::BIGINT AS h2_rank,
        |       (COALESCE(h1_n, 0) * 1000 // h1_tot)::BIGINT
        |         AS h1_permille,
        |       (COALESCE(h2_n, 0) * 1000 // h2_tot)::BIGINT
        |         AS h2_permille
        |FROM h1 FULL OUTER JOIN h2 ON token = token_b
        |WHERE h1_rank <= 15 OR h2_rank <= 15
        |ORDER BY COALESCE(h1_rank, 999), token""".stripMargin,


    // q266: identical nearest-rank decile boundaries and ppm ratio.
    "q266_qq_deciles" ->
      """WITH v AS (
        |  SELECT date_part('year', o_orderdate)::INT AS yr,
        |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
        |         o_orderkey
        |  FROM orders
        |  WHERE date_part('year', o_orderdate) IN (1996, 1997)),
        |r AS (
        |  SELECT yr, v,
        |         row_number() OVER (PARTITION BY yr
        |                            ORDER BY v, o_orderkey) AS rk,
        |         count(*) OVER (PARTITION BY yr) AS n
        |  FROM v),
        |c AS (
        |  SELECT dec,
        |         min(CASE WHEN yr = 1996 THEN v END) AS v96,
        |         min(CASE WHEN yr = 1997 THEN v END) AS v97
        |  FROM r CROSS JOIN (SELECT unnest(range(1, 10)) AS dec)
        |  WHERE rk = (n * dec + 9) // 10
        |  GROUP BY 1)
        |SELECT dec::BIGINT AS decile, (v96 / 100.0)::DOUBLE AS p1996,
        |       (v97 / 100.0)::DOUBLE AS p1997,
        |       (v97::HUGEINT * 1000000 // v96::HUGEINT)::BIGINT
        |         AS ratio_ppm
        |FROM c ORDER BY decile""".stripMargin,


    // q267: identical md5 sample membership and signed ppm error.
    "q267_sample_calibration" ->
      """WITH b AS (
        |  SELECT n_name,
        |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |           AS rev_c,
        |         CASE WHEN substr(md5(o_orderkey::VARCHAR), 1, 1) = '0'
        |              THEN 1 ELSE 0 END AS s
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON n_nationkey = c_nationkey),
        |a AS (
        |  SELECT n_name, count(*)::BIGINT AS n_orders,
        |         sum(s)::BIGINT AS n_sampled,
        |         sum(rev_c)::BIGINT AS full_c,
        |         sum(rev_c * s)::BIGINT AS samp_c
        |  FROM b GROUP BY 1)
        |SELECT n_name, n_orders, n_sampled,
        |       (full_c / 100.0)::DOUBLE AS full_revenue,
        |       (samp_c * 16 / 100.0)::DOUBLE AS est_revenue,
        |       ((samp_c::HUGEINT * 16 - full_c::HUGEINT) * 1000000
        |        // full_c::HUGEINT)::BIGINT AS err_ppm
        |FROM a ORDER BY n_name""".stripMargin,


    // q268: identical per-feed min/max and high-water staleness.
    "q268_freshness_audit" ->
      """WITH f AS (
        |  SELECT 'orders' AS feed, min(CAST(o_orderdate AS DATE))
        |           AS min_d, max(CAST(o_orderdate AS DATE)) AS max_d
        |  FROM orders
        |  UNION ALL
        |  SELECT 'lineitem_shipments', min(CAST(l_shipdate AS DATE)),
        |         max(CAST(l_shipdate AS DATE))
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'events', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))
        |  FROM events),
        |h AS (SELECT f.*, max(max_d) OVER () AS hwm FROM f)
        |SELECT feed, strftime(min_d, '%Y-%m-%d') AS oldest,
        |       strftime(max_d, '%Y-%m-%d') AS newest,
        |       date_diff('day', max_d, hwm)::BIGINT AS staleness_days
        |FROM h ORDER BY feed""".stripMargin,


    // q269: identical midranks from value-grain cumulative counts
    // (half-integer U as double, tie-corrected variance), one sqrt.
    "q269_rank_sum_test" ->
      """WITH b AS (
        |  SELECT o_orderpriority AS grp,
        |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |vg AS (
        |  SELECT v, count(*)::BIGINT AS t,
        |         sum(CASE WHEN grp = '1-URGENT' THEN 1 ELSE 0 END)
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


    // q270: identical per-axis singleton shares.
    "q270_singleton_tail" ->
      """SELECT * FROM (
        |  SELECT 'customer_orders' AS axis, count(*)::BIGINT AS n_keys,
        |         sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)::BIGINT
        |           AS n_singletons,
        |         (sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) * 1000
        |          // count(*))::BIGINT AS singleton_permille
        |  FROM (SELECT count(*) AS f FROM orders GROUP BY o_custkey)
        |  UNION ALL
        |  SELECT 'part_lines', count(*)::BIGINT,
        |         sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)::BIGINT,
        |         (sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) * 1000
        |          // count(*))::BIGINT
        |  FROM (SELECT count(*) AS f FROM lineitem GROUP BY l_partkey)
        |  UNION ALL
        |  SELECT 'user_events', count(*)::BIGINT,
        |         sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)::BIGINT,
        |         (sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) * 1000
        |          // count(*))::BIGINT
        |  FROM (SELECT count(*) AS f FROM events GROUP BY user_id)
        |  UNION ALL
        |  SELECT 'source_docs', count(*)::BIGINT,
        |         sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)::BIGINT,
        |         (sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) * 1000
        |          // count(*))::BIGINT
        |  FROM (SELECT count(*) AS f FROM documents GROUP BY source)
        |) ORDER BY axis""".stripMargin,


    // q271: identical sign sequence, island run count, exact
    // rationals, one sqrt.
    "q271_runs_test" ->
      """WITH d AS (
        |  SELECT o_orderdate AS d,
        |         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           ::BIGINT AS rev
        |  FROM orders GROUP BY 1),
        |s AS (
        |  SELECT d, CASE WHEN rev > prev THEN 1
        |                 WHEN rev < prev THEN -1 ELSE 0 END AS sgn
        |  FROM (SELECT d, rev, lag(rev) OVER (ORDER BY d) AS prev
        |        FROM d)
        |  WHERE prev IS NOT NULL),
        |m AS (
        |  SELECT sgn, lag(sgn) OVER (ORDER BY d) AS prev_sgn
        |  FROM s WHERE sgn <> 0),
        |a AS (
        |  SELECT sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)::BIGINT
        |           AS n_up,
        |         sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END)::BIGINT
        |           AS n_down,
        |         sum(CASE WHEN prev_sgn IS NULL OR sgn <> prev_sgn
        |                  THEN 1 ELSE 0 END)::BIGINT AS n_runs
        |  FROM m)
        |SELECT n_up, n_down, n_runs,
        |       floor((1.0 + (n_up * n_down * 2)::DOUBLE
        |                    / (n_up + n_down)::DOUBLE)
        |             * 10000 + 0.5) / 10000 AS expected_runs,
        |       floor(((n_runs::DOUBLE
        |               - (1.0 + (n_up * n_down * 2)::DOUBLE
        |                        / (n_up + n_down)::DOUBLE))
        |              / sqrt((n_up * n_down * 2)::DOUBLE
        |                     * ((n_up * n_down * 2)::DOUBLE
        |                        - (n_up + n_down)::DOUBLE)
        |                     / ((n_up + n_down)::DOUBLE
        |                        * (n_up + n_down)::DOUBLE
        |                        * ((n_up + n_down)::DOUBLE - 1.0))))
        |             * 10000 + 0.5) / 10000 AS z
        |FROM a""".stripMargin,


    // q272: identical common-token join + closed-form complement.
    "q272_tv_distance" ->
      """WITH c AS (
        |  SELECT source, token, count(*)::BIGINT AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  WHERE length(token) > 0
        |  GROUP BY 1, 2),
        |t AS (SELECT source, sum(c)::BIGINT AS tot FROM c GROUP BY 1),
        |j AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |         ta.tot AS ta, tb.tot AS tb,
        |         sum(abs(a.c::HUGEINT * tb.tot
        |                 - b.c::HUGEINT * ta.tot)) AS s_common,
        |         sum(a.c)::BIGINT AS ca_common,
        |         sum(b.c)::BIGINT AS cb_common
        |  FROM c a
        |  JOIN c b ON a.token = b.token AND a.source < b.source
        |  JOIN t ta ON ta.source = a.source
        |  JOIN t tb ON tb.source = b.source
        |  GROUP BY 1, 2, 3, 4)
        |SELECT src_a, src_b,
        |       floor(((s_common
        |               + (ta - ca_common)::HUGEINT * tb::HUGEINT
        |               + (tb - cb_common)::HUGEINT * ta::HUGEINT)
        |              ::DOUBLE
        |              / ((ta::HUGEINT * tb::HUGEINT)::DOUBLE * 2.0))
        |             * 10000 + 0.5) / 10000 AS tv_distance
        |FROM j ORDER BY src_a, src_b""".stripMargin,


    // q273: identical sessionization, entry pick, bounce share.
    "q273_bounce_by_entry" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
        |                   <= 1800000000 THEN 0 ELSE 1 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts,
        |                        event_id ROWS UNBOUNDED PRECEDING)
        |           AS sess_id
        |  FROM e),
        |r AS (
        |  SELECT event_type,
        |         row_number() OVER (PARTITION BY user_id, sess_id
        |                            ORDER BY ts, event_id) AS rk,
        |         count(*) OVER (PARTITION BY user_id, sess_id)
        |           AS depth
        |  FROM s)
        |SELECT event_type AS entry_type, count(*)::BIGINT AS n_sessions,
        |       sum(CASE WHEN depth = 1 THEN 1 ELSE 0 END)::BIGINT
        |         AS n_bounces,
        |       (sum(CASE WHEN depth = 1 THEN 1 ELSE 0 END) * 1000
        |        // count(*))::BIGINT AS bounce_permille
        |FROM r WHERE rk = 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // q274: identical integer bit buckets and ppm shares.
    "q274_value_width_density" ->
      """WITH w AS (
        |  SELECT l_orderkey, count(*)::BIGINT AS n_lines
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT length(printf('%b',
        |           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)))
        |           ::BIGINT AS value_bits,
        |         n_lines
        |  FROM orders JOIN w ON o_orderkey = l_orderkey),
        |g AS (
        |  SELECT value_bits, n_lines, count(*)::BIGINT AS n_orders
        |  FROM c GROUP BY 1, 2)
        |SELECT value_bits, n_lines, n_orders,
        |       (n_orders * 1000000 // sum(n_orders) OVER ())::BIGINT
        |         AS share_ppm
        |FROM g ORDER BY value_bits, n_lines""".stripMargin,


    // q275: identical supplier-count bands and share permilles.
    "q275_supply_risk" ->
      """WITH pp AS (
        |  SELECT l_partkey,
        |         count(DISTINCT l_suppkey)::BIGINT AS n_suppliers,
        |         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |             * (100 - CAST(floor(l_discount * 100 + 0.5)
        |                           AS BIGINT)))::BIGINT AS rev_u
        |  FROM lineitem GROUP BY 1),
        |g AS (
        |  SELECT n_suppliers, count(*)::BIGINT AS n_parts,
        |         sum(rev_u)::BIGINT AS rev
        |  FROM pp GROUP BY 1)
        |SELECT n_suppliers, n_parts,
        |       (n_parts * 1000 // sum(n_parts) OVER ())::BIGINT
        |         AS part_share_permille,
        |       (rev::HUGEINT * 1000 // sum(rev) OVER ()::HUGEINT)
        |         ::BIGINT AS rev_share_permille
        |FROM g ORDER BY n_suppliers""".stripMargin,


    // q276: identical distinct frame, pair join, union identity.
    "q276_type_affinity" ->
      """WITH ut AS (
        |  SELECT DISTINCT user_id, event_type FROM events),
        |sz AS (
        |  SELECT event_type, count(*)::BIGINT AS nu
        |  FROM ut GROUP BY 1),
        |i AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |         count(*)::BIGINT AS n_both
        |  FROM ut a JOIN ut b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, n_both,
        |       floor(n_both::DOUBLE
        |             / (sa.nu + sb.nu - n_both)::DOUBLE * 10000 + 0.5)
        |         / 10000 AS user_jaccard
        |FROM i
        |JOIN sz sa ON sa.event_type = type_a
        |JOIN sz sb ON sb.event_type = type_b
        |ORDER BY type_a, type_b""".stripMargin,


    // q277: identical first/last picks and signed ppm drift.
    "q277_price_drift" ->
      """WITH u AS (
        |  SELECT l_partkey,
        |         (CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |          * 100) // CAST(l_quantity AS BIGINT) AS u,
        |         l_shipdate, l_orderkey, l_linenumber
        |  FROM lineitem),
        |r AS (
        |  SELECT l_partkey, u,
        |         row_number() OVER w AS rk,
        |         count(*) OVER (PARTITION BY l_partkey) AS n,
        |         first_value(u) OVER w2 AS first_u,
        |         last_value(u) OVER w2 AS last_u
        |  FROM u
        |  WINDOW w AS (PARTITION BY l_partkey
        |               ORDER BY l_shipdate, l_orderkey, l_linenumber),
        |         w2 AS (PARTITION BY l_partkey
        |                ORDER BY l_shipdate, l_orderkey, l_linenumber
        |                ROWS BETWEEN UNBOUNDED PRECEDING
        |                AND UNBOUNDED FOLLOWING)),
        |d AS (
        |  SELECT l_partkey, n AS n_sales,
        |         (first_u / 10000.0)::DOUBLE AS first_price,
        |         (last_u / 10000.0)::DOUBLE AS last_price,
        |         ((last_u::HUGEINT - first_u::HUGEINT) * 1000000
        |          // first_u::HUGEINT)::BIGINT AS drift_ppm
        |  FROM r WHERE rk = 1 AND n >= 5 AND first_u > 0),
        |t AS (
        |  SELECT d.*, row_number() OVER (ORDER BY abs(drift_ppm) DESC,
        |                                 l_partkey) AS rk2
        |  FROM d)
        |SELECT rk2::BIGINT AS rank, l_partkey, n_sales::BIGINT
        |         AS n_sales, first_price, last_price, drift_ppm
        |FROM t WHERE rk2 <= 20 ORDER BY rank""".stripMargin,


    // q278: identical per-vector index-ordered reconstruction fold;
    // the per-dim quantized code and the cosine use the same
    // floor(+0.5) spelling.
    "q278_quantization_error" ->
      """WITH per AS (
        |  SELECT label,
        |         list_reduce(list_prepend(0.0, list_transform(
        |             embedding, x -> CAST(x AS DOUBLE)
        |               * floor(CAST(x AS DOUBLE)
        |                       / list_aggregate(list_transform(
        |                           embedding,
        |                           y -> abs(CAST(y AS DOUBLE))), 'max')
        |                       * 127.0 + 0.5))),
        |           (a, x) -> a + x) AS dot,
        |         list_reduce(list_prepend(0.0, list_transform(
        |             embedding,
        |             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |           (a, x) -> a + x) AS a2,
        |         list_reduce(list_prepend(0.0, list_transform(
        |             embedding, x ->
        |               floor(CAST(x AS DOUBLE)
        |                     / list_aggregate(list_transform(
        |                         embedding,
        |                         y -> abs(CAST(y AS DOUBLE))), 'max')
        |                     * 127.0 + 0.5)
        |               * floor(CAST(x AS DOUBLE)
        |                       / list_aggregate(list_transform(
        |                           embedding,
        |                           y -> abs(CAST(y AS DOUBLE))), 'max')
        |                       * 127.0 + 0.5))),
        |           (a, x) -> a + x) AS b2
        |  FROM embeddings),
        |ppm AS (
        |  SELECT label,
        |         CASE WHEN a2 > 0.0 AND b2 > 0.0 THEN
        |           CAST(floor(dot / (sqrt(a2) * sqrt(b2))
        |                      * 1000000 + 0.5) AS BIGINT)
        |         ELSE 0 END AS cos_ppm
        |  FROM per)
        |SELECT label::BIGINT AS label, count(*)::BIGINT AS n_vecs,
        |       (sum(cos_ppm) // count(*))::BIGINT AS mean_cos_ppm,
        |       min(cos_ppm)::BIGINT AS min_cos_ppm
        |FROM ppm GROUP BY 1 ORDER BY 1""".stripMargin,


    // q279: identical md5-hex fold and cross-multiplied deviations.
    "q279_kfold_balance" ->
      """WITH f AS (
        |  SELECT lang,
        |         (('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT
        |          % 5) AS fold
        |  FROM documents),
        |cell AS (
        |  SELECT fold, lang, count(*)::BIGINT AS c
        |  FROM f GROUP BY 1, 2),
        |w AS (
        |  SELECT fold, lang, c,
        |         sum(c) OVER (PARTITION BY fold) AS fold_n,
        |         sum(c) OVER (PARTITION BY lang) AS lang_n,
        |         sum(c) OVER () AS tot
        |  FROM cell)
        |SELECT fold, max(fold_n)::BIGINT AS n_docs,
        |       max(abs(c * tot - lang_n * fold_n) * 1000000
        |           // (fold_n * tot))::BIGINT AS worst_lang_dev_ppm
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,


    // q280: identical smoothed cross-multiplied keyness and top-5.
    "q280_distinctive_terms" ->
      """WITH tok AS (
        |  SELECT lang, token
        |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  WHERE length(token) > 0),
        |cell AS (
        |  SELECT lang, token, count(*)::BIGINT AS c_in
        |  FROM tok GROUP BY 1, 2),
        |tt AS (SELECT token, count(*)::BIGINT AS c_all
        |       FROM tok GROUP BY 1),
        |lt AS (SELECT lang, count(*)::BIGINT AS t_in
        |       FROM tok GROUP BY 1),
        |g AS (SELECT count(*)::BIGINT AS t_all FROM tok),
        |sc AS (
        |  SELECT lang, token, c_in,
        |         floor((c_in * (t_all - t_in))::DOUBLE
        |               / (((c_all - c_in) + 1) * t_in)::DOUBLE
        |               * 10000 + 0.5) / 10000 AS keyness
        |  FROM cell JOIN tt USING (token) JOIN lt USING (lang)
        |  CROSS JOIN g
        |  WHERE c_in >= 5),
        |r AS (
        |  SELECT sc.*, row_number() OVER (PARTITION BY lang
        |                                  ORDER BY keyness DESC,
        |                                           token) AS rk
        |  FROM sc)
        |SELECT lang, rk::BIGINT AS rank, token, c_in, keyness
        |FROM r WHERE rk <= 5 ORDER BY lang, rank""".stripMargin,


    // q281: identical year-conditional sums and ppm shares.
    "q281_segment_mix_shift" ->
      """WITH a AS (
        |  SELECT c_mktsegment,
        |         sum(CASE WHEN date_part('year', o_orderdate) = 1996
        |             THEN CAST(floor(o_totalprice * 100 + 0.5)
        |                       AS BIGINT) ELSE 0 END)::BIGINT AS r96,
        |         sum(CASE WHEN date_part('year', o_orderdate) = 1997
        |             THEN CAST(floor(o_totalprice * 100 + 0.5)
        |                       AS BIGINT) ELSE 0 END)::BIGINT AS r97
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE date_part('year', o_orderdate) IN (1996, 1997)
        |  GROUP BY 1),
        |t AS (
        |  SELECT a.*, sum(r96) OVER () AS t96, sum(r97) OVER () AS t97
        |  FROM a)
        |SELECT c_mktsegment,
        |       (r96::HUGEINT * 1000000 // t96::HUGEINT)::BIGINT
        |         AS share96_ppm,
        |       (r97::HUGEINT * 1000000 // t97::HUGEINT)::BIGINT
        |         AS share97_ppm,
        |       ((r97::HUGEINT * 1000000 // t97::HUGEINT)
        |        - (r96::HUGEINT * 1000000 // t96::HUGEINT))::BIGINT
        |         AS shift_ppm
        |FROM t ORDER BY c_mktsegment""".stripMargin,


    // q282: identical nearest-rank medians and quadrant compares.
    "q282_equity_quadrants" ->
      """WITH per AS (
        |  SELECT c_custkey, c_mktsegment,
        |         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c,
        |         sp.spend_c
        |  FROM customer
        |  JOIN (SELECT o_custkey,
        |               sum(CAST(floor(o_totalprice * 100 + 0.5)
        |                        AS BIGINT))::BIGINT AS spend_c
        |        FROM orders GROUP BY 1) sp
        |    ON c_custkey = o_custkey),
        |r AS (
        |  SELECT c_mktsegment, bal_c, spend_c,
        |         row_number() OVER (ORDER BY bal_c, c_custkey) AS rb,
        |         row_number() OVER (ORDER BY spend_c, c_custkey) AS rs,
        |         count(*) OVER () AS n
        |  FROM per),
        |m AS (
        |  SELECT r.*,
        |         min(CASE WHEN rb = (n + 1) // 2 THEN bal_c END)
        |           OVER () AS med_b,
        |         min(CASE WHEN rs = (n + 1) // 2 THEN spend_c END)
        |           OVER () AS med_s
        |  FROM r)
        |SELECT c_mktsegment,
        |       (CASE WHEN bal_c > med_b THEN 'hi_bal'
        |             ELSE 'lo_bal' END || '/' ||
        |        CASE WHEN spend_c > med_s THEN 'hi_spend'
        |             ELSE 'lo_spend' END) AS quadrant,
        |       count(*)::BIGINT AS n_customers
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // q283: identical in-row token intersection and permille.
    "q283_name_type_consistency" ->
      """WITH p AS (
        |  SELECT p_brand,
        |         CASE WHEN length(list_intersect(
        |                  string_split(lower(p_name), ' '),
        |                  string_split(lower(p_type), ' '))) > 0
        |              THEN 1 ELSE 0 END AS consistent
        |  FROM part)
        |SELECT p_brand, count(*)::BIGINT AS n_parts,
        |       sum(consistent)::BIGINT AS n_consistent,
        |       (sum(consistent) * 1000 // count(*))::BIGINT
        |         AS consistency_permille
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,


    // q284: identical adjacent-transition gaps and nearest-rank
    // medians.
    "q284_transition_latency" ->
      """WITH t AS (
        |  SELECT lag(event_type) OVER w AS from_type,
        |         event_type AS to_type,
        |         ((epoch_us(ts) - epoch_us(lag(ts) OVER w))
        |          // 1000000)::BIGINT AS gap_s,
        |         event_id
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |r AS (
        |  SELECT from_type, to_type, gap_s,
        |         row_number() OVER (PARTITION BY from_type, to_type
        |                            ORDER BY gap_s, event_id) AS rk,
        |         count(*) OVER (PARTITION BY from_type, to_type) AS m
        |  FROM t WHERE from_type IS NOT NULL)
        |SELECT from_type, to_type, count(*)::BIGINT AS n_transitions,
        |       min(CASE WHEN rk = (m + 1) // 2 THEN gap_s END)
        |         ::BIGINT AS median_gap_s
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // q285: identical pinned cutoff and integer age bands.
    "q285_open_order_aging" ->
      """WITH ls AS (
        |  SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS last_ship
        |  FROM lineitem GROUP BY 1),
        |o AS (
        |  SELECT o_orderpriority,
        |         date_diff('day', o_orderdate, DATE '1998-07-01')
        |           ::BIGINT AS age_d
        |  FROM orders JOIN ls ON o_orderkey = l_orderkey
        |  WHERE o_orderdate <= DATE '1998-07-01'
        |    AND last_ship > DATE '1998-07-01'),
        |b AS (
        |  SELECT o_orderpriority,
        |         CASE WHEN age_d <= 30 THEN 'a_0_30'
        |              WHEN age_d <= 90 THEN 'b_31_90'
        |              ELSE 'c_91_plus' END AS age_band
        |  FROM o)
        |SELECT o_orderpriority, age_band, count(*)::BIGINT AS n_open
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // q286: identical width bands and integer mean discount.
    "q286_discount_by_width" ->
      """WITH w AS (
        |  SELECT l_orderkey, count(*)::BIGINT AS n_lines,
        |         sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
        |           ::BIGINT AS disc_pct_sum
        |  FROM lineitem GROUP BY 1),
        |b AS (
        |  SELECT CASE WHEN n_lines <= 2 THEN 'a_1_2'
        |              WHEN n_lines <= 4 THEN 'b_3_4'
        |              WHEN n_lines <= 6 THEN 'c_5_6'
        |              ELSE 'd_7_plus' END AS width_band,
        |         n_lines, disc_pct_sum
        |  FROM w)
        |SELECT width_band, count(*)::BIGINT AS n_orders,
        |       sum(n_lines)::BIGINT AS n_lines,
        |       (sum(disc_pct_sum) * 10 // sum(n_lines))::BIGINT
        |         AS mean_disc_permille
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,


    // q287: identical offset aggregate, running sum, integer
    // cents-per-user.
    "q287_ltv_curve" ->
      """WITH f AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS first_d
        |  FROM events GROUP BY 1),
        |o AS (
        |  SELECT date_diff('day', f.first_d, CAST(e.ts AS DATE))
        |           ::BIGINT AS age_d,
        |         sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT))
        |           ::BIGINT AS day_value_c
        |  FROM events e JOIN f ON e.user_id = f.user_id
        |  GROUP BY 1),
        |n AS (SELECT count(*)::BIGINT AS n_users FROM f)
        |SELECT age_d, (day_value_c / 100.0)::DOUBLE AS day_value,
        |       (sum(day_value_c) OVER (ORDER BY age_d
        |                               ROWS UNBOUNDED PRECEDING)
        |        * 100 // n_users)::BIGINT AS ltv_cents_per_user
        |FROM o CROSS JOIN n ORDER BY age_d""".stripMargin,


    // q288: identical adjacent compares and permille roll-up.
    "q288_ship_inversions" ->
      """WITH i AS (
        |  SELECT l_orderkey,
        |         CASE WHEN CAST(l_shipdate AS DATE) <
        |                   lag(CAST(l_shipdate AS DATE)) OVER w
        |              THEN 1 ELSE 0 END AS inverted,
        |         lag(l_shipdate) OVER w AS prev
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_orderkey
        |               ORDER BY l_linenumber,
        |                        CAST(l_shipdate AS DATE),
        |                        l_partkey)),
        |j AS (
        |  SELECT o_orderpriority, inverted
        |  FROM i JOIN orders ON l_orderkey = o_orderkey
        |  WHERE prev IS NOT NULL)
        |SELECT o_orderpriority, count(*)::BIGINT AS n_adjacent_pairs,
        |       sum(inverted)::BIGINT AS n_inversions,
        |       (sum(inverted) * 1000 // count(*))::BIGINT
        |         AS inversion_permille
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,


    // q289: identical double-mean ordering, integer-div means,
    // top-20 spread.
    "q289_procurement_arbitrage" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey, count(*)::BIGINT AS n,
        |         sum((CAST(floor(l_extendedprice * 100 + 0.5)
        |                   AS BIGINT) * 100)
        |             // CAST(l_quantity AS BIGINT))::BIGINT AS su
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT l_partkey, su, n,
        |         row_number() OVER (PARTITION BY l_partkey
        |                            ORDER BY su::DOUBLE / n::DOUBLE,
        |                                     l_suppkey) AS lo_rk,
        |         row_number() OVER (PARTITION BY l_partkey
        |                            ORDER BY su::DOUBLE / n::DOUBLE
        |                            DESC, l_suppkey) AS hi_rk,
        |         count(*) OVER (PARTITION BY l_partkey) AS n_supp
        |  FROM ps),
        |p AS (
        |  SELECT l_partkey, n_supp,
        |         min(CASE WHEN lo_rk = 1 THEN su // n END) AS lo_mean_u,
        |         min(CASE WHEN hi_rk = 1 THEN su // n END) AS hi_mean_u
        |  FROM r WHERE n_supp >= 2 AND (lo_rk = 1 OR hi_rk = 1)
        |  GROUP BY 1, 2),
        |t AS (
        |  SELECT l_partkey, n_supp::BIGINT AS n_suppliers,
        |         (lo_mean_u / 10000.0)::DOUBLE AS lo_mean_price,
        |         (hi_mean_u / 10000.0)::DOUBLE AS hi_mean_price,
        |         ((hi_mean_u::HUGEINT - lo_mean_u::HUGEINT) * 1000000
        |          // lo_mean_u::HUGEINT)::BIGINT AS spread_ppm
        |  FROM p WHERE lo_mean_u > 0),
        |k AS (
        |  SELECT t.*, row_number() OVER (ORDER BY spread_ppm DESC,
        |                                 l_partkey) AS rk
        |  FROM t)
        |SELECT rk::BIGINT AS rank, l_partkey, n_suppliers,
        |       lo_mean_price, hi_mean_price, spread_ppm
        |FROM k WHERE rk <= 20 ORDER BY rank""".stripMargin,


    // q290: identical inverse-Simpson permille and bands.
    "q290_basket_diversity" ->
      """WITH pt AS (
        |  SELECT l_orderkey, p_type, count(*)::BIGINT AS c
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  GROUP BY 1, 2),
        |po AS (
        |  SELECT (sum(c) * sum(c) * 1000 // sum(c * c))::BIGINT
        |           AS eff_permille
        |  FROM pt GROUP BY l_orderkey),
        |b AS (
        |  SELECT CASE WHEN eff_permille < 1500 THEN 'a_1x'
        |              WHEN eff_permille < 2500 THEN 'b_2x'
        |              WHEN eff_permille < 4500 THEN 'c_3_4x'
        |              ELSE 'd_5x_plus' END AS diversity_band
        |  FROM po)
        |SELECT diversity_band, count(*)::BIGINT AS n_orders,
        |       (count(*) * 1000 // sum(count(*)) OVER ())::BIGINT
        |         AS share_permille
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,


    // q291: identical grid anti-join and sorted missing list.
    "q291_coverage_gaps" ->
      """WITH present AS (
        |  SELECT source AS src_p, lang AS lang_p
        |  FROM documents GROUP BY 1, 2),
        |srcs AS (SELECT DISTINCT source FROM documents),
        |lgs AS (SELECT DISTINCT lang AS lang_g FROM documents),
        |missing AS (
        |  SELECT s.source, l.lang_g
        |  FROM srcs s CROSS JOIN lgs l
        |  WHERE NOT EXISTS (SELECT 1 FROM present p
        |                    WHERE p.src_p = s.source
        |                      AND p.lang_p = l.lang_g))
        |SELECT source, count(*)::BIGINT AS n_missing_langs,
        |       array_to_string(list_sort(list(lang_g)), ',')
        |         AS missing_langs
        |FROM missing GROUP BY 1 ORDER BY 1""".stripMargin,


    // q292: identical dom shares and 31-scaled revenue index.
    "q292_dom_profile" ->
      """WITH d AS (
        |  SELECT date_part('day', o_orderdate)::BIGINT AS dom,
        |         count(*)::BIGINT AS n_orders,
        |         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           ::BIGINT AS rev_c
        |  FROM orders GROUP BY 1),
        |t AS (
        |  SELECT d.*, sum(n_orders) OVER () AS tot_n,
        |         sum(rev_c) OVER () AS tot_r
        |  FROM d)
        |SELECT dom, n_orders,
        |       (n_orders * 1000 // tot_n)::BIGINT
        |         AS order_share_permille,
        |       (rev_c::HUGEINT * 31000 // tot_r::HUGEINT)::BIGINT
        |         AS rev_index_permille
        |FROM t ORDER BY dom""".stripMargin,


    // q293: identical hourly integer intensity.
    "q293_value_by_hour" ->
      """SELECT date_part('hour', ts)::BIGINT AS hr,
        |       count(*)::BIGINT AS n_events,
        |       (sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |        // count(*))::BIGINT AS cents_per_event
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,


    // q294: identical first-order pick, quartile ntile, nearest-rank
    // medians.
    "q294_first_order_predictor" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |           AS first_c,
        |         n_orders
        |  FROM (SELECT o_custkey, o_totalprice,
        |               row_number() OVER (PARTITION BY o_custkey
        |                                  ORDER BY o_orderdate,
        |                                           o_orderkey) AS rk,
        |               count(*) OVER (PARTITION BY o_custkey)
        |                 AS n_orders
        |        FROM orders)
        |  WHERE rk = 1),
        |b AS (
        |  SELECT per.*, ntile(4) OVER (ORDER BY first_c, o_custkey)
        |           AS band
        |  FROM per),
        |r AS (
        |  SELECT band, n_orders, o_custkey,
        |         row_number() OVER (PARTITION BY band
        |                            ORDER BY n_orders, o_custkey)
        |           AS mrk,
        |         count(*) OVER (PARTITION BY band) AS m
        |  FROM b)
        |SELECT band::BIGINT AS first_value_quartile,
        |       count(*)::BIGINT AS n_customers,
        |       min(CASE WHEN mrk = (m + 1) // 2 THEN n_orders END)
        |         ::BIGINT AS median_orders,
        |       (sum(CASE WHEN n_orders > 1 THEN 1 ELSE 0 END) * 1000
        |        // count(*))::BIGINT AS repeat_permille
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,


    // q295: identical regex predicates and ppm shares.
    "q295_casing_profile" ->
      """WITH t AS (
        |  SELECT source, token AS tok
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  WHERE length(token) > 0),
        |a AS (
        |  SELECT source, count(*)::BIGINT AS n_tokens,
        |         sum(CASE WHEN regexp_matches(substr(tok, 1, 1),
        |                                      '^[A-Z]$')
        |                  THEN 1 ELSE 0 END)::BIGINT AS n_upper,
        |         sum(CASE WHEN regexp_matches(tok, '^[A-Z]+$')
        |                       AND length(tok) >= 2
        |                  THEN 1 ELSE 0 END)::BIGINT AS n_caps
        |  FROM t GROUP BY 1)
        |SELECT source, n_tokens,
        |       (n_upper * 1000000 // n_tokens)::BIGINT
        |         AS upper_initial_ppm,
        |       (n_caps * 1000000 // n_tokens)::BIGINT AS all_caps_ppm
        |FROM a ORDER BY source""".stripMargin,


    // q296: identical month-kind stack and signed timing gap.
    "q296_booked_vs_shipped" ->
      """WITH l AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS book_m,
        |         strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS ship_m,
        |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |           * (100 - CAST(floor(l_discount * 100 + 0.5)
        |                         AS BIGINT)) AS rev_u
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |u AS (
        |  SELECT book_m AS mon, rev_u, 'booked' AS kind FROM l
        |  UNION ALL
        |  SELECT ship_m, rev_u, 'shipped' FROM l),
        |g AS (
        |  SELECT mon,
        |         sum(CASE WHEN kind = 'booked' THEN rev_u ELSE 0 END)
        |           ::BIGINT AS booked_u,
        |         sum(CASE WHEN kind = 'shipped' THEN rev_u ELSE 0 END)
        |           ::BIGINT AS shipped_u
        |  FROM u GROUP BY 1)
        |SELECT mon, (booked_u / 10000.0)::DOUBLE AS booked_revenue,
        |       (shipped_u / 10000.0)::DOUBLE AS shipped_revenue,
        |       ((shipped_u::HUGEINT - booked_u::HUGEINT) * 1000000
        |        // booked_u::HUGEINT)::BIGINT AS timing_gap_ppm
        |FROM g WHERE booked_u > 0 ORDER BY mon""".stripMargin,


    // q297: identical dominant-share bands.
    "q297_user_specialization" ->
      """WITH pt AS (
        |  SELECT user_id, event_type, count(*)::BIGINT AS c
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT user_id, c,
        |         sum(c) OVER (PARTITION BY user_id) AS tot,
        |         max(c) OVER (PARTITION BY user_id) AS mx
        |  FROM pt),
        |d AS (
        |  SELECT user_id, max(mx * 1000 // tot) AS dom_permille,
        |         max(tot) AS n_events
        |  FROM w WHERE c = mx GROUP BY 1),
        |b AS (
        |  SELECT CASE WHEN dom_permille < 400 THEN 'a_mixed'
        |              WHEN dom_permille < 700 THEN 'b_leaning'
        |              WHEN dom_permille < 950 THEN 'c_specialized'
        |              ELSE 'd_single_track' END AS specialization
        |  FROM d WHERE n_events >= 10)
        |SELECT specialization, count(*)::BIGINT AS n_users
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,


    // q298: identical isodow shares.
    "q298_weekday_priority_mix" ->
      """WITH g AS (
        |  SELECT date_part('isodow', o_orderdate)::BIGINT AS isodow,
        |         o_orderpriority, count(*)::BIGINT AS n_orders
        |  FROM orders GROUP BY 1, 2)
        |SELECT isodow, o_orderpriority, n_orders,
        |       (n_orders * 1000 //
        |        sum(n_orders) OVER (PARTITION BY isodow))::BIGINT
        |         AS share_permille
        |FROM g ORDER BY isodow, o_orderpriority""".stripMargin,


    // q299: identical coverage bands off distinct-month counts.
    "q299_supplier_coverage" ->
      """WITH ps AS (
        |  SELECT l_suppkey,
        |         count(DISTINCT strftime(CAST(l_shipdate AS DATE),
        |                                 '%Y-%m'))::BIGINT AS n_months
        |  FROM lineitem GROUP BY 1),
        |w AS (
        |  SELECT n_months, max(n_months) OVER () AS all_months
        |  FROM ps),
        |b AS (
        |  SELECT CASE WHEN n_months = all_months THEN 'a_always_on'
        |              WHEN n_months * 4 >= all_months * 3
        |                THEN 'b_mostly_on'
        |              WHEN n_months * 2 >= all_months THEN 'c_half'
        |              ELSE 'd_sporadic' END AS coverage_band
        |  FROM w),
        |g AS (
        |  SELECT coverage_band, count(*)::BIGINT AS n_suppliers
        |  FROM b GROUP BY 1)
        |SELECT coverage_band, n_suppliers,
        |       (n_suppliers * 1000 // sum(n_suppliers) OVER ())::BIGINT
        |         AS share_permille
        |FROM g ORDER BY coverage_band""".stripMargin,
  )
}
