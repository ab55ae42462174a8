package graft

import org.apache.spark.sql.Row

/** Cross-row invariants of the statistics/diagnostics queries — the
  * properties a per-value hash oracle cannot express (monotonicity
  * along a ladder, conservation identities, analytic bounds). Each
  * runs the declared query end-to-end on the sf0.001 fixture.
  */
class StatInvariantSpec extends SparkSpec {

  private def rows(q: String): Seq[Row] =
    SparkEntry.queries(q)(spark, sf001).collect().toSeq

  test("q220 Wilson lower bound never exceeds the raw rate") {
    rows("q220_wilson_returns").foreach { r =>
      val rate = r.getAs[Double]("return_rate")
      val lb = r.getAs[Double]("wilson_lb")
      assert(lb <= rate + 1e-9, s"lb $lb > rate $rate")
      assert(lb >= -1e-9, s"lb $lb negative")
    }
  }

  test("q232 concentration ladder is monotone in the percent cut") {
    val byPct = rows("q232_revenue_concentration")
      .map(r => r.getAs[Int]("pct_permille").toLong ->
        r.getAs[Long]("share_ppm")).toMap
    assert(byPct(10L) <= byPct(50L) && byPct(50L) <= byPct(100L),
      s"shares not monotone: $byPct")
    assert(byPct(10L) >= 10000L,
      "top 1% of customers must hold >= 1% of revenue")
  }

  test("q235 Spearman rho stays in [-1, 1]") {
    rows("q235_spearman_len_tokens").foreach { r =>
      val rho = r.getAs[Double]("spearman_rho")
      assert(rho >= -1.0 - 1e-9 && rho <= 1.0 + 1e-9, s"rho $rho")
    }
  }

  test("q242 contamination is non-increasing in the n-gram size") {
    val byK = rows("q242_contamination_ladder")
      .map(r => r.getAs[Long]("k") -> r.getAs[Long]("rate_permille"))
      .toMap
    assert(byK(3L) >= byK(5L) && byK(5L) >= byK(8L),
      s"ladder not monotone: $byK")
  }

  test("q245 OOV ladder is non-increasing in vocab size") {
    rows("q245_oov_ladder").foreach { r =>
      val a = r.getAs[Long]("oov_top5_ppm")
      val b = r.getAs[Long]("oov_top15_ppm")
      val c = r.getAs[Long]("oov_top25_ppm")
      assert(a >= b && b >= c, s"ladder not monotone: $a $b $c")
    }
  }

  test("q246 ABC-XYZ revenue shares sum to ~1e6 ppm") {
    val tot = rows("q246_abc_xyz_matrix")
      .map(r => r.getAs[Long]("rev_share_ppm")).sum
    // integer-division truncation loses < 1 ppm per cell
    assert(tot <= 1000000L && tot >= 1000000L - 20L, s"sum $tot")
  }

  test("q264 growth accounting conserves: active = new + retained + resurrected") {
    rows("q264_growth_accounting").foreach { r =>
      assert(r.getAs[Long]("n_active") ==
        r.getAs[Long]("n_new") + r.getAs[Long]("n_retained") +
          r.getAs[Long]("n_resurrected"), s"not conserved: $r")
      assert(r.getAs[Long]("n_churned") >= 0L, s"negative churn: $r")
    }
  }

  test("q266 Q-Q decile boundaries are strictly ordered") {
    val rs = rows("q266_qq_deciles").sortBy(_.getAs[Long]("decile"))
    rs.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a.getAs[Double]("p1996") <= b.getAs[Double]("p1996"))
        assert(a.getAs[Double]("p1997") <= b.getAs[Double]("p1997"))
      case _ =>
    }
  }

  test("q259 overdue leaderboard: contiguous ranks, non-increasing overdue") {
    val rs = rows("q259_overdue_customers")
    assert(rs.map(_.getAs[Long]("rank")) == (1L to rs.size).toSeq,
      "ranks must be the contiguous 1..N of the limited result")
    assert(rs.size <= 20)
    val overdue = rs.map(_.getAs[Long]("overdue_x_permille"))
    assert(overdue.zip(overdue.drop(1)).forall { case (a, b) => a >= b },
      s"overdue_x_permille not non-increasing along rank: $overdue")
    rs.foreach { r =>
      assert(r.getAs[Long]("n_orders") >= 5L, "cadence needs >=5 orders")
      assert(r.getAs[Long]("mean_gap_d") >= 0L)
    }
  }

  test("q302 jackknife: 16 folds, agreement in [0,10] with consistent pct") {
    val rs = rows("q302_topk_stability")
    assert(rs.size == 16, s"expected 16 md5-nibble folds, got ${rs.size}")
    assert(rs.map(_.getAs[String]("drop_slice")).toSet ==
      "0123456789abcdef".map(_.toString).toSet)
    rs.foreach { r =>
      val n = r.getAs[Long]("n_agree")
      assert(n >= 0L && n <= 10L, s"n_agree $n outside [0,10]")
      assert(r.getAs[Long]("agreement_pct") == n * 10L,
        "agreement_pct must be n_agree out of 10, in percent")
    }
  }

  test("q239 rolling median EQUALS the nearest-rank median of its 7-day window") {
    val rs = rows("q239_rolling_median_revenue").sortBy(_.getAs[String]("day"))
    val revs = rs.map(_.getAs[Double]("revenue"))
    rs.zipWithIndex.foreach { case (r, i) =>
      val w = revs.slice(math.max(0, i - 6), i + 1)
      assert(r.getAs[Long]("n_window") == w.size)
      val m = r.getAs[Double]("median7_revenue")
      // exact nearest-rank recompute (a containment check would accept
      // ANY window value — it could not catch an off-by-one rank index)
      val expected = w.sorted.apply((w.size + 1) / 2 - 1)
      assert(math.abs(m - expected) <= 1e-9,
        s"median $m != nearest-rank $expected (window ${w.sorted}) " +
          s"at ${r.getString(0)}")
    }
  }

  test("q269 rank-sum U lies in [0, n1*n2]") {
    val r = rows("q269_rank_sum_test").head
    val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
    // midrank formulation: U and its null mean are half-integer doubles
    val u1 = r.getAs[Double]("u1")
    assert(u1 >= 0.0 && u1 <= (n1 * n2).toDouble,
      s"u1 $u1 outside [0, ${n1 * n2}]")
    assert(r.getAs[Double]("u_null_mean") == n1 * n2 / 2.0)
  }

  test("q261 winsorization: cuts ordered, clipped mass bounded by tail count share") {
    rows("q261_winsorization_preview").foreach { r =>
      assert(r.getAs[Long]("p01_cents") <= r.getAs[Long]("p99_cents"))
      val n = r.getAs[Long]("n_events")
      val tails = r.getAs[Long]("n_below") + r.getAs[Long]("n_above")
      // nearest-rank p01/p99 leave at most ~2% of rows outside
      assert(tails * 100 <= n * 3, s"tails $tails of $n")
    }
  }

  test("q251 effective sample size never exceeds the doc count") {
    rows("q251_effective_sample_size").foreach { r =>
      assert(r.getAs[Double]("ess") <=
        r.getAs[Long]("n_docs").toDouble + 1e-6, s"ESS > n: $r")
      assert(r.getAs[Long]("ess_ratio_ppm") <= 1000000L)
    }
  }

  test("q271 runs test: run count bounded by move count, expectation within it") {
    val r = rows("q271_runs_test").head
    val moves = r.getAs[Long]("n_up") + r.getAs[Long]("n_down")
    val runs = r.getAs[Long]("n_runs")
    assert(runs >= 1L && runs <= moves, s"runs $runs of $moves moves")
    val exp = r.getAs[Double]("expected_runs")
    assert(exp >= 1.0 && exp <= moves + 1.0, s"expected $exp")
  }

  test("q272 TV distance is a bounded [0,1] symmetric-grain metric") {
    val rs = rows("q272_tv_distance")
    assert(rs.nonEmpty)
    rs.foreach { r =>
      val tv = r.getAs[Double]("tv_distance")
      assert(tv >= -1e-9 && tv <= 1.0 + 1e-9, s"tv $tv")
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"),
        "pair grain must be the ordered upper triangle")
    }
  }

  test("q281 mix shift: shares each sum to ~1e6 ppm and shifts to ~0") {
    val rs = rows("q281_segment_mix_shift")
    val s96 = rs.map(_.getAs[Long]("share96_ppm")).sum
    val s97 = rs.map(_.getAs[Long]("share97_ppm")).sum
    val shift = rs.map(_.getAs[Long]("shift_ppm")).sum
    assert(s96 >= 999990L && s96 <= 1000000L, s"s96 $s96")
    assert(s97 >= 999990L && s97 <= 1000000L, s"s97 $s97")
    assert(math.abs(shift) <= 10L, s"shift sum $shift")
  }

  test("q282 quadrants partition the ordering customer base") {
    val total = rows("q282_equity_quadrants")
      .map(_.getAs[Long]("n_customers")).sum
    // independent recount: customers with >= 1 order
    import org.apache.spark.sql.functions._
    val n = graft.sources.Tables.orders(spark, sf001)
      .select(col("o_custkey")).distinct().count()
    assert(total == n, s"quadrant total $total != ordering customers $n")
  }

  test("q287 LTV curve is monotone nondecreasing") {
    val rs = rows("q287_ltv_curve").sortBy(_.getAs[Long]("age_d"))
    rs.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a.getAs[Long]("ltv_cents_per_user") <=
          b.getAs[Long]("ltv_cents_per_user"), s"LTV dipped: $a -> $b")
      case _ =>
    }
  }

  test("q288 inversions bounded by adjacent pairs") {
    rows("q288_ship_inversions").foreach { r =>
      assert(r.getAs[Long]("n_inversions") <=
        r.getAs[Long]("n_adjacent_pairs"), s"impossible count: $r")
    }
  }

  test("q326 Hamilton allocation conserves the budget exactly") {
    val total = rows("q326_hamilton_allocation")
      .map(_.getAs[Long]("quota")).sum
    assert(total == 10000L, s"quotas sum to $total, not 10000")
  }

  test("q327 CDF ladder is monotone in the threshold") {
    val rs = rows("q327_value_cdf_ladder")
      .sortBy(_.getAs[Double]("threshold"))
    rs.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a.getAs[Long]("order_share_permille") <=
          b.getAs[Long]("order_share_permille"))
        assert(a.getAs[Long]("revenue_share_permille") <=
          b.getAs[Long]("revenue_share_permille"))
      case _ =>
    }
  }

  test("q324 value concentration monotone in the percent cut") {
    val byPct = rows("q324_user_value_concentration")
      .map(r => r.getAs[Int]("pct_permille").toLong ->
        r.getAs[Long]("share_ppm")).toMap
    assert(byPct(10L) <= byPct(100L), s"not monotone: $byPct")
  }

  test("q224 weighted median lies within the value range of its nation") {
    import org.apache.spark.sql.functions._
    val med = SparkEntry.queries("q224_weighted_median_value")(spark, sf001)
    val bounds = graft.sources.Tables.lineitem(spark, sf001)
      .join(graft.sources.Tables.orders(spark, sf001),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.sources.Tables.customer(spark, sf001)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(graft.sources.Tables.nation(spark, sf001),
        col("n_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name").as("nn"))
      .agg(min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
    val joined = med.join(bounds, col("n_name") === col("nn")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val m = r.getAs[Double]("wmedian_value")
      assert(m >= r.getAs[Double]("lo") - 0.01 &&
        m <= r.getAs[Double]("hi") + 0.01, s"median outside range: $r")
    }
  }
}
