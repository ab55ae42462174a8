package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{AsOfJoin, Dedup, EntityResolution, GraphOps, Multimodal, PriceAlerts, Relational, Similarity, Sketches, TextAnalysis, TimeSeries}

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

  /** Binary-arithmetic rounding (floor(x*10^n + 0.5)/10^n) — identical
    * on Spark and DuckDB because both evaluate it on the raw double.
    * Spark's round() goes through the decimal string representation
    * (BigDecimal HALF_UP) and disagrees with C-style engines on exact
    * .5 boundaries of the binary value.
    */
  private def r2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * 100 + lit(0.5)) / 100
  private def r4(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * 10000 + lit(0.5)) / 10000

  /** q43's per-source mixture weight table (keep fraction per source) —
    * the driver-side config the engine broadcast-joins and the oracle
    * embeds as a VALUES clause. Fractions are exact binary values so
    * `keep_frac * 65536` is integer-exact in both engines.
    */
  private[graft] val mixtureWeights: Seq[(String, Double)] =
    (0 until 20).map(i => (s"src$i", ((i % 4) + 1) * 0.25))

  /** q51's per-source sample quotas (exact kept-count per stratum) —
    * sized so at every SF some strata are clipped by the quota and some
    * fall short of it (both branches of the min(quota, |stratum|)
    * contract are exercised).
    */
  private[graft] val stratifiedQuotas: Seq[(String, Long)] =
    (0 until 20).map(i => (s"src$i", 10L + 15L * (i % 3)))

  /** q74's per-source sampling weights — powers of two only, so the
    * Efraimidis–Spirakis key u^(1/w) reduces to iterated IEEE sqrt
    * (bit-identical across engines; see TextAnalysis.weightedSample).
    */
  private[graft] val sampleWeights: Seq[(String, Long)] =
    (0 until 20).map(i => (s"src$i", 1L << (i % 3)))

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
    // ── Relational breadth (SURVEY.md §2.11 "not present" list) ────────
    // Multi-aggregate (sum/avg/count) grouped summary.
    "q05_pricing_summary" -> ((s, dir) => {
      Relational.pricingSummary(Tables.lineitem(s, dir))
        .select(col("l_returnflag"), col("l_linestatus"),
          r2(col("sum_qty")).as("sum_qty"),
          r2(col("sum_base_price")).as("sum_base_price"),
          r2(col("sum_disc_price")).as("sum_disc_price"),
          r4(col("avg_qty")).as("avg_qty"),
          r4(col("avg_price")).as("avg_price"),
          col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Top-k: ORDER BY + LIMIT → TakeOrderedAndProject (bounded heaps).
    "q06_topk_orders" -> ((s, dir) => {
      Relational.topOrders(Tables.orders(s, dir), 100)
        .select(col("o_orderkey"), col("o_custkey"),
          r2(col("o_totalprice")).as("o_totalprice"))
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
          r2(col("sum_qty")).as("sum_qty"), col("n"))
        .orderBy("returnflag", "linestatus")
    }),

    // Analytic window functions: row_number, lag, running sum.
    "q11_order_analytics" -> ((s, dir) => {
      Relational.orderHistoryAnalytics(Tables.orders(s, dir))
        .select(col("o_custkey"), col("o_orderkey"), col("rn").cast("long").as("rn"),
          r2(col("prev_price")).as("prev_price"),
          r2(col("running_total")).as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Star-schema multi-join with broadcast dims.
    "q12_revenue_per_region" -> ((s, dir) => {
      Relational.revenuePerRegion(Tables.region(s, dir), Tables.nation(s, dir),
          Tables.customer(s, dir), Tables.orders(s, dir))
        .select(col("r_name"), r2(col("revenue")).as("revenue"), col("n_orders"))
        .orderBy("r_name")
    }),

    // Generator/explode (UDTF-shaped): token frequency top-100.
    "q13_token_frequency" -> ((s, dir) => {
      Relational.tokenFrequency(Tables.documents(s, dir), 100)
    }),

    // ── Training-data pipeline (north star) ────────────────────────────
    // Exact dedup: survivor + copy count per distinct text.
    "q14_dedup_exact" -> ((s, dir) => {
      Dedup.exact(Tables.documents(s, dir)).orderBy("doc_id")
    }),

    // Fingerprint dedup over md5(normalized text).
    "q15_dedup_fingerprint" -> ((s, dir) => {
      Dedup.byFingerprint(Tables.documents(s, dir)).orderBy("doc_id")
    }),

    // Exact word-set jaccard near-dup pairs (blocked by source).
    "q16_dedup_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(Tables.documents(s, dir), 0.5)
        .select(col("doc_a"), col("doc_b"), r4(col("jaccard")).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    }),

    // MinHash+LSH candidate pairs (shingle→minhash→band→bucket-join).
    // Oracle: OracleHashSql.q17MinhashLsh reproduces the FNV-1a/splitmix
    // signatures bit-exactly in DuckDB HUGEINT arithmetic.
    "q17_dedup_minhash_lsh" -> ((s, dir) => {
      Dedup.minhashLshPairs(s, Tables.documents(s, dir))
        .select(col("doc_a"), col("doc_b"), r4(col("est_jaccard")).as("est_jaccard"))
        .orderBy("doc_a", "doc_b")
    }),

    // SimHash near-dup pairs (hamming ≤ 3 via 16-bit chunk buckets).
    // hamming cast to long: DuckDB bit_count emits a narrow int.
    "q18_dedup_simhash" -> ((s, dir) => {
      Dedup.simhashPairs(s, Tables.documents(s, dir))
        .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
        .orderBy("doc_a", "doc_b")
    }),

    // Embedding-cosine near-dup pairs (label-blocked exact).
    "q19_dedup_embedding" -> ((s, dir) => {
      Dedup.embeddingCosinePairs(s, Tables.embeddings(s, dir), 0.3)
        .select(col("vec_a"), col("vec_b"), r4(col("cos")).as("cos"))
        .orderBy("vec_a", "vec_b")
    }),

    // Brute-force cosine top-k (exact ANN baseline).
    "q20_sim_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(s, emb, emb.filter(col("vec_id") < 5), 10)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), r4(col("cos")).as("cos"))
        .orderBy("query_id", "rank")
    }),

    // LSH-bucketed ANN top-k (the scale path; recall vs q20 is tested
    // in SimilaritySpec). Oracle embeds the exact plane constants as
    // SQL literals (OracleHashSql.q21AnnLsh).
    "q21_sim_ann_lsh" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.annTopK(s, emb, emb.filter(col("vec_id") < 5), 10)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), r4(col("cos")).as("cos"))
        .orderBy("query_id", "rank")
    }),

    // Text quality metrics (length/punct/stopword/token counts + score).
    "q22_text_quality" -> ((s, dir) => {
      TextAnalysis.qualityMetrics(Tables.documents(s, dir))
        .select(col("doc_id"), col("n_chars"), col("n_tokens_ws"),
          col("n_tokens_bpe"), col("n_punct"), col("n_alpha"),
          r4(col("quality")).as("quality"))
        .orderBy("doc_id")
    }),

    // Language-ID heuristic (stopword n-gram scores + argmax).
    "q23_text_langid" -> ((s, dir) => {
      TextAnalysis.languageId(Tables.documents(s, dir))
        .select(col("doc_id"),
          r4(col("score_en")).as("score_en"),
          r4(col("score_de")).as("score_de"),
          r4(col("score_fr")).as("score_fr"),
          r4(col("score_es")).as("score_es"),
          col("lang_pred"))
        .orderBy("doc_id")
    }),

    // Multimodal plumbing: binary payloads → batched (stub) decode →
    // per-kind integer byte stats (oracle-reproducible; the decode
    // codec itself stays a declared stub).
    "q24_media_features" -> ((s, dir) => {
      Multimodal.featureStats(s, Tables.documents(s, dir)).orderBy("kind")
    }),

    // Document fingerprints (md5, oracle-backed; the rolling-hash twin
    // is covered by TextAnalysisSpec).
    "q25_text_fingerprint" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.functions.TextFunctions.fingerprintMd5(col("text")).as("fp_md5"))
        .orderBy("doc_id")
    }),

    // ── Temporal / windowing extensions ────────────────────────────────
    // AS-OF join: each click matched to the user's latest prior
    // purchase. Runs on the custom physical operator (plans/
    // AsOfJoinExec: co-partitioned sort-merge, ~30% faster than the
    // union+window composition, which AsOfJoinSpec proves equivalent).
    // Oracle: DuckDB's native ASOF JOIN.
    "q26_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      graft.plans.AsOfJoinPhysical.asof(clicks, purchases,
          leftKey = "user_id", rightKey = "user_id",
          leftTs = "ts", rightTs = "ts")
        .select(col("event_id"), col("user_id"),
          tsStr(col("ts")).as("click_ts"),
          tsStr(col("asof_ts")).as("purchase_ts"),
          r2(col("asof_value")).as("purchase_value"))
        .orderBy("event_id", "user_id", "click_ts", "purchase_ts", "purchase_value")
    }),

    // Sliding (hopping) window: 5-minute windows sliding by 1 minute.
    "q27_sliding_window" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "5 minutes", "1 minute"), col("event_type"))
        .agg(r2(sum(col("value"))).as("total"), count(lit(1)).as("n"))
        .select(tsStr(col("window.start")).as("window_start"), col("event_type"),
          col("total"), col("n"))
        .orderBy("window_start", "event_type", "total", "n")
    }),

    // Session windows: 30-minute-gap sessions per user
    // (gaps-and-islands oracle in DuckDB).
    "q28_session_window" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), r2(sum(col("value"))).as("total"))
        .select(col("user_id"), tsStr(col("session_window.start")).as("session_start"),
          col("n_events"), col("total"))
        .orderBy("user_id", "session_start", "n_events", "total")
    }),

    // IVF ANN top-k (centroid cells + nProbe; recall vs q20 tested in
    // SimilaritySpec). Fully relational → exact DuckDB oracle.
    "q29_sim_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopK(s, emb, emb.filter(col("vec_id") < 5), 10)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), r4(col("cos")).as("cos"))
        .orderBy("query_id", "rank")
    }),

    // IVF ANN top-k with deterministic sampled-k-means centroids — the
    // recall-quality variant you'd ship (q29's first-N centroids are
    // the trivial stand-in). Training is a bounded-sample driver-side
    // Lloyd with a fixed fold order; the oracle unrolls the same
    // iterations in SQL, so even the trained centroids are verified
    // bit-exactly.
    "q44_sim_ivf_kmeans" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopKTrained(s, emb, emb.filter(col("vec_id") < 5), 10)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), r4(col("cos")).as("cos"))
        .orderBy("query_id", "rank")
    }),

    // Deterministic content-hash train/val split: the reproducible-split
    // primitive of a training-data pipeline (split follows the CONTENT,
    // not row order or RNG — stable under reshuffling and re-ingestion).
    "q30_train_val_split" -> ((s, dir) => {
      val firstHex = substring(md5(col("text")), 1, 1)
      Tables.documents(s, dir)
        .select(col("doc_id"),
          when(firstHex.isin("0", "1", "2", "3"), "val")
            .otherwise("train").as("split"))
        .orderBy("doc_id", "split")
    }),

    // Pivot: per-user event-value matrix (fixed pivot column list).
    "q32_pivot" -> ((s, dir) => {
      val p = Relational.pivotEventValues(Tables.events(s, dir))
      p.select(col("user_id") +:
        Seq("click", "error", "purchase", "signup", "view")
          .map(c => r2(col(c)).as(c)): _*)
        .orderBy("user_id")
    }),

    // Exact interpolated percentiles per group.
    "q33_percentiles" -> ((s, dir) => {
      Relational.valuePercentiles(Tables.events(s, dir))
        .select(col("event_type"), r4(col("p50")).as("p50"),
          r4(col("p90")).as("p90"))
        .orderBy("event_type")
    }),

    // LSH-blocked exact jaccard: candidates from MinHash banding,
    // exact sorted-merge rerank — the at-scale form of q16 (whose
    // `source` blocking is fixture-only). Oracle mirrors the LSH
    // candidate generation bit-exactly (OracleHashSql).
    "q36_dedup_lsh_jaccard" -> ((s, dir) => {
      Dedup.lshBlockedJaccardPairs(s, Tables.documents(s, dir))
        .select(col("doc_a"), col("doc_b"), r4(col("jaccard")).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    }),

    // LSH-blocked embedding near-dup pairs: hyperplane buckets propose
    // candidates, exact cosine reranks — the at-scale form of q19
    // (whose `label` blocking is fixture-only). Oracle embeds the
    // plane constants (OracleHashSql.q37LshBlockedCosine).
    "q37_dedup_embedding_lsh" -> ((s, dir) => {
      Dedup.lshBlockedCosinePairs(s, Tables.embeddings(s, dir))
        .select(col("vec_a"), col("vec_b"), r4(col("cos")).as("cos"))
        .orderBy("vec_a", "vec_b")
    }),

    // PII scrubbing: per-doc match counts + fingerprint of the redacted
    // text — the corpus-sanitization step of a training-data pipeline.
    "q38_pii_redaction" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      Tables.documents(s, dir)
        .select(col("doc_id"),
          piiCount(col("text"), emailRe).cast("long").as("n_emails"),
          piiCount(col("text"), phoneRe).cast("long").as("n_phones"),
          piiCount(col("text"), ipRe).cast("long").as("n_ips"),
          md5(redactPii(col("text"))).as("redacted_md5"))
        .orderBy("doc_id")
    }),

    // Per-vector stats over the embedding column (sequential-fold l2 /
    // mean via `aggregate`, array_min/max) — the vector-hygiene check
    // (zero/degenerate embedding detection) of an embedding pipeline.
    "q39_vector_stats" -> ((s, dir) => {
      val e = col("embedding")
      val sq = aggregate(e, lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))
      val sm = aggregate(e, lit(0.0), (acc, x) => acc + x.cast("double"))
      Tables.embeddings(s, dir)
        .select(col("vec_id"),
          r4(sqrt(sq)).as("l2_norm"),
          r4(sm / size(e)).as("vmean"),
          r4(array_min(e).cast("double")).as("vmin"),
          r4(array_max(e).cast("double")).as("vmax"))
        .orderBy("vec_id")
    }),

    // Keyed interval join: each click matched to ALL of the user's
    // purchases in the preceding day (the bounded-range sibling
    // of the as-of join q26 — equi-key + range predicate, so the pair
    // space is per-user-window, never the cross product).
    "q40_interval_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("click_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"), col("value"))
      clicks.join(purchases, Seq("user_id"))
        .filter(col("purchase_ts") <= col("click_ts") &&
          col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 DAY"))
        .select(col("click_id"), col("user_id"),
          tsStr(col("click_ts")).as("click_ts"),
          col("purchase_id"),
          tsStr(col("purchase_ts")).as("purchase_ts"),
          r2(col("value")).as("value"))
        .orderBy("click_id", "user_id", "click_ts", "purchase_id",
          "purchase_ts", "value")
    }),

    // Benchmark decontamination: corpus docs sharing any word 4-gram
    // with the "benchmark" set (first 5 docs) — the train/test-overlap
    // sweep of a training-data pipeline (production uses n=8..13; n=4
    // here so the synthetic fixture shows hits).
    "q41_contamination" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      TextAnalysis.contamination(docs.filter(col("doc_id") >= 5),
          docs.filter(col("doc_id") < 5), n = 4)
        .orderBy("doc_id", "n_overlapping")
    }),

    // Deterministic mixture sampling: each source kept at its own
    // configured rate (the dataset-mixing step of a training-data
    // build), decided by a content-hash uniform — reshuffle-stable and
    // oracle-reproducible. The per-source weight table is a driver-side
    // config broadcast-joined into the filter (at 100 TB the corpus
    // side never shuffles; the weights are a ~KB broadcast); sources
    // absent from the table are dropped, as a mixture spec defines the
    // kept universe.
    "q43_mixture_sampling" -> ((s, dir) => {
      import s.implicits._
      // first 4 hex chars of md5 -> uniform in [0, 65536)
      val u = conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long")
      val weights = mixtureWeights.toDF("source", "keep_frac")
      Tables.documents(s, dir)
        .join(broadcast(weights), Seq("source"))
        .filter(u < (col("keep_frac") * 65536).cast("long"))
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id", "source")
    }),

    // Training-sequence packing: each doc assigned to the fixed
    // token-budget sequence it starts in (concat-and-chunk pretraining
    // layout) — per-source doc_id-ordered cumulative token counts, all
    // integer arithmetic.
    "q45_sequence_packing" -> ((s, dir) => {
      TextAnalysis.sequencePacking(Tables.documents(s, dir))
        .orderBy("doc_id", "source", "n_tokens", "seq_id")
    }),

    // Per-source length-percentile gate: drop each source's shortest
    // 20% by token count (deterministic percent_rank over
    // (n_tokens, doc_id) — no ties, integer-driven).
    "q46_length_percentile" -> ((s, dir) => {
      TextAnalysis.lengthPercentileFilter(Tables.documents(s, dir))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          r4(col("pr")).as("pr"))
        .orderBy("doc_id", "source", "n_tokens", "pr")
    }),

    // Absmax int8 embedding quantization stats (the storage-compression
    // step of an embedding pipeline): per-vector scale + integer
    // checksums of every quantized component — single-pass codegen
    // expression, scan speed.
    "q47_embedding_quantize" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables.embeddings(s, dir)
        .select(col("vec_id"),
          graft.functions.GraftFunctions.quantizeI8Stats(col("embedding")).as("q"))
        .select(col("vec_id"), r4(col("q.scale")).as("scale"),
          col("q.q_sum").as("q_sum"), col("q.q_min").as("q_min"),
          col("q.q_max").as("q_max"))
        .orderBy("vec_id", "scale", "q_sum", "q_min", "q_max")
    }),

    // Cross-document boilerplate 4-grams (C4-style): document frequency
    // of n-grams shared by >= 2 docs.
    "q48_boilerplate_ngrams" -> ((s, dir) => {
      TextAnalysis.boilerplateNgrams(Tables.documents(s, dir))
        .orderBy("g", "n_docs")
    }),

    // Near-dup cluster assignment: connected components over the q17
    // MinHash+LSH pair graph (min-label propagation to fixpoint) — the
    // canonical-survivor step that actually shrinks the corpus (A~B,
    // B~C collapse to ONE survivor even when A~C was never emitted).
    "q49_dedup_clusters" -> ((s, dir) => {
      val pairs = Dedup.minhashLshPairs(s, Tables.documents(s, dir))
        .select(col("doc_a"), col("doc_b"))
      GraphOps.dedupClusters(pairs)
        .orderBy("cluster_id", "doc_id")
    }),

    // Per-doc top-3 rarity-weighted terms (TF-IDF keyword extraction
    // with linear idf — exact-integer ratio, so bit-exactly oracled).
    "q50_tfidf_terms" -> ((s, dir) => {
      TextAnalysis.tfidfTerms(Tables.documents(s, dir))
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          r4(col("score")).as("score"), col("rk"))
        .orderBy("doc_id", "rk")
    }),

    // Exact-quota stratified sample: per source keep exactly
    // min(quota, |source|) docs chosen by content-hash order — the
    // fixed-budget sibling of q43's rate-based mixture.
    "q51_stratified_sample" -> ((s, dir) => {
      import s.implicits._
      val quotas = stratifiedQuotas.toDF("source", "quota")
      TextAnalysis.stratifiedSample(Tables.documents(s, dir), quotas)
        .orderBy("doc_id", "source", "rk")
    }),

    // Count-min-sketch heavy hitters: bounded-memory token counting
    // (map-side partial agg = the per-partition sketch), estimates
    // reported against exact counts for the top 50 tokens.
    "q52_cms_heavy_hitters" -> ((s, dir) => {
      Sketches.cmsHeavyHitters(s, Tables.documents(s, dir))
        .orderBy("token", "cnt", "est_cms")
    }),

    // Morton z-order clustering key over (user_id, event-minute): the
    // data-layout primitive behind 2-D scan pruning — sorting by z
    // gives BOTH dimensions row-group locality (ScaleOps.zorderLayout
    // is the write path; this query verifies the key itself).
    "q53_zorder_key" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables.events(s, dir)
        .withColumn("m", expr("cast(ts AS long) div 60"))
        .select(col("event_id"), col("user_id"), col("m"),
          graft.functions.GraftFunctions.zorder64(col("user_id"), col("m"))
            .as("z"))
        .orderBy("z", "event_id", "user_id", "m")
    }),

    // Content-defined chunking + cross-doc chunk dedup: rolling-hash
    // boundaries follow content (re-sync after edits), so near-dup
    // docs share chunks even without aligned n-grams — the
    // storage-dedup primitive at chunk granularity.
    "q54_cdc_chunks" -> ((s, dir) => {
      Dedup.cdcChunkDedup(s, Tables.documents(s, dir))
        .orderBy("chunk_md5", "n_docs", "n_occ")
    }),

    // Edit-distance rerank over LSH candidates: character-level near-dup
    // (transpositions/OCR noise) — Levenshtein runs ONLY on the
    // LSH-bounded candidate set, never a blocked self-join.
    "q55_dedup_edit_distance" -> ((s, dir) => {
      Dedup.lshEditDistancePairs(s, Tables.documents(s, dir))
        .select(col("doc_a"), col("doc_b"), col("edit_dist"),
          r4(col("sim")).as("sim"))
        .orderBy("doc_a", "doc_b", "edit_dist", "sim")
    }),

    // Window-function breadth: quartile bucketing, next-order lookahead,
    // cumulative distribution per customer order history.
    "q56_order_windows" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          lead(col("o_orderkey"), 1).over(w).as("next_ok"),
          r4(cume_dist().over(w)).as("cd"))
        .orderBy("o_custkey", "o_orderkey", "quartile", "next_ok", "cd")
    }),

    // The end-to-end corpus build, composed from the operator library in
    // ONE declarative plan: fingerprint-dedup survivors -> quality gate
    // -> benchmark decontamination (anti-join, benchmark n-grams
    // broadcast) -> per-source mixture sampling (weight table broadcast,
    // content-hash uniform) -> training-sequence packing of what's left.
    // Catalyst fuses the whole chain; the corpus is scanned, filtered,
    // and laid out without ever materializing an intermediate table.
    "q57_corpus_pipeline" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val fp = Dedup.byFingerprint(docs).select(col("doc_id"))
      val quality = TextAnalysis.qualityMetrics(docs)
        .filter(col("quality") >= 0.3).select(col("doc_id"))
      val bench = docs.filter(col("doc_id") < 5)
      val corpus = docs.filter(col("doc_id") >= 5)
      val contaminated = TextAnalysis.contamination(corpus, bench, n = 4)
        .select(col("doc_id"))
      val u = conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long")
      val weights = mixtureWeights.toDF("source", "keep_frac")
      val kept = corpus
        .join(fp, "doc_id")
        .join(quality, "doc_id")
        .join(contaminated, Seq("doc_id"), "left_anti")
        .join(broadcast(weights), Seq("source"))
        .filter(u < (col("keep_frac") * 65536).cast("long"))
        .select(docs.columns.map(col): _*)
      TextAnalysis.sequencePacking(kept)
        .orderBy("doc_id", "source", "n_tokens", "seq_id")
    }),

    // Corpus snapshot diff (dataset versioning): FULL OUTER join of two
    // corpus versions on doc_id comparing content fingerprints ->
    // added / removed / changed rows (v2 is a deterministic derivation:
    // drop doc_id%7, edit doc_id%11, add doc_id%13 under new ids).
    // At scale both sides shuffle once on doc_id; only fingerprints
    // cross the wire, never text.
    "q58_snapshot_diff" -> ((s, dir) => {
      import graft.functions.TextFunctions
      val docs = Tables.documents(s, dir)
      val v1 = docs.select(col("doc_id"),
        TextFunctions.fingerprintMd5(col("text")).as("fp_a"))
      val v2base = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(11)) === 0,
            concat(col("text"), lit(" edited"))).otherwise(col("text")).as("text"))
      val v2new = docs.filter(pmod(col("doc_id"), lit(13)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val v2 = v2base.union(v2new)
        .select(col("doc_id"), TextFunctions.fingerprintMd5(col("text")).as("fp_b"))
      v1.join(v2, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("fp_a").isNull, "added")
            .when(col("fp_b").isNull, "removed")
            .when(col("fp_a") =!= col("fp_b"), "changed")
            .otherwise("same").as("status"))
        .filter(col("status") =!= "same")
        .orderBy("doc_id", "status")
    }),

    // Semi-structured extraction: parse the JSON `props` column with a
    // declared schema (from_json stays codegen'd — scan-speed shredding)
    // and aggregate the extracted field per event type. At 100 TB this
    // is the ELT shred step: no UDF, the parser runs inside the scan
    // stage and only (type, k) reaches the aggregate.
    "q59_json_props" -> ((s, dir) => {
      val k = expr("from_json(props, 'k BIGINT').k")
      Tables.events(s, dir)
        .select(col("event_type"), k.as("k"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type", "n", "sum_k", "min_k", "max_k")
    }),

    // Intra-document repetition (Gopher-style quality signal): distinct
    // vs total 3-gram counts per document.
    "q42_repetition" -> ((s, dir) => {
      TextAnalysis.repetition(Tables.documents(s, dir), n = 3)
        .select(col("doc_id"), col("n_grams"), col("n_distinct"),
          r4(col("distinct_ratio")).as("distinct_ratio"))
        .orderBy("doc_id")
    }),

    // Explicit GROUPING SETS with per-column grouping flags — completes
    // the grouping family (rollup q10, cube q34): only the two
    // single-column marginals plus the grand total, with grouping()
    // flags distinguishing "NULL group value" from "aggregated-away".
    "q60_grouping_sets" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("long").as("g_rf"),
          grouping(col("l_linestatus")).cast("long").as("g_ls"),
          r2(sum(col("l_quantity"))).as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("g_rf"), col("g_ls"), col("sum_qty"), col("n"))
        .orderBy("returnflag", "linestatus", "g_rf", "g_ls", "sum_qty", "n")
    }),

    // CUBE grouping sets (all four grouping combinations).
    "q34_cube" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sq"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          r2(col("sq")).as("sum_qty"), col("n"))
        .orderBy("returnflag", "linestatus")
    }),

    // Correlated-subquery shape: orders above their customer's average
    // (decorrelated to a window aggregate — no per-row subquery at scale).
    "q35_above_avg_orders" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
      Tables.orders(s, dir)
        .withColumn("cust_avg", avg(col("o_totalprice")).over(w))
        .filter(col("o_totalprice") > col("cust_avg"))
        .select(col("o_orderkey"), col("o_custkey"),
          r2(col("o_totalprice")).as("o_totalprice"))
        .orderBy("o_orderkey", "o_custkey", "o_totalprice")
    }),

    // Composed corpus filter: fingerprint-dedup survivors that also pass
    // the quality floor — the end-to-end "clean the corpus" pipeline.
    "q31_corpus_filter" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val survivors = Dedup.byFingerprint(docs).select(col("doc_id"))
      val quality = TextAnalysis.qualityMetrics(docs)
        .filter(col("quality") >= 0.3)
        .select(col("doc_id"), col("n_tokens_ws"), col("quality"))
      survivors.join(quality, "doc_id")
        .select(col("doc_id"), col("n_tokens_ws"),
          r4(col("quality")).as("quality"))
        .orderBy("doc_id", "n_tokens_ws", "quality")
    }),

    // Fixed-iteration PageRank over the customer→supplier purchase
    // graph (suppliers offset by 100000 to disjoin the id spaces) —
    // link-authority scoring, the graph-centrality sibling of q49's
    // connected components. Deterministic: 10 rounds, not
    // convergence-tested.
    "q61_pagerank" -> ((s, dir) => {
      val edges = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (lit(100000L) + col("l_suppkey")).as("dst"))
      GraphOps.pageRank(edges, iters = 10)
        .select(col("v").as("node_id"), col("pr").as("pagerank"))
        .orderBy("node_id")
    }),

    // Segment-level dedup with document reconstruction (C4-style line
    // dedup on 8-token segments): keep each distinct segment's first
    // global occurrence, rebuild docs from survivors in order. Exact
    // duplicates of earlier docs vanish entirely.
    "q62_segment_dedup" -> ((s, dir) => {
      TextAnalysis.segmentDedupRebuild(Tables.documents(s, dir))
        .orderBy("doc_id")
    }),

    // One-pass histogram quantile sketch per return flag — the
    // mergeable at-scale sibling of q33's exact percentiles; every
    // estimate is the bin upper edge at rank ceil(q·n), exact
    // arithmetic end to end.
    "q63_histogram_quantiles" -> ((s, dir) => {
      Sketches.histogramQuantiles(Tables.lineitem(s, dir),
          "l_extendedprice", "l_returnflag")
        .select(col("grp").as("l_returnflag"), col("n"),
          col("p25"), col("p50"), col("p75"), col("p95"))
        .orderBy("l_returnflag")
    }),

    // SemDeDup semantic dedup: k-means cells (the bit-exact q44
    // trainer) + intra-cell cosine drop — survivors with their cluster
    // geometry. The at-scale complement of q37's LSH blocking.
    "q64_semantic_dedup" -> ((s, dir) => {
      Dedup.semanticDedup(s, Tables.embeddings(s, dir))
        .orderBy("vec_id")
    }),

    // Embedding dimension correlation (top-20 |Pearson| pairs) via the
    // Gram-matrix pattern: per-row outer-product expansion folded by
    // the typed VectorSum Aggregator — one moment vector per task ever
    // reaches the shuffle.
    "q65_dim_correlation" -> ((s, dir) => {
      Similarity.dimCorrelationTopK(s, Tables.embeddings(s, dir))
        .orderBy("rank")
    }),

    // MERGE INTO / CDC apply: a deterministic changeset (updates =
    // uppercased text on doc_id%7=0, deletes on doc_id%11=3, inserts =
    // reversed text under doc_id+1e6 on doc_id%13=0) applied to the
    // documents snapshot via anti-join + union — the broadcastable
    // merge shape (base never shuffles).
    "q66_merge_apply" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val changes = docs.select(col("doc_id"),
          when(pmod(col("doc_id"), lit(11)) === 3, "D")
            .when(pmod(col("doc_id"), lit(7)) === 0, "U").as("op"),
          upper(col("text")).as("text"), col("lang"), col("source"),
          col("n_chars"))
        .filter(col("op").isNotNull)
        .unionByName(docs.filter(pmod(col("doc_id"), lit(13)) === 0)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"),
            lit("U").as("op"), reverse(col("text")).as("text"),
            col("lang"), col("source"), col("n_chars")))
      Relational.mergeApply(docs, changes, "doc_id")
        .select(col("doc_id"), col("source"), md5(col("text")).as("text_md5"),
          length(col("text")).cast("long").as("n_chars_new"))
        .orderBy("doc_id")
    }),

    // JSONL round-trip: parquet -> JSONL on disk -> schema'd read ->
    // per-source aggregate. The oracle computes the same aggregate from
    // the parquet directly, so any loss in the JSON write/read path
    // (encoding, nulls, type widening) breaks the hash.
    "q67_jsonl_roundtrip" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val path = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_q67_${math.abs(dir.hashCode)}"
      graft.sources.JsonIO.writeJsonl(docs, path)
      graft.sources.JsonIO.readJsonl(s, path, docs.schema)
        .groupBy("source").agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          countDistinct(md5(col("text"))).as("n_distinct_texts"))
        .orderBy("source")
    }),

    // Per-user time-series features: truncated EWMA (α=1/2 — exact
    // binary weights, bit-identical fold both engines) + rolling
    // mean/min/max over the last 32 events.
    "q68_ewma_features" -> ((s, dir) => {
      TimeSeries.ewmaFeatures(Tables.events(s, dir))
        .select(col("event_id"), col("user_id"), tsStr(col("ts")).as("ts"),
          r2(col("value")).as("value"), r4(col("ewma")).as("ewma"),
          r4(col("roll_mean")).as("roll_mean"),
          r2(col("roll_min")).as("roll_min"),
          r2(col("roll_max")).as("roll_max"))
        .orderBy("event_id")
    }),

    // HyperLogLog distinct count: per-flag distinct orders via 256
    // integer registers — the shuffle carries <= m counter rows per
    // group instead of every distinct key (the 100 TB replacement for
    // q08's exact countDistinct); exact count rides along as ground
    // truth, registers verified bit-for-bit by the oracle.
    "q69_hll_distinct" -> ((s, dir) => {
      Sketches.hllDistinct(Tables.lineitem(s, dir), "l_orderkey",
          "l_returnflag")
        .orderBy("grp")
    }),

    // Bloom-prefiltered semi join — the manual runtime row-level
    // filter: customers holding an urgent-priority order, with the
    // customer scan probed against a 4 KB bloom of the urgent custkeys
    // BEFORE any exchange. The closing exact semi join removes the
    // bloom's false positives, so the result is byte-identical to a
    // plain semi join (the oracle) for any sketch size; at 100 TB the
    // fact-side shuffle drops from |fact| to |matches| + fpp·|fact|.
    "q70_bloom_semi_join" -> ((s, dir) => {
      val urgent = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
      Sketches.bloomSemiJoin(Tables.customer(s, dir), urgent,
          "c_custkey", "o_custkey")
        .groupBy(col("c_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          r2(sum(col("c_acctbal"))).as("sum_acctbal"))
        .orderBy("nationkey")
    }),

    // Unigram LM quality scoring (the CCNet-style perplexity filter
    // with the corpus as its own model): mean negative log-likelihood
    // per document. Raw doubles (q65 precedent — sub-1e-12 summation
    // noise sits far inside the compare tolerance).
    "q71_lm_quality" -> ((s, dir) => {
      TextAnalysis.unigramLogProb(Tables.documents(s, dir))
        .orderBy("doc_id")
    }),

    // Exact 2-sigma outlier counts per (user, event_type) with the
    // threshold algebraized into DECIMAL(38,0) — no float boundary on
    // the comparison, so membership is bit-identical to the oracle's
    // HUGEINT evaluation.
    "q72_outlier_counts" -> ((s, dir) => {
      TimeSeries.outlierCounts(Tables.events(s, dir))
        .orderBy("user_id", "event_type")
    }),

    // Token co-occurrence PMI over the top-50 vocabulary — pair space
    // bounded at v^2/2 per doc by the broadcast vocab, never a corpus
    // cross product.
    "q73_pmi_cooccurrence" -> ((s, dir) => {
      TextAnalysis.pmiCooccurrence(Tables.documents(s, dir))
    }),

    // Deterministic weighted sampling (Efraimidis–Spirakis): top-200
    // keys u^(1/w), content-addressed u, power-of-two weights so the
    // key is iterated IEEE sqrt — bit-identical to the oracle.
    "q74_weighted_sample" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.weightedSample(Tables.documents(s, dir),
          sampleWeights.toDF("source", "w"), 200)
        .orderBy(col("key").desc, col("doc_id").asc)
    }),

    // CSV round-trip: parquet -> RFC-4180-escaped CSV -> schema'd read
    // -> per-source aggregate. The oracle aggregates the parquet
    // directly, so any loss in quoting/escaping/typing across the CSV
    // boundary breaks the hash (q67's JSONL contract, for CSV).
    "q75_csv_roundtrip" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val path = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_q75_${math.abs(dir.hashCode)}"
      graft.sources.CsvIO.writeCsv(docs, path)
      graft.sources.CsvIO.readCsv(s, path, docs.schema)
        .groupBy("source").agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          countDistinct(md5(col("text"))).as("n_distinct_texts"))
        .orderBy("source")
    }),

    // Distributed BPE tokenizer training: the first 5 merge rules. One
    // corpus pass for word frequencies; every merge round then runs
    // over the vocabulary only (iteration cost independent of corpus
    // size).
    "q76_bpe_merges" -> ((s, dir) => {
      TextAnalysis.bpeMerges(Tables.documents(s, dir))
    }),

    // Exact triangle count on the market-basket parts graph: parts
    // co-purchased in >= 2 orders (the support threshold keeps the
    // graph sparse — the raw co-supplier graph is 90% of a complete
    // graph at sf0.1 and makes EXACT triangle counting quadratic by
    // construction; dense graphs want sampling estimators, not exact
    // counts). Engine orients edges by (degree, id) — O(sqrt(m))
    // out-neighborhoods even under skew; the oracle id-orients, valid
    // because the count is orientation-invariant.
    "q77_triangle_count" -> ((s, dir) => {
      val os = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("pk"))
        .distinct()
      val pairs = os.as("pa")
        .join(os.as("pb"),
          col("pa.o") === col("pb.o") && col("pa.pk") < col("pb.pk"))
        .groupBy(col("pa.pk").as("a"), col("pb.pk").as("b"))
        .agg(count(lit(1)).as("n_cooccur"))
        .filter(col("n_cooccur") >= 2)
        .select(col("a"), col("b"))
      GraphOps.triangleCount(pairs)
    }),

    // Ordered conversion funnel view -> click -> purchase with
    // first-touch semantics (each stage strictly after the previous
    // stage's first qualifying event).
    "q78_funnel" -> ((s, dir) => {
      Relational.funnel(Tables.events(s, dir),
          Seq("view", "click", "purchase"))
        .orderBy("stage_idx")
    }),

    // Cohort retention: users cohorted by first-active epoch day,
    // (cohort_day, offset) -> distinct active users.
    "q79_cohort_retention" -> ((s, dir) => {
      Relational.cohortRetention(Tables.events(s, dir))
        .orderBy("cohort_d", "offset_d")
    }),

    // BPE ENCODE: q76's learned merges applied back to the corpus —
    // per-source token compression (chars vs post-merge tokens). The
    // corpus text is read once for the (source, word) frequencies; the
    // symbol table stays vocabulary-bounded.
    "q80_bpe_encode" -> ((s, dir) => {
      TextAnalysis.bpeEncode(Tables.documents(s, dir))
        .orderBy("source")
    }),

    // Containment rerank over the LSH candidates: |A∩B| / min(|A|,|B|)
    // — catches a doc quoted inside a larger one (high containment,
    // low jaccard). Threshold as an exact-integer inequality.
    "q81_containment" -> ((s, dir) => {
      Dedup.lshContainmentPairs(s, Tables.documents(s, dir))
        .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_min"),
          r4(col("n_inter").cast("double") / col("n_min"))
            .as("containment"))
        .orderBy("doc_a", "doc_b")
    }),

    // Per-source distribution drift: KL(P_src || P_corpus) over token
    // frequencies, add-one smoothed on the corpus vocabulary — the
    // mixture-monitoring primitive. Raw doubles (q65/q71 precedent).
    "q82_source_drift_kl" -> ((s, dir) => {
      TextAnalysis.sourceDriftKl(Tables.documents(s, dir))
        .orderBy("source")
    }),

    // Per-type value stats through the TYPED Aggregator tier (Welford
    // online variance, merged with Chan's formula) — puts the UDAF
    // extension path itself under the oracle gate.
    "q83_welford_variance" -> ((s, dir) => {
      val welford = udaf(graft.functions.Aggregators.WelfordVariance)
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          r4(avg(col("value"))).as("mean_value"),
          r4(welford(col("value"))).as("var_value"))
        .orderBy("event_type")
    }),

    // Time-weighted average price per part over its shipment history:
    // each price holds until the next shipment (lead window), weight =
    // holding seconds; last observation carries zero weight and the
    // plain average rides along. One window pass, partitioned by part.
    "q84_twap" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_partkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      val nextTs = lead(unix_timestamp(col("l_shipdate")), 1)
        .over(w)
      val weight = (nextTs - unix_timestamp(col("l_shipdate")))
        .cast("double")
      Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_extendedprice").as("price"),
          weight.as("wt"))
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_ship"),
          r2(sum(col("price") * col("wt")) / sum(col("wt"))).as("twap"),
          r2(avg(col("price"))).as("plain_avg"))
        .filter(col("n_ship") >= 2)
        .orderBy("l_partkey")
    }),

    // Week-over-week trending parts: shipment counts per (part, week),
    // lag-1 ratio with +1 smoothing, top 50 risers — the corpus-drift
    // shape on the relational side (two bounded aggregates + one
    // window over the part's own week series).
    // Top user journeys: sessionized (30-min gap) first-5 event-type
    // paths, counted — order-deterministic via in-group struct sort.
    "q87_top_journeys" -> ((s, dir) => {
      Relational.topJourneys(Tables.events(s, dir))
    }),

    // Event-type transition matrix (first-order Markov): per-user
    // lag-1 pairs, global counts, and the row-normalized transition
    // probability — the behavioral model behind q87's journeys. One
    // window pass partitioned by user; the matrix is
    // |event_types|^2-bounded.
    "q94_type_transitions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
      val totals = pairs.groupBy("prev_type")
        .agg(sum(col("n")).as("n_from"))
      pairs.join(totals, "prev_type")
        .select(col("prev_type"), col("next_type"), col("n"),
          r4(col("n").cast("double") / col("n_from")).as("p"))
        .orderBy("prev_type", "next_type")
    }),

    // Cross-source leakage matrix at PASSAGE granularity: 8-token
    // segment fingerprints (q62's segmentation) present in both
    // sources of a pair — the check run before declaring two subsets
    // independent (train vs eval leaks passages, rarely whole docs).
    // Pair space is per-fingerprint (sources sharing that segment),
    // never cross-corpus; only 16-byte digests shuffle.
    "q93_leakage_matrix" -> ((s, dir) => {
      import graft.functions.TextFunctions
      val toks = TextFunctions.wsTokens(col("text"))
      val nSeg = ((size(toks) + lit(7)) / lit(8)).cast("int")
      val fps = Tables.documents(s, dir)
        .select(col("source"), explode(transform(
          sequence(lit(0), nSeg - lit(1)),
          j => md5(array_join(slice(toks, j * lit(8) + lit(1), lit(8)),
            " ")))).as("fp"))
        .distinct()
      fps.as("fa")
        .join(fps.as("fb"),
          col("fa.fp") === col("fb.fp") &&
            col("fa.source") < col("fb.source"))
        .groupBy(col("fa.source").as("source_a"),
          col("fb.source").as("source_b"))
        .agg(count(lit(1)).as("n_shared_segments"))
        .orderBy("source_a", "source_b")
    }),

    // Incremental ingest: a new batch (deterministic derivation —
    // docs with id%5==0 resubmitted verbatim, id%7==0 with an
    // " update" suffix under a new id, id%11==0 brand-new reversed
    // text) admitted against the BASE corpus by exact-fingerprint
    // anti-join. Per-doc verdict: duplicate_of_base / admitted. The
    // base side ships only 16-byte fingerprints — at 100 TB the
    // admission check shuffles digests, never text.
    "q92_incremental_ingest" -> ((s, dir) => {
      import graft.functions.TextFunctions
      val base = Tables.documents(s, dir)
      val batch = base.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select((col("doc_id") + 2000000L).as("new_id"), col("text"))
        .unionByName(base.filter(pmod(col("doc_id"), lit(7)) === 0)
          .select((col("doc_id") + 3000000L).as("new_id"),
            concat(col("text"), lit(" update")).as("text")))
        .unionByName(base.filter(pmod(col("doc_id"), lit(11)) === 0)
          .select((col("doc_id") + 4000000L).as("new_id"),
            reverse(col("text")).as("text")))
      val baseFp = base
        .select(TextFunctions.fingerprintMd5(col("text")).as("fp"))
        .distinct()
      batch
        .select(col("new_id"),
          TextFunctions.fingerprintMd5(col("text")).as("fp"))
        .join(baseFp.withColumn("in_base", lit(1L)), Seq("fp"), "left")
        .select(col("new_id"),
          when(col("in_base").isNotNull, "duplicate_of_base")
            .otherwise("admitted").as("verdict"))
        .orderBy("new_id")
    }),

    // Keep-best survivor selection over the near-dup clusters: real
    // pipelines keep the most complete copy (longest text, id
    // tie-break), not the arbitrary min-id — the policy layer on top
    // of q49's cluster assignment.
    "q91_dedup_keep_best" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val pairs = Dedup.minhashLshPairs(s, Tables.documents(s, dir))
        .select(col("doc_a"), col("doc_b"))
      val clusters = GraphOps.dedupClusters(pairs)
      val rk = row_number().over(Window.partitionBy(col("cluster_id"))
        .orderBy(col("n_chars").desc, col("doc_id").asc))
      clusters
        .join(Tables.documents(s, dir).select("doc_id", "n_chars"), "doc_id")
        .withColumn("rk", rk)
        .filter(col("rk") === 1)
        .select(col("cluster_id"), col("doc_id").as("survivor_id"),
          col("cluster_size"), col("n_chars").as("n_chars_kept"))
        .orderBy("cluster_id")
    }),

    // PII compliance report: per-source match counts + density per
    // 10k chars (integer counts; one exact double division, r4).
    "q90_pii_density" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      Tables.documents(s, dir)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars"),
          sum(piiCount(col("text"), emailRe)).as("n_emails"),
          sum(piiCount(col("text"), phoneRe)).as("n_phones"),
          sum(piiCount(col("text"), ipRe)).as("n_ips"))
        .select(col("source"), col("n_docs"),
          col("n_emails"), col("n_phones"), col("n_ips"),
          r4((col("n_emails") + col("n_phones") + col("n_ips"))
            .cast("double") * lit(10000.0) / col("n_chars"))
            .as("pii_per_10k_chars"))
        .orderBy("source")
    }),

    // Cluster cohesion: per-label centroid + member-to-centroid cosine
    // stats — embedding hygiene for a labeled corpus; centroids are a
    // labels-sized broadcast, zero pairwise work.
    "q88_cluster_cohesion" -> ((s, dir) => {
      Similarity.clusterCohesion(s, Tables.embeddings(s, dir))
        .select(col("label"), col("n_vecs"),
          r4(col("avg_cos")).as("avg_cos"), r4(col("min_cos")).as("min_cos"))
        .orderBy("label")
    }),

    // Dataset card: the per-source corpus summary a training-data
    // pipeline publishes — doc/token/dup counts and the majority
    // language, all exact aggregates (the mode via a deterministic
    // (count, lang) argmax).
    "q89_dataset_card" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      val perLang = docs.groupBy("source", "lang")
        .agg(count(lit(1)).as("n_lang"))
      val topLang = perLang
        .withColumn("rk", row_number().over(Window.partitionBy("source")
          .orderBy(col("n_lang").desc, col("lang").asc)))
        .filter(col("rk") === 1)
        .select(col("source"), col("lang").as("top_lang"),
          col("n_lang").as("top_lang_docs"))
      docs.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(graft.functions.TextFunctions.tokenCountWs(col("text")))
            .as("n_tokens"),
          countDistinct(md5(col("text"))).as("n_distinct_texts"),
          sum(col("n_chars")).as("n_chars"))
        .join(topLang, "source")
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("n_chars"),
          (col("n_docs") - col("n_distinct_texts")).as("n_dup_docs"),
          col("top_lang"), col("top_lang_docs"))
        .orderBy("source")
    }),

    // Per-user OLS value trend — slope over centered time (exact
    // integer centering keeps the moment sums inside exact-double
    // range; raw-double output, q65 precedent).
    "q86_user_trend" -> ((s, dir) => {
      TimeSeries.olsTrend(Tables.events(s, dir))
        .orderBy("user_id")
    }),

    "q85_trending_parts" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wk = floor(unix_timestamp(col("l_shipdate")) / lit(604800L))
        .cast("long")
      val counts = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"), wk.as("week"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("l_partkey")).orderBy(col("week"))
      counts
        .select(col("l_partkey"), col("week"), col("cnt"),
          lag(col("cnt"), 1).over(w).as("prev_cnt"))
        .filter(col("prev_cnt").isNotNull)
        .select(col("l_partkey"), col("week"), col("cnt"), col("prev_cnt"),
          r4((col("cnt") + lit(1)).cast("double") /
            (col("prev_cnt") + lit(1))).as("ratio"))
        .orderBy(col("ratio").desc, col("l_partkey").asc, col("week").asc)
        .limit(50)
    }),

    // KMV k-minimum-values sketch: pairwise source overlap (Jaccard +
    // union cardinality) from k=64 retained hashes per source — the
    // set-INTERSECTION sketch q69's HLL cannot express. est columns
    // next to their exact ground truth, q52-style.
    "q95_kmv_overlap" -> ((s, dir) => {
      Sketches.kmvSourceOverlap(s, Tables.documents(s, dir))
    }),

    // Hashed-feature linear quality classifier at scan speed: the
    // token→bucket→weight chain folded inside one aggregate() HOF —
    // zero shuffle, exact integer score.
    "q96_quality_classifier" -> ((s, dir) => {
      TextAnalysis.qualityClassifier(s, Tables.documents(s, dir))
    }),

    // Deterministic contrastive negative sampling: 4 hash-derived
    // negatives per anchor doc, joined back for the negative's
    // source and a cross-source marker. Reshuffle-stable (content
    // hash of the anchor id), one hash-join on neg_id.
    "q97_contrastive_pairs" -> ((s, dir) => {
      import graft.functions.GraftFunctions
      GraftFunctions.register(s)
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
      val n = docs.groupBy().agg(count(lit(1)).as("n_docs"))
      val negs = docs.crossJoin(broadcast(n))
        .select(col("doc_id"), col("source"), col("n_docs"),
          explode(sequence(lit(0L), lit(3L))).as("slot"))
        .withColumn("neg_id",
          pmod(GraftFunctions.hash64Seeded(lit(300L) + col("slot"),
            col("doc_id").cast("string")), col("n_docs")))
        .filter(col("neg_id") =!= col("doc_id"))
      negs.join(docs.select(col("doc_id").as("neg_id"),
          col("source").as("neg_source")), "neg_id")
        .select(col("doc_id"), col("slot"), col("neg_id"),
          col("neg_source"),
          (col("neg_source") =!= col("source")).cast("int")
            .as("cross_source"))
        .orderBy("doc_id", "slot")
    }),

    // BM25 keyword retrieval: full posting-set scores for a fixed
    // 4-query workload — query terms broadcast, tf inside a per-row
    // HOF (no token explode / inverted-index shuffle).
    "q98_bm25_retrieval" -> ((s, dir) => {
      TextAnalysis.bm25(Tables.documents(s, dir), bm25Queries)
    }),

    // Overlapping passage chunking (RAG unit): window 32 / stride 24
    // token chunks with offsets + md5 chunk fingerprint. Pure per-row
    // explode, zero shuffle.
    "q99_passage_chunks" -> ((s, dir) => {
      TextAnalysis.passageChunks(Tables.documents(s, dir))
    }),

    // Bigram LM quality scoring: add-half-smoothed corpus bigram
    // model, per-doc NLL — q71's unigram scorer one context up.
    "q100_bigram_lm" -> ((s, dir) => {
      TextAnalysis.bigramLogProb(Tables.documents(s, dir))
    }),

    // Telemetry debounce: drop events < 5 s after the same
    // (user, type) predecessor. Microsecond-long comparisons, one
    // keyed window pass.
    "q101_event_debounce" -> ((s, dir) => {
      TimeSeries.debounce(Tables.events(s, dir))
    }),

    // Robust anomaly stats: per-type median, MAD, 3-MAD outlier
    // count — the robust sibling of q72's 2-sigma counts.
    "q102_mad_anomaly" -> ((s, dir) => {
      TimeSeries.madAnomaly(Tables.events(s, dir))
    }),

    // Inter-document novelty: fraction of a doc's distinct 3-gram
    // shingles first seen in this doc (min-doc_id attribution).
    "q103_shingle_novelty" -> ((s, dir) => {
      TextAnalysis.shingleNovelty(Tables.documents(s, dir))
    }),

    // Deequ-style data-quality profile: one scan over lineitem, all
    // four numeric measures columns at once (Expand-planned multi-
    // distinct), decimal-exact sums.
    "q104_table_profile" -> ((s, dir) => {
      Relational.profile(Tables.lineitem(s, dir),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    }),

    // Incremental view maintenance: base partials (event_id % 10 != 0)
    // merged with the delta batch (% 10 == 0) — bit-equal to a full
    // recompute because the sums are exact decimals (associative).
    "q105_incremental_agg" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      Relational.finalizePartials(Relational.mergePartials(
        Relational.aggPartials(ev.filter(col("event_id") % 10 =!= 0)),
        Relational.aggPartials(ev.filter(col("event_id") % 10 === 0))))
    }),

    // Retrieval eval harness: MRR/nDCG/P/R@10 for q98's workload under
    // an integer coordination-tf ranking (rank boundaries bit-exact
    // across engines) and md5-derived relevance labels.
    "q106_retrieval_eval" -> ((s, dir) => {
      TextAnalysis.retrievalEval(Tables.documents(s, dir), bm25Queries)
    }),

    // Tokenizer-vocab coverage: top-500 corpus vocab, per-source OOV
    // rate — the "does this slice fit the tokenizer" gate.
    "q107_vocab_coverage" -> ((s, dir) => {
      TextAnalysis.vocabCoverage(Tables.documents(s, dir))
    }),

    // Character Shannon entropy + evenness per doc (Gopher-family
    // quality signal; deterministic sorted fold).
    "q108_char_entropy" -> ((s, dir) => {
      TextAnalysis.charEntropy(Tables.documents(s, dir))
    }),

    // Hourly LOCF gap-fill on the custom as-of physical operator —
    // grid probes per-user reading history backward in time.
    "q109_gap_fill" -> ((s, dir) => {
      TimeSeries.gapFillHourly(Tables.events(s, dir))
    }),

    // Deterministic word-dropout augmentation (content+position keyed
    // md5 residues — reproducible train-time noise).
    "q110_word_dropout" -> ((s, dir) => {
      TextAnalysis.wordDropout(Tables.documents(s, dir))
    }),

    // Length-percentile calibration: histogram-join percent_rank
    // (per-source + global) with integer sort keys.
    "q111_length_calibration" -> ((s, dir) => {
      TextAnalysis.lengthCalibration(Tables.documents(s, dir))
    }),

    // Inverted-index build: per-term df + capped ascending posting
    // list (rank-filtered BEFORE collection — no unbounded buffers).
    "q112_posting_lists" -> ((s, dir) => {
      TextAnalysis.postingLists(Tables.documents(s, dir))
    }),

    // Temperature-weighted source mixture: p_temp ∝ p_raw^0.3
    // renormalized; upsample factor per source.
    "q113_temperature_mixture" -> ((s, dir) => {
      TextAnalysis.temperatureMixture(Tables.documents(s, dir))
    }),

    // Codec round-trip: text bytes → real grayscale PNG → real
    // ImageIO decode → decoded-domain integer pixel stats (the
    // oracle derives them analytically from the bytes — a fake or
    // lossy codec cannot pass).
    "q114_image_roundtrip" -> ((s, dir) => {
      Multimodal.imageRoundTrip(s, Tables.documents(s, dir))
    }),

    // Audio-codec round-trip: text bytes → real RIFF/WAV (8-bit
    // unsigned PCM) → real AudioSystem decode → integer frame/sample
    // stats the oracle derives analytically.
    "q115_audio_roundtrip" -> ((s, dir) => {
      Multimodal.audioRoundTrip(s, Tables.documents(s, dir))
    }),

    // Wide→long unpivot of the lineitem measure family — a single
    // Expand over the scan, the inverse of q32's pivot.
    "q116_unpivot_measures" -> ((s, dir) => {
      Relational.unpivotMeasures(Tables.lineitem(s, dir))
    }),

    // Image perceptual near-dup: dHash over the real ImageIO decode,
    // hamming<=3 pairing via 16-bit chunk buckets (pigeonhole-
    // complete), aHash distance as the second opinion.
    "q117_image_neardup" -> ((s, dir) => {
      Multimodal.perceptualNearDupPairs(s, Tables.documents(s, dir))
        .orderBy("doc_a", "doc_b")
    }),

    // Cross-document repeated-substring spans (Lee et al.-style) —
    // shingle-chain extension of duplicated 8-token runs; shuffle keys
    // are the shingle and the doc, never a suffix-array sort.
    "q118_repeated_substrings" -> ((s, dir) => {
      TextAnalysis.repeatedSubstringSpans(Tables.documents(s, dir))
        .orderBy("doc_id", "span_start")
    }),

    // The actionable half of q118: cut every detected span and rebuild
    // each document from the survivors (ExactSubstr removal policy).
    "q119_substring_removal" -> ((s, dir) => {
      TextAnalysis.removeRepeatedSubstrings(Tables.documents(s, dir))
        .orderBy("doc_id")
    }),

    // Video frame sampling under the oracle gate: every video-kind
    // payload through the real 64-byte chunker (stride 2), per-frame
    // integer stats the oracle derives from the source bytes.
    "q120_video_frames" -> ((s, dir) => {
      Multimodal.videoFrameStats(s, Tables.documents(s, dir))
    }),

    // Record linkage: multi-blocked candidate generation (nation +
    // name-digit suffix), pair dedup, trigram-jaccard + balance-
    // proximity scoring, one-best assignment per customer.
    "q121_entity_match" -> ((s, dir) => {
      EntityResolution.linkCustomersToSuppliers(
        Tables.customer(s, dir), Tables.supplier(s, dir))
        .orderBy("c_custkey")
    }),

    // SCD Type-2 dimension build: per-customer order-status change
    // points collapsed into validity intervals (valid_from/valid_to,
    // version, is_current) — two windows over one partitioning.
    "q122_scd2_history" -> ((s, dir) => {
      Relational.scd2History(Tables.orders(s, dir))
        .select(col("o_custkey"), col("status"),
          tsStr(col("valid_from_ts")).as("valid_from"),
          tsStr(col("valid_to_ts")).as("valid_to"),
          col("version"), col("is_current"))
        .orderBy("o_custkey", "version")
    }),

    // JL-style dimensionality reduction with a deterministic ±1
    // projection over int8-quantized embeddings — integer-exact, so
    // the projection itself sits under the hash-oracle gate.
    "q123_random_projection" -> ((s, dir) => {
      Similarity.randomProjection(Tables.embeddings(s, dir))
        .orderBy("vec_id")
    }),

    // Contrastive hard negatives: top-k most-similar vectors with a
    // DIFFERENT label per anchor (q20's broadcast shape + label
    // disequality in the join).
    "q124_hard_negatives" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.hardNegatives(s, emb, emb.filter(col("vec_id") < 5), 10)
        .select(col("anchor_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), r4(col("cos")).as("cos"))
        .orderBy("anchor_id", "rank")
    }),

    // Per-group top-k tokens via the mergeable SpaceSaving sketch —
    // capacity 64 ≥ the 31-token per-source vocabulary, so the sketch
    // is exact (err=0) and the DuckDB oracle certifies it; the
    // approximate regime is property-tested.
    "q126_spacesaving_topk" -> ((s, dir) => {
      Sketches.spaceSavingTopTokens(s, Tables.documents(s, dir))
    }),

    // PCA projection: distributed Gram moments (the q65 aggregate) →
    // driver FIXED-ROUND power iteration + deflation → broadcast
    // top-r basis vectors as literals. The oracle unrolls the same
    // rounds in DuckDB list folds (q61/q129 technique), so the whole
    // pipeline is hash-certified; eigen GEOMETRY (orthonormality,
    // Jacobi cross-check, captured variance) is spec-verified.
    "q125_pca_project" -> ((s, dir) => {
      val p = Similarity.pcaProject(s, Tables.embeddings(s, dir), r = 4)
      p.select(col("vec_id") +:
        p.columns.filter(_.startsWith("c")).map(c => r4(col(c)).as(c)): _*)
        .orderBy("vec_id")
    }),

    // EXACT all-pairs shingle-jaccard join via prefix filtering
    // (AllPairs/PPJoin) — the uncapped exact scale form retiring q16's
    // capped baseline; the oracle computes plain all-pairs, so the
    // hash match certifies prefix filtering is result-preserving.
    "q127_prefix_filter_jaccard" -> ((s, dir) => {
      Dedup.prefixFilterJaccardPairs(Tables.documents(s, dir), 0.5)
        .select(col("doc_a"), col("doc_b"), r4(col("jaccard")).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    }),

    // Per-customer order-value quantiles via the MRL mergeable
    // quantile sketch — bounded groups keep it in the exact regime
    // (finish ≡ DuckDB quantile_disc), so the oracle certifies sketch
    // + merge; rank-error bounds are property-tested.
    "q128_mrl_quantiles" -> ((s, dir) => {
      val q = Sketches.mrlQuantilesPerCustomer(s, Tables.orders(s, dir))
      q.select(col("o_custkey"), col("n_orders"),
        r4(col("p25")).as("p25"), r4(col("p50")).as("p50"),
        r4(col("p75")).as("p75"), r4(col("p95")).as("p95"))
        .orderBy("o_custkey")
    }),

    // PQ-ADC approximate top-k (Jégou et al. product quantization):
    // per-subspace codebooks trained deterministically over a bounded
    // sample, corpus encoded to m byte codes per vector, queries score
    // via LUT folds, exact-cosine rerank — every double mirrored by
    // the oracle's unrolled per-subspace SQL. The IVF-composed form
    // (ivfPqTopK) is spec-bounded for recall.
    "q129_pq_adc_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.pqAdcTopK(s, emb, emb.filter(col("vec_id") < 5))
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          r4(col("cos")).as("cos"))
        .orderBy("query_id", "rank")
    }),

    // Cluster-safe train/val split: the split key is the NEAR-DUP
    // CLUSTER, not the document, so near-duplicates can never straddle
    // train and val — closing the leakage trap q41/q93 only DETECT
    // (a near-copy of a training doc sitting in the eval split).
    // Singletons fall back to their own doc_id as cluster id; the
    // same md5-prefix rule as q30 keeps the split content-addressed
    // and reshuffle-stable.
    "q136_cluster_safe_split" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.minhashLshPairs(s, docs)
        .select(col("doc_a"), col("doc_b"))
      val clusters = GraphOps.dedupClusters(pairs)
        .select(col("doc_id"), col("cluster_id"))
      val firstHex = substring(md5(col("cluster_id").cast("string")), 1, 1)
      docs.select(col("doc_id")).join(clusters, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
        .select(col("doc_id"), col("cluster_id"),
          when(firstHex.isin("0", "1", "2", "3"), "val")
            .otherwise("train").as("split"))
        .orderBy("doc_id")
    }),

    // HLL rollup FROM SKETCHES: per-flag registers max-merge into the
    // 'ALL' union level — re-aggregation without revisiting keys, the
    // property that makes HLL the production distinct counter.
    "q135_hll_union_rollup" -> ((s, dir) => {
      Sketches.hllDistinctRollup(Tables.lineitem(s, dir),
        "l_orderkey", "l_returnflag")
        .orderBy("grp")
    }),

    // Personalized PageRank from 3 seed customers over the q61 graph —
    // teleport AND dangling mass confined to the seeds, so ranks
    // measure proximity to them (recommender primitive). Unreached
    // vertices (exactly 0.0 on both engines) are filtered out.
    "q134_personalized_pagerank" -> ((s, dir) => {
      val edges = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (lit(100000L) + col("l_suppkey")).as("dst"))
      GraphOps.personalizedPageRank(edges, Seq(1L, 2L, 3L), iters = 10)
        .filter(col("pr") > 0.0)
        .select(col("v").as("node_id"), col("pr").as("pagerank"))
        .orderBy("node_id")
    }),

    // First/last-touch revenue attribution with a 1-hour lookback —
    // the marketing-analytics rollup over the event stream (struct
    // min/max per purchase, no window sort; 'direct' = anti-join).
    "q133_touch_attribution" -> ((s, dir) => {
      Relational.touchAttribution(Tables.events(s, dir))
        .select(col("model"), col("touch_type"), col("n_purchases"),
          r4(col("revenue")).as("revenue"))
        .orderBy("model", "touch_type")
    }),

    // Image dedup end-to-end: q117's decoded-domain perceptual pairs →
    // connected components → keep-largest-payload survivor flag — the
    // multimodal sibling of q91's text keep-best.
    "q132_image_dedup_survivors" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      val pairs = Multimodal.perceptualNearDupPairs(s, docs)
        .select(col("doc_a"), col("doc_b"))
      val clusters = GraphOps.dedupClusters(pairs)
      val nb = docs.select(col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
      val rk = row_number().over(Window.partitionBy(col("cluster_id"))
        .orderBy(col("n_bytes").desc, col("doc_id").asc))
      clusters.join(nb, "doc_id")
        .withColumn("is_survivor", rk === 1)
        .select(col("cluster_id"), col("doc_id"), col("cluster_size"),
          col("is_survivor"), col("n_bytes"))
        .orderBy("cluster_id", "doc_id")
    }),

    // Per-user autocorrelation at lags 1..3 — the seasonality /
    // persistence diagnostic of the time-series family (q86's float
    // contract: r4-rounded double sums under the oracle).
    "q131_acf" -> ((s, dir) => {
      TimeSeries.acf(Tables.events(s, dir))
        .select(col("user_id"), col("n_events"),
          r4(col("r1")).as("r1"), r4(col("r2")).as("r2"),
          r4(col("r3")).as("r3"))
        .orderBy("user_id")
    }),

    // k-core of the customer-supplier graph (q61's edge set) by
    // fixed-round iterative peeling — rounds pinned so the oracle
    // unrolls them; converged rounds are provable no-ops.
    "q130_kcore" -> ((s, dir) => {
      val edges = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (lit(100000L) + col("l_suppkey")).as("dst"))
      GraphOps.kCore(edges, k = 10, rounds = 4)
        .select(col("v").as("node_id"), col("deg"))
        .orderBy("node_id")
    }),

    // Exact core NUMBER per vertex (the full decomposition q130's
    // single-k membership only bounds) via the h-index iteration —
    // rounds follow estimate-propagation depth (~6), not the
    // degeneracy (~60 a peel-per-k would pay). Integer-exact oracle
    // unrolls the same rounds.
    "q137_core_numbers" -> ((s, dir) => {
      val edges = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (lit(100000L) + col("l_suppkey")).as("dst"))
      GraphOps.coreNumbers(edges, rounds = 8)
        .orderBy("node_id")
    }),

    // Synchronous label-propagation communities: most-frequent
    // neighbor label, ties to the smallest — the deterministic LPA
    // form (pure integers, fixed rounds, bit-exact unrolled oracle).
    "q138_label_propagation" -> ((s, dir) => {
      val edges = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (lit(100000L) + col("l_suppkey")).as("dst"))
      GraphOps.labelPropagation(edges, rounds = 5)
        .orderBy("node_id")
    }),

    // HITS hubs & authorities on the DIRECTED customer→supplier graph
    // — q61's loop anatomy (fixed rounds, broadcast 1-row norms,
    // unrolled oracle, r4-rounded floats).
    "q139_hits" -> ((s, dir) => {
      val edges = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (lit(100000L) + col("l_suppkey")).as("dst"))
      GraphOps.hits(edges, iters = 10)
        .select(col("node_id"), r4(col("hub")).as("hub"),
          r4(col("authority")).as("authority"))
        .orderBy("node_id")
    }),

    // Holt linear-trend smoothing + 3-step forecast per user: the
    // exact per-key recurrence as ONE codegen aggregate fold over the
    // sorted series (α=β=1/2 → exact binary coefficients, oracle
    // replays the fold with list_reduce verbatim).
    "q140_holt_forecast" -> ((s, dir) => {
      val f = TimeSeries.holtForecast(Tables.events(s, dir))
      f.select(col("user_id"), col("n"),
        r4(col("level")).as("level"), r4(col("trend")).as("trend"),
        r4(col("f1")).as("f1"), r4(col("f2")).as("f2"),
        r4(col("f3")).as("f3"))
        .orderBy("user_id")
    }),

    // Funnel stage-transition latency: strictly-after first-touch
    // chaining with per-transition converting-user counts and p50/p90
    // conversion delays in integer microseconds (quantile_disc rule —
    // integer-exact under the oracle).
    "q142_funnel_latency" -> ((s, dir) => {
      Relational.funnelLatency(Tables.events(s, dir),
        Seq("view", "click", "purchase"))
        .orderBy("stage_idx")
    }),

    // Length-distribution-matched resampling: per-source acceptance
    // weights that reshape every source's length histogram to the
    // corpus-wide one; content-addressed accept/reject (q30/q43
    // convention), weights derived from identical integer counts on
    // both engines so even the boundary is deterministic.
    "q143_length_matched_resample" -> ((s, dir) => {
      val r = TextAnalysis.lengthMatchedResample(Tables.documents(s, dir))
      r.select(col("doc_id"), col("source"), col("bucket"),
        r4(col("keep_frac")).as("keep_frac"), col("kept"))
        .orderBy("doc_id")
    }),

    // PII scan + redaction: emails/IPs/SSNs/phones counted and
    // replaced by placeholder tokens; deterministic PII injected on
    // doc_id % 97 == 0 so the oracle (RE2) cross-checks Java-regex
    // match semantics on real matches, not an empty corpus.
    "q144_pii_scrub" -> ((s, dir) => {
      TextAnalysis.piiScrub(Tables.documents(s, dir))
        .orderBy("doc_id")
    }),

    // Blocklist gate (C4-style wordlist filter): occurrence counts +
    // integer-arithmetic keep decision (n_hits·100 < n_tokens·pct).
    "q145_blocklist_filter" -> ((s, dir) => {
      TextAnalysis.blocklistFilter(Tables.documents(s, dir))
        .orderBy("doc_id")
    }),

    // DSIR-style importance selection: hashed-unigram target/raw
    // probability ratios (integer-quantized — see the operator's
    // determinism note), per-source top-quarter quota.
    "q152_dsir_selection" -> ((s, dir) => {
      TextAnalysis.dsirSelect(Tables.documents(s, dir)).orderBy("doc_id")
    }),

    // GDPR erasure-cascade audit: hash-selected deletion cohort,
    // per-table purge counts down the FK chain + tombstone
    // fingerprints the deletion job must reproduce.
    "q169_erasure_audit" -> ((s, dir) => {
      Relational.erasureAudit(Tables.customer(s, dir),
          Tables.orders(s, dir), Tables.lineitem(s, dir))
        .orderBy("table_name")
    }),

    // CUPED A/B readout: hash-assigned arms, pre-period covariate,
    // variance-reduced adjusted means (cent-exact integer moments).
    "q167_ab_cuped" -> ((s, dir) => {
      Relational.abCuped(Tables.events(s, dir)).orderBy("arm")
    }),

    // Kaplan-Meier survival: first-view -> first-purchase durations
    // with right-censoring at observation end; ascending-t product.
    "q166_kaplan_meier" -> ((s, dir) => {
      Relational.kaplanMeier(Tables.events(s, dir)).orderBy("t_days")
    }),

    // Join fan-out audit: exact output-cardinality histogram by
    // (ml, mr) multiplicity class, computed WITHOUT running the join.
    "q164_join_fanout_audit" -> ((s, dir) => {
      Relational.joinFanoutAudit(Tables.customer(s, dir),
          Tables.orders(s, dir), "c_custkey", "o_custkey")
        .orderBy("ml", "mr")
    }),

    // Market-basket pair mining: within-order part co-occurrence,
    // support + lift, top-k by support with id tiebreaks.
    "q165_market_basket" -> ((s, dir) => {
      Relational.marketBasketPairs(Tables.lineitem(s, dir))
        .orderBy("rank")
    }),

    // TPC-H Q7 shape (cross-nation volume shipping): the OR'd
    // nation-pair predicate sits on the broadcast n1×n2 pair frame,
    // by-year rollup of bilateral trade.
    "q163_volume_shipping" -> ((s, dir) => {
      val n1 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      val pairs = n1.crossJoin(n2).filter(
        (col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
          (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(pairs),
          col("s_nationkey") === col("s_nk") &&
            col("c_nationkey") === col("c_nk"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("vol"), count(lit(1)).as("n_items"))
        .select(col("supp_nation"), col("cust_nation"), col("l_year"),
          r2(col("vol")).as("volume"), col("n_items"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // Incremental sessionization with state handoff: two chunks
    // sessionized independently + boundary carry + stitch; the
    // ORACLE is the GLOBAL sessionization — hash equality proves the
    // handoff lossless.
    "q162_incremental_sessions" -> ((s, dir) => {
      Relational.incrementalSessions(Tables.events(s, dir),
          "2024-01-12 15:45:00")
        .select(col("user_id"),
          tsStr(col("s_start")).as("session_start"),
          tsStr(col("s_end")).as("session_end"),
          col("n_events"), r2(col("total")).as("total"))
        .orderBy("user_id", "session_start", "session_end", "n_events",
          "total")
    }),

    // k-anonymity / l-diversity audit: QI-group sizes + distinct
    // sensitive values, k<5 / l<2 risk flags (privacy governance).
    "q161_k_anonymity" -> ((s, dir) => {
      Relational.kAnonymityAudit(Tables.customer(s, dir),
          Tables.orders(s, dir))
        .orderBy("nation", "segment", "bal_bucket")
    }),

    // Holt-Winters seasonal smoothing: 24-slot hour-of-day additive
    // profile per key, seasonal index = the observation's own hour
    // (gap-immune), 27-lane fold (q140's technique, seasonally).
    "q160_holt_winters_hourly" -> ((s, dir) => {
      TimeSeries.holtWintersHourly(Tables.events(s, dir))
        .orderBy("user_id")
    }),

    // Token-budget prefix fill: cut each source to a fixed token
    // budget in content-addressed priority order (shard-writer fill
    // semantics; any scoring column drops into the priority slot).
    "q159_token_budget_fill" -> ((s, dir) => {
      TextAnalysis.tokenBudgetFill(Tables.documents(s, dir))
        .orderBy("doc_id")
    }),

    // MMR diverse rerank: λ·relevance − (1−λ)·max-sim-to-selected,
    // greedy rounds unrolled per query over the capped candidate pool.
    "q158_mmr_rerank" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.mmrRerank(s, emb, emb.filter(col("vec_id") < 5))
        .select(col("query_id"), col("rank"), col("doc_id"),
          r4(col("rel")).as("rel"), r4(col("mmr")).as("mmr"))
        .orderBy("query_id", "rank")
    }),

    // Deterministic training-shard manifest: content-addressed shard
    // assignment + per-shard byte budget, balance per-mille, id range
    // and order-independent integrity fingerprint.
    "q157_shard_manifest" -> ((s, dir) => {
      TextAnalysis.shardManifest(Tables.documents(s, dir))
        .orderBy("shard_id")
    }),

    // k-center greedy coreset: Gonzalez farthest-first exemplars +
    // nearest-center assignment (diversity sampling for curation).
    "q156_kcenter_coreset" -> ((s, dir) => {
      Similarity.kCenterCoreset(s, Tables.embeddings(s, dir))
        .select(col("vec_id"), col("center_id"),
          r4(col("cos")).as("cos"), col("is_center"))
        .orderBy("vec_id")
    }),

    // Binary sign-quantized ANN: 2×64-bit sign words per vector,
    // xor+popcount Hamming candidates, exact cosine rerank on the
    // capped candidate set (the 1-bit tier after int8 q47 / PQ q129).
    "q155_binary_hamming_ann" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.binaryHammingTopK(s, emb, emb.filter(col("vec_id") < 5))
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("hamming"), r4(col("cos")).as("cos"))
        .orderBy("query_id", "rank")
    }),

    // Peak concurrency per day: interval sweep partitioned by day
    // with exact carry-in (bounded session durations ⇒ one-midnight
    // crossings), half-open [start,end) tie rule. All integer µs.
    "q154_peak_concurrency" -> ((s, dir) => {
      Relational.peakConcurrency(Tables.events(s, dir)).orderBy("day")
    }),

    // URL canonicalization dedup: authority lowercase, default-port /
    // utm_* / fragment strip, min-id survivor per canonical URL
    // (deterministic messy-URL injection, q144/q146 convention).
    "q153_url_canonical_dedup" -> ((s, dir) => {
      TextAnalysis.urlCanonicalDedup(Tables.documents(s, dir))
        .orderBy("doc_id")
    }),

    // Two-sided CUSUM change-point detection per key: Page's
    // s± accumulators vs the key's own mean, alarm + reset at the
    // threshold — the exact sequential recurrence as one codegen
    // aggregate fold over the sorted series (q140's technique).
    "q151_cusum_changepoints" -> ((s, dir) => {
      TimeSeries.cusum(Tables.events(s, dir)).orderBy("user_id")
    }),

    // Golden-record consolidation: deterministic dirty variants →
    // equality-blocked pairs → pointer-jumping CC → field-level
    // survivorship (min-id canonical, min_by name, max balance,
    // mode segment with struct-max tie rule).
    "q146_golden_records" -> ((s, dir) => {
      EntityResolution.goldenRecords(Tables.customer(s, dir))
        .select(col("golden_id"), col("name"),
          r2(col("best_bal")).as("best_bal"), col("seg"), col("n_members"))
        .orderBy("golden_id")
    }),

    // Hybrid retrieval: BM25 ranks ⊕ embedding-cosine ranks fused by
    // reciprocal-rank fusion — integer ranks make the fused scores
    // bit-identical across engines; BM25 ranking keys on the
    // r4-floored score so float noise can't flip a rank.
    "q147_hybrid_rrf" -> ((s, dir) => {
      TextAnalysis.hybridRrf(s, Tables.documents(s, dir),
        Tables.embeddings(s, dir), bm25Queries)
        .orderBy("query_id", "rank")
    }),

    // TPC-H Q3 shape (shipping priority): segment-filtered customers ×
    // date-windowed orders × late-shipping lineitems → top-10 orders
    // by revenue. Top-k orders by the ROUNDED revenue with an id
    // tiebreak, so the limit membership is deterministic on both
    // engines (the q147 rank convention).
    "q148_shipping_priority" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit("1998-01-01"))
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1998-01-01"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("rev"))
        .select(col("l_orderkey"), r2(col("rev")).as("revenue"),
          tsStr(col("o_orderdate")).as("o_orderdate"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // TPC-H Q10 shape (returned-item reporting): revenue lost to
    // returns per customer with nation context — top-20 by rounded
    // revenue, id tiebreak.
    "q149_returned_items" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      l.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("rev"))
        .select(col("c_custkey"), col("c_name"), r2(col("rev")).as("revenue"),
          r2(col("c_acctbal")).as("acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // TPC-H Q5 shape (local supplier volume): region-filtered 6-table
    // join with the dual nation-key condition (customer and supplier
    // in the SAME nation) — the classic join-order/broadcast stress.
    // region/nation broadcast; customer×orders and lineitem×supplier
    // shuffle on their natural keys; the c_nationkey = s_nationkey
    // equality rides the join condition, never a post-filter.
    "q150_local_supplier_volume" -> ((s, dir) => {
      val n = Tables.nation(s, dir)
        .join(Tables.region(s, dir).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1997-01-01"))
      Tables.lineitem(s, dir)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, dir),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("rev"), count(lit(1)).as("n_items"))
        .select(col("n_name"), r2(col("rev")).as("revenue"), col("n_items"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }),

    // ORC round-trip: parquet -> ORC on disk -> schema'd read ->
    // per-source aggregate (q67's contract on the second columnar
    // format; the oracle reads the parquet truth directly).
    // Avro OCF round-trip: parquet -> one container file per
    // partition -> schema-gated decode -> per-source aggregate
    // (q141's contract on the third ROW format; oracle reads the
    // parquet truth).
    "q168_avro_roundtrip" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val path = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_q168_${math.abs(dir.hashCode)}"
      graft.sources.AvroFileIO.writeOcf(docs, path)
      graft.sources.AvroFileIO.readOcf(s, path, docs.schema)
        .groupBy("source").agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          countDistinct(md5(col("text"))).as("n_distinct_texts"))
        .orderBy("source")
    }),

    "q141_orc_roundtrip" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val path = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_q141_${math.abs(dir.hashCode)}"
      graft.sources.OrcIO.writeOrc(docs, path)
      graft.sources.OrcIO.readOrc(s, path, docs.schema)
        .groupBy("source").agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          countDistinct(md5(col("text"))).as("n_distinct_texts"))
        .orderBy("source")
    }),

    // WARC-style length-framed container round-trip (the web-crawl
    // ingest shape): parquet -> one container per partition ->
    // stream-parsed read -> per-source aggregate. sum_chars is
    // RECOMPUTED from the decoded payload (not carried metadata), so
    // the hash match certifies byte-exact payload framing.
    "q197_warc_roundtrip" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val path = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_q197_${math.abs(dir.hashCode)}"
      graft.sources.WarcIO.writeWarc(docs, path)
      graft.sources.WarcIO.readWarc(s, path)
        .groupBy("source").agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("sum_chars"),
          countDistinct(md5(col("text"))).as("n_distinct_texts"))
        .orderBy("source")
    }),

    // Grouped 2-D skyline: per market segment, the Pareto frontier of
    // customers maximizing account balance while minimizing lifetime
    // spend (churn-risk review list: money parked, little bought).
    // Both objectives are exact integer cents; the oracle is the
    // textbook NOT-EXISTS dominance test, certifying the
    // window-reduction in Relational.skyline2d.
    "q170_skyline_customers" -> ((s, dir) => {
      val cents = floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
      val spend = Tables.customer(s, dir)
        .join(Tables.orders(s, dir),
          col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_mktsegment"), col("c_custkey"), col("c_name"),
          col("c_acctbal"))
        .agg(coalesce(sum(cents), lit(0L)).as("spend_c"))
        .select(col("c_mktsegment"), col("c_custkey"), col("c_name"),
          floor(col("c_acctbal") * 100 + lit(0.5)).cast("long").as("bal_c"),
          col("spend_c"))
        // skyline2d traverses its input twice (candidates + join-back);
        // materialize the O(customers) frame so the customer×orders
        // aggregation doesn't run twice
        .localCheckpoint(true)
      Relational.skyline2d(spend, "c_mktsegment", "bal_c", "spend_c")
        .select("c_mktsegment", "c_custkey", "c_name", "bal_c", "spend_c")
        .orderBy(col("c_mktsegment"), col("bal_c").desc, col("spend_c"),
          col("c_custkey"))
    }),

    // TPC-H Q13 shape (customer order-count distribution): the left
    // join carries the priority filter IN THE JOIN CONDITION (a WHERE
    // would turn it inner and drop zero-order customers), then two
    // cascading aggregations — the second runs on the tiny
    // (count, custdist) domain.
    "q171_order_count_distribution" -> ((s, dir) => {
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir),
          col("o_custkey") === col("c_custkey") &&
            col("o_orderpriority") =!= lit("1-URGENT"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q17 shape (small-quantity revenue): the classic correlated
    // per-part average decorrelated into a WINDOW over l_partkey — the
    // shuffle for the brand-filtered join on l_partkey is the SAME
    // hash partitioning the window needs, so Catalyst reuses one
    // exchange instead of the textbook self-join's two. Quantities are
    // integral doubles, so the per-part mean is an exact-sum/count
    // division on both engines; revenue folds integer cents.
    "q172_small_qty_revenue" -> ((s, dir) => {
      val brands = Seq("Brand#1", "Brand#2", "Brand#3")
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, dir)
        .join(Tables.part(s, dir).filter(col("p_brand").isin(brands: _*)),
          col("p_partkey") === col("l_partkey"))
      val w = Window.partitionBy(col("l_partkey"))
      li.withColumn("aq", avg(col("l_quantity")).over(w))
        .filter(col("l_quantity") < lit(0.5) * col("aq"))
        .groupBy(col("p_brand"))
        .agg(
          r2(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
            / 100.0 / 7.0).as("avg_yearly"),
          count(lit(1)).as("n_small"))
        .orderBy("p_brand")
    }),

    // TPC-H Q21 shape (suppliers who kept orders waiting), re-keyed to
    // this schema: in 'F' orders with ≥2 distinct suppliers, the ONE
    // supplier whose lines were returned when nobody else's were. The
    // EXISTS / NOT-EXISTS pair becomes one per-order aggregate (two
    // distinct-counts) joined back — both shuffles share the orderkey
    // partitioning; supplier is broadcast.
    "q173_waiting_suppliers" -> ((s, dir) => {
      val fLines = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"))
      val perOrder = fLines
        .groupBy(col("l_orderkey").as("ok"))
        .agg(countDistinct(col("l_suppkey")).as("n_supps"),
          countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
            .as("n_ret"))
        .filter(col("n_supps") >= 2 && col("n_ret") === 1)
      val blamed = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .join(perOrder, col("l_orderkey") === col("ok"))
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      blamed
        .join(broadcast(Tables.supplier(s, dir)),
          col("s_suppkey") === col("l_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(25)
    }),

    // TPC-H Q22 shape (rich-but-inactive customers): global
    // positive-balance average as a broadcast scalar, an anti-join
    // against urgent orders, nation rollup. The threshold compare is
    // exact integer cross-multiplication (bal_c·n > Σbal_c) — no
    // division, no float-order sensitivity in the average.
    "q174_inactive_rich_customers" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val c = Tables.customer(s, dir)
        .withColumn("bal_c",
          floor(col("c_acctbal") * 100 + lit(0.5)).cast("long"))
      val mom = c.filter(col("c_acctbal") > 0.0)
        .agg(sum(col("bal_c")).cast(dec).as("s_c"), count(lit(1)).as("n"))
      val urgent = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      c.crossJoin(broadcast(mom))
        .filter(col("bal_c").cast(dec) * col("n") > col("s_c"))
        .join(urgent, col("o_custkey") === col("c_custkey"), "left_anti")
        .join(broadcast(Tables.nation(s, dir)),
          col("n_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_custs"),
          (sum(col("bal_c")) / 100.0).as("total_bal"))
        .orderBy("n_name")
    }),

    // Benford first-digit forensic audit of order amounts per
    // priority class (this synthetic feed is uniform, so dev_micro is
    // large everywhere — exactly what the audit should report).
    "q175_benford_audit" -> ((s, dir) => {
      Relational.benfordAudit(Tables.orders(s, dir), "o_orderpriority",
          "o_totalprice")
        .select(col("o_orderpriority").as("prio"), col("digit"),
          col("obs"), col("n"), col("dev_micro"))
        .orderBy("prio", "digit")
    }),

    // Robust winnowing (MOSS) fingerprints per document — the
    // plagiarism-detection fingerprint family member q25 (full-doc
    // rolling hash) and q15 (shingle set) bracket; certified as the
    // full selected SET per doc (count+sum+min+max).
    "q176_winnow_fingerprints" -> ((s, dir) => {
      TextAnalysis.winnowFingerprints(Tables.documents(s, dir))
        .orderBy("doc_id")
    }),

    // Matryoshka truncation audit: recall@10 of prefix-16-dim cosine
    // retrieval vs the full 64-dim ranking, per query.
    "q177_matryoshka_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.matryoshkaRecall(s, emb,
          emb.filter(col("vec_id") < 20), 10, 16)
        .orderBy("query_id")
    }),

    // Fano-factor burstiness audit per user (bot signal: scripted
    // bursts >> 1, metronomes << 1, humans ≈ 1 on this Poisson-ish
    // synthetic feed).
    "q178_burstiness_audit" -> ((s, dir) => {
      TimeSeries.burstinessAudit(Tables.events(s, dir))
        .orderBy("user_id")
    }),

    // Gini concentration of order volume per part type — the
    // imbalance audit (zero-order parts included).
    "q179_gini_concentration" -> ((s, dir) => {
      Relational.giniConcentration(Tables.part(s, dir),
          Tables.lineitem(s, dir).select(col("l_partkey"),
            col("l_orderkey")),
          "p_type", "p_partkey", "l_partkey")
        .orderBy("p_type")
    }),

    // Forward as-of with tolerance: each purchase joined to the next
    // error by the same user within 30 minutes (what-broke-after-
    // checkout triage); pandas merge_asof(direction='forward')
    // semantics on the union+window carry, no pair explosion.
    "q180_asof_forward" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          col("ts").as("p_ts"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("e_id"),
          col("ts").as("e_ts"))
      AsOfJoin.asofForward(purchases, errors, "user_id", "user_id",
          "p_ts", "e_ts", "e_id", 30L * 60L * 1000000L)
        .select(col("user_id"), col("p_id"),
          tsStr(col("p_ts")).as("p_ts"),
          col("asof_e_id").as("next_error_id"),
          ((unix_micros(col("asof_e_ts")) - unix_micros(col("p_ts")))
            / 1000000L).cast("long").as("delta_s"))
        .orderBy("p_id")
    }),

    // DAU/WAU/MAU stickiness curves over the full observed day range
    // (min-offset fan-out — no range join, no multi-distinct Expand).
    "q181_active_user_curves" -> ((s, dir) => {
      TimeSeries.activeUserCurves(Tables.events(s, dir))
        .orderBy("epoch_day")
    }),

    // LSH calibration curve: recall of q17's minhash banding (no
    // estimate cut) against EXACT shingle jaccard, per jaccard decade
    // band — the measured S-curve that tunes bands/rows before a
    // 100 TB dedup run. Truth comes from the exactness-certified
    // prefix-filter join (q127's form), never an n² self-join. (This
    // synthetic corpus is bimodal — all true pairs sit in band 9, so
    // the curve is one row here; the machinery is band-general.)
    "q182_lsh_calibration" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val truth = Dedup.prefixFilterJaccardPairs(docs, threshold = 0.3,
        shingleSize = 3)
      val cand = Dedup.minhashLshPairs(s, docs, estimateThreshold = 0.0)
        .select(col("doc_a"), col("doc_b"), lit(1L).as("caught"))
      truth
        .withColumn("band",
          least(floor(col("jaccard") * 10), lit(9.0)).cast("long"))
        .join(cand, Seq("doc_a", "doc_b"), "left")
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("caught"), lit(0L))).as("n_caught"))
        .select(col("band"), col("n_true"), col("n_caught"),
          (col("n_caught") * 1000L / col("n_true")).cast("long")
            .as("recall_permille"))
        .orderBy("band")
    }),

    // Share-of-total with top-N + OTHER rollup (the standard BI
    // reporting shape): per region, each nation's revenue share; the
    // top 2 nations keep their names, the tail folds into 'OTHER'.
    // All shares are integer-permille over exact cent sums.
    "q183_share_rollup" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cents = floor(col("l_extendedprice") * (lit(1.0) -
        col("l_discount")) * 100 + lit(0.5)).cast("long")
      val nat = broadcast(Tables.nation(s, dir)
        .join(Tables.region(s, dir),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name")))
      val perNation = Tables.lineitem(s, dir)
        .join(Tables.supplier(s, dir),
          col("l_suppkey") === col("s_suppkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(cents).as("rev_c"))
      val wr = Window.partitionBy(col("r_name"))
      val ranked = perNation
        .withColumn("total_c", sum(col("rev_c")).over(wr))
        .withColumn("rk", row_number().over(
          wr.orderBy(col("rev_c").desc, col("n_name").asc)))
      ranked
        .withColumn("label",
          when(col("rk") <= 2, col("n_name")).otherwise(lit("OTHER")))
        .groupBy(col("r_name"), col("label"))
        .agg(sum(col("rev_c")).as("rev_c"), first(col("total_c")).as("t"),
          count(lit(1)).as("n_nations"))
        .select(col("r_name"), col("label"),
          (col("rev_c") / 100.0).as("revenue"),
          // integral div: cent totals exceed double's 2^53 integer
          // range long before they exceed a long
          expr("rev_c * 1000L div t").as("share_permille"),
          col("n_nations"))
        .orderBy(col("r_name"), col("share_permille").desc, col("label"))
    }),

    // Ingest volume anomaly audit: per (event_type, day) counts over
    // a DENSE day axis (a silent zero day IS the incident), flagged
    // at |z| > 3 against the type's own day-count distribution. The
    // flag is the exact integer inequality (c·n−Σ)² > 9(n·Σc²−Σ²);
    // z itself is one IEEE sqrt over the same exact integers. The
    // ops-monitoring query a 100 TB feed runs nightly: two map-side
    // aggregates + a |types|×|days| dense frame, no event-scale join.
    "q184_ingest_anomaly" -> ((s, dir) => {
      val dayCol = floor(unix_micros(col("ts")) / 86400000000L)
        .cast("long")
      val pd = Tables.events(s, dir)
        .groupBy(col("event_type"), dayCol.as("d"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // bounds + dense join both read it
      val bounds = pd.agg(min(col("d")).as("dmin"), max(col("d")).as("dmax"))
      val dense = pd.select(col("event_type")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"),
          explode(sequence(col("dmin"), col("dmax"))).as("d"))
        .join(pd, Seq("event_type", "d"), "left")
        .na.fill(0L, Seq("c"))
      val mom = dense.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
          sum(col("c") * col("c")).as("s2"))
      dense.join(broadcast(mom), Seq("event_type"))
        .select(col("event_type"), col("d").as("epoch_day"), col("c"),
          r4((col("c") * col("n") - col("s")).cast("double") /
            sqrt((col("n") * col("s2") - col("s") * col("s"))
              .cast("double"))).as("z"),
          ((col("c") * col("n") - col("s")) *
            (col("c") * col("n") - col("s")) >
            lit(9L) * (col("n") * col("s2") - col("s") * col("s")))
            .as("anomalous"))
        .orderBy("event_type", "epoch_day")
    }),

    // Markov next-event backtest — the eval-harness shape (q106's
    // retrieval eval for sequence models): train a first-order
    // transition argmax on the pre-split pairs (q94's matrix), score
    // top-1 accuracy on the post-split pairs. A pair belongs to the
    // period of its LATER event — exactly what a deployed predictor
    // sees (it predicts from the last observed event regardless of
    // which period that event fell in).
    "q185_markov_backtest" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val split = to_timestamp(lit("2024-01-16 00:00:00"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val trans = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNotNull)
      val counts = trans.filter(col("ts") < split)
        .groupBy(col("prev"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val wp = Window.partitionBy(col("prev"))
        .orderBy(col("n").desc, col("event_type").asc)
      val pred = counts.withColumn("rk", row_number().over(wp))
        .filter(col("rk") === 1)
        .select(col("prev"), col("event_type").as("predicted_next"),
          col("n").as("train_n"))
      trans.filter(col("ts") >= split)
        .join(broadcast(pred), Seq("prev"), "left")
        .groupBy(col("prev"))
        .agg(first(col("predicted_next")).as("predicted_next"),
          first(col("train_n")).as("train_n"),
          count(lit(1)).as("n_test"),
          sum(when(col("event_type") === col("predicted_next"), 1L)
            .otherwise(0L)).as("n_correct"))
        .select(col("prev"), col("predicted_next"), col("train_n"),
          col("n_test"), col("n_correct"),
          expr("n_correct * 1000L div n_test").as("acc_permille"))
        .orderBy("prev")
    }),

    // TPC-H Q19 shape: three OR'd (brand, size-range, quantity-range)
    // branches over one lineitem×part join — the disjunctive-predicate
    // normalization/pushdown stress (each branch's part-side conjuncts
    // can prune the build side; the OR itself rides the join filter).
    "q186_disjunctive_revenue" -> ((s, dir) => {
      val cents = floor(col("l_extendedprice") * (lit(1.0) -
        col("l_discount")) * 100 + lit(0.5)).cast("long")
      val branch = (col("p_brand") === "Brand#1" &&
        col("p_size").between(1, 10) && col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#2" &&
          col("p_size").between(11, 25) && col("l_quantity").between(5, 30)) ||
        (col("p_brand") === "Brand#3" &&
          col("p_size").between(26, 50) && col("l_quantity").between(10, 40))
      Tables.lineitem(s, dir)
        .join(Tables.part(s, dir), col("p_partkey") === col("l_partkey"))
        .filter(branch)
        .agg(r2(sum(cents) / 100.0).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q4 shape: priority counts of orders with at least one line
    // shipped after the order date — EXISTS as a LEFT SEMI join whose
    // non-equi half (l_shipdate > o_orderdate) rides the join
    // condition; lineitem is never widened into the aggregate.
    "q187_priority_late_ship" -> ((s, dir) => {
      Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1996-07-01"))
        .join(Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_shipdate")),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q16 shape: supplier diversity per (brand, size) with a
    // blocklisted supplier set removed by ANTI join before the
    // distinct count (the NOT IN that must never become a filter on a
    // nullable subquery).
    "q188_supplier_diversity" -> ((s, dir) => {
      val excluded = Tables.supplier(s, dir)
        .filter(col("s_name").endsWith("7"))
        .select(col("s_suppkey").as("x_suppkey"))
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand"), col("p_size"))),
          col("p_partkey") === col("l_partkey"))
        .join(excluded, col("l_suppkey") === col("x_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
    }),

    // TPC-H Q11 shape: per-part lineitem value with a GLOBAL share
    // threshold (HAVING value > fraction × Σ) — the scalar rides a
    // broadcast 1-row frame, the share is integral parts-per-million.
    "q189_part_value_share" -> ((s, dir) => {
      val cents = floor(col("l_extendedprice") * 100 + lit(0.5))
        .cast("long")
      val perPart = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"))
        .agg(sum(cents).as("value_c"))
        .localCheckpoint(true) // scalar + filtered output both read it
      val total = perPart.agg(sum(col("value_c")).cast("decimal(38,0)")
        .as("total_c"))
      perPart.crossJoin(broadcast(total))
        .withColumn("share_ppm",
          expr("CAST(value_c AS DECIMAL(38,0)) * 1000000 div total_c")
            .cast("long"))
        .filter(col("share_ppm") > 800L)
        .select(col("l_partkey"), (col("value_c") / 100.0).as("value"),
          col("share_ppm"))
        .orderBy(col("share_ppm").desc, col("l_partkey"))
    }),

    // TPC-H Q8 shape: one nation's market share inside one region's
    // order flow, per order-year — conditional cents over the same
    // 6-table join as q150, share by integral division.
    "q190_market_share" -> ((s, dir) => {
      val cents = floor(col("l_extendedprice") * (lit(1.0) -
        col("l_discount")) * 100 + lit(0.5)).cast("long")
      val cn = Tables.nation(s, dir)
        .join(Tables.region(s, dir).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cn_key"))
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(sum(cents).as("total_c"),
          sum(when(col("s_nationkey") === 7, cents).otherwise(0L))
            .as("target_c"))
        .select(col("yr"), (col("total_c") / 100.0).as("total_rev"),
          expr("target_c * 1000L div total_c").as("share_permille"))
        .orderBy("yr")
    }),

    // TPC-H Q15 shape: the top-revenue supplier(s) of a quarter — a
    // 1-row scalar max joined back by equality, so ties all surface
    // (the view+max formulation, not a LIMIT 1 that drops ties).
    "q191_top_supplier" -> ((s, dir) => {
      val cents = floor(col("l_extendedprice") * (lit(1.0) -
        col("l_discount")) * 100 + lit(0.5)).cast("long")
      val rev = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1996-04-01"))
          .select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_suppkey"))
        .agg(sum(cents).as("rev_c"))
        .localCheckpoint(true) // max + equality join both read it
      val top = rev.agg(max(col("rev_c")).as("max_c"))
      rev.crossJoin(broadcast(top))
        .filter(col("rev_c") === col("max_c"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("s_suppkey") === col("l_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          (col("rev_c") / 100.0).as("total_rev"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q18 shape: large-volume orders — the IN(group-by-HAVING)
    // is the same aggregate the output needs, so it computes ONCE and
    // joins back; quantities are integral doubles (exact sums).
    "q192_large_orders" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 300.0)
      big.join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          tsStr(col("o_orderdate")).as("o_orderdate"),
          col("total_qty").cast("long").as("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(20)
    }),

    // Magnitude histogram: order amounts bucketed by the BIT LENGTH
    // of their integer cents (exact log2 buckets without libm — the
    // binary-digit count is pure integer/string arithmetic on both
    // engines). Benford's (q175) distribution-forensics sibling for
    // spotting clipped or re-scaled feeds.
    "q219_magnitude_histogram" -> ((s, dir) => {
      val cents = floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
      Tables.orders(s, dir)
        .filter(col("o_totalprice") > 0)
        .select(length(bin(cents)).cast("long").as("bits"),
          cents.as("c"))
        .groupBy(col("bits"))
        .agg(count(lit(1)).as("n_orders"),
          (min(col("c")) / 100.0).as("min_amount"),
          (max(col("c")) / 100.0).as("max_amount"))
        .orderBy("bits")
    }),

    // Returns-rate ranking by Wilson lower bound (z=1.96) — the
    // "how not to sort by average" correction: a brand with 3/3
    // returns must NOT outrank one with 80/100. Inputs are exact
    // integer (returns, total) pairs; the bound is one fixed IEEE
    // formula over them, identical on both engines.
    "q220_wilson_returns" -> ((s, dir) => {
      val perBrand = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand"))),
          col("p_partkey") === col("l_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("r"))
      // z² as a PARSED literal (3.8416), not a computed square:
      // double(1.96)² can land one ulp away from parse("3.8416"),
      // and the oracle embeds the parsed form
      val z2 = lit(3.8416)
      val p = col("r").cast("double") / col("n").cast("double")
      val nD = col("n").cast("double")
      val wilson = (p + z2 / (nD * 2.0) -
        lit(1.96) * sqrt(p * (lit(1.0) - p) / nD +
          z2 / (nD * nD * 4.0))) / (lit(1.0) + z2 / nD)
      perBrand
        .select(col("p_brand"), col("n"), col("r"),
          r4(p).as("return_rate"), r4(wilson).as("wilson_lb"))
        .orderBy(col("wilson_lb").desc, col("p_brand"))
    }),

    // Per-brand revenue trend by ordinary least squares over the
    // weekly series: slope/intercept/R² all come from five exact
    // integer moments (n, Σx, Σy, Σxy, Σx², Σy²) so the only IEEE
    // steps are the final divisions — no per-row float accumulation
    // order to disagree on. y is WHOLE-DOLLAR weekly revenue
    // (integer-div of the exact 1e-4-unit sum), x the week index;
    // cross-products ride decimal(38,0) (HUGEINT in the oracle), so
    // the squared-covariance numerator of R² (~1e24 at sf0.1) never
    // touches a long.
    "q221_brand_trend_ols" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val weekly = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand"))),
          col("p_partkey") === col("l_partkey"))
        .select(col("p_brand"),
          floor(datediff(col("o_orderdate"), lit("1992-01-01")) / 7)
            .cast("long").as("wk"),
          (floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long") *
            (lit(100L) - floor(col("l_discount") * 100 + lit(0.5))
              .cast("long"))).as("rev_u"))
        .groupBy(col("p_brand"), col("wk"))
        .agg(expr("sum(rev_u) div 10000").as("y"))
      val m = weekly.groupBy(col("p_brand"))
        .agg(count(lit(1)).cast(dec).as("n"),
          sum(col("wk")).cast(dec).as("sx"),
          sum(col("y")).cast(dec).as("sy"),
          sum(col("wk") * col("y")).cast(dec).as("sxy"),
          sum(col("wk") * col("wk")).cast(dec).as("sxx"),
          sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"))
      val num = col("n") * col("sxy") - col("sx") * col("sy")
      val dxx = col("n") * col("sxx") - col("sx") * col("sx")
      val dyy = col("n") * col("syy") - col("sy") * col("sy")
      m.filter(col("n") >= 10 && dxx > 0 && dyy > 0)
        .select(col("p_brand"), col("n").cast("long").as("n_weeks"),
          r4(num.cast("double") / dxx.cast("double")).as("slope_usd_wk"),
          r4((col("sy") * col("sxx") - col("sx") * col("sxy"))
            .cast("double") / dxx.cast("double")).as("intercept_usd"),
          r4((num * num).cast("double") /
            (dxx * dyy).cast("double")).as("r2"))
        .orderBy("p_brand")
    }),

    // Theil–Sen robust trend: the MEDIAN of all pairwise slopes over
    // each brand's MONTHLY revenue series — one wild month cannot
    // drag it the way it drags q221's OLS. The pair space is bounded
    // by the CALENDAR (84 months → ≤3.5k pairs per brand), not the
    // data volume, so the pairs materialize as a per-brand in-row
    // array expansion (a DataFrame self-join would recompute — and
    // rescan — the whole monthly aggregate on both sides). Each
    // slope is one IEEE division of exact integers; the median is
    // nearest-rank (value at index ⌈m/2⌉ of the sorted slopes) so no
    // float averaging enters the gate. The oracle keeps the
    // definitional self-join + rank formulation, certifying the
    // array expansion against it.
    "q222_theil_sen_trend" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand"))),
          col("p_partkey") === col("l_partkey"))
        .select(col("p_brand"),
          ((year(col("o_orderdate")) - 1992) * 12 +
            month(col("o_orderdate")) - 1).cast("long").as("mo"),
          (floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long") *
            (lit(100L) - floor(col("l_discount") * 100 + lit(0.5))
              .cast("long"))).as("rev_u"))
        .groupBy(col("p_brand"), col("mo"))
        .agg(expr("sum(rev_u) div 10000").as("y"))
        .groupBy(col("p_brand"))
        .agg(sort_array(collect_list(struct(col("mo"), col("y"))))
          .as("pts"))
        .withColumn("sl", expr(
          """array_sort(flatten(transform(pts, (a, i) ->
            |  transform(slice(pts, i + 2, size(pts)), b ->
            |    cast(b.y - a.y as double) /
            |    cast(b.mo - a.mo as double)))))""".stripMargin))
        .select(col("p_brand"),
          size(col("sl")).cast("long").as("n_pairs"),
          r4(expr("element_at(sl, cast((size(sl) + 1) div 2 as int))"))
            .as("ts_slope_usd_mo"))
        .orderBy("p_brand")
    }),

    // Chi-squared independence test (return flag × line status) with
    // Cramér's V effect size. The fact table is scanned ONCE: the
    // contingency table collapses to one array of (flag, status,
    // count) cells, and every marginal, expectation and the statistic
    // itself is a higher-order-function fold over that array —
    // re-deriving marginals from the base table would scan the fact
    // 4× (Spark does not reuse uncached sibling aggregates).
    // Observed/marginal counts are exact integers; each cell's
    // (O−E)²/E is one deterministic IEEE expression; the final
    // reduction is a LEFT FOLD over the value-sorted contribution
    // array (both engines sort doubles identically), so the statistic
    // never depends on aggregation order. The fold array is
    // |flags|×|statuses| — bounded by construction, never data-sized.
    "q223_chi2_flag_linestatus" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"))
        .agg(count(lit(1)).as("o"))
        .agg(sort_array(collect_list(
          struct(col("rf"), col("ls"), col("o")))).as("cs"))
        .withColumn("n", expr("aggregate(cs, 0L, (a, x) -> a + x.o)"))
        .withColumn("nr", expr(
          "cast(size(array_distinct(transform(cs, c -> c.rf))) as bigint)"))
        .withColumn("nc", expr(
          "cast(size(array_distinct(transform(cs, c -> c.ls))) as bigint)"))
        .withColumn("chi2r", expr(
          """aggregate(
            |  array_sort(transform(cs, c ->
            |    pow(cast(c.o as double) -
            |        cast(aggregate(filter(cs, x -> x.rf = c.rf),
            |                       0L, (a, x) -> a + x.o) as double)
            |        * cast(aggregate(filter(cs, x -> x.ls = c.ls),
            |                         0L, (a, x) -> a + x.o) as double)
            |        / cast(n as double), 2.0)
            |    / (cast(aggregate(filter(cs, x -> x.rf = c.rf),
            |                      0L, (a, x) -> a + x.o) as double)
            |       * cast(aggregate(filter(cs, x -> x.ls = c.ls),
            |                        0L, (a, x) -> a + x.o) as double)
            |       / cast(n as double)))),
            |  cast(0.0 as double), (a, x) -> a + x)""".stripMargin))
        .select(col("n"),
          ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
          r4(col("chi2r")).as("chi2"),
          r4(sqrt(col("chi2r") / (col("n").cast("double") *
            (least(col("nr"), col("nc")) - 1).cast("double"))))
            .as("cramers_v"))
    }),

    // Exact QUANTITY-WEIGHTED median line value per nation: the
    // smallest value whose cumulative weight reaches half the total
    // (2·cumw ≥ totw in pure integers — no halving division). Rows
    // collapse to (nation, value)-grain integer weights BEFORE the
    // window, so the running sum walks distinct values, not line
    // items, and the crossing group is tie-order-independent.
    "q224_weighted_median_value" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val perVal = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("n_nationkey") === col("c_nationkey"))
        .select(col("n_name"),
          floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
            .as("v_c"),
          col("l_quantity").cast("long").as("w"))
        .groupBy(col("n_name"), col("v_c"))
        .agg(sum(col("w")).as("w"))
      val wOrd = Window.partitionBy(col("n_name")).orderBy(col("v_c"))
      val wAll = Window.partitionBy(col("n_name"))
      perVal
        .withColumn("cumw", sum(col("w")).over(wOrd))
        .withColumn("totw", sum(col("w")).over(wAll))
        .filter(col("cumw") * 2 >= col("totw"))
        .groupBy(col("n_name"))
        .agg((min(col("v_c")) / 100.0).as("wmedian_value"),
          max(col("totw")).as("total_qty"))
        .orderBy("n_name")
    }),

    // Vocabulary richness per source: type-token ratio and hapax-
    // legomenon rate (how much of the vocabulary occurs exactly
    // once) — corpus health signals that drop when a crawl loops on
    // boilerplate. Same single-space tokenizer the token-frequency
    // query pins; everything is exact integer counts + one division.
    "q225_vocab_richness" -> ((s, dir) => {
      val tok = Tables.documents(s, dir)
        .select(col("source"),
          explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy(col("source"), col("token"))
        .agg(count(lit(1)).as("c"))
      tok.groupBy(col("source"))
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          col("n_hapax"),
          r4(col("n_types").cast("double") /
            col("n_tokens").cast("double")).as("ttr"),
          r4(col("n_hapax").cast("double") /
            col("n_types").cast("double")).as("hapax_rate"))
        .orderBy("source")
    }),

    // Longest strictly-increasing run of daily revenue per nation —
    // gaps-and-islands over the ACTIVE-day series (calendar holes
    // don't break a run; a flat or down day does). Revenue compares
    // are exact 1e-4-unit integers; islands come from a cumulative
    // break counter, run rank ties go to the earliest end date.
    "q226_revenue_streaks" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("n_nationkey") === col("c_nationkey"))
        .select(col("n_name"), col("o_orderdate").as("d"),
          (floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long") *
            (lit(100L) - floor(col("l_discount") * 100 + lit(0.5))
              .cast("long"))).as("rev_u"))
        .groupBy(col("n_name"), col("d"))
        .agg(sum(col("rev_u")).as("rev"))
      val wOrd = Window.partitionBy(col("n_name")).orderBy(col("d"))
      val runs = daily
        .withColumn("brk",
          when(col("rev") > lag(col("rev"), 1).over(wOrd), 0L)
            .otherwise(1L))
        .withColumn("grp", sum(col("brk")).over(wOrd))
        .groupBy(col("n_name"), col("grp"))
        .agg(count(lit(1)).as("len"), max(col("d")).as("end_d"))
      runs
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("n_name"))
            .orderBy(col("len").desc, col("end_d").asc)))
        .filter(col("rk") === 1)
        .select(col("n_name"), col("len").as("streak_days"),
          date_format(col("end_d"), "yyyy-MM-dd").as("streak_end"))
        .orderBy("n_name")
    }),

    // Referential-integrity audit: one row per declared constraint —
    // PK uniqueness (rows whose key repeats) and FK orphans (child
    // rows with no parent) — the pre-ingest contract check every
    // pipeline runs before trusting a snapshot. Each child table is
    // scanned ONCE: FK checks ride a LEFT join (parent keys are
    // unique, so no fanout) counting null parents alongside the row
    // total in one aggregate, and lineitem's two FK checks share a
    // single pass (stack-unpivoted into two report rows). Parents
    // that fit (nation, region) broadcast; the rest shuffle on the
    // key they'd shuffle on anyway. Zeros are the healthy report.
    "q227_integrity_audit" -> ((s, dir) => {
      def pkDup(df: org.apache.spark.sql.DataFrame, key: String,
                name: String) =
        df.groupBy(col(key)).agg(count(lit(1)).as("c"))
          .agg(sum(when(col("c") > 1L, col("c")).otherwise(0L))
            .as("n_violations"), count(lit(1)).as("n_checked"))
          .select(lit(name).as("check_name"),
            coalesce(col("n_violations"), lit(0L)).as("n_violations"),
            col("n_checked"))
      def fkOrphan(child: org.apache.spark.sql.DataFrame, ck: String,
                   parent: org.apache.spark.sql.DataFrame, pk: String,
                   name: String, bcast: Boolean) = {
        val p = parent.select(col(pk))
        child.select(col(ck))
          .join(if (bcast) broadcast(p) else p,
            col(ck) === col(pk), "left")
          .agg(sum(when(col(pk).isNull, 1L).otherwise(0L))
            .as("n_violations"), count(lit(1)).as("n_checked"))
          .select(lit(name).as("check_name"), col("n_violations"),
            col("n_checked"))
      }
      val li = Tables.lineitem(s, dir); val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir); val su = Tables.supplier(s, dir)
      val p = Tables.part(s, dir); val na = Tables.nation(s, dir)
      val re = Tables.region(s, dir)
      val liBoth = li.select(col("l_orderkey"), col("l_partkey"))
        .join(o.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left")
        .join(p.select(col("p_partkey")),
          col("l_partkey") === col("p_partkey"), "left")
        .agg(sum(when(col("o_orderkey").isNull, 1L).otherwise(0L))
          .as("v_orders"),
          sum(when(col("p_partkey").isNull, 1L).otherwise(0L))
            .as("v_part"),
          count(lit(1)).as("n_checked"))
        .select(expr("stack(2, 'fk_lineitem_orders', v_orders, n_checked," +
          " 'fk_lineitem_part', v_part, n_checked)" +
          " as (check_name, n_violations, n_checked)"))
      pkDup(o, "o_orderkey", "pk_orders")
        .unionAll(pkDup(c, "c_custkey", "pk_customer"))
        .unionAll(pkDup(p, "p_partkey", "pk_part"))
        .unionAll(pkDup(su, "s_suppkey", "pk_supplier"))
        .unionAll(liBoth)
        .unionAll(fkOrphan(o, "o_custkey", c, "c_custkey",
          "fk_orders_customer", bcast = false))
        .unionAll(fkOrphan(c, "c_nationkey", na, "n_nationkey",
          "fk_customer_nation", bcast = true))
        .unionAll(fkOrphan(su, "s_nationkey", na, "n_nationkey",
          "fk_supplier_nation", bcast = true))
        .unionAll(fkOrphan(na, "n_regionkey", re, "r_regionkey",
          "fk_nation_region", bcast = true))
        .orderBy("check_name")
    }),

    // Spend-decile mobility matrix: each customer's total-spend
    // decile in 1996 vs 1997, counted per (from, to) cell — the
    // rank-rank transition view of churn/upsell. ONE orders scan:
    // spend aggregates at (customer, year) grain, deciles are exact
    // ntile over the YEAR-partitioned aggregate with a custkey
    // tie-break (identical buckets to two separate rankings), and
    // the year pair pivots back to one row per customer — no
    // aggregate self-join. The exact-quintile global-sort caveat is
    // q209's (ranks entity aggregates, never fact rows).
    "q228_decile_mobility" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      Tables.orders(s, dir)
        .filter(year(col("o_orderdate")).isin(1996, 1997))
        .groupBy(col("o_custkey"),
          year(col("o_orderdate")).as("yr"))
        .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5))
          .cast("long")).as("sp"))
        .withColumn("dec", ntile(10).over(Window.partitionBy(col("yr"))
          .orderBy(col("sp"), col("o_custkey"))))
        .groupBy(col("o_custkey"))
        .agg(max(when(col("yr") === 1996, col("dec"))).as("dec_1996"),
          max(when(col("yr") === 1997, col("dec"))).as("dec_1997"))
        .filter(col("dec_1996").isNotNull && col("dec_1997").isNotNull)
        .groupBy(col("dec_1996"), col("dec_1997"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("dec_1996", "dec_1997")
    }),

    // Day-of-week seasonality profile per event type: each ISO
    // weekday's share of the type's events plus its index against
    // the uniform 1/7 expectation (n·7000 div total, exact permille
    // integers) — the load-shaping readout for capacity planning.
    "q229_dow_seasonality" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      Tables.events(s, dir)
        .select(col("event_type"),
          (weekday(col("ts")) + 1).cast("long").as("isodow"))
        .groupBy(col("event_type"), col("isodow"))
        .agg(count(lit(1)).as("n"))
        .withColumn("tot", sum(col("n")).over(
          Window.partitionBy(col("event_type"))))
        .select(col("event_type"), col("isodow"), col("n"),
          expr("n * 1000L div tot").as("share_permille"),
          expr("n * 7000L div tot").as("index_permille"))
        .orderBy("event_type", "isodow")
    }),

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
    // whale-dependence readout that complements q179's Gini. Ranks
    // run over the |customers| aggregate; thresholds are exact
    // ceil-index integers.
    "q232_revenue_concentration" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val perCust = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5))
          .cast("long")).as("rev_c"))
      val ranked = perCust
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rev_c").desc, col("o_custkey"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy()))
        .withColumn("tot", sum(col("rev_c")).over(Window.partitionBy()))
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
        .select(col("yr"), col("mo"),
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
    // long near n=2M). Two windows share the language exchange.
    "q235_spearman_len_tokens" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dec = "decimal(38,0)"
      val base = Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"),
          col("n_chars").cast("long").as("len"),
          expr("cast(size(filter(split(text, ' '), " +
            "t -> length(t) > 0)) as bigint)").as("ntok"))
      val ranked = base
        .withColumn("r1", row_number().over(Window.partitionBy(col("lang"))
          .orderBy(col("len"), col("doc_id"))))
        .withColumn("r2", row_number().over(Window.partitionBy(col("lang"))
          .orderBy(col("ntok"), col("doc_id"))))
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
          expr("element_at(array_sort(win)," +
            " cast((size(win) + 1) div 2 as int)) / 100.0")
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
    // |keys| aggregate; hot-key multiples ride decimal(38,0).
    "q244_join_skew_audit" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      def profile(freq: org.apache.spark.sql.DataFrame) = {
        val w = Window.partitionBy(col("key_col"))
        freq
          .withColumn("rk", row_number().over(
            w.orderBy(col("f"), col("key"))))
          .withColumn("nk", count(lit(1)).over(w))
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
      val vocab = tok.groupBy(col("token"))
        .agg(count(lit(1)).as("tc"))
        .withColumn("r", row_number().over(
          Window.orderBy(col("tc").desc, col("token"))))
        .select(col("token").as("vtoken"), col("r"))
      tok.groupBy(col("source"), col("token"))
        .agg(count(lit(1)).as("c"))
        .join(vocab, col("token") === col("vtoken"))
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
    // the exact quantity moments together; the cumulative rank runs
    // over parts, never lines.
    "q246_abc_xyz_matrix" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dec = "decimal(38,0)"
      val perPart = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_partkey"),
          date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
        .agg(sum(col("l_quantity").cast("long")).as("q_m"),
          sum(floor(col("l_extendedprice") * 100 + lit(0.5))
            .cast("long")).as("rev_m"))
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_m"), sum(col("q_m")).as("sq"),
          sum(col("q_m") * col("q_m")).as("sq2"),
          sum(col("rev_m")).as("rev_c"))
      val wCum = Window.orderBy(col("rev_c").desc, col("l_partkey"))
      val classed = perPart
        .withColumn("cum_c", sum(col("rev_c")).over(wCum))
        .withColumn("tot_c", sum(col("rev_c")).over(Window.partitionBy()))
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
      val top20 = parts
        .join(demand, col("p_partkey") === col("l_partkey"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("qty").desc, col("p_partkey"))))
        .filter(col("rk") <= 20)
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
      per
        .withColumn("rk", row_number().over(Window.orderBy(
          col("overdue_x_permille").desc, col("o_custkey"))))
        .filter(col("rk") <= 20)
        .select(col("rk").cast("long").as("rank"), col("o_custkey"),
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
    // before anyone mutates the feed. One type-keyed rank window
    // over the fact rows, one rollup sharing its exchange.
    "q261_winsorization_preview" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val vals = Tables.events(s, dir)
        .select(col("event_type"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("v"),
          col("event_id"))
      val w = Window.partitionBy(col("event_type"))
      val ranked = vals
        .withColumn("rk", row_number().over(
          w.orderBy(col("v"), col("event_id"))))
        .withColumn("n", count(lit(1)).over(w))
      ranked
        .withColumn("p01", min(when(col("rk") ===
          ((col("n") + 99) / lit(100)).cast("long"), col("v"))).over(w))
        .withColumn("p99", min(when(col("rk") ===
          ((col("n") * 99 + 99) / lit(100)).cast("long"), col("v")))
          .over(w))
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
    // rollup; every class is an exact integer.
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
          coalesce(lag(col("n_active"), 1).over(
            Window.orderBy(col("d"))), lit(0L)) - col("n_retained"))
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("n_active"), col("n_new"), col("n_retained"),
          col("n_resurrected"), col("n_churned"))
        .orderBy("day")
    }),

    // Token-rank drift: the top-15 tokens of the corpus' first half
    // (by doc_id) against their rank in the second half — entered /
    // left / moved, with the permille frequency both sides. The
    // vocabulary-drift readout between two snapshots; both rankings
    // run over |vocab| aggregates off one scan each half (FULL outer
    // join keeps tokens that vanished).
    "q265_token_rank_drift" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      val mid = docs.agg(expr("(min(doc_id) + max(doc_id)) div 2")
        .as("mid"))
      def ranked(half: org.apache.spark.sql.DataFrame,
                 pfx: String) = half
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy(col("token"))
        .agg(count(lit(1)).as(s"${pfx}_n"))
        .withColumn(s"${pfx}_rank", row_number().over(
          Window.orderBy(col(s"${pfx}_n").desc, col("token"))))
        .withColumn(s"${pfx}_tot",
          sum(col(s"${pfx}_n")).over(Window.partitionBy()))
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
    // Exact nearest-rank boundaries off one year-partitioned rank
    // window, ONE orders scan, |deciles| output rows.
    "q266_qq_deciles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("yr"))
      val ranked = Tables.orders(s, dir)
        .filter(year(col("o_orderdate")).isin(1996, 1997))
        .select(year(col("o_orderdate")).as("yr"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
            .as("v"), col("o_orderkey"))
        .withColumn("rk", row_number().over(
          w.orderBy(col("v"), col("o_orderkey"))))
        .withColumn("n", count(lit(1)).over(w))
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
    // that ignores outliers a t-test would chase. Ranks are
    // row_number over the combined set with an orderkey tie-break
    // (deterministic; the handful of equal-cent ties makes this the
    // tie-broken U variant, stated), U and its null mean are exact
    // integers, the z-score one IEEE sqrt. One orders scan.
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
        .withColumn("rk2", row_number().over(Window.orderBy(
          abs(col("drift_ppm")).desc, col("l_partkey"))))
        .filter(col("rk2") <= 20)
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
    // are exact nearest-rank over the |customers| aggregate; the
    // quadrant is two integer compares.
    "q282_equity_quadrants" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val per = Tables.customer(s, dir)
        .join(Tables.orders(s, dir)
          .groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5))
            .cast("long")).as("spend_c")),
          col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_mktsegment"),
          floor(col("c_acctbal") * 100 + lit(0.5)).cast("long")
            .as("bal_c"), col("spend_c"))
      val wB = Window.orderBy(col("bal_c"), col("c_custkey"))
      val wS = Window.orderBy(col("spend_c"), col("c_custkey"))
      val wAll = Window.partitionBy()
      val ranked = per
        .withColumn("rb", row_number().over(wB))
        .withColumn("rs", row_number().over(wS))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("med_b", min(when(col("rb") ===
          ((col("n") + 1) / lit(2)).cast("long"), col("bal_c")))
          .over(wAll))
        .withColumn("med_s", min(when(col("rs") ===
          ((col("n") + 1) / lit(2)).cast("long"), col("spend_c")))
          .over(wAll))
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
      val wP = Window.partitionBy(col("from_type"), col("to_type"))
      trans
        .withColumn("rk", row_number().over(
          wP.orderBy(col("gap_s"), col("event_id"))))
        .withColumn("m", count(lit(1)).over(wP))
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
    // price (exact integer unit prices; per-supplier means compared
    // by cross-multiplication so no float enters the pick), top 20
    // by spread ppm. The sourcing-optimization readout.
    "q289_procurement_arbitrage" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dec = "decimal(38,0)"
      val perSupp = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey"),
          expr("(cast(floor(l_extendedprice * 100 + 0.5) as bigint)" +
            " * 100) div cast(l_quantity as bigint)").as("u"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(count(lit(1)).as("n"), sum(col("u")).as("su"))
      // mean compare by cross-multiplication: su_a·n_b vs su_b·n_a
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
        .withColumn("rk", row_number().over(Window.orderBy(
          col("spread_ppm").desc, col("l_partkey"))))
        .filter(col("rk") <= 20)
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
    // FIRST-order value quartile (exact ntile over the aggregate),
    // each band's median lifetime order count and repeat share —
    // the acquisition-quality readout. First order picked by
    // (date, orderkey); medians nearest-rank.
    "q294_first_order_predictor" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
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
        .withColumn("band", ntile(4).over(
          Window.orderBy(col("first_c"), col("o_custkey"))))
      val wB = Window.partitionBy(col("band"))
      per
        .withColumn("mrk", row_number().over(
          wB.orderBy(col("n_orders"), col("o_custkey"))))
        .withColumn("m", count(lit(1)).over(wB))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_customers"),
          min(when(col("mrk") === floor((col("m") + lit(1L)) / 2)
            .cast("long"), col("n_orders"))).as("median_orders"),
          sum(when(col("n_orders") > 1L, 1L).otherwise(0L))
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
      val fullTop = totals
        .withColumn("rk", row_number().over(
          Window.orderBy(col("c_all").desc, col("token"))))
        .filter(col("rk") <= 10)
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
      import org.apache.spark.sql.expressions.Window
      val dec = "decimal(38,0)"
      val per = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_quantity").cast("long")).as("qty"))
        .join(Tables.part(s, dir)
          .select(col("p_partkey"), length(col("p_name")).cast("long")
            .as("name_len")),
          col("l_partkey") === col("p_partkey"))
      val ranked = per
        .withColumn("r1", row_number().over(
          Window.orderBy(col("name_len"), col("l_partkey"))))
        .withColumn("r2", row_number().over(
          Window.orderBy(col("qty"), col("l_partkey"))))
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
      import org.apache.spark.sql.expressions.Window
      val dec = "decimal(38,0)"
      val per = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
          .as("v_c"))
      per
        .withColumn("rk", row_number().over(
          Window.orderBy(col("v_c").desc, col("user_id"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy()))
        .withColumn("tot", sum(col("v_c")).over(Window.partitionBy()))
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
    // moment; the volume median is nearest-rank over suppliers.
    "q337_dormant_rich_suppliers" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
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
      val ranked = su.crossJoin(broadcast(mom))
        .withColumn("qrk", row_number().over(
          Window.orderBy(col("qty"), col("s_suppkey"))))
        .withColumn("med_idx",
          ((col("n") + 1) / lit(2)).cast("long"))
        .withColumn("med_q", min(when(col("qrk") === col("med_idx"),
          col("qty"))).over(Window.partitionBy()))
      ranked
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
    // assortment-planning signal. Part tiers are exact ntile over
    // the catalog; the order flags are two conditional maxima.
    "q339_cross_tier_baskets" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tiers = Tables.part(s, dir)
        .select(col("p_partkey"),
          ntile(4).over(Window.orderBy(
            floor(col("p_retailprice") * 100 + lit(0.5)).cast("long"),
            col("p_partkey"))).as("tier"))
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

    // Relative-standing deciles: each customer's balance percentile
    // WITHIN their nation — percent_rank is (rank−1)/(n−1), exact
    // integers + one division, then decile bands; the rollup reports
    // band populations and value. The window sorts per nation.
    "q216_balance_deciles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_nationkey"))
      val ranked = Tables.customer(s, dir)
        .select(col("c_nationkey").cast("long").as("nation"),
          col("c_custkey"),
          floor(col("c_acctbal") * 100 + lit(0.5)).cast("long").as("bal_c"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("nation"))
            .orderBy(col("bal_c"), col("c_custkey"))).cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("nation"))))
        // decile = floor(10·(rk−1)/n) capped at 9: integer arithmetic
        .withColumn("decile", least(expr("(rk - 1) * 10 div n"), lit(9L)))
      ranked.groupBy(col("nation"), col("decile"))
        .agg(count(lit(1)).as("n_custs"),
          (sum(col("bal_c")) / 100.0).as("total_bal"))
        .orderBy("nation", "decile")
    }),

    // Signup→purchase conversion by signup hour-of-day: users whose
    // first purchase follows their first signup within 24 h, bucketed
    // by the signup's hour — the "when do signups convert" readout.
    // Two keyed min-aggregates + one join; permille is integral.
    "q217_conversion_by_hour" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
      signups.join(purchases, Seq("user_id"), "left")
        .select(hour(col("s_ts")).cast("long").as("signup_hour"),
          when(col("p_ts").isNotNull && col("p_ts") > col("s_ts") &&
            unix_micros(col("p_ts")) - unix_micros(col("s_ts")) <=
              86400000000L, 1L).otherwise(0L).as("converted"))
        .groupBy(col("signup_hour"))
        .agg(count(lit(1)).as("n_signups"),
          sum(col("converted")).as("n_converted"))
        .select(col("signup_hour"), col("n_signups"), col("n_converted"),
          expr("n_converted * 1000L div n_signups").as("conv_permille"))
        .orderBy("signup_hour")
    }),

    // Source-vocabulary similarity matrix: cosine between sources'
    // token-count vectors — the corpus redundancy map (two sources
    // with cosine ≈ 1 are the same crawl twice). The sparse dot
    // product joins per-token counts on the token (never a dense
    // |vocab| vector); norms are exact integer sums + one IEEE sqrt.
    "q218_source_vocab_cosine" -> ((s, dir) => {
      val tok = Tables.documents(s, dir)
        .select(col("source"),
          explode(graft.functions.TextFunctions.wsTokens(col("text")))
            .as("tok"))
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // norms + the pair join both read it
      val norms = tok.groupBy(col("source"))
        .agg(sum(col("c") * col("c")).as("n2"))
      val dots = tok.as("a").join(tok.as("b"),
          col("a.tok") === col("b.tok") &&
            col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(sum(col("a.c") * col("b.c")).as("dot"))
      dots
        .join(broadcast(norms.select(col("source").as("src_a"),
          col("n2").as("n2a"))), Seq("src_a"))
        .join(broadcast(norms.select(col("source").as("src_b"),
          col("n2").as("n2b"))), Seq("src_b"))
        .select(col("src_a"), col("src_b"),
          r4(col("dot").cast("double") /
            (sqrt(col("n2a").cast("double")) *
              sqrt(col("n2b").cast("double")))).as("cos"))
        .orderBy("src_a", "src_b")
    }),

    // Order-cadence regularity: coefficient of variation of each
    // customer's inter-order gaps — CV≈0 is metronome-regular
    // (subscriptions, schedulers), CV≈1 is Poisson-organic, higher is
    // bursty. Day-gaps are integers, so variance comes from exact
    // moments (q178's identity) and CV is one IEEE sqrt + division.
    "q213_order_cadence" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val gaps = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
        .withColumn("gap_d",
          datediff(col("o_orderdate"),
            lag(col("o_orderdate"), 1).over(w)).cast("long"))
        .filter(col("gap_d").isNotNull)
      gaps.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_gaps"), sum(col("gap_d")).as("s"),
          sum(col("gap_d") * col("gap_d")).as("s2"))
        .filter(col("n_gaps") >= 5L && col("s") > 0L)
        .select(col("o_custkey"), col("n_gaps"),
          r4(col("s").cast("double") / col("n_gaps").cast("double"))
            .as("mean_gap_d"),
          r4(sqrt((col("n_gaps") * col("s2") - col("s") * col("s"))
            .cast("double")) / col("s").cast("double")).as("cv"))
        .orderBy("o_custkey")
    }),

    // Dominant-part-type customer segments: each customer's argmax
    // part type by quantity (rank window, ties to the alphabetical
    // type — deterministic), rolled up to segment sizes and the
    // dominant type's average share.
    "q214_dominant_type_segments" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val perType = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_type"))),
          col("p_partkey") === col("l_partkey"))
        .groupBy(col("o_custkey"), col("p_type"))
        .agg(sum(col("l_quantity").cast("long")).as("qty"))
      val wc = Window.partitionBy(col("o_custkey"))
      val ranked = perType
        .withColumn("total_qty", sum(col("qty")).over(wc))
        .withColumn("rk", row_number().over(
          wc.orderBy(col("qty").desc, col("p_type").asc)))
        .filter(col("rk") === 1)
      ranked.groupBy(col("p_type").as("dominant_type"))
        .agg(count(lit(1)).as("n_custs"),
          sum(col("qty")).as("dom_qty"), sum(col("total_qty")).as("tot_qty"))
        .select(col("dominant_type"), col("n_custs"),
          expr("dom_qty * 1000L div tot_qty").as("avg_share_permille"))
        .orderBy("dominant_type")
    }),

    // Region→region trade-flow matrix: customer region × supplier
    // region revenue — the full-matrix generalization of q163's
    // nation pairs. Both dim chains broadcast; one fact aggregate.
    "q215_trade_flow_matrix" -> ((s, dir) => {
      val cents = floor(col("l_extendedprice") * (lit(1.0) -
        col("l_discount")) * 100 + lit(0.5)).cast("long")
      val cReg = broadcast(Tables.nation(s, dir)
        .join(Tables.region(s, dir),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("c_nk"), col("r_name").as("cust_region")))
      val sReg = broadcast(Tables.nation(s, dir)
        .join(Tables.region(s, dir),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("s_nk"), col("r_name").as("supp_region")))
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(cReg, col("c_nationkey") === col("c_nk"))
        .join(sReg, col("s_nationkey") === col("s_nk"))
        .groupBy(col("cust_region"), col("supp_region"))
        .agg((sum(cents) / 100.0).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("cust_region", "supp_region")
    }),

    // Cold-catalog gap analysis: never-ordered parts with their
    // NEAREST ordered sibling by size within the brand — q26's as-of
    // carry idiom applied to a NON-TIME axis (size): two
    // ignore-nulls carries over one brand-keyed exchange (asc + desc
    // sorts), nearest = the smaller |size gap|, ties to the smaller
    // size. No self-join over the catalog.
    "q211_cold_parts" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, dir)
      val maxD = li.agg(max(col("l_shipdate")).as("t_max"))
      // "cold" = nothing shipped in the trailing 60 days (every part
      // in this dense fixture has SOME history, so all-time coldness
      // is vacuous — recency-window coldness is the real report)
      val orderedKeys = li.crossJoin(broadcast(maxD))
        .filter(col("l_shipdate") > col("t_max") - expr("INTERVAL 60 DAYS"))
        .select(col("l_partkey")).distinct()
      val parts = Tables.part(s, dir)
        .join(orderedKeys, col("p_partkey") === col("l_partkey"), "left")
        .select(col("p_partkey"), col("p_brand"), col("p_size"),
          col("l_partkey").isNotNull.as("is_ordered"))
      val mark = when(col("is_ordered"),
        struct(col("p_size").as("s"), col("p_partkey").as("k")))
      val wUp = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_size").asc, col("p_partkey").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val wDn = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_size").desc, col("p_partkey").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val gb = col("p_size") - col("below.s")
      val ga = col("above.s") - col("p_size")
      parts
        .withColumn("below", last(mark, ignoreNulls = true).over(wUp))
        .withColumn("above", last(mark, ignoreNulls = true).over(wDn))
        .filter(!col("is_ordered"))
        .withColumn("pick",
          when(col("below").isNull, col("above"))
            .when(col("above").isNull, col("below"))
            .when(gb <= ga, col("below")).otherwise(col("above")))
        .select(col("p_partkey"), col("p_brand"), col("p_size"),
          col("pick.k").as("nearest_partkey"),
          col("pick.s").as("nearest_size"),
          abs(col("pick.s") - col("p_size")).as("size_gap"))
        .orderBy("p_partkey")
    }),

    // Supply-base attrition: the 10 most-idle suppliers by days since
    // last shipment (rank-based, so the report is never vacuous
    // however dense the feed). One aggregate + TakeOrderedAndProject.
    "q212_supplier_attrition" -> ((s, dir) => {
      val maxD = Tables.lineitem(s, dir)
        .agg(max(col("l_shipdate")).as("t_max"))
      Tables.lineitem(s, dir)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_lines"),
          max(col("l_shipdate")).as("last_ship"))
        .crossJoin(broadcast(maxD))
        .select(col("l_suppkey"), col("n_lines"),
          datediff(col("t_max"), col("last_ship")).cast("long")
            .as("days_idle"))
        .orderBy(col("days_idle").desc, col("l_suppkey"))
        .limit(10)
    }),

    // RFM segmentation (recency / frequency / monetary) — the
    // marketing staple: exact quintile scores per dimension (ntile
    // over the per-customer AGGREGATE with a custkey tie-break, so
    // bucketing is engine-exact), then rule-based segments. The
    // global ntile sorts |customers| aggregate rows — the exact-
    // quintile price; the approximate path at extreme cardinality is
    // q63's histogram boundaries.
    "q209_rfm_segmentation" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cents = floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
      val maxD = Tables.orders(s, dir)
        .agg(max(col("o_orderdate")).as("t_max"))
      val rfm = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("f"), sum(cents).as("m_c"))
        .crossJoin(broadcast(maxD))
        .select(col("o_custkey"),
          datediff(col("t_max"), col("last_order")).cast("long").as("r"),
          col("f"), col("m_c"))
      val scored = rfm
        .withColumn("score_r", lit(6) - ntile(5).over(
          Window.orderBy(col("r").asc, col("o_custkey"))))
        .withColumn("score_f", lit(6) - ntile(5).over(
          Window.orderBy(col("f").desc, col("o_custkey"))))
        .withColumn("score_m", lit(6) - ntile(5).over(
          Window.orderBy(col("m_c").desc, col("o_custkey"))))
      scored
        .withColumn("segment",
          when(col("score_r") >= 4 && col("score_f") >= 4, "champion")
            .when(col("score_r") >= 4 && col("score_f") < 4, "recent")
            .when(col("score_r") <= 2 && col("score_f") >= 4, "at_risk")
            .when(col("score_r") <= 2 && col("score_f") <= 2, "lost")
            .otherwise("regular"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_custs"),
          (sum(col("m_c")) / 100.0).as("monetary"),
          r4(sum(col("r")).cast("double") / count(lit(1)).cast("double"))
            .as("avg_recency_days"))
        .orderBy("segment")
    }),

    // Discount-band quantity lift: does a deeper discount move more
    // units? avg quantity per discount band vs the zero-discount
    // baseline, the lift an exact integer cross-multiplication
    // (quantities are integral doubles).
    "q210_discount_lift" -> ((s, dir) => {
      val band = floor(col("l_discount") * 100 + lit(0.5)).cast("long")
      val perBand = Tables.lineitem(s, dir)
        .groupBy(band.as("disc_pct"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("long")).as("qty"))
        .localCheckpoint(true) // baseline + output both read it
      val base = perBand.filter(col("disc_pct") === 0L)
        .select(col("n_items").as("n0"), col("qty").as("q0"))
      perBand.crossJoin(broadcast(base))
        .select(col("disc_pct"), col("n_items"),
          r4(col("qty").cast("double") / col("n_items").cast("double"))
            .as("avg_qty"),
          expr("qty * n0 * 1000L div (n_items * q0)").as("lift_permille"))
        .orderBy("disc_pct")
    }),

    // ABC / Pareto inventory classification: parts ranked by revenue,
    // class A = first 80% of cumulative revenue, B = to 95%, C = the
    // tail. The one global sort runs over the per-part AGGREGATE
    // (|parts| rows, not lineitems) — the documented acceptable form;
    // cumulative shares are integer ppm so class boundaries are
    // engine-exact.
    "q206_abc_classification" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cents = floor(col("l_extendedprice") * (lit(1.0) -
        col("l_discount")) * 100 + lit(0.5)).cast("long")
      val perPart = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey")).agg(sum(cents).as("rev_c"))
        .localCheckpoint(true) // total + ranked output both read it
      val total = perPart.agg(sum(col("rev_c")).cast("decimal(38,0)")
        .as("total_c"))
      val w = Window.orderBy(col("rev_c").desc, col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val classed = perPart.crossJoin(broadcast(total))
        .withColumn("cum_c", sum(col("rev_c")).over(w))
        .withColumn("cum_ppm",
          expr("CAST(cum_c AS DECIMAL(38,0)) * 1000000 div total_c")
            .cast("long"))
        .withColumn("abc_class",
          when(col("cum_ppm") <= 800000L, "A")
            .when(col("cum_ppm") <= 950000L, "B").otherwise("C"))
      classed.groupBy(col("abc_class"))
        .agg(count(lit(1)).as("n_parts"),
          (sum(col("rev_c")) / 100.0).as("revenue"),
          min(col("cum_ppm")).as("min_cum_ppm"),
          max(col("cum_ppm")).as("max_cum_ppm"))
        .orderBy("abc_class")
    }),

    // Demand-acceleration flag: parts whose last-7-day quantity runs
    // ahead of their prior-28-day DAILY mean by >2× — the
    // demand-sensing / stockout-risk report. The compare is integer
    // cross-multiplication (q7·28 > 2·q28·7), no float rate anywhere.
    "q207_demand_acceleration" -> ((s, dir) => {
      val maxD = Tables.lineitem(s, dir)
        .agg(max(col("l_shipdate")).as("t_max"))
      val flagged = Tables.lineitem(s, dir)
        .crossJoin(broadcast(maxD))
        .filter(col("l_shipdate") >
          col("t_max") - expr("INTERVAL 35 DAYS"))
        .groupBy(col("l_partkey"))
        .agg(
          sum(when(col("l_shipdate") >
            col("t_max") - expr("INTERVAL 7 DAYS"),
            col("l_quantity").cast("long")).otherwise(0L)).as("q7"),
          sum(when(col("l_shipdate") <=
            col("t_max") - expr("INTERVAL 7 DAYS"),
            col("l_quantity").cast("long")).otherwise(0L)).as("q28"))
        .filter(col("q28") > 0L && col("q7") * 28L > col("q28") * 14L)
      flagged
        .select(col("l_partkey"), col("q7"), col("q28"),
          expr("q7 * 28L * 1000L div (q28 * 7L)").as("accel_permille"))
        .orderBy(col("accel_permille").desc, col("l_partkey"))
        .limit(30)
    }),

    // Double-charge detection: same user, same dollar amount,
    // purchase within 7 days of the previous identical one — one lag
    // window per (user, amount) key, never a self-join on the event
    // table. (Dollar granularity: this synthetic feed's continuous
    // values never collide at cents; real payment feeds collide at
    // exact amounts and the window is typically minutes.)
    "q208_double_charges" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dollars = floor(col("value")).cast("long")
      val w = Window.partitionBy(col("user_id"), col("amount_d"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase" && col("value").isNotNull)
        .select(col("user_id"), col("event_id"), col("ts"),
          dollars.as("amount_d"))
        .withColumn("prev_id", lag(col("event_id"), 1).over(w))
        .withColumn("gap_s",
          (unix_micros(col("ts")) -
            unix_micros(lag(col("ts"), 1).over(w))) / 1000000L)
        .filter(col("prev_id").isNotNull && col("gap_s") <= 604800L)
        .select(col("user_id"), col("event_id").as("dup_event_id"),
          col("prev_id").as("orig_event_id"), col("amount_d"),
          col("gap_s").cast("long").as("gap_s"))
        .orderBy("user_id", "dup_event_id")
    }),

    // Run-length report per event type — the gaps-and-islands idiom
    // (island id = seq rank − per-type rank, both windows sharing one
    // user-keyed exchange): how long do users streak on one action
    // (e.g. consecutive 'error' events = retry storms). Counts are
    // integers; avg_run is one division.
    "q204_event_runs" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wAll = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wType = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"))
        .withColumn("island",
          row_number().over(wAll) - row_number().over(wType))
        .groupBy(col("user_id"), col("event_type"), col("island"))
        .agg(count(lit(1)).as("run_len"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_runs"), max(col("run_len")).as("max_run"),
          sum(col("run_len")).as("n_events"))
        .select(col("event_type"), col("n_runs"), col("max_run"),
          r4(col("n_events").cast("double") / col("n_runs").cast("double"))
            .as("avg_run"))
        .orderBy("event_type")
    }),

    // Coordinated-account detection: user pairs acting in the SAME
    // minute unusually often (bot rings move in lockstep). The pair
    // space is per-minute-bounded (the q17/q117 bucket-join
    // discipline — a skew-capped self-join on the minute bucket,
    // never users²); the threshold is an integer count.
    "q205_coordinated_pairs" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val um = Tables.events(s, dir)
        .select(col("user_id"),
          floor(unix_micros(col("ts")) / 60000000L).cast("long")
            .as("minute"))
        .distinct()
        // skew guard: a minute with a site-wide event (everyone acts)
        // carries no coordination signal and would quadratically blow
        // the join — cap it, same contract as the LSH bucket caps
        .withColumn("m_n", count(lit(1)).over(
          Window.partitionBy(col("minute"))))
        .filter(col("m_n") <= 50)
        .drop("m_n")
      um.as("a").join(um.as("b"),
          col("a.minute") === col("b.minute") &&
            col("a.user_id") < col("b.user_id"))
        .groupBy(col("a.user_id").as("user_a"),
          col("b.user_id").as("user_b"))
        .agg(count(lit(1)).as("n_shared_minutes"))
        .filter(col("n_shared_minutes") >= 3)
        .orderBy(col("n_shared_minutes").desc, col("user_a"),
          col("user_b"))
        .limit(50)
    }),

    // Exact nearest-rank inter-arrival percentiles per event type —
    // the latency-profile shape (p50/p90/p99 of the gap between
    // consecutive events of a type). Gaps are integer seconds; the
    // nearest-rank index floor((n−1)·q)+1 is integer arithmetic, so
    // the profile is engine-exact. Exact per-group quantiles cost a
    // per-type sort (partitioned across types); the sketch path at
    // extreme cardinality is q128's MRL / q63's histogram, documented
    // there.
    "q203_gap_percentiles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wSeq = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val gaps = Tables.events(s, dir)
        .select(col("event_type"), col("ts"), col("event_id"))
        .withColumn("gap_s",
          ((unix_micros(col("ts")) -
            unix_micros(lag(col("ts"), 1).over(wSeq))) / 1000000L)
            .cast("long"))
        .filter(col("gap_s").isNotNull)
      val wRank = Window.partitionBy(col("event_type"))
        .orderBy(col("gap_s"), col("event_id"))
      gaps
        .withColumn("rk", row_number().over(wRank).cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("event_type"))))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n_gaps"),
          max(when(col("rk") === expr("(n - 1) * 50 div 100 + 1"),
            col("gap_s"))).as("p50_s"),
          max(when(col("rk") === expr("(n - 1) * 90 div 100 + 1"),
            col("gap_s"))).as("p90_s"),
          max(when(col("rk") === expr("(n - 1) * 99 div 100 + 1"),
            col("gap_s"))).as("p99_s"))
        .orderBy("event_type")
    }),

    // Cross-format consistency audit: the same table written to and
    // read back from ALL four row/container formats (JSONL, ORC, Avro
    // OCF, WARC) must agree on the content digest — one query that
    // certifies the whole source tier jointly (a format-specific
    // corruption shows up as one divergent row).
    "q201_format_consistency" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val base = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_q201_${math.abs(dir.hashCode)}"
      def digest(df: DataFrame, fmt: String) =
        df.agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("sum_chars"),
          countDistinct(md5(col("text"))).as("n_texts"),
          sum(conv(substring(md5(col("text")), 1, 8), 16, 10)
            .cast("long")).as("digest_sum"))
          .select(lit(fmt).as("format"), col("n_docs"), col("sum_chars"),
            col("n_texts"), col("digest_sum"))
      graft.sources.JsonIO.writeJsonl(docs, s"$base/jsonl")
      graft.sources.OrcIO.writeOrc(docs, s"$base/orc")
      graft.sources.AvroFileIO.writeOcf(docs, s"$base/avro")
      graft.sources.WarcIO.writeWarc(docs, s"$base/warc")
      digest(graft.sources.JsonIO.readJsonl(s, s"$base/jsonl", docs.schema),
          "jsonl")
        .unionByName(digest(
          graft.sources.OrcIO.readOrc(s, s"$base/orc", docs.schema), "orc"))
        .unionByName(digest(graft.sources.AvroFileIO
          .readOcf(s, s"$base/avro", docs.schema), "avro"))
        .unionByName(digest(
          graft.sources.WarcIO.readWarc(s, s"$base/warc"), "warc"))
        .orderBy("format")
    }),

    // Per-source 10%-trimmed mean of document length — the robust
    // location estimate that survives the outliers q102/q72 only
    // FLAG. Trim bounds are integer rank comparisons; the mean is an
    // exact integer sum over the kept ranks, one division at the end.
    "q202_trimmed_mean" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars"), col("doc_id"))
      Tables.documents(s, dir)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("source"))))
        .filter(col("rk") > expr("n div 10") &&
          col("rk") <= col("n") - expr("n div 10"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("s"))
        .select(col("source"), col("n_kept"),
          r4(col("s").cast("double") / col("n_kept").cast("double"))
            .as("trimmed_mean_chars"))
        .orderBy("source")
    }),

    // Deterministic epoch interleave: rank within source by content
    // address, epoch_key = (r−1)·S + source_idx — the training-order
    // query. The GLOBAL order is a computed key, never a global
    // row_number (the classic unpartitioned-window scale-killer);
    // ordering by the key interleaves sources round-robin, reruns are
    // byte-identical, and the tail (exhausted sources) stays sparse
    // but totally ordered.
    "q198_epoch_interleave" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      // the one unpartitioned window runs over the DISTINCT source
      // list (|sources| rows, broadcast afterwards) — never over data
      val srcIdx = docs.select(col("source")).distinct()
        .withColumn("src_idx",
          row_number().over(Window.orderBy(col("source"))).cast("long") - 1)
      val nSrc = srcIdx.agg(count(lit(1)).as("n_src"))
      val wSrc = Window.partitionBy(col("source"))
        .orderBy(md5(col("text")), col("doc_id"))
      docs
        .withColumn("r", row_number().over(wSrc).cast("long"))
        .join(broadcast(srcIdx), Seq("source"))
        .crossJoin(broadcast(nSrc))
        .select(col("doc_id"), col("source"), col("r"),
          ((col("r") - 1) * col("n_src") + col("src_idx"))
            .as("epoch_key"))
        .orderBy("epoch_key")
    }),

    // Quality gate with a REASON bitmask (C4/Gopher-style cleaning,
    // explainable): every rule is an exact integer comparison on the
    // q22 counts, so the verdict is engine-exact and each dropped doc
    // says why — the per-doc companion of q195's dedup explain.
    "q199_quality_gate" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val toks = graft.functions.TextFunctions.wsTokens(col("text"))
      val tri = graft.functions.HashFunctions.wordShingles(toks, 3)
      val nTok = size(toks).cast("long")
      val nChars = length(col("text")).cast("long")
      val nAlpha = graft.functions.TextFunctions.alphaCount(col("text"))
        .cast("long")
      val nPunct = graft.functions.TextFunctions.punctCount(col("text"))
        .cast("long")
      val nStop = graft.functions.TextFunctions
        .stopwordCount(col("text"),
          graft.functions.TextFunctions.stopwords("en")).cast("long")
      val nTri = size(tri).cast("long")
      val nTriD = size(array_distinct(tri)).cast("long")
      val mask =
        when(nTok < 5, 1L).otherwise(0L) +
          when(nAlpha * 1000L < nChars * 600L, 2L).otherwise(0L) +
          when(nPunct * 1000L > nChars * 100L, 4L).otherwise(0L) +
          when(nStop === 0L, 8L).otherwise(0L) +
          when(nTri > 0L && nTriD * 1000L < nTri * 800L, 16L)
            .otherwise(0L)
      Tables.documents(s, dir)
        .select(col("doc_id"), nTok.as("n_tokens"), nChars.as("n_chars"),
          mask.as("reason_mask"), (mask === 0L).as("kept"))
        .orderBy("doc_id")
    }),

    // Capstone composition: quality gate (q199) → byte-exact dedup
    // survivors → content-addressed token-budget fill per source
    // (q159's convention) — the cleaning pipeline a corpus run
    // actually executes, certified END-TO-END by one oracle instead
    // of per-stage.
    "q200_clean_pipeline" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.GraftFunctions.register(s)
      val toks = graft.functions.TextFunctions.wsTokens(col("text"))
      val tri = graft.functions.HashFunctions.wordShingles(toks, 3)
      val nTok = size(toks).cast("long")
      val nChars = length(col("text")).cast("long")
      val nAlpha = graft.functions.TextFunctions.alphaCount(col("text"))
        .cast("long")
      val nPunct = graft.functions.TextFunctions.punctCount(col("text"))
        .cast("long")
      val nStop = graft.functions.TextFunctions
        .stopwordCount(col("text"),
          graft.functions.TextFunctions.stopwords("en")).cast("long")
      val nTriD = size(array_distinct(tri)).cast("long")
      val clean = Tables.documents(s, dir)
        .filter(nTok >= 5 && nAlpha * 1000L >= nChars * 600L &&
          nPunct * 1000L <= nChars * 100L && nStop > 0L &&
          !(size(tri) > 0 && nTriD * 1000L < size(tri).cast("long") * 800L))
      val wDup = Window.partitionBy(md5(col("text")))
      val survivors = clean
        .withColumn("surv", min(col("doc_id")).over(wDup))
        .filter(col("doc_id") === col("surv"))
      val priority = conv(substring(md5(col("text")), 1, 8), 16, 10)
        .cast("long")
      val wFill = Window.partitionBy(col("source"))
        .orderBy(col("priority"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      survivors
        .select(col("doc_id"), col("source"), nTok.as("n_tokens"),
          priority.as("priority"))
        .withColumn("cum_tokens", sum(col("n_tokens")).over(wFill))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("cum_tokens"), (col("cum_tokens") <= 800L).as("kept"))
        .orderBy("doc_id")
    }),

    // Corpus balance audit: per language, the Simpson-index effective
    // source count (Σc)²/Σc² — "how many sources is this slice REALLY
    // drawing from" — plus the top source's share. The entropy-based
    // diversity needs libm log (gate-hostile); Simpson is exact
    // integers + one division, and 2^H ≈ Simpson for near-uniform
    // mixes. One aggregate over |lang|×|source| cells.
    "q194_source_diversity" -> ((s, dir) => {
      val perSrc = Tables.documents(s, dir)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("c"))
      perSrc.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sources"),
          sum(col("c")).as("n_docs"),
          sum(col("c") * col("c")).as("sum_c2"),
          max(col("c")).as("top_c"))
        .select(col("lang"), col("n_sources"), col("n_docs"),
          r4((col("n_docs") * col("n_docs")).cast("double") /
            col("sum_c2").cast("double")).as("effective_sources"),
          expr("top_c * 1000L div n_docs").as("top_share_permille"))
        .orderBy("lang")
    }),

    // Dedup survivor EXPLAIN table — the governance view the dedup
    // family (q14/q15/q17) feeds: for every dropped document, who it
    // collapsed into and at which tier. Tiers are mutually exclusive
    // and cascade: byte-exact first, whitespace/case-normalized next,
    // then minhash near-dup candidates (min-id partner; the full
    // transitive clustering is q49/q91 — this is the per-doc audit
    // row, not the cluster assignment).
    "q195_dedup_explain" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text")).localCheckpoint(true)
      val wExact = org.apache.spark.sql.expressions.Window
        .partitionBy(col("h"))
      def tier(df: DataFrame, keyCol: org.apache.spark.sql.Column,
               name: String) = {
        val withMin = df.withColumn("h", keyCol)
          .withColumn("surv", min(col("doc_id")).over(wExact))
        (withMin.filter(col("doc_id") =!= col("surv"))
          .select(col("doc_id"), col("surv").as("survivor_id"),
            lit(name).as("tier")),
          withMin.filter(col("doc_id") === col("surv"))
            .select(col("doc_id"), col("text")))
      }
      val (exactDrops, afterExact) = tier(docs, md5(col("text")), "exact")
      val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
      val (normDrops, afterNorm) = tier(afterExact, md5(norm), "normalized")
      val remaining = afterNorm.select(col("doc_id"))
      val pairs = Dedup.minhashLshPairs(s, Tables.documents(s, dir))
        .join(remaining.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
        .join(remaining.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"))
      val nearDrops = pairs.groupBy(col("doc_b").as("doc_id"))
        .agg(min(col("doc_a")).as("survivor_id"))
        .select(col("doc_id"), col("survivor_id"),
          lit("near_dup").as("tier"))
      exactDrops.unionByName(normDrops).unionByName(nearDrops)
        .orderBy("doc_id", "tier")
    }),

    // k-anonymity generalization ladder (q161's remediation step):
    // for each candidate balance-band width, how many QI groups stay
    // re-identifiable (n < k) — the report that picks the coarsest
    // compliant generalization instead of guessing.
    "q196_generalization_ladder" -> ((s, dir) => {
      val widths = Seq(1000, 5000, 10000)
      widths.map { wth =>
        Tables.customer(s, dir)
          .groupBy(col("c_nationkey").cast("long").as("nation"),
            col("c_mktsegment").as("segment"),
            floor(col("c_acctbal") / wth).cast("long").as("b"))
          .agg(count(lit(1)).as("n"))
          .agg(lit(wth.toLong).as("band_width"),
            count(lit(1)).as("n_groups"),
            sum(when(col("n") < 5, 1L).otherwise(0L)).as("n_risky"),
            max(when(col("n") < 5, col("n")).otherwise(0L))
              .as("largest_risky"))
          .select(col("band_width"), col("n_groups"), col("n_risky"),
            (col("n_risky") === 0L).as("compliant"))
      }.reduce(_.unionByName(_)).orderBy("band_width")
    }),

    // TPC-H Q14 shape: promo revenue share per ship-month —
    // conditional cents, integral permille, no join ordering hazards
    // (part broadcasts).
    "q193_promo_share" -> ((s, dir) => {
      val cents = floor(col("l_extendedprice") * (lit(1.0) -
        col("l_discount")) * 100 + lit(0.5)).cast("long")
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_type"))),
          col("p_partkey") === col("l_partkey"))
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
        .agg(sum(cents).as("total_c"),
          sum(when(col("p_type") === "PROMO", cents).otherwise(0L))
            .as("promo_c"))
        .select(col("month"), (col("total_c") / 100.0).as("revenue"),
          expr("promo_c * 1000L div total_c").as("promo_share_permille"))
        .orderBy("month")
    }),
  )

  /** Bench-only twins: timed by [[Bench]] alongside `queries` but
    * NEVER part of the declared correctness surface — each exercises a
    * production path whose accuracy contract lives in the spec tier,
    * so the invariant "every `queries` entry is hash-certified" stays
    * intact while the path still gets a round-over-round wall-time
    * number in BENCH_r{N}.json.
    */
  val benchQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q61's PRODUCTION stopping rule: tol early-exit instead of the
    // oracle-pinned 10 rounds (the fixed count exists only because the
    // DuckDB oracle unrolls exactly 10). tol=3e-4 exits at round ~6 on
    // the sf0.1 graph (measured delta decay ~0.8/round), and the
    // ε·d/(1−d) distance bound vs the run-to-cap reference is
    // property-tested in GraphOpsSpec.
    "q61_pagerank_tol" -> ((s, dir) => {
      val edges = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (lit(100000L) + col("l_suppkey")).as("dst"))
      GraphOps.pageRank(edges, iters = 10, tol = 3e-4)
        .select(col("v").as("node_id"), col("pr").as("pagerank"))
        .orderBy("node_id")
    }),
  )

  /** q98's fixed retrieval workload (mirrored as a VALUES clause in the
    * oracle) — in production the query table is whatever arrives, the
    * plan shape is identical.
    */
  private[graft] val bm25Queries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("join", "hash"),
    2L -> Seq("stream", "window"),
    3L -> Seq("spark", "filter", "scan"),
    4L -> Seq("customer", "batch"))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
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

    "q05_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       floor((SUM(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
        |       floor((SUM(l_extendedprice)) * 100 + 0.5) / 100 AS sum_base_price,
        |       floor((SUM(l_extendedprice * (1.0 - l_discount))) * 100 + 0.5) / 100 AS sum_disc_price,
        |       floor((AVG(l_quantity)) * 10000 + 0.5) / 10000 AS avg_qty,
        |       floor((AVG(l_extendedprice)) * 10000 + 0.5) / 10000 AS avg_price,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q06_topk_orders" ->
      """SELECT o_orderkey, o_custkey, floor((o_totalprice) * 100 + 0.5) / 100 AS o_totalprice
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
        |       floor((SUM(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
        |       COUNT(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin,

    "q11_order_analytics" ->
      """SELECT o_custkey, o_orderkey,
        |       row_number() OVER w AS rn,
        |       floor((lag(o_totalprice, 1) OVER w) * 100 + 0.5) / 100 AS prev_price,
        |       floor((SUM(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |                                       AND CURRENT ROW)) * 100 + 0.5) / 100 AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY 1, 2""".stripMargin,

    "q12_revenue_per_region" ->
      """SELECT r_name, floor((SUM(o_totalprice)) * 100 + 0.5) / 100 AS revenue, COUNT(*) AS n_orders
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

    "q14_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, COUNT(*) AS n_copies
        |FROM documents
        |GROUP BY text
        |ORDER BY 1""".stripMargin,

    "q15_dedup_fingerprint" ->
      """SELECT min(doc_id) AS doc_id,
        |       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |       COUNT(*) AS n_copies
        |FROM documents
        |GROUP BY 2
        |ORDER BY 1""".stripMargin,

    "q16_dedup_ngram_jaccard" ->
      // the bounded CTE mirrors the engine's maxBlockSize skew guard
      // (Dedup.ngramJaccardPairs drops blocks larger than the cap)
      s"""WITH bounded AS (
        |  SELECT doc_id, source, text
        |  FROM (SELECT doc_id, source, text,
        |               COUNT(*) OVER (PARTITION BY source) AS block_n
        |        FROM documents)
        |  WHERE block_n <= ${graft.operators.Dedup.DefaultMaxBlockSize})
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       floor((len(list_intersect(list_distinct(string_split(a.text, ' ')),
        |                                list_distinct(string_split(b.text, ' '))))::DOUBLE
        |             / len(list_distinct(list_concat(string_split(a.text, ' '),
        |                                             string_split(b.text, ' '))))) * 10000 + 0.5) / 10000 AS jaccard
        |FROM bounded a JOIN bounded b
        |  ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE len(list_intersect(list_distinct(string_split(a.text, ' ')),
        |                         list_distinct(string_split(b.text, ' '))))::DOUBLE
        |      / len(list_distinct(list_concat(string_split(a.text, ' '),
        |                                      string_split(b.text, ' ')))) >= 0.5
        |ORDER BY 1, 2""".stripMargin,

    "q17_dedup_minhash_lsh" -> OracleHashSql.q17MinhashLsh,
    "q18_dedup_simhash" -> OracleHashSql.q18Simhash,
    "q36_dedup_lsh_jaccard" -> OracleHashSql.q36LshBlockedJaccard,
    "q49_dedup_clusters" -> OracleHashSql.q49DedupClusters,
    "q52_cms_heavy_hitters" -> OracleHashSql.q52CmsHeavyHitters(),
    "q53_zorder_key" -> OracleHashSql.q53ZOrder,
    "q54_cdc_chunks" -> OracleHashSql.q54CdcChunks,
    "q55_dedup_edit_distance" -> OracleHashSql.q55EditDistance,
    "q61_pagerank" -> OracleHashSql.q61PageRank(),

    // q62: segment split mirrors wsTokens (lower + split-on-space +
    // drop empties); first-occurrence key is the same doc_id*4096+idx
    // packing; reassembly order is the segment index.
    "q62_segment_dedup" ->
      """WITH base AS MATERIALIZED (
        |  SELECT doc_id,
        |         list_filter(string_split(lower(text), ' '),
        |                     t -> length(t) > 0) AS toks
        |  FROM documents),
        |segs AS MATERIALIZED (
        |  SELECT doc_id,
        |         unnest(list_transform(range((len(toks) + 7) // 8), j ->
        |           {'idx': j,
        |            'seg': array_to_string(toks[(j*8+1)::INT : (j*8+8)::INT], ' ')})) AS s
        |  FROM base),
        |occ AS MATERIALIZED (
        |  SELECT doc_id, s.idx AS idx, s.seg AS seg,
        |         doc_id * 4096 + s.idx AS occ
        |  FROM segs),
        |firsts AS (SELECT seg, min(occ) AS first_occ FROM occ GROUP BY seg),
        |kept AS (
        |  SELECT o.doc_id, o.idx, o.seg FROM occ o
        |  JOIN firsts f ON o.seg = f.seg AND o.occ = f.first_occ),
        |rebuilt AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_kept,
        |         string_agg(seg, ' ' ORDER BY idx) AS rb
        |  FROM kept GROUP BY doc_id),
        |totals AS (SELECT doc_id, count(*)::BIGINT AS n_seg FROM occ GROUP BY doc_id)
        |SELECT r.doc_id, t.n_seg, r.n_kept,
        |       length(r.rb)::BIGINT AS n_chars_rebuilt,
        |       md5(r.rb) AS rebuilt_md5
        |FROM rebuilt r JOIN totals t ON r.doc_id = t.doc_id
        |ORDER BY r.doc_id""".stripMargin,

    // q63: same inverse-CDF rank rule (first bin edge with cum >=
    // ceil(q*n)); all-integer counts and literal*integer edges.
    "q63_histogram_quantiles" ->
      """WITH bins AS (
        |  SELECT l_returnflag, floor(l_extendedprice / 1000.0)::BIGINT AS bin,
        |         count(*)::BIGINT AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (
        |  SELECT l_returnflag, bin, cnt,
        |         sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin)::BIGINT AS cum,
        |         sum(cnt) OVER (PARTITION BY l_returnflag)::BIGINT AS n
        |  FROM bins)
        |SELECT l_returnflag, max(n) AS n,
        |       min(CASE WHEN cum >= ceil(0.25 * n) THEN (bin + 1) * 1000.0 END) AS p25,
        |       min(CASE WHEN cum >= ceil(0.5 * n)  THEN (bin + 1) * 1000.0 END) AS p50,
        |       min(CASE WHEN cum >= ceil(0.75 * n) THEN (bin + 1) * 1000.0 END) AS p75,
        |       min(CASE WHEN cum >= ceil(0.95 * n) THEN (bin + 1) * 1000.0 END) AS p95
        |FROM c GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q57_corpus_pipeline" -> {
      val values = mixtureWeights
        .map { case (src, f) => s"('$src', $f)" }.mkString(", ")
      s"""WITH fp AS (
        |  SELECT min(doc_id) AS doc_id
        |  FROM documents
        |  GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))),
        |qual AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id,
        |           0.4 * (len(list_filter(string_split(lower(text), ' '),
        |                    x -> x IN ('the','a','of','and','in','to','is','it','that','for')))::DOUBLE
        |                 / greatest(len(list_filter(string_split(lower(text), ' '),
        |                    x -> length(x) > 0))::DOUBLE, 1.0))
        |           + 0.3 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
        |                    / greatest(length(text)::DOUBLE, 1.0))
        |           + 0.3 * (least(len(list_filter(string_split(lower(text), ' '),
        |                    x -> length(x) > 0))::DOUBLE, 100.0) / 100.0) AS qv
        |    FROM documents)
        |  WHERE qv >= 0.3),
        |toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> length(x) > 0) AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)-2),
        |                 i -> array_to_string(t[i:i+3], ' '))) AS g
        |  FROM toks WHERE len(t) >= 4),
        |test AS (SELECT DISTINCT g FROM grams WHERE doc_id < 5),
        |contaminated AS (
        |  SELECT DISTINCT c.doc_id FROM grams c JOIN test USING (g)
        |  WHERE c.doc_id >= 5),
        |weights(source, keep_frac) AS (VALUES $values),
        |kept AS (
        |  SELECT d.doc_id, d.source, d.text
        |  FROM documents d
        |  JOIN fp USING (doc_id)
        |  JOIN qual USING (doc_id)
        |  JOIN weights USING (source)
        |  WHERE d.doc_id >= 5
        |    AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
        |    AND ('0x' || substr(md5(d.text), 1, 4))::BIGINT <
        |        CAST(keep_frac * 65536 AS BIGINT)),
        |t57 AS (
        |  SELECT doc_id, source,
        |         len(list_filter(string_split(lower(text), ' '), x -> length(x) > 0))::BIGINT AS n_tokens
        |  FROM kept),
        |c57 AS (
        |  SELECT doc_id, source, n_tokens,
        |         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |                             ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
        |  FROM t57)
        |SELECT doc_id, source, n_tokens, ((cum - n_tokens) // 2048)::BIGINT AS seq_id
        |FROM c57
        |ORDER BY 1, 2, 3, 4""".stripMargin
    },

    "q58_snapshot_diff" ->
      """WITH v1 AS (
        |  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp_a
        |  FROM documents),
        |v2 AS (
        |  SELECT doc_id,
        |         md5(trim(regexp_replace(lower(
        |           CASE WHEN doc_id % 11 = 0 THEN text || ' edited' ELSE text END),
        |           '\s+', ' ', 'g'))) AS fp_b
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
        |  FROM documents WHERE doc_id % 13 = 0),
        |j AS (
        |  SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id, fp_a, fp_b
        |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
        |SELECT doc_id,
        |       CASE WHEN fp_a IS NULL THEN 'added'
        |            WHEN fp_b IS NULL THEN 'removed'
        |            WHEN fp_a <> fp_b THEN 'changed'
        |            ELSE 'same' END AS status
        |FROM j
        |WHERE fp_a IS NULL OR fp_b IS NULL OR fp_a <> fp_b
        |ORDER BY 1, 2""".stripMargin,

    "q60_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS linestatus,
        |       GROUPING(l_returnflag)::BIGINT AS g_rf,
        |       GROUPING(l_linestatus)::BIGINT AS g_ls,
        |       floor((SUM(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
        |       COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY 1, 2, 3, 4, 5, 6""".stripMargin,

    "q59_json_props" ->
      """SELECT event_type, count(k)::BIGINT AS n, sum(k)::BIGINT AS sum_k,
        |       min(k)::BIGINT AS min_k, max(k)::BIGINT AS max_k
        |FROM (SELECT event_type, json_extract(props, '$.k')::BIGINT AS k
        |      FROM events)
        |GROUP BY 1
        |ORDER BY 1, 2, 3, 4, 5""".stripMargin,

    "q56_order_windows" ->
      """SELECT o_custkey, o_orderkey,
        |       ntile(4) OVER w AS quartile,
        |       lead(o_orderkey, 1) OVER w AS next_ok,
        |       floor(cume_dist() OVER w * 10000 + 0.5) / 10000 AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY 1, 2, 3, 4, 5""".stripMargin,

    "q50_tfidf_terms" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(lower(text),' '), x -> length(x) > 0)) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
        |df AS (
        |  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
        |n AS (
        |  SELECT count(*)::BIGINT AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term, tf, df, (tf * n_docs) / df AS sc
        |  FROM tf JOIN df USING (term), n),
        |ranked AS (
        |  SELECT doc_id, term, tf, df, sc,
        |         row_number() OVER (PARTITION BY doc_id
        |                            ORDER BY sc DESC, term ASC) AS rk
        |  FROM scored)
        |SELECT doc_id, term, tf, df,
        |       floor(sc * 10000 + 0.5) / 10000 AS score, rk::BIGINT AS rk
        |FROM ranked WHERE rk <= 3
        |ORDER BY 1, 6""".stripMargin,

    "q51_stratified_sample" -> {
      val values = stratifiedQuotas
        .map { case (src, q) => s"('$src', $q)" }.mkString(", ")
      s"""WITH quotas(source, quota) AS (VALUES $values),
        |h AS (
        |  SELECT doc_id, source,
        |         ('0x' || substr(md5(text), 1, 8))::BIGINT AS u
        |  FROM documents),
        |r AS (
        |  SELECT h.doc_id, h.source, quota,
        |         row_number() OVER (PARTITION BY h.source
        |                            ORDER BY u, doc_id) AS rk
        |  FROM h JOIN quotas USING (source))
        |SELECT doc_id, source, rk::BIGINT AS rk
        |FROM r WHERE rk <= quota
        |ORDER BY 1, 2, 3""".stripMargin
    },
    "q21_sim_ann_lsh" ->
      OracleHashSql.q21AnnLsh(graft.operators.Similarity.defaultPlaneSets()),
    "q29_sim_ivf" -> OracleHashSql.q29Ivf,
    "q44_sim_ivf_kmeans" -> OracleHashSql.q44IvfKmeans(),
    "q64_semantic_dedup" -> OracleHashSql.q64SemanticDedup(),

    // q65: pairwise dim moments via a (vec, dim)-exploded self-join —
    // the oracle can afford dim²·N rows at fixture scale; the engine's
    // Gram fold computes the same sums (order-noise ~1e-15 only).
    "q65_dim_correlation" ->
      """WITH x AS MATERIALIZED (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |dims AS MATERIALIZED (
        |  SELECT vec_id, s.d AS d, s.v AS v FROM (
        |    SELECT vec_id,
        |           unnest(list_transform(range(64), j ->
        |             {'d': j, 'v': e[(j+1)::INT]})) AS s
        |    FROM x)),
        |stats AS (
        |  SELECT a.d AS d1, b.d AS d2, count(*)::DOUBLE AS n,
        |         sum(a.v) AS sx, sum(b.v) AS sy,
        |         sum(a.v*a.v) AS sxx, sum(b.v*b.v) AS syy,
        |         sum(a.v*b.v) AS sxy
        |  FROM dims a JOIN dims b ON a.vec_id = b.vec_id AND a.d < b.d
        |  GROUP BY 1, 2)
        |SELECT * FROM (
        |  SELECT d1::BIGINT AS d1, d2::BIGINT AS d2,
        |         (n*sxy - sx*sy) /
        |           (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)) AS corr,
        |         row_number() OVER (ORDER BY abs((n*sxy - sx*sy) /
        |           (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy))) DESC,
        |           d1, d2)::BIGINT AS rank
        |  FROM stats)
        |WHERE rank <= 20
        |ORDER BY rank""".stripMargin,

    // q66: same changeset rules; merge = untouched base ∪ 'U' rows.
    "q66_merge_apply" ->
      """WITH changes AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 11 = 3 THEN 'D'
        |              WHEN doc_id % 7 = 0 THEN 'U' END AS op,
        |         upper(text) AS text, source
        |  FROM documents WHERE doc_id % 11 = 3 OR doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, 'U', reverse(text), source
        |  FROM documents WHERE doc_id % 13 = 0),
        |merged AS (
        |  SELECT b.doc_id, b.text, b.source FROM documents b
        |  LEFT JOIN changes c ON b.doc_id = c.doc_id
        |  WHERE c.doc_id IS NULL
        |  UNION ALL
        |  SELECT doc_id, text, source FROM changes WHERE op = 'U')
        |SELECT doc_id, source, md5(text) AS text_md5,
        |       length(text)::BIGINT AS n_chars_new
        |FROM merged ORDER BY doc_id""".stripMargin,

    // q67: the engine's JSONL round-trip must reproduce the parquet
    // truth exactly.
    "q67_jsonl_roundtrip" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
        |       sum(n_chars)::BIGINT AS sum_chars,
        |       count(DISTINCT md5(text))::BIGINT AS n_distinct_texts
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // q68: same truncated-EWMA left fold (2^-j weights are exact
    // binary doubles, so the fold matches bit-for-bit); rolling stats
    // over the identical ROWS frame.
    "q68_ewma_features" ->
      """WITH f AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS tsu, value,
        |         list(value) OVER win AS vals,
        |         min(value) OVER win AS rmin,
        |         max(value) OVER win AS rmax
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts
        |                 ROWS BETWEEN 31 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id,
        |       strftime(tsu, '%Y-%m-%d %H:%M:%S') AS ts,
        |       floor(value*100+0.5)/100 AS value,
        |       floor(list_reduce(list_prepend(0.0::DOUBLE,
        |           list_transform(range(1, len(vals)+1),
        |             j -> vals[j] * pow(0.5, len(vals) - j + 1))),
        |           (a, b) -> a + b) * 10000 + 0.5) / 10000 AS ewma,
        |       floor(list_reduce(list_prepend(0.0::DOUBLE, vals),
        |           (a, b) -> a + b) / len(vals) * 10000 + 0.5) / 10000
        |         AS roll_mean,
        |       floor(rmin*100+0.5)/100 AS roll_min,
        |       floor(rmax*100+0.5)/100 AS roll_max
        |FROM f ORDER BY event_id""".stripMargin,

    // q69: registers reproduced bit-exactly (FNV-1a + splitmix on the
    // key string, integer rho ladder); single double division at the end.
    "q69_hll_distinct" -> OracleHashSql.q69HllDistinct(),

    // q70: the bloom is an optimization, not a semantic — the oracle is
    // the plain semi join the prefiltered plan must reproduce exactly.
    "q70_bloom_semi_join" ->
      """SELECT c_nationkey::BIGINT AS nationkey,
        |       COUNT(*) AS n_cust,
        |       floor((SUM(c_acctbal)) * 100 + 0.5) / 100 AS sum_acctbal
        |FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q71: same unigram model in SQL; nll = ln(N) - avg(ln cnt).
    "q71_lm_quality" ->
      """WITH toks AS (
        |  SELECT doc_id, t AS token FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |    FROM documents)
        |  WHERE length(t) > 0),
        |vocab AS (
        |  SELECT token, COUNT(*)::DOUBLE AS cnt FROM toks GROUP BY 1),
        |tot AS (SELECT SUM(cnt) AS n_total FROM vocab)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |       ln((SELECT n_total FROM tot)) - avg(ln(cnt)) AS nll
        |FROM toks JOIN vocab USING (token)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q72: same integer-space inequality in HUGEINT.
    "q72_outlier_counts" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |         CAST(floor(value * 100) AS HUGEINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |stats AS (
        |  SELECT user_id, event_type, COUNT(*)::HUGEINT AS n,
        |         SUM(c) AS s, SUM(c * c) AS ssq
        |  FROM ev GROUP BY 1, 2)
        |SELECT e.user_id, e.event_type, max(n)::BIGINT AS n_events,
        |       SUM(CASE WHEN (c*n - s)*(c*n - s) > 4*(n*ssq - s*s)
        |                THEN 1 ELSE 0 END)::BIGINT AS n_outliers
        |FROM ev e JOIN stats USING (user_id, event_type)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q73: same vocabulary cut and pair count in SQL.
    "q73_pmi_cooccurrence" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, t AS token FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |    FROM documents)
        |  WHERE length(t) > 0),
        |vocab AS (
        |  SELECT token, COUNT(*)::DOUBLE AS df FROM toks GROUP BY 1
        |  ORDER BY 2 DESC, 1 ASC LIMIT 50),
        |vt AS (SELECT doc_id, token, df FROM toks JOIN vocab USING (token)),
        |nd AS (SELECT COUNT(*)::DOUBLE AS n_docs FROM documents)
        |SELECT a.token AS t1, b.token AS t2, COUNT(*) AS c_xy,
        |       ln((SELECT n_docs FROM nd) * COUNT(*)::DOUBLE /
        |          (max(a.df) * max(b.df))) AS pmi
        |FROM vt a JOIN vt b
        |  ON a.doc_id = b.doc_id AND a.token < b.token
        |GROUP BY 1, 2
        |ORDER BY 3 DESC, 1 ASC, 2 ASC
        |LIMIT 100""".stripMargin,

    // q74: same A-ES keys; u from 13 md5 hex chars (52-bit exact),
    // u^(1/w) as iterated sqrt (correctly rounded per IEEE 754, so the
    // key — and therefore the top-200 cut — matches bit-for-bit).
    "q74_weighted_sample" -> {
      val values = sampleWeights
        .map { case (src, w) => s"('$src', $w)" }.mkString(", ")
      s"""WITH weights(source, w) AS (VALUES $values),
        |keyed AS (
        |  SELECT doc_id, source, w,
        |         (('0x' || substr(md5(text), 1, 13))::BIGINT::DOUBLE + 0.5)
        |           / 4503599627370496.0 AS u
        |  FROM documents JOIN weights USING (source))
        |SELECT doc_id, source, w,
        |       CASE CAST(log2(w) AS INT)
        |         WHEN 0 THEN u
        |         WHEN 1 THEN sqrt(u)
        |         WHEN 2 THEN sqrt(sqrt(u))
        |         ELSE sqrt(sqrt(sqrt(u))) END AS key
        |FROM keyed
        |ORDER BY key DESC, doc_id ASC
        |LIMIT 200""".stripMargin
    },

    // q75: the CSV round-trip must reproduce the parquet truth exactly.
    "q75_csv_roundtrip" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
        |       sum(n_chars)::BIGINT AS sum_chars,
        |       count(DISTINCT md5(text))::BIGINT AS n_distinct_texts
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // q76: the same 5 merge rounds unrolled as CTEs (OracleHashSql).
    "q76_bpe_merges" -> OracleHashSql.q76BpeMerges(),

    // q77: id-oriented wedge closure — same count as the engine's
    // degree-oriented join (orientation-invariant).
    "q77_triangle_count" ->
      """WITH os AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS s FROM lineitem),
        |e AS (
        |  SELECT a.s AS x, b.s AS y
        |  FROM os a JOIN os b ON a.o = b.o AND a.s < b.s
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |deg AS (
        |  SELECT v FROM (
        |    SELECT x AS v FROM e UNION ALL SELECT y FROM e)
        |  GROUP BY 1),
        |tri AS (
        |  SELECT COUNT(*)::BIGINT AS n
        |  FROM e e1 JOIN e e2 ON e1.x = e2.x AND e1.y < e2.y
        |  JOIN e e3 ON e3.x = e1.y AND e3.y = e2.y)
        |SELECT (SELECT COUNT(*) FROM deg)::BIGINT AS n_vertices,
        |       (SELECT COUNT(*) FROM e)::BIGINT AS n_edges,
        |       (SELECT n FROM tri) AS n_triangles""".stripMargin,

    // q78: the same first-touch chain as three dependent aggregates.
    "q78_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1)
        |SELECT * FROM (
        |  SELECT 1::BIGINT AS stage_idx, 'view' AS stage,
        |         (SELECT COUNT(*) FROM s1)::BIGINT AS n_users
        |  UNION ALL
        |  SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
        |  UNION ALL
        |  SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3))
        |ORDER BY stage_idx""".stripMargin,

    // q79: identical integer epoch-day arithmetic.
    "q79_cohort_retention" ->
      """WITH ev AS (
        |  SELECT user_id,
        |         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
        |  FROM events),
        |fs AS (SELECT user_id, min(d) AS cohort_d FROM ev GROUP BY 1)
        |SELECT cohort_d, (d - cohort_d) AS offset_d,
        |       COUNT(DISTINCT ev.user_id)::BIGINT AS n_users
        |FROM ev JOIN fs ON ev.user_id = fs.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q80: encode side of the shared BPE CTE chain.
    "q80_bpe_encode" -> OracleHashSql.q80BpeEncode(),

    // q81: q36's bit-exact candidate CTEs + containment rerank.
    "q81_containment" -> OracleHashSql.q81Containment,

    // q82: same smoothed KL fold in SQL.
    "q82_source_drift_kl" ->
      """WITH toks AS (
        |  SELECT source, t AS token FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS t
        |    FROM documents)
        |  WHERE length(t) > 0),
        |corpus AS (
        |  SELECT token, COUNT(*)::DOUBLE AS c_corpus FROM toks GROUP BY 1),
        |nc AS (SELECT SUM(c_corpus) AS n_corpus FROM corpus),
        |nv AS (SELECT COUNT(*)::DOUBLE AS n_vocab FROM corpus),
        |bysrc AS (
        |  SELECT source, token, COUNT(*)::DOUBLE AS c_src
        |  FROM toks GROUP BY 1, 2),
        |st AS (SELECT source, SUM(c_src) AS n_src FROM bysrc GROUP BY 1)
        |SELECT source,
        |       SUM(p * ln(p / (c_corpus / (SELECT n_corpus FROM nc)))) AS kl,
        |       COUNT(*)::BIGINT AS n_vocab_terms
        |FROM (
        |  SELECT st.source, corpus.token, corpus.c_corpus,
        |         (COALESCE(b.c_src, 0) + 1)
        |           / (st.n_src + (SELECT n_vocab FROM nv)) AS p
        |  FROM corpus CROSS JOIN st
        |  LEFT JOIN bysrc b
        |    ON b.source = st.source AND b.token = corpus.token)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q83: Welford == var_samp analytically; r4 absorbs path noise.
    "q83_welford_variance" ->
      """SELECT event_type, COUNT(*)::BIGINT AS n_events,
        |       floor(avg(value) * 10000 + 0.5) / 10000 AS mean_value,
        |       floor(var_samp(value) * 10000 + 0.5) / 10000 AS var_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // q84: identical lead-window weighting (last observation NULL
    // weight drops out of both sums on both engines).
    "q84_twap" ->
      """WITH base AS (
        |  SELECT l_partkey, l_extendedprice AS price,
        |         epoch(lead(l_shipdate) OVER (
        |             PARTITION BY l_partkey
        |             ORDER BY l_shipdate, l_orderkey, l_linenumber))
        |           - epoch(l_shipdate) AS wt
        |  FROM lineitem)
        |SELECT l_partkey, COUNT(*)::BIGINT AS n_ship,
        |       floor(SUM(price * wt) / SUM(wt) * 100 + 0.5) / 100 AS twap,
        |       floor(avg(price) * 100 + 0.5) / 100 AS plain_avg
        |FROM base GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY 1""".stripMargin,

    // q85: same integer week index and smoothed ratio; ORDER BY the
    // rounded ratio with a total tie-break so the LIMIT cut matches.
    "q85_trending_parts" ->
      """WITH counts AS (
        |  SELECT l_partkey,
        |         CAST(floor(epoch(l_shipdate) / 604800) AS BIGINT) AS week,
        |         COUNT(*)::BIGINT AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |lagged AS (
        |  SELECT l_partkey, week, cnt,
        |         lag(cnt) OVER (PARTITION BY l_partkey ORDER BY week)
        |           AS prev_cnt
        |  FROM counts)
        |SELECT l_partkey, week, cnt, prev_cnt,
        |       floor((cnt + 1)::DOUBLE / (prev_cnt + 1) * 10000 + 0.5)
        |         / 10000 AS ratio
        |FROM lagged WHERE prev_cnt IS NOT NULL
        |ORDER BY ratio DESC, l_partkey ASC, week ASC
        |LIMIT 50""".stripMargin,

    // q87: same gaps-and-islands sessionization; the path is an
    // ORDER BY inside the list aggregate, cut to 5.
    "q87_top_journeys" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM marked),
        |paths AS (
        |  SELECT array_to_string(
        |           (list(event_type ORDER BY ts, event_id))[1:5], '>')
        |           AS path
        |  FROM sess GROUP BY user_id, sess)
        |SELECT path, COUNT(*)::BIGINT AS n_sessions
        |FROM paths GROUP BY 1
        |ORDER BY 2 DESC, 1 ASC LIMIT 20""".stripMargin,

    // q91: q49's recursive components + keep-longest argmax.
    "q91_dedup_keep_best" -> OracleHashSql.q91DedupKeepBest,

    // q94: identical lag pairs and row-normalized probabilities.
    "q94_type_transitions" ->
      """WITH pairs AS (
        |  SELECT prev_type, event_type AS next_type, COUNT(*)::BIGINT AS n
        |  FROM (
        |    SELECT event_type,
        |           lag(event_type) OVER (PARTITION BY user_id
        |             ORDER BY ts, event_id) AS prev_type
        |    FROM events)
        |  WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |totals AS (
        |  SELECT prev_type, SUM(n)::BIGINT AS n_from FROM pairs GROUP BY 1)
        |SELECT p.prev_type, p.next_type, p.n,
        |       floor(p.n::DOUBLE / t.n_from * 10000 + 0.5) / 10000 AS p
        |FROM pairs p JOIN totals t ON p.prev_type = t.prev_type
        |ORDER BY 1, 2""".stripMargin,

    // q93: q62's segmentation, md5 per segment, per-fp source pairs.
    "q93_leakage_matrix" ->
      """WITH base AS (
        |  SELECT source,
        |         list_filter(string_split(lower(text), ' '),
        |                     t -> length(t) > 0) AS toks
        |  FROM documents),
        |fps AS (
        |  SELECT DISTINCT source, fp FROM (
        |    SELECT source,
        |           unnest(list_transform(range((len(toks) + 7) // 8), j ->
        |             md5(array_to_string(
        |               toks[(j*8+1)::INT : (j*8+8)::INT], ' ')))) AS fp
        |    FROM base))
        |SELECT a.source AS source_a, b.source AS source_b,
        |       COUNT(*)::BIGINT AS n_shared_segments
        |FROM fps a JOIN fps b
        |  ON a.fp = b.fp AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q92: same derivation rules and normalized-md5 admission check.
    "q92_incremental_ingest" ->
      """WITH batch AS (
        |  SELECT doc_id + 2000000 AS new_id, text
        |  FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 3000000, text || ' update'
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 4000000, reverse(text)
        |  FROM documents WHERE doc_id % 11 = 0),
        |basefp AS (
        |  SELECT DISTINCT
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents)
        |SELECT new_id,
        |       CASE WHEN basefp.fp IS NOT NULL THEN 'duplicate_of_base'
        |            ELSE 'admitted' END AS verdict
        |FROM (SELECT new_id,
        |             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |      FROM batch) b
        |LEFT JOIN basefp ON b.fp = basefp.fp
        |ORDER BY new_id""".stripMargin,

    // q90: same regex counters aggregated per source.
    "q90_pii_density" -> {
      val email = graft.functions.TextFunctions.emailRe
      val phone = graft.functions.TextFunctions.phoneRe
      val ip = graft.functions.TextFunctions.ipRe
      s"""SELECT source, COUNT(*)::BIGINT AS n_docs,
        |       SUM(len(regexp_extract_all(text, '$email')))::BIGINT AS n_emails,
        |       SUM(len(regexp_extract_all(text, '$phone')))::BIGINT AS n_phones,
        |       SUM(len(regexp_extract_all(text, '$ip')))::BIGINT AS n_ips,
        |       floor((SUM(len(regexp_extract_all(text, '$email')))
        |              + SUM(len(regexp_extract_all(text, '$phone')))
        |              + SUM(len(regexp_extract_all(text, '$ip'))))::DOUBLE
        |             * 10000.0 / SUM(n_chars) * 10000 + 0.5) / 10000
        |         AS pii_per_10k_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // q89: exact aggregates; mode via the same (count desc, lang asc)
    // argmax.
    "q89_dataset_card" ->
      """WITH base AS (
        |  SELECT source,
        |         COUNT(*)::BIGINT AS n_docs,
        |         SUM(len(list_filter(string_split(lower(text), ' '),
        |             x -> length(x) > 0)))::BIGINT AS n_tokens,
        |         COUNT(DISTINCT md5(text))::BIGINT AS n_distinct_texts,
        |         SUM(n_chars)::BIGINT AS n_chars
        |  FROM documents GROUP BY 1),
        |langs AS (
        |  SELECT source, lang, COUNT(*)::BIGINT AS n_lang,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY COUNT(*) DESC, lang ASC) AS rk
        |  FROM documents GROUP BY 1, 2)
        |SELECT b.source, n_docs, n_tokens, n_chars,
        |       (n_docs - n_distinct_texts) AS n_dup_docs,
        |       l.lang AS top_lang, l.n_lang AS top_lang_docs
        |FROM base b JOIN langs l ON b.source = l.source AND l.rk = 1
        |ORDER BY 1""".stripMargin,

    // q88: per-dim centroid sums, then list_cosine_similarity to the
    // rebuilt centroid list (summation-order noise absorbed by r4).
    "q88_cluster_cohesion" ->
      """WITH e AS (
        |  SELECT label::BIGINT AS label,
        |         CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings),
        |dims AS (
        |  SELECT label, i, SUM(e[i]) AS s, COUNT(*)::BIGINT AS n
        |  FROM (SELECT label, e, unnest(range(1, 65)) AS i FROM e)
        |  GROUP BY 1, 2),
        |cents AS (
        |  SELECT label, max(n) AS n_vecs,
        |         list(s / n ORDER BY i) AS centroid
        |  FROM dims GROUP BY 1),
        |scored AS (
        |  SELECT e.label, n_vecs,
        |         list_cosine_similarity(e.e, c.centroid) AS cos
        |  FROM e JOIN cents c ON e.label = c.label)
        |SELECT label, max(n_vecs) AS n_vecs,
        |       floor(avg(cos) * 10000 + 0.5) / 10000 AS avg_cos,
        |       floor(min(cos) * 10000 + 0.5) / 10000 AS min_cos
        |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin,

    // q86: same centered closed-form moments (NOT regr_slope — its
    // internal algorithm differs; the explicit sums match to ulps).
    "q86_user_trend" ->
      """WITH ev AS (
        |  SELECT user_id, epoch(ts) AS tsec, value
        |  FROM events WHERE value IS NOT NULL),
        |mins AS (SELECT user_id, min(tsec) AS t0 FROM ev GROUP BY 1),
        |c AS (
        |  SELECT ev.user_id, (tsec - t0)::DOUBLE AS x, value AS y
        |  FROM ev JOIN mins ON ev.user_id = mins.user_id)
        |SELECT user_id, COUNT(*)::BIGINT AS n_events,
        |       (COUNT(*)::DOUBLE * SUM(x*y) - SUM(x) * SUM(y)) /
        |         (COUNT(*)::DOUBLE * SUM(x*x) - SUM(x) * SUM(x)) AS slope
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "q24_media_features" -> OracleHashSql.q24MediaStats,
    "q37_dedup_embedding_lsh" -> OracleHashSql.q37LshBlockedCosine(
      graft.operators.Similarity.defaultPlaneSets(planes = 3, tables = 12,
        dim = 64, seed = 137L)),

    "q38_pii_redaction" -> {
      // SQL single-quoted strings keep backslashes literally, so the
      // Scala regex values drop straight in.
      val email = graft.functions.TextFunctions.emailRe
      val phone = graft.functions.TextFunctions.phoneRe
      val ip = graft.functions.TextFunctions.ipRe
      s"""SELECT doc_id,
        |       len(regexp_extract_all(text, '$email'))::BIGINT AS n_emails,
        |       len(regexp_extract_all(text, '$phone'))::BIGINT AS n_phones,
        |       len(regexp_extract_all(text, '$ip'))::BIGINT AS n_ips,
        |       md5(regexp_replace(regexp_replace(regexp_replace(text,
        |             '$email', '<EMAIL>', 'g'),
        |             '$ip', '<IP>', 'g'),
        |             '$phone', '<PHONE>', 'g')) AS redacted_md5
        |FROM documents
        |ORDER BY 1""".stripMargin
    },

    "q39_vector_stats" ->
      """SELECT vec_id,
        |       floor(sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
        |           x -> x::DOUBLE * x::DOUBLE)), (a, b) -> a + b)) * 10000 + 0.5) / 10000 AS l2_norm,
        |       floor((list_reduce(list_prepend(0.0, list_transform(embedding,
        |           x -> x::DOUBLE)), (a, b) -> a + b) / len(embedding)) * 10000 + 0.5) / 10000 AS vmean,
        |       floor(list_min(embedding)::DOUBLE * 10000 + 0.5) / 10000 AS vmin,
        |       floor(list_max(embedding)::DOUBLE * 10000 + 0.5) / 10000 AS vmax
        |FROM embeddings
        |ORDER BY 1""".stripMargin,

    "q41_contamination" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> length(x) > 0) AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)-2),
        |                 i -> array_to_string(t[i:i+3], ' '))) AS g
        |  FROM toks WHERE len(t) >= 4),
        |test AS (SELECT DISTINCT g FROM grams WHERE doc_id < 5)
        |SELECT c.doc_id, count(DISTINCT c.g) AS n_overlapping
        |FROM grams c JOIN test USING (g)
        |WHERE c.doc_id >= 5
        |GROUP BY 1
        |ORDER BY 1, 2""".stripMargin,

    "q43_mixture_sampling" -> {
      // the same weight table the engine broadcasts, as a VALUES clause
      val values = mixtureWeights
        .map { case (src, f) => s"('$src', $f)" }.mkString(", ")
      s"""WITH weights(source, keep_frac) AS (VALUES $values)
        |SELECT doc_id, source
        |FROM documents JOIN weights USING (source)
        |WHERE ('0x' || substr(md5(text), 1, 4))::BIGINT <
        |      CAST(keep_frac * 65536 AS BIGINT)
        |ORDER BY 1, 2""".stripMargin
    },

    "q47_embedding_quantize" ->
      """WITH s AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |sc AS (
        |  SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS scale FROM s),
        |q AS (
        |  SELECT vec_id, scale,
        |         CASE WHEN scale > 0
        |              THEN list_transform(e, x -> floor(x / scale * 127 + 0.5)::BIGINT)
        |              ELSE list_transform(e, x -> 0::BIGINT) END AS qs
        |  FROM sc)
        |SELECT vec_id, floor(scale * 10000 + 0.5) / 10000 AS scale,
        |       list_sum(qs)::BIGINT AS q_sum,
        |       list_min(qs)::BIGINT AS q_min,
        |       list_max(qs)::BIGINT AS q_max
        |FROM q
        |ORDER BY 1, 2, 3, 4, 5""".stripMargin,

    "q45_sequence_packing" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         len(list_filter(string_split(lower(text), ' '), x -> length(x) > 0))::BIGINT AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |                             ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens
        |  FROM t)
        |SELECT doc_id, source, n_tokens,
        |       ((cum_tokens - n_tokens) // 2048)::BIGINT AS seq_id
        |FROM c
        |ORDER BY 1, 2, 3, 4""".stripMargin,

    "q46_length_percentile" ->
      // prr vs pr: the filter must see the UNROUNDED rank (DuckDB WHERE
      // can bind SELECT aliases, so the output alias is kept distinct)
      """WITH t AS (
        |  SELECT doc_id, source,
        |         len(list_filter(string_split(lower(text), ' '), x -> length(x) > 0))::BIGINT AS n_tokens
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, source, n_tokens,
        |         percent_rank() OVER (PARTITION BY source ORDER BY n_tokens, doc_id) AS prr
        |  FROM t)
        |SELECT doc_id, source, n_tokens, floor(prr * 10000 + 0.5) / 10000 AS pr
        |FROM p WHERE prr >= 0.2
        |ORDER BY 1, 2, 3, 4""".stripMargin,

    "q48_boilerplate_ngrams" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> length(x) > 0) AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t)-2),
        |                 i -> array_to_string(t[i:i+3], ' ')))) AS g
        |  FROM toks WHERE len(t) >= 4)
        |SELECT g, count(*)::BIGINT AS n_docs
        |FROM grams
        |GROUP BY 1
        |HAVING count(*) >= 2
        |ORDER BY 1, 2""".stripMargin,

    "q42_repetition" ->
      """WITH g AS (
        |  SELECT doc_id,
        |         CASE WHEN len(t) >= 3
        |              THEN list_transform(range(1, len(t)-1), i -> array_to_string(t[i:i+2], ' '))
        |              ELSE [] END AS grams
        |  FROM (SELECT doc_id, list_filter(string_split(lower(text),' '), x -> length(x) > 0) AS t
        |        FROM documents))
        |SELECT doc_id,
        |       len(grams)::BIGINT AS n_grams,
        |       len(list_distinct(grams))::BIGINT AS n_distinct,
        |       floor((len(list_distinct(grams))::DOUBLE
        |              / greatest(len(grams)::DOUBLE, 1.0)) * 10000 + 0.5) / 10000 AS distinct_ratio
        |FROM g
        |ORDER BY 1""".stripMargin,

    "q40_interval_join" ->
      """SELECT c.event_id AS click_id,
        |       c.user_id,
        |       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |       p.event_id AS purchase_id,
        |       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |       floor(p.value * 100 + 0.5) / 100 AS value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON p.user_id = c.user_id
        | AND p.ts <= c.ts AND p.ts >= c.ts - INTERVAL 1 DAY
        |ORDER BY 1, 2, 3, 4, 5, 6""".stripMargin,

    "q19_dedup_embedding" ->
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |       floor((list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                    CAST(b.embedding AS DOUBLE[]))) * 10000 + 0.5) / 10000 AS cos
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) >= 0.3
        |ORDER BY 1, 2""".stripMargin,

    "q20_sim_topk" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                CAST(c.embedding AS DOUBLE[])) AS cos
        |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 5)
        |SELECT query_id, rank, neighbor_id, floor((cos) * 10000 + 0.5) / 10000 AS cos
        |FROM (SELECT query_id, neighbor_id, cos,
        |             row_number() OVER (PARTITION BY query_id
        |                                ORDER BY cos DESC, neighbor_id ASC) AS rank
        |      FROM scored)
        |WHERE rank <= 10
        |ORDER BY 1, 2""".stripMargin,

    "q22_text_quality" ->
      """SELECT doc_id,
        |       length(text) AS n_chars,
        |       len(list_filter(string_split(lower(text), ' '), x -> length(x) > 0)) AS n_tokens_ws,
        |       len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_tokens_bpe,
        |       length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
        |       length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
        |       floor((0.4 * (len(list_filter(string_split(lower(text), ' '),
        |                         x -> x IN ('the','a','of','and','in','to','is','it','that','for')))::DOUBLE
        |                    / greatest(len(list_filter(string_split(lower(text), ' '),
        |                         x -> length(x) > 0))::DOUBLE, 1.0))
        |           + 0.3 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
        |                    / greatest(length(text)::DOUBLE, 1.0))
        |           + 0.3 * (least(len(list_filter(string_split(lower(text), ' '),
        |                         x -> length(x) > 0))::DOUBLE, 100.0) / 100.0)) * 10000 + 0.5) / 10000 AS quality
        |FROM documents
        |ORDER BY 1""".stripMargin,

    "q23_text_langid" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split(lower(text), ' '), x -> length(x) > 0) AS t
        |  FROM documents),
        |scores AS (
        |  SELECT doc_id,
        |    len(list_filter(t, x -> x IN ('the','a','of','and','in','to','is','it','that','for')))::DOUBLE / greatest(len(t)::DOUBLE, 1.0) AS s_en,
        |    len(list_filter(t, x -> x IN ('der','die','das','und','ist','nicht','ein','zu','den','mit')))::DOUBLE / greatest(len(t)::DOUBLE, 1.0) AS s_de,
        |    len(list_filter(t, x -> x IN ('le','les','et','est','une','des','que','pour','dans','pas')))::DOUBLE / greatest(len(t)::DOUBLE, 1.0) AS s_fr,
        |    len(list_filter(t, x -> x IN ('el','los','y','es','un','una','por','con','no','se')))::DOUBLE / greatest(len(t)::DOUBLE, 1.0) AS s_es
        |  FROM toks)
        |SELECT doc_id,
        |       floor((s_en) * 10000 + 0.5) / 10000 AS score_en, floor((s_de) * 10000 + 0.5) / 10000 AS score_de,
        |       floor((s_fr) * 10000 + 0.5) / 10000 AS score_fr, floor((s_es) * 10000 + 0.5) / 10000 AS score_es,
        |       CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
        |            WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
        |            WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
        |            WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
        |            ELSE 'es' END AS lang_pred
        |FROM scores
        |ORDER BY 1""".stripMargin,

    "q25_text_fingerprint" ->
      """SELECT doc_id,
        |       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp_md5
        |FROM documents
        |ORDER BY 1""".stripMargin,

    "q26_asof_join" ->
      """SELECT c.event_id,
        |       c.user_id,
        |       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |       floor((p.value) * 100 + 0.5) / 100 AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON p.user_id = c.user_id AND p.ts <= c.ts
        |ORDER BY 1, 2, 3, 4, 5""".stripMargin,

    "q27_sliding_window" ->
      """SELECT strftime(date_trunc('minute', ts) - (k * INTERVAL 1 MINUTE),
        |                '%Y-%m-%d %H:%M:%S') AS window_start,
        |       event_type,
        |       floor((SUM(value)) * 100 + 0.5) / 100 AS total,
        |       COUNT(*) AS n
        |FROM events, (SELECT unnest(range(5)) AS k)
        |GROUP BY 1, 2
        |ORDER BY 1, 2, 3, 4""".stripMargin,

    "q28_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       COUNT(*) AS n_events,
        |       floor((SUM(value)) * 100 + 0.5) / 100 AS total
        |FROM sessions
        |GROUP BY user_id, sid
        |ORDER BY 1, 2, 3, 4""".stripMargin,

    "q32_pivot" ->
      """SELECT user_id,
        |       floor((SUM(value) FILTER (event_type = 'click')) * 100 + 0.5) / 100 AS click,
        |       floor((SUM(value) FILTER (event_type = 'error')) * 100 + 0.5) / 100 AS error,
        |       floor((SUM(value) FILTER (event_type = 'purchase')) * 100 + 0.5) / 100 AS purchase,
        |       floor((SUM(value) FILTER (event_type = 'signup')) * 100 + 0.5) / 100 AS signup,
        |       floor((SUM(value) FILTER (event_type = 'view')) * 100 + 0.5) / 100 AS view
        |FROM events
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q33_percentiles" ->
      """SELECT event_type,
        |       floor((quantile_cont(value, 0.5)) * 10000 + 0.5) / 10000 AS p50,
        |       floor((quantile_cont(value, 0.9)) * 10000 + 0.5) / 10000 AS p90
        |FROM events
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q34_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS linestatus,
        |       floor(SUM(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
        |       COUNT(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin,

    "q35_above_avg_orders" ->
      """SELECT o_orderkey, o_custkey,
        |       floor(o_totalprice * 100 + 0.5) / 100 AS o_totalprice
        |FROM orders o
        |WHERE o_totalprice > (SELECT AVG(i.o_totalprice)
        |                      FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY 1, 2, 3""".stripMargin,

    "q30_train_val_split" ->
      """SELECT doc_id,
        |       CASE WHEN substr(md5(text), 1, 1) IN ('0','1','2','3')
        |            THEN 'val' ELSE 'train' END AS split
        |FROM documents
        |ORDER BY 1, 2""".stripMargin,

    "q31_corpus_filter" ->
      """WITH survivors AS (
        |  SELECT min(doc_id) AS doc_id
        |  FROM documents
        |  GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))),
        |quality AS (
        |  SELECT doc_id,
        |         len(list_filter(string_split(lower(text), ' '), x -> length(x) > 0)) AS n_tokens_ws,
        |         0.4 * (len(list_filter(string_split(lower(text), ' '),
        |                  x -> x IN ('the','a','of','and','in','to','is','it','that','for')))::DOUBLE
        |               / greatest(len(list_filter(string_split(lower(text), ' '),
        |                  x -> length(x) > 0))::DOUBLE, 1.0))
        |         + 0.3 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
        |                  / greatest(length(text)::DOUBLE, 1.0))
        |         + 0.3 * (least(len(list_filter(string_split(lower(text), ' '),
        |                  x -> length(x) > 0))::DOUBLE, 100.0) / 100.0) AS q
        |  FROM documents)
        |SELECT s.doc_id, q.n_tokens_ws, floor((q.q) * 10000 + 0.5) / 10000 AS quality
        |FROM survivors s JOIN quality q ON s.doc_id = q.doc_id
        |WHERE q.q >= 0.3
        |ORDER BY 1, 2, 3""".stripMargin,

    // q95: bit-exact KMV sketches (fnv1a64Seeded mirror, signed rank).
    "q95_kmv_overlap" -> OracleHashSql.q95KmvOverlap(),

    // q96: token→bucket→weight hash chain mirrored over distinct
    // tokens; BIGINT sum is order-independent so grouping is free.
    "q96_quality_classifier" -> OracleHashSql.q96QualityClassifier(),

    // q97: seeded hash of the anchor id's decimal string, signed pmod.
    "q97_contrastive_pairs" -> OracleHashSql.q97ContrastivePairs(),

    // q98: BM25 with every constant combination spelled as the same
    // IEEE op the engine folds (1.2 + 1.0, not 2.2); score is a sum of
    // <= 3 doubles, inside the checker's 1e-9 float tolerance.
    "q98_bm25_retrieval" -> {
      val values = bm25Queries
        .flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }
        .mkString(", ")
      s"""WITH q(query_id, term) AS (VALUES $values),
        |dd AS (
        |  SELECT doc_id,
        |         list_filter(string_split(lower(text), ' '),
        |                     x -> length(x) > 0) AS toks
        |  FROM documents),
        |d AS (SELECT doc_id, toks, len(toks)::BIGINT AS dl FROM dd),
        |stats AS (SELECT count(*)::BIGINT AS n_docs,
        |                 SUM(dl)::BIGINT AS sum_dl FROM d),
        |dfs AS (
        |  SELECT term, count(*)::BIGINT AS df
        |  FROM d CROSS JOIN (SELECT DISTINCT term FROM q) t
        |  WHERE list_contains(toks, term) GROUP BY 1),
        |cand AS (
        |  SELECT query_id, q.term, doc_id, dl,
        |         len(list_filter(toks, x -> x = q.term))::BIGINT AS tf
        |  FROM d CROSS JOIN q)
        |SELECT query_id::BIGINT AS query_id, doc_id::BIGINT AS doc_id,
        |       count(*)::BIGINT AS n_terms,
        |       SUM(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        |           * (tf * (1.2 + 1.0))
        |           / (tf + 1.2 * (1.0 - 0.75
        |                          + 0.75 * dl / (sum_dl::DOUBLE / n_docs))))
        |         AS score
        |FROM cand JOIN dfs USING (term), stats
        |WHERE tf > 0
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    // q147: q98's BM25 CTEs + a q20-style cosine ranking, fused by
    // RRF. Ranks are integers (BM25 ranking keys on the r4-floored
    // score), so 1/(60+rank) sums are bit-identical across engines.
    "q147_hybrid_rrf" -> {
      val values = bm25Queries
        .flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }
        .mkString(", ")
      val qids = bm25Queries.map(_._1).mkString(", ")
      s"""WITH q(query_id, term) AS (VALUES $values),
        |dd AS (
        |  SELECT doc_id,
        |         list_filter(string_split(lower(text), ' '),
        |                     x -> length(x) > 0) AS toks
        |  FROM documents),
        |d AS (SELECT doc_id, toks, len(toks)::BIGINT AS dl FROM dd),
        |stats AS (SELECT count(*)::BIGINT AS n_docs,
        |                 SUM(dl)::BIGINT AS sum_dl FROM d),
        |dfs AS (
        |  SELECT term, count(*)::BIGINT AS df
        |  FROM d CROSS JOIN (SELECT DISTINCT term FROM q) t
        |  WHERE list_contains(toks, term) GROUP BY 1),
        |cand AS (
        |  SELECT query_id, q.term, doc_id, dl,
        |         len(list_filter(toks, x -> x = q.term))::BIGINT AS tf
        |  FROM d CROSS JOIN q),
        |bm AS (
        |  SELECT query_id::BIGINT AS query_id, doc_id::BIGINT AS doc_id,
        |         SUM(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        |             * (tf * (1.2 + 1.0))
        |             / (tf + 1.2 * (1.0 - 0.75
        |                            + 0.75 * dl / (sum_dl::DOUBLE / n_docs))))
        |           AS score
        |  FROM cand JOIN dfs USING (term), stats
        |  WHERE tf > 0 GROUP BY 1, 2),
        |bmr AS (
        |  SELECT query_id, doc_id, r_bm FROM (
        |    SELECT query_id, doc_id, row_number() OVER (
        |      PARTITION BY query_id
        |      ORDER BY floor(score * 10000 + 0.5) / 10000 DESC,
        |               doc_id ASC)::BIGINT AS r_bm
        |    FROM bm)
        |  WHERE r_bm <= 20),
        |em AS (
        |  SELECT qe.vec_id AS query_id, e.vec_id AS doc_id,
        |         list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
        |                                CAST(e.embedding AS DOUBLE[])) AS cos
        |  FROM embeddings qe JOIN embeddings e ON e.vec_id <> qe.vec_id
        |  WHERE qe.vec_id IN ($qids)),
        |emr AS (
        |  SELECT query_id, doc_id, r_em FROM (
        |    SELECT query_id, doc_id, row_number() OVER (
        |      PARTITION BY query_id
        |      ORDER BY cos DESC, doc_id ASC)::BIGINT AS r_em
        |    FROM em)
        |  WHERE r_em <= 20),
        |fused AS (
        |  SELECT coalesce(b.query_id, e2.query_id) AS query_id,
        |         coalesce(b.doc_id, e2.doc_id) AS doc_id,
        |         b.r_bm, e2.r_em,
        |         coalesce(1.0 / (60.0 + b.r_bm), 0.0) +
        |         coalesce(1.0 / (60.0 + e2.r_em), 0.0) AS rrf
        |  FROM bmr b FULL JOIN emr e2
        |    ON b.query_id = e2.query_id AND b.doc_id = e2.doc_id)
        |SELECT query_id, rank, doc_id, r_bm, r_em, rrf FROM (
        |  SELECT query_id, doc_id, r_bm, r_em, rrf,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY rrf DESC, doc_id ASC)::BIGINT AS rank
        |  FROM fused)
        |WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin
    },

    // q99: integer/string chunking — truncating and floor division
    // agree because dl > 0 is enforced on both sides.
    "q99_passage_chunks" ->
      """WITH dd AS (
        |  SELECT doc_id,
        |         list_filter(string_split(lower(text), ' '),
        |                     x -> length(x) > 0) AS toks
        |  FROM documents),
        |d AS (SELECT doc_id, toks, len(toks)::BIGINT AS dl FROM dd
        |      WHERE len(toks) > 0),
        |c AS (
        |  SELECT doc_id, toks, dl, unnest(range((dl - 1) // 24 + 1)) AS chunk_id
        |  FROM d),
        |x AS (
        |  SELECT doc_id, chunk_id::BIGINT AS chunk_id,
        |         (chunk_id * 24)::BIGINT AS start_tok,
        |         least(32, dl - chunk_id * 24)::BIGINT AS n_tok,
        |         array_to_string(
        |           list_slice(toks, chunk_id * 24 + 1,
        |                      chunk_id * 24 + least(32, dl - chunk_id * 24)),
        |           ' ') AS chunk_text
        |  FROM c)
        |SELECT doc_id, chunk_id, start_tok, n_tok, chunk_text,
        |       md5(chunk_text) AS chunk_fp
        |FROM x ORDER BY 1, 2""".stripMargin,

    // q100: DuckDB's range(2, n+1) is already empty for n < 2, so only
    // the Spark side needs the descending-sequence guard. Mirrors the
    // Spark plan's pre-aggregated form: (doc, bg) → m first, each
    // ln-term weighted by m (the fingerprint join keys are a pure
    // shuffle-width optimization — string keys give the same answer,
    // which is exactly what this oracle checks). <= 98 ln-terms per
    // doc — well inside the 1e-9 float tolerance.
    "q100_bigram_lm" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         list_filter(string_split(lower(text), ' '),
        |                     x -> length(x) > 0) AS t
        |  FROM documents),
        |pairs AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(2, len(t) + 1),
        |                               i -> t[i - 1] || ' ' || t[i])) AS bg
        |  FROM d),
        |occ AS (
        |  SELECT doc_id, bg, count(*)::BIGINT AS m
        |  FROM pairs GROUP BY 1, 2),
        |uni AS (
        |  SELECT w, count(*)::BIGINT AS ca
        |  FROM (SELECT unnest(t) AS w FROM d) GROUP BY 1),
        |vv AS (SELECT count(*)::BIGINT AS v FROM uni),
        |big AS (SELECT bg, SUM(m)::BIGINT AS cab FROM occ GROUP BY 1),
        |sc AS (
        |  SELECT doc_id, SUM(m)::BIGINT AS n_bigrams,
        |         SUM(-ln((cab + 0.5) / (ca + 0.5 * v)) * m) AS nll
        |  FROM occ
        |  JOIN big USING (bg)
        |  JOIN uni ON uni.w = split_part(bg, ' ', 1)
        |  CROSS JOIN vv
        |  GROUP BY 1)
        |SELECT doc_id, n_bigrams, nll, nll / n_bigrams AS nll_tok
        |FROM sc ORDER BY doc_id""".stripMargin,

    // q101: epoch_us mirrors unix_micros (both truncate the nanos
    // column to integer microseconds) — the whole filter is
    // integer-exact.
    "q101_event_debounce" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS tus, value
        |  FROM events),
        |l AS (
        |  SELECT *, lag(tus) OVER (PARTITION BY user_id, event_type
        |                           ORDER BY tus, event_id) AS prev
        |  FROM e)
        |SELECT event_id, user_id, event_type, tus, value
        |FROM l WHERE prev IS NULL OR tus - prev >= 5000000
        |ORDER BY event_id""".stripMargin,

    // q102: the histogram-sketch median fold (q63 inverse-CDF rule)
    // mirrored term-for-term — floor(v/w) binning, cumulative counts,
    // upper bin edge (bin+1)*w at rank ceil(0.5*n). Same IEEE double
    // arithmetic both engines, width = 1.0.
    "q102_mad_anomaly" ->
      """WITH ev AS (
        |  SELECT event_type, value FROM events WHERE value IS NOT NULL),
        |mbin AS (
        |  SELECT event_type, CAST(floor(value / 1.0) AS BIGINT) AS bin,
        |         count(*) AS cnt
        |  FROM ev GROUP BY 1, 2),
        |mcum AS (
        |  SELECT event_type, bin, cnt,
        |         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM mbin),
        |med AS (
        |  SELECT event_type,
        |         min(CASE WHEN cum >= ceil(0.5 * n)
        |                  THEN (bin + 1) * 1.0 END) AS med
        |  FROM mcum GROUP BY 1),
        |dev AS (
        |  SELECT ev.event_type, med, abs(value - med) AS adev
        |  FROM ev JOIN med USING (event_type)),
        |abin AS (
        |  SELECT event_type, CAST(floor(adev / 1.0) AS BIGINT) AS bin,
        |         count(*) AS cnt
        |  FROM dev GROUP BY 1, 2),
        |acum AS (
        |  SELECT event_type, bin, cnt,
        |         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM abin),
        |mad AS (
        |  SELECT event_type,
        |         min(CASE WHEN cum >= ceil(0.5 * n)
        |                  THEN (bin + 1) * 1.0 END) AS mad
        |  FROM acum GROUP BY 1)
        |SELECT d.event_type, count(*)::BIGINT AS n, max(d.med) AS med,
        |       max(m.mad) AS mad,
        |       SUM(CASE WHEN d.adev > 3.0 * m.mad THEN 1 ELSE 0 END)::BIGINT
        |         AS n_outliers
        |FROM dev d JOIN mad m USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q103_shingle_novelty" -> OracleHashSql.q103ShingleNovelty(),

    // q104: per-column branches UNION ALL'd; sums in DECIMAL(18,2)
    // (the doubles are cent-valued, so the cast rounds to the intended
    // cent identically on both engines) then one cast to double.
    "q104_table_profile" -> {
      def branch(c: String) =
        s"""SELECT '$c' AS col_name, count(*)::BIGINT AS n_rows,
           |       SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
           |       count(DISTINCT $c)::BIGINT AS n_distinct,
           |       CAST(min($c) AS DOUBLE) AS min_v,
           |       CAST(max($c) AS DOUBLE) AS max_v,
           |       CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
           |FROM lineitem""".stripMargin
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .map(branch).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },

    // q105: the oracle recomputes from scratch — exact decimal sums
    // make the engine's base+delta merge bit-equal to this.
    "q105_incremental_agg" ->
      """SELECT event_type, count(*)::BIGINT AS cnt,
        |       SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
        |       CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sum_v,
        |       min(value) AS min_v, max(value) AS max_v
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q106: every division is spelled ::DOUBLE (a bare DuckDB 1.0 is
    // DECIMAL and decimal÷bigint is not the IEEE op Spark runs); rank
    // is integer-keyed so the window order is bit-exact both engines.
    "q106_retrieval_eval" -> {
      val values = bm25Queries
        .flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }
        .mkString(", ")
      s"""WITH q(query_id, term) AS (VALUES $values),
        |d AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '),
        |                             x -> length(x) > 0) AS toks
        |  FROM documents),
        |cand AS (
        |  SELECT query_id, doc_id, count(*)::BIGINT AS n_terms,
        |         SUM(tf)::BIGINT AS tf_sum
        |  FROM (SELECT query_id, doc_id,
        |               len(list_filter(toks, x -> x = q.term))::BIGINT AS tf
        |        FROM d CROSS JOIN q)
        |  WHERE tf > 0 GROUP BY 1, 2),
        |r AS (
        |  SELECT *,
        |    CASE WHEN ('0x' || substr(md5(query_id::VARCHAR || ':' ||
        |                doc_id::VARCHAR), 1, 13))::BIGINT % 5 = 0
        |         THEN 1 ELSE 0 END AS rel,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY n_terms DESC, tf_sum DESC, doc_id ASC) AS rank
        |  FROM cand),
        |a AS (
        |  SELECT query_id, count(*)::BIGINT AS n_cand,
        |         SUM(rel)::BIGINT AS n_rel,
        |         SUM(CASE WHEN rank <= 10 THEN rel ELSE 0 END)::BIGINT
        |           AS rel_at_k,
        |         MAX(CASE WHEN rank <= 10 AND rel = 1
        |             THEN 1.0::DOUBLE / rank ELSE 0.0::DOUBLE END) AS mrr,
        |         SUM(CASE WHEN rank <= 10 AND rel = 1
        |             THEN 1.0::DOUBLE / ln(rank + 1.0::DOUBLE)
        |             ELSE 0.0::DOUBLE END) AS dcg
        |  FROM r GROUP BY 1),
        |i AS (
        |  SELECT *, CASE WHEN n_rel = 0 THEN 0.0::DOUBLE ELSE
        |      coalesce(list_sum(list_transform(
        |        range(1, least(n_rel, 10) + 1),
        |        i -> 1.0::DOUBLE / ln(i::DOUBLE + 1.0::DOUBLE))),
        |        0.0::DOUBLE) END AS idcg
        |  FROM a)
        |SELECT query_id, n_cand, n_rel, rel_at_k, mrr,
        |       CASE WHEN idcg > 0.0 THEN dcg / idcg
        |            ELSE 0.0::DOUBLE END AS ndcg,
        |       rel_at_k::DOUBLE / 10.0::DOUBLE AS p_at_k,
        |       CASE WHEN n_rel > 0 THEN rel_at_k::DOUBLE / n_rel
        |            ELSE 0.0::DOUBLE END AS recall_at_k
        |FROM i ORDER BY 1""".stripMargin
    },

    // q107: vocab boundary is deterministic both engines — (count
    // desc, token asc) tie-break; oov_rate is one int÷int IEEE op.
    "q107_vocab_coverage" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |         unnest(list_filter(string_split(lower(text), ' '),
        |                            x -> length(x) > 0)) AS token
        |  FROM documents),
        |vocab AS (
        |  SELECT token FROM toks GROUP BY token
        |  ORDER BY count(*) DESC, token ASC LIMIT 500)
        |SELECT source, count(DISTINCT doc_id)::BIGINT AS n_docs,
        |       count(*)::BIGINT AS n_tokens,
        |       SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)::BIGINT
        |         AS n_oov,
        |       SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)::DOUBLE
        |         / count(*) AS oov_rate
        |FROM toks t LEFT JOIN vocab v ON t.token = v.token
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q108: the char-histogram fold runs over the SORTED distinct list
    // on both engines — one deterministic summation order.
    "q108_char_entropy" ->
      """WITH c AS (
        |  SELECT doc_id, regexp_extract_all(text, '[\s\S]') AS ch
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, len(ch)::BIGINT AS n,
        |         list_transform(list_sort(list_distinct(ch)),
        |           x -> len(list_filter(ch, y -> y = x))::DOUBLE) AS cnts
        |  FROM c WHERE len(ch) > 0)
        |SELECT doc_id, n AS n_chars, len(cnts)::BIGINT AS n_unique,
        |       ln(n::DOUBLE) -
        |         list_sum(list_transform(cnts, c -> c * ln(c))) / n
        |         AS entropy,
        |       CASE WHEN len(cnts) > 1 THEN
        |         (ln(n::DOUBLE) -
        |          list_sum(list_transform(cnts, c -> c * ln(c))) / n)
        |           / ln(len(cnts)::DOUBLE)
        |       ELSE 0.0::DOUBLE END AS evenness
        |FROM d ORDER BY 1""".stripMargin,

    // q109: DuckDB's native ASOF JOIN oracles the custom physical
    // operator; grid starts at trunc(min)+1h so inner semantics drop
    // nothing, readings pre-collapsed per (user, ts) on both sides.
    "q109_gap_fill" ->
      """WITH d AS (
        |  SELECT user_id, ts, arg_max(value, event_id) AS value
        |  FROM events GROUP BY 1, 2),
        |span AS (
        |  SELECT user_id,
        |         date_trunc('hour', min(ts)) + INTERVAL 1 HOUR AS h0,
        |         date_trunc('hour', max(ts)) AS h1
        |  FROM d GROUP BY 1),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS g
        |  FROM span WHERE h1 >= h0)
        |SELECT g.user_id, strftime(g.g, '%Y-%m-%d %H:%M:%S') AS hour_ts,
        |       floor((d.value) * 100 + 0.5) / 100 AS value_ffill,
        |       (epoch_us(g.g) - epoch_us(d.ts))::BIGINT AS age_us
        |FROM grid g ASOF JOIN d ON d.user_id = g.user_id AND d.ts <= g.g
        |ORDER BY 1, 2, 3, 4""".stripMargin,

    // q110: DuckDB lambda indices are 1-based — the engine hashes the
    // 1-based ordinal too (i + 1 on the Spark side).
    "q110_word_dropout" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(string_split(lower(text), ' '),
        |                     x -> length(x) > 0) AS toks
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, len(toks)::BIGINT AS n_orig,
        |         list_filter(toks, (x, i) ->
        |           ('0x' || substr(md5(doc_id::VARCHAR || ':' ||
        |             i::VARCHAR || ':' || x), 1, 13))::BIGINT % 10 >= 1)
        |           AS kept
        |  FROM t WHERE len(toks) > 0)
        |SELECT doc_id, n_orig, len(kept)::BIGINT AS n_kept,
        |       array_to_string(kept, ' ') AS aug_text,
        |       (n_orig - len(kept))::DOUBLE / n_orig AS drop_rate
        |FROM d ORDER BY 1""".stripMargin,

    // q111: the oracle runs the textbook percent_rank windows; the
    // engine computes the identical (less/(n-1)) via histogram joins.
    "q111_length_calibration" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         len(list_filter(string_split(lower(text), ' '),
        |                         x -> length(x) > 0))::BIGINT AS n_tokens
        |  FROM documents)
        |SELECT doc_id, source, n_tokens,
        |       percent_rank() OVER (PARTITION BY source ORDER BY n_tokens)
        |         AS pct_source,
        |       percent_rank() OVER (ORDER BY n_tokens) AS pct_global
        |FROM d ORDER BY 1""".stripMargin,

    // q112: DISTINCT after the unnest (Spark: array_distinct before
    // the explode — same per-doc term set); string_agg with ORDER BY
    // mirrors the sorted comma-joined postings.
    "q112_posting_lists" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, term FROM (
        |    SELECT doc_id,
        |           unnest(list_filter(string_split(lower(text), ' '),
        |                              x -> length(x) > 0)) AS term
        |    FROM documents)),
        |dfv AS (SELECT term, count(*)::BIGINT AS df FROM toks GROUP BY 1),
        |top AS (
        |  SELECT term, doc_id,
        |         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
        |  FROM toks),
        |cap AS (
        |  SELECT term,
        |         string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings,
        |         count(*)::BIGINT AS n_postings
        |  FROM top WHERE rn <= 16 GROUP BY 1)
        |SELECT term, df, postings, n_postings
        |FROM dfv JOIN cap USING (term) ORDER BY term""".stripMargin,

    // q113: pow/division on the |sources|-row table — identical IEEE
    // double arithmetic both engines; the 20-term z sum is far inside
    // the 1e-9 tolerance whatever the fold order.
    "q113_temperature_mixture" ->
      """WITH per AS (
        |  SELECT source, count(*)::BIGINT AS n_docs,
        |         SUM(len(list_filter(string_split(lower(text), ' '),
        |                             x -> length(x) > 0)))::BIGINT AS n_tokens
        |  FROM documents GROUP BY 1),
        |t AS (SELECT SUM(n_tokens)::BIGINT AS tot FROM per),
        |p AS (
        |  SELECT source, n_docs, n_tokens,
        |         n_tokens::DOUBLE / tot AS p_raw,
        |         pow(n_tokens::DOUBLE / tot, 0.3) AS pa
        |  FROM per CROSS JOIN t),
        |z AS (SELECT SUM(pa) AS z FROM p)
        |SELECT source, n_docs, n_tokens, p_raw, pa / z AS p_temp,
        |       (pa / z) / p_raw AS upsample
        |FROM p CROSS JOIN z ORDER BY source""".stripMargin,

    // q114: the analytic side of the codec round-trip — width is the
    // layout constant, height the ceil division over the UTF-8 BYTE
    // length, pixel_sum the UTF-8 byte sum (computed from the encoded
    // blob's hex dump, so the oracle holds for non-ASCII text too; PNG
    // zero padding adds nothing). The Spark side reads these from
    // DECODED pixels; matching hashes prove the codec is real and
    // lossless.
    "q114_image_roundtrip" ->
      """WITH b AS (
        |  SELECT doc_id, octet_length(encode(text))::BIGINT AS nb,
        |         lower(hex(encode(text))) AS hx
        |  FROM documents)
        |SELECT doc_id, 32::BIGINT AS width,
        |       greatest(1, CAST(ceil(nb / 32.0) AS BIGINT)) AS height,
        |       coalesce(list_sum(list_transform(range(nb),
        |         i -> ('0x' || substr(hx, (2 * i + 1)::INT, 2))::BIGINT)),
        |         0)::BIGINT AS pixel_sum,
        |       1::BIGINT AS is_decoded
        |FROM b ORDER BY doc_id""".stripMargin,

    // q115: WAV frames are the text's UTF-8 BYTES themselves (8-bit
    // unsigned PCM mono, frame size 1); empty text is one zero frame.
    // Byte-based like q114, so non-ASCII fixtures stay correct.
    "q115_audio_roundtrip" ->
      """WITH b AS (
        |  SELECT doc_id, octet_length(encode(text))::BIGINT AS nb,
        |         lower(hex(encode(text))) AS hx
        |  FROM documents)
        |SELECT doc_id,
        |       greatest(1, nb)::BIGINT AS n_frames,
        |       8000::BIGINT AS sample_rate,
        |       1::BIGINT AS channels,
        |       coalesce(list_sum(list_transform(range(nb),
        |         i -> ('0x' || substr(hx, (2 * i + 1)::INT, 2))::BIGINT)),
        |         0)::BIGINT AS sample_sum,
        |       1::BIGINT AS is_decoded
        |FROM b ORDER BY doc_id""".stripMargin,

    // q117: hashes derived analytically from the text bytes; the
    // engine reads them from DECODED PNG pixels (q114 pattern) — see
    // OracleHashSql.q117ImageNearDup for the exactness notes.
    "q117_image_neardup" -> OracleHashSql.q117ImageNearDup(),

    // q118: same shingling as the engine (wsTokens split + 8-token
    // space-joined shingles), duplicate test = global COUNT window over
    // the shingle string, islands via pos - row_number — all integer.
    "q118_repeated_substrings" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split(lower(text), ' '),
        |                     x -> length(x) > 0) AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(range(len(t) - 7)) AS pos,
        |         unnest(list_transform(range(len(t) - 7),
        |                i -> array_to_string(t[(i+1)::INT:(i+8)::INT], ' '))) AS s
        |  FROM toks WHERE len(t) >= 8),
        |dup AS (
        |  SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos, count(*) OVER (PARTITION BY s) AS occ FROM sh)
        |  WHERE occ >= 2),
        |isl AS (
        |  SELECT doc_id, pos,
        |         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
        |           AS island
        |  FROM dup),
        |runs AS (
        |  SELECT doc_id, min(pos)::BIGINT AS span_start,
        |         (max(pos) + 7)::BIGINT AS span_end
        |  FROM isl GROUP BY doc_id, island)
        |SELECT doc_id, span_start, span_end,
        |       span_end - span_start + 1 AS span_tokens
        |FROM runs WHERE span_end - span_start + 1 >= 16
        |ORDER BY doc_id, span_start""".stripMargin,

    // q119: q118's runs grouped to per-doc span lists, then a 1-based
    // list_filter((x, i)) mirrors Spark's 0-based filter((x, i)).
    "q119_substring_removal" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split(lower(text), ' '),
        |                     x -> length(x) > 0) AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(range(len(t) - 7)) AS pos,
        |         unnest(list_transform(range(len(t) - 7),
        |                i -> array_to_string(t[(i+1)::INT:(i+8)::INT], ' '))) AS s
        |  FROM toks WHERE len(t) >= 8),
        |dup AS (
        |  SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos, count(*) OVER (PARTITION BY s) AS occ FROM sh)
        |  WHERE occ >= 2),
        |isl AS (
        |  SELECT doc_id, pos,
        |         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
        |           AS island
        |  FROM dup),
        |runs AS (
        |  SELECT doc_id, min(pos)::BIGINT AS ss, (max(pos) + 7)::BIGINT AS se
        |  FROM isl GROUP BY doc_id, island),
        |spans AS (
        |  SELECT doc_id, list(struct_pack(s := ss, e := se)) AS sps
        |  FROM runs WHERE se - ss + 1 >= 16 GROUP BY doc_id),
        |rebuilt AS (
        |  SELECT d.doc_id, len(d.t)::BIGINT AS n_tokens,
        |         CASE WHEN sp.sps IS NULL THEN d.t
        |              ELSE list_filter(d.t, (x, i) ->
        |                len(list_filter(sp.sps,
        |                    r -> r.s <= i - 1 AND i - 1 <= r.e)) = 0)
        |         END AS kept
        |  FROM toks d LEFT JOIN spans sp ON d.doc_id = sp.doc_id)
        |SELECT doc_id, n_tokens, (n_tokens - len(kept))::BIGINT AS n_removed,
        |       coalesce(array_to_string(kept, ' '), '') AS rebuilt
        |FROM rebuilt ORDER BY doc_id""".stripMargin,

    // q120: video kind = doc_id % 3 == 2 (the syntheticMedia
    // round-robin); frame j covers bytes [64j, min(64(j+1), nb)),
    // kept when j % 2 = 0; byte sums from the hex dump (q114 pattern).
    "q120_video_frames" ->
      """WITH b AS (
        |  SELECT doc_id, octet_length(encode(text))::BIGINT AS nb,
        |         lower(hex(encode(text))) AS hx
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT doc_id, nb, hx,
        |         unnest(list_filter(range((nb + 63) // 64), j -> j % 2 = 0)) AS j
        |  FROM b WHERE nb > 0)
        |SELECT doc_id, j::BIGINT AS frame_no,
        |       least(64, nb - 64 * j)::BIGINT AS n_bytes,
        |       list_sum(list_transform(range(least(64, nb - 64 * j)),
        |         k -> ('0x' || substr(hx, (2 * (64 * j + k) + 1)::INT, 2))::BIGINT)
        |         )::BIGINT AS byte_sum
        |FROM f ORDER BY doc_id, frame_no""".stripMargin,

    // q116: UNION ALL of the four measure branches = Spark's Expand;
    // decimal(18,2) cast both engines makes each cent value exact
    // before the one double cast.
    "q116_unpivot_measures" -> {
      def branch(c: String) =
        s"""SELECT l_orderkey, l_linenumber, '$c' AS measure,
           |       CAST(CAST($c AS DECIMAL(18,2)) AS DOUBLE) AS value
           |FROM lineitem""".stripMargin
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .map(branch)
        .mkString("", "\nUNION ALL\n",
          "\nORDER BY l_orderkey, l_linenumber, measure")
    },

    // q121: same multi-blocking (nation / digit-suffix), per-block cap,
    // pair dedup, trigram-jaccard + balance-proximity score, one-best
    // row_number assignment. All score arithmetic is the identical IEEE
    // expression tree on both engines; trigram sets are distinct lists
    // so intersection/union sizes match Spark's array_intersect exactly.
    "q121_entity_match" ->
      """WITH l AS (
        |  SELECT c_custkey, c_nationkey::BIGINT AS l_nation,
        |         regexp_extract(c_name, '([0-9]+)', 1) AS l_digits,
        |         c_acctbal AS l_bal
        |  FROM customer),
        |r AS (
        |  SELECT s_suppkey, s_nationkey::BIGINT AS r_nation,
        |         regexp_extract(s_name, '([0-9]+)', 1) AS r_digits,
        |         s_acctbal AS r_bal
        |  FROM supplier),
        |lb AS (
        |  SELECT c_custkey, 'n' || l_nation::VARCHAR AS bkey FROM l
        |  UNION ALL
        |  SELECT c_custkey, 's' || right(l_digits, 2) FROM l),
        |rb AS (
        |  SELECT s_suppkey, 'n' || r_nation::VARCHAR AS bkey FROM r
        |  UNION ALL
        |  SELECT s_suppkey, 's' || right(r_digits, 2) FROM r),
        |lc AS (SELECT c_custkey, bkey FROM (
        |         SELECT *, count(*) OVER (PARTITION BY bkey) AS bn FROM lb)
        |       WHERE bn <= 10000),
        |rc AS (SELECT s_suppkey, bkey FROM (
        |         SELECT *, count(*) OVER (PARTITION BY bkey) AS bn FROM rb)
        |       WHERE bn <= 10000),
        |cands AS (
        |  SELECT DISTINCT c_custkey, s_suppkey
        |  FROM lc JOIN rc USING (bkey)),
        |scored AS (
        |  SELECT c.c_custkey, c.s_suppkey, sc.jac, sc.balscore,
        |         0.7 * sc.jac + 0.3 * sc.balscore AS score
        |  FROM cands c
        |  JOIN l ON c.c_custkey = l.c_custkey
        |  JOIN r ON c.s_suppkey = r.s_suppkey,
        |  LATERAL (
        |    SELECT CASE WHEN uni > 0 THEN inter / uni ELSE 0.0 END AS jac,
        |           1.0 / (1.0 + abs(l_bal - r_bal)) AS balscore
        |    FROM (
        |      SELECT len(list_filter(ltg, x -> list_contains(rtg, x)))::DOUBLE
        |               AS inter,
        |             (len(ltg) + len(rtg))::DOUBLE
        |               - len(list_filter(ltg, x -> list_contains(rtg, x)))::DOUBLE
        |               AS uni
        |      FROM (SELECT
        |              list_distinct(list_transform(
        |                range(1, greatest(length(l_digits) - 2, 1) + 1),
        |                i -> substring(l_digits, i::INT, 3))) AS ltg,
        |              list_distinct(list_transform(
        |                range(1, greatest(length(r_digits) - 2, 1) + 1),
        |                i -> substring(r_digits, i::INT, 3))) AS rtg))) sc)
        |SELECT c_custkey, s_suppkey,
        |       floor(score * 1000000 + 0.5) / 1000000 AS score, n_cands
        |FROM (
        |  SELECT c_custkey, s_suppkey, score,
        |         count(*) OVER (PARTITION BY c_custkey) AS n_cands,
        |         row_number() OVER (PARTITION BY c_custkey
        |                            ORDER BY score DESC, s_suppkey ASC) AS rk
        |  FROM scored)
        |WHERE rk = 1
        |ORDER BY c_custkey""".stripMargin,

    // q122: change points via lag over (custkey, orderdate, orderkey),
    // intervals via lead over the FILTERED change-point set.
    "q122_scd2_history" ->
      """WITH obs AS (
        |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
        |         lag(o_orderstatus) OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |chg AS (
        |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
        |  FROM obs WHERE prev IS NULL OR prev <> o_orderstatus)
        |SELECT o_custkey, o_orderstatus AS status,
        |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |       strftime(lead(o_orderdate) OVER w, '%Y-%m-%d %H:%M:%S')
        |         AS valid_to,
        |       row_number() OVER w AS version,
        |       (lead(o_orderdate) OVER w IS NULL) AS is_current
        |FROM chg
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, version""".stripMargin,

    // q123: q47's quantization CTE + the exact ±1 sign lists baked as
    // literals (Similarity.projSigns is the single source of truth,
    // like q21's plane constants) — all-integer, hash-exact.
    "q123_random_projection" -> {
      val signs = Similarity.projSigns(16, 64)
      val comps = signs.zipWithIndex.map { case (sj, j) =>
        val lits = sj.map(_.toString).mkString("[", ",", "]::BIGINT[]")
        f"list_sum(list_transform(range(64), i -> q[(i+1)::INT] * ($lits)[(i+1)::INT]))::BIGINT AS p$j%02d"
      }.mkString(",\n       ")
      s"""WITH s AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |sc AS (
         |  SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS scale
         |  FROM s),
         |qt AS (
         |  SELECT vec_id,
         |         CASE WHEN scale > 0
         |              THEN list_transform(e, x -> floor(x / scale * 127 + 0.5)::BIGINT)
         |              ELSE list_transform(e, x -> 0::BIGINT) END AS q
         |  FROM sc)
         |SELECT vec_id,
         |       $comps
         |FROM qt ORDER BY vec_id""".stripMargin
    },

    // q126: in the exact regime (capacity >= per-group distinct) the
    // SpaceSaving sketch equals the full groupBy count — top-5 per
    // source by (cnt desc, token asc), err identically 0.
    "q126_spacesaving_topk" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split(lower(text), ' ')) AS tok
        |  FROM documents),
        |cnts AS (
        |  SELECT source, tok, count(*)::BIGINT AS cnt
        |  FROM toks WHERE length(tok) > 0
        |  GROUP BY source, tok)
        |SELECT source, rank, tok AS token, cnt, 0::BIGINT AS err
        |FROM (SELECT source, tok, cnt,
        |             row_number() OVER (PARTITION BY source
        |                                ORDER BY cnt DESC, tok ASC)::BIGINT
        |               AS rank
        |      FROM cnts)
        |WHERE rank <= 5
        |ORDER BY source, rank""".stripMargin,

    // q124: q20's oracle with the label-disequality join condition.
    "q124_hard_negatives" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS anchor_id, c.vec_id AS neighbor_id,
        |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                CAST(c.embedding AS DOUBLE[])) AS cos
        |  FROM embeddings q JOIN embeddings c
        |    ON q.vec_id <> c.vec_id AND q.label <> c.label
        |  WHERE q.vec_id < 5)
        |SELECT anchor_id, rank, neighbor_id,
        |       floor((cos) * 10000 + 0.5) / 10000 AS cos
        |FROM (SELECT anchor_id, neighbor_id, cos,
        |             row_number() OVER (PARTITION BY anchor_id
        |                                ORDER BY cos DESC, neighbor_id ASC)
        |               AS rank
        |      FROM scored)
        |WHERE rank <= 10
        |ORDER BY 1, 2""".stripMargin,

    // q127: deliberately does NOT mirror the engine's prefix filter —
    // plain all-pairs-sharing-a-shingle jaccard, so the hash match
    // certifies that prefix filtering is result-preserving. Shingling
    // mirrors q118 (wsTokens + 3-token space-joined), distinct sets.
    "q127_prefix_filter_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '),
        |                             x -> length(x) > 0) AS t
        |  FROM documents),
        |docs AS (
        |  SELECT doc_id, list_distinct(list_transform(range(len(t) - 2),
        |           i -> array_to_string(t[(i+1)::INT:(i+3)::INT], ' '))) AS sh
        |  FROM toks WHERE len(t) >= 3),
        |ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b,
        |       floor((len(list_intersect(a.sh, b.sh))::DOUBLE
        |              / len(list_distinct(list_concat(a.sh, b.sh)))) * 10000 + 0.5)
        |         / 10000 AS jaccard
        |FROM cand JOIN docs a ON doc_a = a.doc_id JOIN docs b ON doc_b = b.doc_id
        |WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
        |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
        |ORDER BY 1, 2""".stripMargin,

    // q128: bounded per-customer groups keep the MRL sketch exact, so
    // quantile_disc (index max(0, ceil(q*n)-1) of the sorted values)
    // is the definitional mirror of the sketch's finish.
    "q128_mrl_quantiles" ->
      """SELECT o_custkey, count(*)::BIGINT AS n_orders,
        |       floor(quantile_disc(o_totalprice::DOUBLE, 0.25) * 10000 + 0.5) / 10000 AS p25,
        |       floor(quantile_disc(o_totalprice::DOUBLE, 0.50) * 10000 + 0.5) / 10000 AS p50,
        |       floor(quantile_disc(o_totalprice::DOUBLE, 0.75) * 10000 + 0.5) / 10000 AS p75,
        |       floor(quantile_disc(o_totalprice::DOUBLE, 0.95) * 10000 + 0.5) / 10000 AS p95
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q125_pca_project" -> OracleHashSql.q125PcaPower(),
    "q129_pq_adc_topk" -> OracleHashSql.q129PqAdc(),
    "q130_kcore" -> OracleHashSql.q130KCore(),
    "q137_core_numbers" -> OracleHashSql.q137CoreNumbers(),
    "q138_label_propagation" -> OracleHashSql.q138LabelPropagation(),
    "q139_hits" -> OracleHashSql.q139Hits(),

    // q140: the identical [level, trend, count] list fold, replayed by
    // list_reduce over the (ts, event_id)-ordered series; α=β=1/2 are
    // exact binary doubles so the recurrence matches bit-for-bit.
    "q140_holt_forecast" ->
      """WITH s AS MATERIALIZED (
        |  SELECT user_id, list(value::DOUBLE ORDER BY ts, event_id) AS xs
        |  FROM events WHERE value IS NOT NULL GROUP BY user_id),
        |f AS (
        |  SELECT user_id, len(xs)::BIGINT AS n,
        |    list_reduce(
        |      list_prepend([0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE],
        |        list_transform(xs, x -> [x, 0.0::DOUBLE, 0.0::DOUBLE])),
        |      (acc, xx) -> CASE WHEN acc[3] = 0.0
        |        THEN [xx[1], 0.0::DOUBLE, 1.0::DOUBLE]
        |        ELSE [0.5 * xx[1] + 0.5 * (acc[1] + acc[2]),
        |              0.5 * ((0.5 * xx[1] + 0.5 * (acc[1] + acc[2])) - acc[1])
        |                + 0.5 * acc[2],
        |              acc[3] + 1.0] END) AS st
        |  FROM s)
        |SELECT user_id, n,
        |       floor(st[1] * 10000 + 0.5) / 10000 AS level,
        |       floor(st[2] * 10000 + 0.5) / 10000 AS trend,
        |       floor((st[1] + 1.0 * st[2]) * 10000 + 0.5) / 10000 AS f1,
        |       floor((st[1] + 2.0 * st[2]) * 10000 + 0.5) / 10000 AS f2,
        |       floor((st[1] + 3.0 * st[2]) * 10000 + 0.5) / 10000 AS f3
        |FROM f ORDER BY user_id""".stripMargin,

    // q168: the Avro-OCF round-trip must reproduce the parquet truth
    // exactly (q141's contract, third row format).
    "q168_avro_roundtrip" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
        |       sum(n_chars)::BIGINT AS sum_chars,
        |       count(DISTINCT md5(text))::BIGINT AS n_distinct_texts
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // q141: the ORC round-trip must reproduce the parquet truth
    // exactly (q67's contract, second columnar format).
    "q141_orc_roundtrip" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
        |       sum(n_chars)::BIGINT AS sum_chars,
        |       count(DISTINCT md5(text))::BIGINT AS n_distinct_texts
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // q142: q78's strictly-after first-touch chain, plus integer-
    // microsecond deltas and quantile_disc percentiles.
    "q142_funnel_latency" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1),
        |d2 AS (
        |  SELECT epoch_us(s2.t) - epoch_us(s1.t) AS delta
        |  FROM s2 JOIN s1 ON s2.user_id = s1.user_id),
        |d3 AS (
        |  SELECT epoch_us(s3.t) - epoch_us(s2.t) AS delta
        |  FROM s3 JOIN s2 ON s3.user_id = s2.user_id)
        |SELECT * FROM (
        |  SELECT 2::BIGINT AS stage_idx, 'click' AS stage,
        |         count(*)::BIGINT AS n_users,
        |         quantile_disc(delta, 0.5)::BIGINT AS p50_us,
        |         quantile_disc(delta, 0.9)::BIGINT AS p90_us
        |  FROM d2
        |  UNION ALL
        |  SELECT 3, 'purchase', count(*),
        |         quantile_disc(delta, 0.5), quantile_disc(delta, 0.9)
        |  FROM d3)
        |ORDER BY stage_idx""".stripMargin,

    // q143: identical integer counts → identical double weights →
    // identical floor(w·65536) threshold on both engines.
    "q143_length_matched_resample" ->
      """WITH docs AS MATERIALIZED (
        |  SELECT doc_id, source, text, (n_chars // 100) AS bucket
        |  FROM documents),
        |sb AS (SELECT source, bucket, count(*) AS n_sb FROM docs GROUP BY 1, 2),
        |bt AS (SELECT bucket, count(*) AS n_b FROM docs GROUP BY 1),
        |st AS (SELECT source, count(*) AS n_s FROM docs GROUP BY 1),
        |tt AS (SELECT count(*) AS n FROM docs)
        |SELECT d.doc_id, d.source, d.bucket,
        |       floor(least(1.0, (n_b / n) / (n_sb / n_s)) * 10000 + 0.5)
        |         / 10000 AS keep_frac,
        |       (('0x' || substr(md5(d.text), 1, 4))::BIGINT <
        |        CAST(floor(least(1.0, (n_b / n) / (n_sb / n_s)) * 65536)
        |             AS BIGINT)) AS kept
        |FROM docs d
        |JOIN sb ON sb.source = d.source AND sb.bucket = d.bucket
        |JOIN bt ON bt.bucket = d.bucket
        |JOIN st ON st.source = d.source, tt
        |ORDER BY doc_id""".stripMargin,

    // q144: same deterministic PII injection, RE2 counterparts of the
    // Java regexes (fixed-shape patterns, no backrefs/lookaround →
    // identical match sets), 'g' for replace-all parity.
    "q144_pii_scrub" ->
      """WITH base AS MATERIALIZED (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 97 = 0 THEN text || ' contact user' ||
        |      doc_id::VARCHAR || '@example.com call 415-555-' ||
        |      lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
        |      ' from 10.0.' || (doc_id % 256)::VARCHAR || '.7 ssn 123-45-' ||
        |      lpad((doc_id % 10000)::VARCHAR, 4, '0')
        |    ELSE text END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(t, '[a-z0-9.]+@[a-z0-9]+\.[a-z]{2,4}', 0))::BIGINT AS n_email,
        |  len(regexp_extract_all(t, '([0-9]{1,3}\.){3}[0-9]{1,3}', 0))::BIGINT AS n_ip,
        |  len(regexp_extract_all(t, '[0-9]{3}-[0-9]{2}-[0-9]{4}', 0))::BIGINT AS n_ssn,
        |  len(regexp_extract_all(t, '[0-9]{3}-[0-9]{3}-[0-9]{4}', 0))::BIGINT AS n_phone,
        |  md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
        |    '[a-z0-9.]+@[a-z0-9]+\.[a-z]{2,4}', '<EMAIL>', 'g'),
        |    '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g'),
        |    '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g'),
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS redacted_md5
        |FROM base ORDER BY doc_id""".stripMargin,

    // q146: same deterministic variant injection; pairs via the same
    // equality blocking; clusters via the q49 recursive-reach pattern;
    // survivorship with arg_min / max / mode-with-seg-desc-tie.
    "q146_golden_records" ->
      """WITH RECURSIVE dirty AS MATERIALIZED (
        |  SELECT c_custkey::BIGINT AS rec_id, c_name AS name,
        |         c_nationkey::BIGINT AS nation, c_acctbal AS bal,
        |         c_mktsegment AS seg
        |  FROM customer
        |  UNION ALL
        |  SELECT (c_custkey + 1000000)::BIGINT, lower(c_name),
        |         c_nationkey::BIGINT, c_acctbal + 0.17, c_mktsegment
        |  FROM customer WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT (c_custkey + 2000000)::BIGINT,
        |         'CUST#' || regexp_extract(c_name, '([0-9]+)', 1),
        |         c_nationkey::BIGINT, c_acctbal - 5.25, 'UNKNOWN'
        |  FROM customer WHERE c_custkey % 11 = 0),
        |keyed AS MATERIALIZED (
        |  SELECT rec_id, name, nation, bal, seg,
        |         regexp_extract(name, '([0-9]+)', 1) AS digits
        |  FROM dirty),
        |p AS (
        |  SELECT a.rec_id AS src, b.rec_id AS dst
        |  FROM keyed a JOIN keyed b
        |    ON a.digits = b.digits AND a.nation = b.nation
        |   AND a.rec_id < b.rec_id),
        |e AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p),
        |v AS (SELECT DISTINCT src AS v FROM e),
        |reach(v, r) AS (
        |  SELECT v, v FROM v
        |  UNION
        |  SELECT reach.v, e.dst FROM reach JOIN e ON e.src = reach.r),
        |comp AS (SELECT v AS rec_id, min(r) AS cluster_id FROM reach GROUP BY v),
        |members AS MATERIALIZED (
        |  SELECT k.rec_id, k.name, k.bal, k.seg,
        |         coalesce(c.cluster_id, k.rec_id) AS cluster_id
        |  FROM keyed k LEFT JOIN comp c ON c.rec_id = k.rec_id),
        |golden AS (
        |  SELECT cluster_id, min(rec_id) AS golden_id,
        |         arg_min(name, rec_id) AS name,
        |         max(bal) AS best_bal, count(*)::BIGINT AS n_members
        |  FROM members GROUP BY 1),
        |segc AS (SELECT cluster_id, seg, count(*) AS c FROM members GROUP BY 1, 2),
        |segp AS (
        |  SELECT cluster_id, seg FROM (
        |    SELECT cluster_id, seg, row_number() OVER (
        |      PARTITION BY cluster_id ORDER BY c DESC, seg DESC) AS rn
        |    FROM segc)
        |  WHERE rn = 1)
        |SELECT g.golden_id, g.name,
        |       floor(g.best_bal * 100 + 0.5) / 100 AS best_bal,
        |       s.seg, g.n_members
        |FROM golden g JOIN segp s ON s.cluster_id = g.cluster_id
        |ORDER BY golden_id""".stripMargin,

    // q148/q149: classic TPC-H Q3/Q10 shapes; top-k membership is
    // deterministic because both engines rank the ROUNDED revenue
    // with an id tiebreak.
    "q148_shipping_priority" ->
      """WITH rev AS (
        |  SELECT l_orderkey,
        |         floor(sum(l_extendedprice * (1.0 - l_discount)) * 100 + 0.5)
        |           / 100 AS revenue,
        |         strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
        |         o_orderpriority
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment = 'BUILDING'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |    AND l_shipdate >= TIMESTAMP '1998-01-01'
        |  GROUP BY l_orderkey, 3, o_orderpriority)
        |SELECT l_orderkey, revenue, o_orderdate, o_orderpriority
        |FROM rev ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q149_returned_items" ->
      """SELECT c_custkey, c_name,
        |       floor(sum(l_extendedprice * (1.0 - l_discount)) * 100 + 0.5)
        |         / 100 AS revenue,
        |       floor(c_acctbal * 100 + 0.5) / 100 AS acctbal, n_name
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    // q150: TPC-H Q5 shape — the dual nation-key condition makes the
    // customer and supplier sides meet in the SAME nation.
    "q150_local_supplier_volume" ->
      """SELECT n_name,
        |       floor(sum(l_extendedprice * (1.0 - l_discount)) * 100 + 0.5)
        |         / 100 AS revenue,
        |       count(*)::BIGINT AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    // q151: the identical [s_pos, s_neg, n_alarms, max_stat] list
    // fold replayed by list_reduce over the (ts, event_id)-ordered
    // series; μ comes from the same sorted fold, k=25 / h=200 are
    // exact binary doubles, so the recurrence matches bit-for-bit.
    "q151_cusum_changepoints" ->
      """WITH s AS MATERIALIZED (
        |  SELECT user_id, list(value::DOUBLE ORDER BY ts, event_id) AS xs
        |  FROM events WHERE value IS NOT NULL GROUP BY user_id),
        |m AS (
        |  SELECT user_id, xs, len(xs)::BIGINT AS n,
        |         list_reduce(list_prepend(0.0::DOUBLE, xs), (a, x) -> a + x)
        |           / len(xs)::DOUBLE AS mu
        |  FROM s),
        |f AS (
        |  SELECT user_id, n, mu,
        |    list_reduce(
        |      list_prepend([0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE],
        |        list_transform(xs, x ->
        |          [x, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE])),
        |      (acc, xx) -> [
        |        CASE WHEN greatest(0.0, acc[1] + (xx[1] - mu - 25.0)) > 200.0
        |             THEN 0.0
        |             ELSE greatest(0.0, acc[1] + (xx[1] - mu - 25.0)) END,
        |        CASE WHEN greatest(0.0, acc[2] + (mu - xx[1] - 25.0)) > 200.0
        |             THEN 0.0
        |             ELSE greatest(0.0, acc[2] + (mu - xx[1] - 25.0)) END,
        |        acc[3] + CASE WHEN
        |            greatest(0.0, acc[1] + (xx[1] - mu - 25.0)) > 200.0
        |            OR greatest(0.0, acc[2] + (mu - xx[1] - 25.0)) > 200.0
        |          THEN 1.0 ELSE 0.0 END,
        |        greatest(acc[4],
        |                 greatest(0.0, acc[1] + (xx[1] - mu - 25.0)),
        |                 greatest(0.0, acc[2] + (mu - xx[1] - 25.0)))]) AS st
        |  FROM m)
        |SELECT user_id, n,
        |       floor(mu * 10000 + 0.5) / 10000 AS mean,
        |       st[3]::BIGINT AS n_alarms,
        |       floor(st[4] * 10000 + 0.5) / 10000 AS max_stat
        |FROM f ORDER BY user_id""".stripMargin,

    // q145: list_filter membership + the same integer keep rule.
    "q145_blocklist_filter" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         len(string_split(lower(text), ' '))::BIGINT AS n_tokens,
        |         len(list_filter(string_split(lower(text), ' '),
        |             x -> x IN ('slow', 'error', 'crash')))::BIGINT AS n_hits
        |  FROM documents)
        |SELECT doc_id, source, n_tokens, n_hits,
        |       (n_hits * 100 < n_tokens * 3) AS kept
        |FROM t ORDER BY doc_id""".stripMargin,
    "q152_dsir_selection" -> OracleHashSql.q152Dsir(),
    "q156_kcenter_coreset" -> OracleHashSql.q156KCenter(),
    "q157_shard_manifest" -> OracleHashSql.q157ShardManifest(),
    "q158_mmr_rerank" -> OracleHashSql.q158Mmr(),
    "q160_holt_winters_hourly" -> OracleHashSql.q160HoltWinters,
    "q167_ab_cuped" -> OracleHashSql.q167AbCuped(),
    "q169_erasure_audit" -> OracleHashSql.q169ErasureAudit(),

    // q161: identical QI grouping, first-order sensitive value,
    // integer risk rules.
    "q161_k_anonymity" ->
      """WITH fp AS (
        |  SELECT o_custkey,
        |         min_by(o_orderpriority,
        |                strftime(o_orderdate, '%Y%m%d%H%M%S') ||
        |                lpad(o_orderkey::VARCHAR, 12, '0')) AS sensitive
        |  FROM orders GROUP BY 1),
        |t AS (
        |  SELECT c_nationkey::BIGINT AS nation,
        |         c_mktsegment AS segment,
        |         floor(c_acctbal / 5000)::BIGINT AS bal_bucket,
        |         COALESCE(fp.sensitive, 'NONE') AS sensitive
        |  FROM customer LEFT JOIN fp ON c_custkey = o_custkey)
        |SELECT nation, segment, bal_bucket,
        |       count(*)::BIGINT AS n,
        |       count(DISTINCT sensitive)::BIGINT AS l_distinct,
        |       (count(*) < 5) AS at_risk_k,
        |       (count(DISTINCT sensitive) < 2) AS at_risk_l
        |FROM t GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    // q166: same duration/censoring bookkeeping; the survival product
    // is DuckDB's sequential window product() vs the engine's
    // ascending-t fold — the same multiply sequence.
    "q166_kaplan_meier" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS te
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > v.t0 GROUP BY 1),
        |mx AS (SELECT max(ts) AS t_max FROM events),
        |dur AS (
        |  SELECT v.user_id,
        |         floor((epoch_us(COALESCE(p.te, mx.t_max)) -
        |                epoch_us(v.t0)) / 86400000000)::BIGINT AS dur,
        |         (p.te IS NOT NULL) AS observed
        |  FROM v LEFT JOIN p ON v.user_id = p.user_id, mx),
        |deaths AS (SELECT dur AS t, count(*)::BIGINT AS d
        |           FROM dur WHERE observed GROUP BY 1),
        |risk AS (SELECT deaths.t, count(*)::BIGINT AS n_risk
        |         FROM dur, deaths WHERE dur.dur >= deaths.t GROUP BY 1),
        |c AS (SELECT t, n_risk, d FROM deaths JOIN risk USING (t))
        |SELECT t AS t_days, n_risk, d AS d_events,
        |       floor(product(1.0 - d::DOUBLE / n_risk::DOUBLE)
        |               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
        |             * 10000 + 0.5) / 10000 AS survival
        |FROM c ORDER BY t_days""".stripMargin,

    // q164: same two keyed counts + full-outer multiplicity classes.
    "q164_join_fanout_audit" ->
      """WITH l AS (SELECT c_custkey AS k, count(*) AS ml
        |           FROM customer GROUP BY 1),
        |r AS (SELECT o_custkey AS k, count(*) AS mr
        |      FROM orders GROUP BY 1),
        |j AS (SELECT COALESCE(l.k, r.k) AS k,
        |             COALESCE(ml, 0) AS ml, COALESCE(mr, 0) AS mr
        |      FROM l FULL OUTER JOIN r ON l.k = r.k)
        |SELECT ml::BIGINT AS ml, mr::BIGINT AS mr,
        |       count(*)::BIGINT AS n_keys,
        |       (count(*) * ml * mr)::BIGINT AS out_rows,
        |       min(k) AS example_key
        |FROM j GROUP BY ml, mr ORDER BY 1, 2""".stripMargin,

    // q165: identical pair space (distinct within-order items,
    // a.part < b.part), support floor, lift as one IEEE division.
    "q165_market_basket" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS oid, l_partkey AS part
        |  FROM lineitem),
        |n AS (SELECT count(DISTINCT oid) AS n_orders FROM items),
        |freq AS (SELECT part, count(*) AS cnt FROM items GROUP BY 1),
        |p AS (
        |  SELECT a.part AS part_a, b.part AS part_b,
        |         count(*)::BIGINT AS support
        |  FROM items a JOIN items b ON a.oid = b.oid AND a.part < b.part
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |s AS (
        |  SELECT p.part_a, p.part_b, p.support,
        |         fa.cnt::BIGINT AS cnt_a, fb.cnt::BIGINT AS cnt_b,
        |         p.support * n.n_orders / (fa.cnt * fb.cnt) AS lift
        |  FROM p JOIN freq fa ON fa.part = p.part_a
        |  JOIN freq fb ON fb.part = p.part_b, n)
        |SELECT rank, part_a, part_b, support, cnt_a, cnt_b,
        |       floor(lift * 10000 + 0.5) / 10000 AS lift
        |FROM (SELECT *, row_number() OVER (
        |        ORDER BY support DESC, part_a, part_b)::BIGINT AS rank
        |      FROM s)
        |WHERE rank <= 50 ORDER BY rank""".stripMargin,

    // q163: identical nation-pair OR predicate and by-year rollup.
    "q163_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       year(l_shipdate)::BIGINT AS l_year,
        |       floor(sum(l_extendedprice * (1.0 - l_discount)) * 100 + 0.5)
        |         / 100 AS volume,
        |       count(*)::BIGINT AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    // q162: the oracle is the GLOBAL gaps-and-islands sessionization
    // (q28's shape + session_end + event_id tiebreak) — no split, no
    // carry. Matching hashes certify the incremental stitch.
    "q162_incremental_sessions" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id, value,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |         SUM(brk) OVER (PARTITION BY user_id
        |                        ORDER BY ts, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        |       COUNT(*)::BIGINT AS n_events,
        |       floor((SUM(value)) * 100 + 0.5) / 100 AS total
        |FROM sessions
        |GROUP BY user_id, sid
        |ORDER BY 1, 2, 3, 4, 5""".stripMargin,

    // q159: identical window cumsum over the (priority, doc_id)
    // order; md5-prefix priority parses hex on both engines.
    "q159_token_budget_fill" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         len(list_filter(string_split(lower(text), ' '),
        |             x -> length(x) > 0))::BIGINT AS n_tokens,
        |         ('0x' || substring(md5(text), 1, 8))::BIGINT AS priority
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens, priority,
        |         sum(n_tokens) OVER (PARTITION BY source
        |           ORDER BY priority, doc_id
        |           ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens
        |  FROM t)
        |SELECT doc_id, source, n_tokens, priority, cum_tokens,
        |       (cum_tokens <= 800) AS kept
        |FROM c ORDER BY doc_id""".stripMargin,

    // q155: identical sign packing (two BIGINT words), xor+bit_count
    // Hamming, integer candidate cut, then the q20 cosine contract.
    "q155_binary_hamming_ann" ->
      """WITH b AS MATERIALIZED (
        |  SELECT vec_id, embedding,
        |    list_reduce(list_prepend(0::BIGINT, list_transform(range(0, 32),
        |      i -> CASE WHEN embedding[(i+1)::INT] > 0
        |                THEN (1::BIGINT << i::INT) ELSE 0::BIGINT END)),
        |      (a, x) -> a + x) AS w0,
        |    list_reduce(list_prepend(0::BIGINT, list_transform(range(32, 64),
        |      i -> CASE WHEN embedding[(i+1)::INT] > 0
        |                THEN (1::BIGINT << (i-32)::INT) ELSE 0::BIGINT END)),
        |      (a, x) -> a + x) AS w1
        |  FROM embeddings),
        |sc AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         (bit_count(xor(q.w0, c.w0)) +
        |          bit_count(xor(q.w1, c.w1)))::BIGINT AS hamming,
        |         CAST(q.embedding AS DOUBLE[]) AS qe,
        |         CAST(c.embedding AS DOUBLE[]) AS ce
        |  FROM b q JOIN b c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 5),
        |cand AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |                 ORDER BY hamming, neighbor_id) AS crank
        |    FROM sc) WHERE crank <= 40),
        |rr AS (
        |  SELECT query_id, neighbor_id, hamming,
        |         list_cosine_similarity(qe, ce) AS cos
        |  FROM cand)
        |SELECT query_id, rank, neighbor_id, hamming,
        |       floor(cos * 10000 + 0.5) / 10000 AS cos
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |                   ORDER BY cos DESC, neighbor_id) AS rank
        |      FROM rr)
        |WHERE rank <= 10 ORDER BY 1, 2""".stripMargin,

    // q154: identical boundary bookkeeping — ends-before-starts at a
    // shared instant, clipped midnight ends, carry-in cancellation.
    "q154_peak_concurrency" ->
      """WITH iv AS (
        |  SELECT event_id,
        |         epoch_us(ts) AS s_us,
        |         epoch_us(ts) + ((event_id % 7200) + 60) * 1000000 AS e_us,
        |         epoch_us(date_trunc('day', ts)) AS d_us,
        |         epoch_us(date_trunc('day', ts)) + 86400000000 AS nd_us
        |  FROM events),
        |deltas AS (
        |  SELECT d_us, s_us AS t_us, 1::BIGINT AS delta, event_id FROM iv
        |  UNION ALL
        |  SELECT d_us, e_us, -1, event_id FROM iv WHERE e_us < nd_us
        |  UNION ALL
        |  SELECT nd_us, e_us, -1, event_id FROM iv WHERE e_us > nd_us),
        |carry AS (
        |  SELECT nd_us AS d_us, count(*)::BIGINT AS carry_in FROM iv
        |  WHERE e_us > nd_us GROUP BY 1),
        |run AS (
        |  SELECT d.d_us, COALESCE(c.carry_in, 0) AS carry_in, d.delta,
        |         COALESCE(c.carry_in, 0) + sum(d.delta) OVER (
        |           PARTITION BY d.d_us
        |           ORDER BY d.t_us, d.delta, d.event_id
        |           ROWS UNBOUNDED PRECEDING) AS running
        |  FROM deltas d LEFT JOIN carry c USING (d_us))
        |SELECT strftime(make_timestamp(d_us), '%Y-%m-%d') AS day,
        |       carry_in::BIGINT AS carry_in,
        |       sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END)::BIGINT
        |         AS n_starts,
        |       sum(CASE WHEN delta = -1 THEN 1 ELSE 0 END)::BIGINT
        |         AS n_ends,
        |       greatest(max(running), carry_in)::BIGINT AS peak
        |FROM run GROUP BY d_us, carry_in ORDER BY day""".stripMargin,

    // q153: identical injection + canonicalization chain; RE2 ('g'
    // flag, \1 backrefs) vs Java regex ($1) is the cross-check.
    "q153_url_canonical_dedup" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://' ||
        |    CASE WHEN doc_id % 3 = 0
        |         THEN upper('www.site' || ((doc_id % 120) % 30)::VARCHAR
        |                    || '.example.com')
        |         ELSE 'www.site' || ((doc_id % 120) % 30)::VARCHAR
        |              || '.example.com' END ||
        |    CASE WHEN doc_id % 4 = 0 THEN ':80'
        |         WHEN doc_id % 10 = 7 THEN ':8080' ELSE '' END ||
        |    '/articles/' || (doc_id % 120)::VARCHAR ||
        |    CASE WHEN doc_id % 2 = 0
        |         THEN '?utm_source=feed&id=' || ((doc_id % 120) % 5)::VARCHAR
        |              || '&utm_campaign=c'
        |         ELSE '?id=' || ((doc_id % 120) % 5)::VARCHAR END ||
        |    CASE WHEN doc_id % 5 = 0 THEN '#section2' ELSE '' END AS raw_url
        |  FROM documents),
        |c0 AS (SELECT doc_id, raw_url,
        |              regexp_replace(raw_url, '#.*$', '') AS v FROM u),
        |c1 AS (SELECT doc_id, raw_url,
        |              lower(regexp_extract(v, '^(https?://[^/?]*)', 1)) ||
        |              regexp_replace(v, '^https?://[^/?]*', '') AS v FROM c0),
        |c2 AS (SELECT doc_id, raw_url,
        |              regexp_replace(v, ':80(/|\?|$)', '\1') AS v FROM c1),
        |c3 AS (SELECT doc_id, raw_url,
        |              regexp_replace(v, '&utm_[a-z]+=[^&]*', '', 'g') AS v
        |       FROM c2),
        |c4 AS (SELECT doc_id, raw_url,
        |              regexp_replace(v, '\?utm_[a-z]+=[^&]*&', '?') AS v
        |       FROM c3),
        |c5 AS (SELECT doc_id, raw_url,
        |              regexp_replace(v, '\?utm_[a-z]+=[^&]*$', '')
        |                AS canonical_url
        |       FROM c4)
        |SELECT doc_id, raw_url, canonical_url,
        |       count(*) OVER (PARTITION BY canonical_url)::BIGINT
        |         AS n_variants,
        |       (doc_id = min(doc_id) OVER (PARTITION BY canonical_url))
        |         AS kept
        |FROM c5 ORDER BY doc_id""".stripMargin,
    "q132_image_dedup_survivors" -> OracleHashSql.q132ImageDedupSurvivors(),
    "q134_personalized_pagerank" ->
      OracleHashSql.q134PersonalizedPageRank(Seq(1L, 2L, 3L)),
    "q135_hll_union_rollup" -> OracleHashSql.q135HllUnionRollup(),
    "q136_cluster_safe_split" -> OracleHashSql.q136ClusterSafeSplit,

    // q133: first/last touch per purchase as rank-1 windows over the
    // user-keyed interval join (≡ the engine's struct min/max because
    // event_id is unique); 'direct' via NOT EXISTS.
    "q133_touch_attribution" ->
      """WITH t AS (
        |  SELECT user_id, ts AS t_ts, event_id AS t_id, event_type AS t_type
        |  FROM events WHERE event_type IN ('click', 'view')),
        |p AS (
        |  SELECT user_id, ts AS p_ts, event_id AS p_id, value
        |  FROM events WHERE event_type = 'purchase'),
        |j AS MATERIALIZED (
        |  SELECT p.p_id, p.value, t.t_ts, t.t_id, t.t_type
        |  FROM p JOIN t ON p.user_id = t.user_id
        |   AND t.t_ts >= p.p_ts - INTERVAL 1 HOUR AND t.t_ts < p.p_ts),
        |mf AS (
        |  SELECT p_id, value, t_type AS first_touch FROM (
        |    SELECT p_id, value, t_type,
        |           row_number() OVER (PARTITION BY p_id
        |                              ORDER BY t_ts ASC, t_id ASC) AS rn
        |    FROM j) WHERE rn = 1),
        |ml AS (
        |  SELECT p_id, t_type AS last_touch FROM (
        |    SELECT p_id, t_type,
        |           row_number() OVER (PARTITION BY p_id
        |                              ORDER BY t_ts DESC, t_id DESC) AS rn
        |    FROM j) WHERE rn = 1),
        |d AS (
        |  SELECT p_id, value FROM p
        |  WHERE NOT EXISTS (SELECT 1 FROM t
        |    WHERE t.user_id = p.user_id
        |      AND t.t_ts >= p.p_ts - INTERVAL 1 HOUR AND t.t_ts < p.p_ts)),
        |per AS (
        |  SELECT mf.p_id, mf.value, mf.first_touch, ml.last_touch
        |  FROM mf JOIN ml ON mf.p_id = ml.p_id
        |  UNION ALL
        |  SELECT p_id, value, 'direct', 'direct' FROM d)
        |SELECT model, touch_type, n_purchases, revenue FROM (
        |  SELECT 'first' AS model, first_touch AS touch_type,
        |         count(*)::BIGINT AS n_purchases,
        |         floor(sum(value) * 10000 + 0.5) / 10000 AS revenue
        |  FROM per GROUP BY 2
        |  UNION ALL
        |  SELECT 'last', last_touch, count(*)::BIGINT,
        |         floor(sum(value) * 10000 + 0.5) / 10000
        |  FROM per GROUP BY 2)
        |ORDER BY 1, 2""".stripMargin,

    // q131: ACF mirrors q86's float contract — per-user double sums,
    // lag over (ts, event_id), zero-variance series → NULL.
    "q131_acf" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id, value
        |  FROM events WHERE value IS NOT NULL),
        |m AS (SELECT user_id, avg(value) AS mu, count(*) AS n
        |      FROM ev GROUP BY 1),
        |l AS (
        |  SELECT e.user_id, m.n, (value - mu) AS d,
        |         lag(value, 1) OVER w - mu AS d1,
        |         lag(value, 2) OVER w - mu AS d2,
        |         lag(value, 3) OVER w - mu AS d3
        |  FROM ev e JOIN m ON e.user_id = m.user_id
        |  WINDOW w AS (PARTITION BY e.user_id ORDER BY ts, event_id))
        |SELECT user_id, max(n)::BIGINT AS n_events,
        |       floor(sum(d * d1) / nullif(sum(d * d), 0) * 10000 + 0.5) / 10000 AS r1,
        |       floor(sum(d * d2) / nullif(sum(d * d), 0) * 10000 + 0.5) / 10000 AS r2,
        |       floor(sum(d * d3) / nullif(sum(d * d), 0) * 10000 + 0.5) / 10000 AS r3
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin,

    // q170: the TEXTBOOK dominance definition (NOT EXISTS a strictly
    // better row) — deliberately independent of the engine's
    // window-reduction, so the hash match certifies the reduction.
    "q170_skyline_customers" ->
      """WITH spend AS (
        |  SELECT c_mktsegment, c_custkey, c_name,
        |         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c,
        |         coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)),
        |                  0)::BIGINT AS spend_c
        |  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |  GROUP BY 1, 2, 3, 4)
        |SELECT c_mktsegment, c_custkey, c_name, bal_c, spend_c
        |FROM spend p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM spend q
        |  WHERE q.c_mktsegment = p.c_mktsegment
        |    AND q.bal_c >= p.bal_c AND q.spend_c <= p.spend_c
        |    AND (q.bal_c > p.bal_c OR q.spend_c < p.spend_c))
        |ORDER BY 1, bal_c DESC, spend_c, c_custkey""".stripMargin,

    // q171: TPC-H Q13 — the priority filter must ride the LEFT JOIN
    // condition so zero-order customers stay.
    "q171_order_count_distribution" ->
      """SELECT c_count, count(*)::BIGINT AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
        |      FROM customer LEFT JOIN orders
        |        ON o_custkey = c_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // q172: TPC-H Q17 — the oracle keeps the textbook correlated
    // per-part average as a grouped CTE; quantities are integral
    // doubles so the mean is exact-sum/count on both engines, and
    // revenue folds integer cents before the /7 annualization.
    "q172_small_qty_revenue" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice, p_brand
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')),
        |pa AS (
        |  SELECT l_partkey AS pk, avg(l_quantity) AS aq
        |  FROM li GROUP BY 1)
        |SELECT p_brand,
        |       floor(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |             / 100.0 / 7.0 * 100 + 0.5) / 100 AS avg_yearly,
        |       count(*)::BIGINT AS n_small
        |FROM li JOIN pa ON pk = l_partkey
        |WHERE l_quantity < 0.5 * aq
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,

    // q173: TPC-H Q21 shape — the EXISTS/NOT-EXISTS pair expressed as
    // one per-order distinct-count aggregate, identically on both
    // engines (the equivalence is definitional: "some other supplier
    // in the order" = n_supps ≥ 2; "no other supplier returned" =
    // exactly one distinct returned supplier).
    "q173_waiting_suppliers" ->
      """WITH per_order AS (
        |  SELECT l_orderkey AS ok,
        |         count(DISTINCT l_suppkey)::BIGINT AS n_supps,
        |         count(DISTINCT CASE WHEN l_returnflag = 'R'
        |                             THEN l_suppkey END)::BIGINT AS n_ret
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY 1),
        |blamed AS (
        |  SELECT DISTINCT l.l_orderkey, l.l_suppkey
        |  FROM lineitem l JOIN per_order ON ok = l.l_orderkey
        |  WHERE l.l_returnflag = 'R' AND n_supps >= 2 AND n_ret = 1)
        |SELECT s_name, count(*)::BIGINT AS numwait
        |FROM blamed JOIN supplier ON s_suppkey = l_suppkey
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 25""".stripMargin,

    // q174: TPC-H Q22 shape — the above-average test is the exact
    // integer cross-multiplication bal_c·n > Σbal_c (no float
    // average anywhere near the comparison).
    "q174_inactive_rich_customers" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey, c_acctbal,
        |         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
        |  FROM customer),
        |m AS (
        |  SELECT sum(bal_c)::HUGEINT AS s_c, count(*)::BIGINT AS n
        |  FROM c WHERE c_acctbal > 0.0)
        |SELECT n_name, count(*)::BIGINT AS n_custs,
        |       (sum(bal_c) / 100.0)::DOUBLE AS total_bal
        |FROM c, m
        |JOIN nation ON n_nationkey = c_nationkey
        |WHERE bal_c::HUGEINT * n > s_c
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    // q175: first digit from the integer-cents decimal string;
    // expected micro-probabilities are the same fixed literals the
    // engine broadcasts (Relational.benfordMicro).
    "q175_benford_audit" ->
      s"""WITH d AS (
        |  SELECT o_orderpriority AS prio,
        |         substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |                     AS VARCHAR), 1, 1)::INT AS digit
        |  FROM orders WHERE o_totalprice > 0),
        |cnt AS (SELECT prio, digit, count(*)::BIGINT AS obs
        |        FROM d GROUP BY 1, 2),
        |tot AS (SELECT prio, sum(obs)::BIGINT AS n FROM cnt GROUP BY 1),
        |exp AS (SELECT * FROM (VALUES ${
          graft.operators.Relational.benfordMicro
            .map { case (d, p) => s"($d, ${p}::BIGINT)" }.mkString(", ")
        }) e(digit, p_micro))
        |SELECT c.prio, c.digit, c.obs, t.n,
        |       (c.obs * 1000000 - t.n * e.p_micro)::BIGINT AS dev_micro
        |FROM cnt c JOIN tot t ON t.prio = c.prio
        |JOIN exp e ON e.digit = c.digit
        |ORDER BY 1, 2""".stripMargin,

    "q176_winnow_fingerprints" -> OracleHashSql.q176Winnow(),

    // q177: both rankings are the q20 brute-force contract; the
    // truncated side slices the list before the cosine.
    "q177_matryoshka_recall" ->
      """WITH qs AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
        |full_r AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |           row_number() OVER (PARTITION BY q.vec_id
        |             ORDER BY list_cosine_similarity(
        |               CAST(q.embedding AS DOUBLE[]),
        |               CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rnk
        |    FROM qs q JOIN embeddings c ON q.vec_id <> c.vec_id)
        |  WHERE rnk <= 10),
        |trunc_r AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |           row_number() OVER (PARTITION BY q.vec_id
        |             ORDER BY list_cosine_similarity(
        |               CAST(q.embedding[1:16] AS DOUBLE[]),
        |               CAST(c.embedding[1:16] AS DOUBLE[])) DESC, c.vec_id) AS rnk
        |    FROM qs q JOIN embeddings c ON q.vec_id <> c.vec_id)
        |  WHERE rnk <= 10),
        |ov AS (
        |  SELECT f.query_id, count(*)::BIGINT AS n_overlap
        |  FROM full_r f JOIN trunc_r t
        |    ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
        |  GROUP BY 1)
        |SELECT f.query_id, count(*)::BIGINT AS k_full,
        |       coalesce(max(ov.n_overlap), 0)::BIGINT AS n_overlap,
        |       (coalesce(max(ov.n_overlap), 0) * 1000
        |          // count(*))::BIGINT AS recall_permille
        |FROM full_r f LEFT JOIN ov ON ov.query_id = f.query_id
        |GROUP BY f.query_id
        |ORDER BY f.query_id""".stripMargin,

    // q178: same two-level integer aggregation; the Fano numerator /
    // denominator and the bursty flag stay in BIGINTs.
    "q178_burstiness_audit" ->
      """WITH pm AS (
        |  SELECT user_id, epoch_us(ts) // 60000000 AS minute,
        |         count(*)::BIGINT AS c
        |  FROM events GROUP BY 1, 2),
        |agg AS (
        |  SELECT user_id,
        |         (max(minute) - min(minute) + 1)::BIGINT AS span_min,
        |         count(*)::BIGINT AS n_active,
        |         sum(c)::BIGINT AS n_events,
        |         sum(c * c)::BIGINT AS sum_c2
        |  FROM pm GROUP BY 1)
        |SELECT user_id, span_min, n_active, n_events,
        |       (n_active * 1000 // span_min)::BIGINT AS duty_permille,
        |       floor(((span_min * sum_c2 - n_events * n_events)::DOUBLE
        |              / (span_min * n_events)::DOUBLE) * 10000 + 0.5)
        |         / 10000 AS fano,
        |       (span_min * sum_c2 - n_events * n_events
        |          > 4 * span_min * n_events) AS bursty
        |FROM agg ORDER BY user_id""".stripMargin,

    // q179: identical rank identity over the same ascending
    // (x, partkey) order; HUGEINT moments mirror the decimal sums.
    "q179_gini_concentration" ->
      """WITH cnt AS (
        |  SELECT p_type, p_partkey, count(l_orderkey)::BIGINT AS x
        |  FROM part LEFT JOIN lineitem ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |rk AS (
        |  SELECT p_type, x,
        |         row_number() OVER (PARTITION BY p_type
        |                            ORDER BY x, p_partkey) AS i
        |  FROM cnt)
        |SELECT p_type, count(*)::BIGINT AS n_items, sum(x)::BIGINT AS total,
        |       floor(((2 * sum(i::HUGEINT * x::HUGEINT)
        |               - (count(*) + 1)::HUGEINT * sum(x)::HUGEINT)::DOUBLE
        |              / (count(*)::HUGEINT * sum(x)::HUGEINT)::DOUBLE)
        |             * 10000 + 0.5) / 10000 AS gini
        |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin,

    // q180: the oracle is the textbook pair-space formulation
    // (bounded join + row_number pick-first), independent of the
    // engine's union+carry — the hash match certifies the carry.
    "q180_asof_forward" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS p_id, ts AS p_ts
        |  FROM events WHERE event_type = 'purchase'),
        |e AS (
        |  SELECT user_id, event_id AS e_id, ts AS e_ts
        |  FROM events WHERE event_type = 'error'),
        |j AS (
        |  SELECT p.user_id, p_id, p_ts, e_id, e_ts,
        |         row_number() OVER (PARTITION BY p_id
        |                            ORDER BY e_ts, e_id) AS rn
        |  FROM p JOIN e ON p.user_id = e.user_id
        |    AND e_ts >= p_ts AND e_ts <= p_ts + INTERVAL 30 MINUTE)
        |SELECT user_id, p_id, strftime(p_ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
        |       e_id AS next_error_id,
        |       ((epoch_us(e_ts) - epoch_us(p_ts)) // 1000000)::BIGINT
        |         AS delta_s
        |FROM j WHERE rn = 1 ORDER BY p_id""".stripMargin,

    // q181: the oracle counts each trailing window directly over the
    // (user, day) pairs — no min-offset trick — so the hash match
    // certifies the fan-out rewrite.
    "q181_active_user_curves" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d
        |  FROM events),
        |bounds AS (SELECT min(d) AS dmin, max(d) AS dmax FROM ud),
        |days AS (SELECT unnest(range(dmin, dmax + 1)) AS d FROM bounds)
        |SELECT days.d AS epoch_day,
        |       count(DISTINCT CASE WHEN ud.d = days.d
        |                           THEN user_id END)::BIGINT AS dau,
        |       count(DISTINCT CASE WHEN ud.d >= days.d - 6
        |                           THEN user_id END)::BIGINT AS wau,
        |       count(DISTINCT user_id)::BIGINT AS mau
        |FROM days LEFT JOIN ud ON ud.d BETWEEN days.d - 27 AND days.d
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q182_lsh_calibration" -> OracleHashSql.q182LshCalibration(),

    // q183: identical rollup; the share is integral division over
    // exact cent sums on both engines.
    "q183_share_rollup" ->
      """WITH pn AS (
        |  SELECT r_name, n_name,
        |         sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100
        |                        + 0.5) AS BIGINT))::BIGINT AS rev_c
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2),
        |rk AS (
        |  SELECT r_name, n_name, rev_c,
        |         sum(rev_c) OVER (PARTITION BY r_name) AS total_c,
        |         row_number() OVER (PARTITION BY r_name
        |                            ORDER BY rev_c DESC, n_name) AS rk
        |  FROM pn),
        |lab AS (
        |  SELECT r_name,
        |         CASE WHEN rk <= 2 THEN n_name ELSE 'OTHER' END AS label,
        |         rev_c, total_c
        |  FROM rk)
        |SELECT r_name, label, (sum(rev_c) / 100.0)::DOUBLE AS revenue,
        |       (sum(rev_c) * 1000 // max(total_c))::BIGINT AS share_permille,
        |       count(*)::BIGINT AS n_nations
        |FROM lab GROUP BY 1, 2
        |ORDER BY r_name, share_permille DESC, label""".stripMargin,

    // q184: same dense day axis and integer z-flag; the z column is
    // one IEEE sqrt over identical integers.
    "q184_ingest_anomaly" ->
      """WITH pd AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
        |         count(*)::BIGINT AS c
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT min(d) AS dmin, max(d) AS dmax FROM pd),
        |dense AS (
        |  SELECT t.event_type, days.d, coalesce(pd.c, 0)::BIGINT AS c
        |  FROM (SELECT DISTINCT event_type FROM pd) t
        |  CROSS JOIN (SELECT unnest(range(dmin, dmax + 1)) AS d
        |              FROM bounds) days
        |  LEFT JOIN pd ON pd.event_type = t.event_type AND pd.d = days.d),
        |mom AS (
        |  SELECT event_type, count(*)::BIGINT AS n, sum(c)::BIGINT AS s,
        |         sum(c * c)::BIGINT AS s2
        |  FROM dense GROUP BY 1)
        |SELECT dense.event_type, dense.d AS epoch_day, dense.c,
        |       floor((dense.c * n - s)::DOUBLE
        |             / sqrt((n * s2 - s * s)::DOUBLE) * 10000 + 0.5)
        |         / 10000 AS z,
        |       ((dense.c * n - s) * (dense.c * n - s)
        |          > 9 * (n * s2 - s * s)) AS anomalous
        |FROM dense JOIN mom ON mom.event_type = dense.event_type
        |ORDER BY 1, 2""".stripMargin,

    // q185: identical split/argmax/scoring; the pair's period is its
    // LATER event's timestamp on both engines.
    "q185_markov_backtest" ->
      """WITH trans AS (
        |  SELECT user_id, ts, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev
        |  FROM events),
        |tr AS (SELECT * FROM trans WHERE prev IS NOT NULL),
        |counts AS (
        |  SELECT prev, event_type, count(*)::BIGINT AS n
        |  FROM tr WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
        |  GROUP BY 1, 2),
        |pred AS (
        |  SELECT prev, event_type AS predicted_next, n AS train_n
        |  FROM (SELECT *, row_number() OVER (PARTITION BY prev
        |          ORDER BY n DESC, event_type) AS rk FROM counts)
        |  WHERE rk = 1)
        |SELECT tr.prev, max(predicted_next) AS predicted_next,
        |       max(train_n)::BIGINT AS train_n,
        |       count(*)::BIGINT AS n_test,
        |       sum(CASE WHEN tr.event_type = predicted_next
        |                THEN 1 ELSE 0 END)::BIGINT AS n_correct,
        |       (sum(CASE WHEN tr.event_type = predicted_next
        |                 THEN 1 ELSE 0 END) * 1000 // count(*))::BIGINT
        |         AS acc_permille
        |FROM tr LEFT JOIN pred ON pred.prev = tr.prev
        |WHERE tr.ts >= TIMESTAMP '2024-01-16 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q186_disjunctive_revenue" ->
      """SELECT floor(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |                           * 100 + 0.5) AS BIGINT)) / 100.0
        |             * 100 + 0.5) / 100 AS revenue,
        |       count(*)::BIGINT AS n_items
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 25
        |       AND l_quantity BETWEEN 5 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 26 AND 50
        |       AND l_quantity BETWEEN 10 AND 40)""".stripMargin,

    "q187_priority_late_ship" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q188_supplier_diversity" ->
      """SELECT p_brand, p_size,
        |       count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_name LIKE '%7')
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,

    "q189_part_value_share" ->
      """WITH pp AS (
        |  SELECT l_partkey,
        |         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |           ::BIGINT AS value_c
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT sum(value_c)::HUGEINT AS total_c FROM pp)
        |SELECT l_partkey, (value_c / 100.0)::DOUBLE AS value,
        |       (value_c::HUGEINT * 1000000 // total_c)::BIGINT AS share_ppm
        |FROM pp, tot
        |WHERE value_c::HUGEINT * 1000000 // total_c > 800
        |ORDER BY share_ppm DESC, l_partkey""".stripMargin,

    "q190_market_share" ->
      """WITH base AS (
        |  SELECT year(o_orderdate)::BIGINT AS yr,
        |         CAST(floor(l_extendedprice * (1.0 - l_discount) * 100
        |                    + 0.5) AS BIGINT) AS cents,
        |         (s_nationkey = 7) AS is_target
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE r_name = 'ASIA')
        |SELECT yr, (sum(cents) / 100.0)::DOUBLE AS total_rev,
        |       (sum(CASE WHEN is_target THEN cents ELSE 0 END) * 1000
        |          // sum(cents))::BIGINT AS share_permille
        |FROM base GROUP BY 1 ORDER BY 1""".stripMargin,

    "q191_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100
        |                        + 0.5) AS BIGINT))::BIGINT AS rev_c
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, (rev_c / 100.0)::DOUBLE AS total_rev
        |FROM rev JOIN supplier ON s_suppkey = l_suppkey
        |WHERE rev_c = (SELECT max(rev_c) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q192_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300.0)
        |SELECT c_name, c_custkey, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
        |       total_qty::BIGINT AS total_qty
        |FROM big
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY total_qty DESC, o_orderkey
        |LIMIT 20""".stripMargin,

    "q193_promo_share" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS month,
        |       (sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100
        |                       + 0.5) AS BIGINT)) / 100.0)::DOUBLE
        |         AS revenue,
        |       (sum(CASE WHEN p_type = 'PROMO'
        |                 THEN CAST(floor(l_extendedprice * (1.0 - l_discount)
        |                                 * 100 + 0.5) AS BIGINT)
        |                 ELSE 0 END) * 1000
        |          // sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |                            * 100 + 0.5) AS BIGINT)))::BIGINT
        |         AS promo_share_permille
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q194_source_diversity" ->
      """WITH ps AS (
        |  SELECT lang, source, count(*)::BIGINT AS c
        |  FROM documents GROUP BY 1, 2)
        |SELECT lang, count(*)::BIGINT AS n_sources,
        |       sum(c)::BIGINT AS n_docs,
        |       floor((sum(c) * sum(c))::DOUBLE / sum(c * c)::DOUBLE
        |             * 10000 + 0.5) / 10000 AS effective_sources,
        |       (max(c) * 1000 // sum(c))::BIGINT AS top_share_permille
        |FROM ps GROUP BY 1 ORDER BY 1""".stripMargin,

    // q195: the same three-tier cascade; the near-dup tier reuses the
    // full q17 minhash/banding replay restricted to tier-1/2
    // survivors, with the min-id partner rule.
    "q195_dedup_explain" -> OracleHashSql.q195DedupExplain,

    "q219_magnitude_histogram" ->
      """WITH c AS (
        |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders WHERE o_totalprice > 0)
        |SELECT length(printf('%b', c))::BIGINT AS bits,
        |       count(*)::BIGINT AS n_orders,
        |       (min(c) / 100.0)::DOUBLE AS min_amount,
        |       (max(c) / 100.0)::DOUBLE AS max_amount
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // q220: identical fixed IEEE Wilson formula over exact integer
    // (returns, total) pairs.
    "q220_wilson_returns" ->
      """WITH pb AS (
        |  SELECT p_brand, count(*)::BIGINT AS n,
        |         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |           ::BIGINT AS r
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  GROUP BY 1)
        |SELECT p_brand, n, r,
        |       floor((r::DOUBLE / n::DOUBLE) * 10000 + 0.5) / 10000
        |         AS return_rate,
        |       floor(((r::DOUBLE / n::DOUBLE + 3.8416 / (2.0 * n::DOUBLE)
        |               - 1.96 * sqrt((r::DOUBLE / n::DOUBLE)
        |                   * (1.0 - r::DOUBLE / n::DOUBLE) / n::DOUBLE
        |                   + 3.8416 / (4.0 * n::DOUBLE * n::DOUBLE)))
        |              / (1.0 + 3.8416 / n::DOUBLE)) * 10000 + 0.5) / 10000
        |         AS wilson_lb
        |FROM pb
        |ORDER BY wilson_lb DESC, p_brand""".stripMargin,

    // q221: the same five exact integer moments in HUGEINT; the only
    // IEEE steps are the final divisions.
    "q221_brand_trend_ols" ->
      """WITH wk AS (
        |  SELECT p_brand,
        |         (date_diff('day', DATE '1992-01-01', o_orderdate) // 7)
        |           ::BIGINT AS wk,
        |         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |             * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
        |           // 10000 AS y
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON p_partkey = l_partkey
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT p_brand, count(*)::HUGEINT AS n,
        |         sum(wk)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
        |         sum(wk * y)::HUGEINT AS sxy,
        |         sum(wk * wk)::HUGEINT AS sxx,
        |         sum(y::HUGEINT * y::HUGEINT) AS syy
        |  FROM wk GROUP BY 1),
        |d AS (
        |  SELECT p_brand, n,
        |         n * sxy - sx * sy AS num,
        |         n * sxx - sx * sx AS dxx,
        |         n * syy - sy * sy AS dyy,
        |         sy * sxx - sx * sxy AS inum
        |  FROM m)
        |SELECT p_brand, n::BIGINT AS n_weeks,
        |       floor(num::DOUBLE / dxx::DOUBLE * 10000 + 0.5) / 10000
        |         AS slope_usd_wk,
        |       floor(inum::DOUBLE / dxx::DOUBLE * 10000 + 0.5) / 10000
        |         AS intercept_usd,
        |       floor((num * num)::DOUBLE / (dxx * dyy)::DOUBLE
        |             * 10000 + 0.5) / 10000 AS r2
        |FROM d WHERE n >= 10 AND dxx > 0 AND dyy > 0
        |ORDER BY p_brand""".stripMargin,

    // q222: identical monthly series, identical pair space, identical
    // nearest-rank pick — each slope one IEEE division of exact ints.
    "q222_theil_sen_trend" ->
      """WITH mo AS (
        |  SELECT p_brand,
        |         ((date_part('year', o_orderdate)::BIGINT - 1992) * 12
        |          + date_part('month', o_orderdate)::BIGINT - 1) AS mo,
        |         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |             * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
        |           // 10000 AS y
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON p_partkey = l_partkey
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.p_brand,
        |         (b.y - a.y)::DOUBLE / (b.mo - a.mo)::DOUBLE AS slope
        |  FROM mo a JOIN mo b
        |    ON a.p_brand = b.p_brand AND a.mo < b.mo),
        |rk AS (
        |  SELECT p_brand, slope,
        |         row_number() OVER (PARTITION BY p_brand
        |                            ORDER BY slope) AS rk,
        |         count(*) OVER (PARTITION BY p_brand) AS m
        |  FROM pairs)
        |SELECT p_brand, m::BIGINT AS n_pairs,
        |       floor(slope * 10000 + 0.5) / 10000 AS ts_slope_usd_mo
        |FROM rk WHERE rk = (m + 1) // 2
        |ORDER BY p_brand""".stripMargin,

    // q223: same per-cell IEEE contributions, same value-sorted left
    // fold (list_reduce seeds with element 0; 0.0+x0 = x0 exactly).
    "q223_chi2_flag_linestatus" ->
      """WITH cells AS (
        |  SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS o
        |  FROM lineitem GROUP BY 1, 2),
        |rt AS (SELECT l_returnflag, sum(o)::BIGINT AS rtot
        |       FROM cells GROUP BY 1),
        |ct AS (SELECT l_linestatus, sum(o)::BIGINT AS ctot
        |       FROM cells GROUP BY 1),
        |tot AS (SELECT sum(o)::BIGINT AS n,
        |               count(DISTINCT l_returnflag)::BIGINT AS nr,
        |               count(DISTINCT l_linestatus)::BIGINT AS nc
        |        FROM cells),
        |contrib AS (
        |  SELECT n, nr, nc,
        |         pow(o::DOUBLE - rtot::DOUBLE * ctot::DOUBLE / n::DOUBLE,
        |             2.0)
        |           / (rtot::DOUBLE * ctot::DOUBLE / n::DOUBLE) AS cell
        |  FROM cells
        |  JOIN rt USING (l_returnflag)
        |  JOIN ct USING (l_linestatus)
        |  CROSS JOIN tot),
        |folded AS (
        |  SELECT n, nr, nc,
        |         list_reduce(list_sort(list(cell)), (a, x) -> a + x)
        |           AS chi2r
        |  FROM contrib GROUP BY 1, 2, 3)
        |SELECT n, (nr - 1) * (nc - 1) AS dof,
        |       floor(chi2r * 10000 + 0.5) / 10000 AS chi2,
        |       floor(sqrt(chi2r / (n::DOUBLE
        |                           * (least(nr, nc) - 1)::DOUBLE))
        |             * 10000 + 0.5) / 10000 AS cramers_v
        |FROM folded""".stripMargin,

    // q224: identical (nation, value)-grain weights, identical
    // integer 2·cumw ≥ totw crossing rule.
    "q224_weighted_median_value" ->
      """WITH pv AS (
        |  SELECT n_name,
        |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v_c,
        |         sum(l_quantity::BIGINT)::BIGINT AS w
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON n_nationkey = c_nationkey
        |  GROUP BY 1, 2),
        |cw AS (
        |  SELECT n_name, v_c,
        |         sum(w) OVER (PARTITION BY n_name ORDER BY v_c
        |                      ROWS UNBOUNDED PRECEDING) AS cumw,
        |         sum(w) OVER (PARTITION BY n_name) AS totw
        |  FROM pv)
        |SELECT n_name, (min(v_c) / 100.0)::DOUBLE AS wmedian_value,
        |       max(totw)::BIGINT AS total_qty
        |FROM cw WHERE cumw * 2 >= totw
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q225: same single-space tokenizer as q13; exact counts.
    "q225_vocab_richness" ->
      """WITH tk AS (
        |  SELECT source, token, count(*)::BIGINT AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  WHERE length(token) > 0
        |  GROUP BY 1, 2),
        |a AS (
        |  SELECT source, sum(c)::BIGINT AS n_tokens,
        |         count(*)::BIGINT AS n_types,
        |         sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax
        |  FROM tk GROUP BY 1)
        |SELECT source, n_tokens, n_types, n_hapax,
        |       floor(n_types::DOUBLE / n_tokens::DOUBLE * 10000 + 0.5)
        |         / 10000 AS ttr,
        |       floor(n_hapax::DOUBLE / n_types::DOUBLE * 10000 + 0.5)
        |         / 10000 AS hapax_rate
        |FROM a ORDER BY source""".stripMargin,

    // q226: identical integer revenue compares, identical island
    // construction and run-rank tie-break.
    "q226_revenue_streaks" ->
      """WITH d AS (
        |  SELECT n_name, o_orderdate AS d,
        |         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |             * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
        |           ::BIGINT AS rev
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON n_nationkey = c_nationkey
        |  GROUP BY 1, 2),
        |b AS (
        |  SELECT n_name, d, rev,
        |         CASE WHEN rev > lag(rev) OVER w THEN 0 ELSE 1 END AS brk
        |  FROM d WINDOW w AS (PARTITION BY n_name ORDER BY d)),
        |g AS (
        |  SELECT n_name, d,
        |         sum(brk) OVER (PARTITION BY n_name ORDER BY d
        |                        ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM b),
        |runs AS (
        |  SELECT n_name, grp, count(*)::BIGINT AS len, max(d) AS end_d
        |  FROM g GROUP BY 1, 2),
        |rk AS (
        |  SELECT n_name, len, end_d,
        |         row_number() OVER (PARTITION BY n_name
        |                            ORDER BY len DESC, end_d) AS rk
        |  FROM runs)
        |SELECT n_name, len AS streak_days,
        |       strftime(end_d, '%Y-%m-%d') AS streak_end
        |FROM rk WHERE rk = 1 ORDER BY n_name""".stripMargin,

    // q227: same constraint set; PK checks count rows in repeated
    // key groups, FK checks count NOT EXISTS orphans.
    "q227_integrity_audit" ->
      """SELECT * FROM (
        |  SELECT 'pk_orders' AS check_name,
        |         COALESCE(sum(CASE WHEN c > 1 THEN c ELSE 0 END), 0)::BIGINT
        |           AS n_violations,
        |         count(*)::BIGINT AS n_checked
        |  FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
        |  UNION ALL
        |  SELECT 'pk_customer',
        |         COALESCE(sum(CASE WHEN c > 1 THEN c ELSE 0 END), 0)::BIGINT,
        |         count(*)::BIGINT
        |  FROM (SELECT count(*) AS c FROM customer GROUP BY c_custkey)
        |  UNION ALL
        |  SELECT 'pk_part',
        |         COALESCE(sum(CASE WHEN c > 1 THEN c ELSE 0 END), 0)::BIGINT,
        |         count(*)::BIGINT
        |  FROM (SELECT count(*) AS c FROM part GROUP BY p_partkey)
        |  UNION ALL
        |  SELECT 'pk_supplier',
        |         COALESCE(sum(CASE WHEN c > 1 THEN c ELSE 0 END), 0)::BIGINT,
        |         count(*)::BIGINT
        |  FROM (SELECT count(*) AS c FROM supplier GROUP BY s_suppkey)
        |  UNION ALL
        |  SELECT 'fk_lineitem_orders',
        |         (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |            (SELECT 1 FROM orders o
        |             WHERE o.o_orderkey = l.l_orderkey))::BIGINT,
        |         (SELECT count(*) FROM lineitem)::BIGINT
        |  UNION ALL
        |  SELECT 'fk_lineitem_part',
        |         (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |            (SELECT 1 FROM part p
        |             WHERE p.p_partkey = l.l_partkey))::BIGINT,
        |         (SELECT count(*) FROM lineitem)::BIGINT
        |  UNION ALL
        |  SELECT 'fk_orders_customer',
        |         (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |            (SELECT 1 FROM customer c
        |             WHERE c.c_custkey = o.o_custkey))::BIGINT,
        |         (SELECT count(*) FROM orders)::BIGINT
        |  UNION ALL
        |  SELECT 'fk_customer_nation',
        |         (SELECT count(*) FROM customer c WHERE NOT EXISTS
        |            (SELECT 1 FROM nation n
        |             WHERE n.n_nationkey = c.c_nationkey))::BIGINT,
        |         (SELECT count(*) FROM customer)::BIGINT
        |  UNION ALL
        |  SELECT 'fk_supplier_nation',
        |         (SELECT count(*) FROM supplier s WHERE NOT EXISTS
        |            (SELECT 1 FROM nation n
        |             WHERE n.n_nationkey = s.s_nationkey))::BIGINT,
        |         (SELECT count(*) FROM supplier)::BIGINT
        |  UNION ALL
        |  SELECT 'fk_nation_region',
        |         (SELECT count(*) FROM nation n WHERE NOT EXISTS
        |            (SELECT 1 FROM region r
        |             WHERE r.r_regionkey = n.n_regionkey))::BIGINT,
        |         (SELECT count(*) FROM nation)::BIGINT
        |) ORDER BY check_name""".stripMargin,

    // q228: identical exact ntile bucketing (sp, custkey tie-break).
    "q228_decile_mobility" ->
      """WITH s96 AS (
        |  SELECT o_custkey,
        |         ntile(10) OVER (ORDER BY sp, o_custkey) AS dec_1996
        |  FROM (SELECT o_custkey,
        |               sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |                 ::BIGINT AS sp
        |        FROM orders WHERE date_part('year', o_orderdate) = 1996
        |        GROUP BY 1)),
        |s97 AS (
        |  SELECT o_custkey,
        |         ntile(10) OVER (ORDER BY sp, o_custkey) AS dec_1997
        |  FROM (SELECT o_custkey,
        |               sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |                 ::BIGINT AS sp
        |        FROM orders WHERE date_part('year', o_orderdate) = 1997
        |        GROUP BY 1))
        |SELECT dec_1996, dec_1997, count(*)::BIGINT AS n_customers
        |FROM s96 JOIN s97 USING (o_custkey)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q229: isodow (1=Mon..7) matches weekday()+1; permille integer
    // divisions.
    "q229_dow_seasonality" ->
      """WITH d AS (
        |  SELECT event_type, date_part('isodow', ts)::BIGINT AS isodow,
        |         count(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, isodow, n,
        |         sum(n) OVER (PARTITION BY event_type) AS tot
        |  FROM d)
        |SELECT event_type, isodow, n,
        |       (n * 1000 // tot)::BIGINT AS share_permille,
        |       (n * 7000 // tot)::BIGINT AS index_permille
        |FROM t ORDER BY event_type, isodow""".stripMargin,

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

    // q264: identical quadrant classes and churn identity.
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
        |       (COALESCE(lag(n_active) OVER (ORDER BY d), 0)
        |        - n_retained)::BIGINT AS n_churned
        |FROM g ORDER BY day""".stripMargin,

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

    // q269: identical tie-broken ranks, integer U, one sqrt.
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

    "q216_balance_deciles" ->
      """WITH rk AS (
        |  SELECT c_nationkey::BIGINT AS nation,
        |         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c,
        |         row_number() OVER (PARTITION BY c_nationkey
        |           ORDER BY CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT),
        |                    c_custkey) AS r,
        |         count(*) OVER (PARTITION BY c_nationkey) AS n
        |  FROM customer)
        |SELECT nation, least((r - 1) * 10 // n, 9)::BIGINT AS decile,
        |       count(*)::BIGINT AS n_custs,
        |       (sum(bal_c) / 100.0)::DOUBLE AS total_bal
        |FROM rk GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q217_conversion_by_hour" ->
      """WITH s AS (
        |  SELECT user_id, min(ts) AS s_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |p AS (
        |  SELECT user_id, min(ts) AS p_ts FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |j AS (
        |  SELECT hour(s_ts)::BIGINT AS signup_hour,
        |         CASE WHEN p_ts IS NOT NULL AND p_ts > s_ts
        |                   AND epoch_us(p_ts) - epoch_us(s_ts) <= 86400000000
        |              THEN 1 ELSE 0 END AS converted
        |  FROM s LEFT JOIN p ON s.user_id = p.user_id)
        |SELECT signup_hour, count(*)::BIGINT AS n_signups,
        |       sum(converted)::BIGINT AS n_converted,
        |       (sum(converted) * 1000 // count(*))::BIGINT AS conv_permille
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "q218_source_vocab_cosine" ->
      """WITH tok AS (
        |  SELECT source, unnest(list_filter(string_split(lower(text), ' '),
        |           x -> length(x) > 0)) AS tok
        |  FROM documents),
        |tc AS (
        |  SELECT source, tok, count(*)::BIGINT AS c
        |  FROM tok GROUP BY 1, 2),
        |norms AS (
        |  SELECT source, sum(c * c)::BIGINT AS n2 FROM tc GROUP BY 1),
        |dots AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |         sum(a.c * b.c)::BIGINT AS dot
        |  FROM tc a JOIN tc b ON a.tok = b.tok AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b,
        |       floor(dot::DOUBLE / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE))
        |             * 10000 + 0.5) / 10000 AS cos
        |FROM dots
        |JOIN norms na ON na.source = src_a
        |JOIN norms nb ON nb.source = src_b
        |ORDER BY 1, 2""".stripMargin,

    "q213_order_cadence" ->
      """WITH g AS (
        |  SELECT o_custkey,
        |         date_diff('day', lag(o_orderdate) OVER w, o_orderdate)
        |           ::BIGINT AS gap_d
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_orderdate, o_orderkey)),
        |a AS (
        |  SELECT o_custkey, count(*)::BIGINT AS n_gaps,
        |         sum(gap_d)::BIGINT AS s,
        |         sum(gap_d * gap_d)::BIGINT AS s2
        |  FROM g WHERE gap_d IS NOT NULL GROUP BY 1)
        |SELECT o_custkey, n_gaps,
        |       floor(s::DOUBLE / n_gaps::DOUBLE * 10000 + 0.5) / 10000
        |         AS mean_gap_d,
        |       floor(sqrt((n_gaps * s2 - s * s)::DOUBLE) / s::DOUBLE
        |             * 10000 + 0.5) / 10000 AS cv
        |FROM a WHERE n_gaps >= 5 AND s > 0
        |ORDER BY o_custkey""".stripMargin,

    "q214_dominant_type_segments" ->
      """WITH pt AS (
        |  SELECT o_custkey, p_type, sum(l_quantity::BIGINT)::BIGINT AS qty
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON p_partkey = l_partkey
        |  GROUP BY 1, 2),
        |rk AS (
        |  SELECT o_custkey, p_type, qty,
        |         sum(qty) OVER (PARTITION BY o_custkey) AS total_qty,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY qty DESC, p_type) AS rk
        |  FROM pt)
        |SELECT p_type AS dominant_type, count(*)::BIGINT AS n_custs,
        |       (sum(qty) * 1000 // sum(total_qty))::BIGINT
        |         AS avg_share_permille
        |FROM rk WHERE rk = 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q215_trade_flow_matrix" ->
      """SELECT cr.r_name AS cust_region, sr.r_name AS supp_region,
        |       (sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100
        |                       + 0.5) AS BIGINT)) / 100.0)::DOUBLE
        |         AS revenue,
        |       count(*)::BIGINT AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region cr ON cn.n_regionkey = cr.r_regionkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN region sr ON sn.n_regionkey = sr.r_regionkey
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q211_cold_parts" ->
      """WITH mx AS (SELECT max(l_shipdate) AS t_max FROM lineitem),
        |ok AS (SELECT DISTINCT l_partkey FROM lineitem, mx
        |       WHERE l_shipdate > t_max - INTERVAL 60 DAY),
        |p AS (
        |  SELECT p_partkey, p_brand, p_size,
        |         (l_partkey IS NOT NULL) AS is_ordered
        |  FROM part LEFT JOIN ok ON p_partkey = l_partkey),
        |c AS (
        |  SELECT p_partkey, p_brand, p_size, is_ordered,
        |    last_value(CASE WHEN is_ordered THEN p_size END IGNORE NULLS)
        |      OVER (PARTITION BY p_brand ORDER BY p_size ASC, p_partkey ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS below_s,
        |    last_value(CASE WHEN is_ordered THEN p_partkey END IGNORE NULLS)
        |      OVER (PARTITION BY p_brand ORDER BY p_size ASC, p_partkey ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS below_k,
        |    last_value(CASE WHEN is_ordered THEN p_size END IGNORE NULLS)
        |      OVER (PARTITION BY p_brand ORDER BY p_size DESC, p_partkey DESC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS above_s,
        |    last_value(CASE WHEN is_ordered THEN p_partkey END IGNORE NULLS)
        |      OVER (PARTITION BY p_brand ORDER BY p_size DESC, p_partkey DESC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS above_k
        |  FROM p),
        |pick AS (
        |  SELECT p_partkey, p_brand, p_size,
        |    CASE WHEN below_s IS NULL THEN above_k
        |         WHEN above_s IS NULL THEN below_k
        |         WHEN p_size - below_s <= above_s - p_size THEN below_k
        |         ELSE above_k END AS nearest_partkey,
        |    CASE WHEN below_s IS NULL THEN above_s
        |         WHEN above_s IS NULL THEN below_s
        |         WHEN p_size - below_s <= above_s - p_size THEN below_s
        |         ELSE above_s END AS nearest_size
        |  FROM c WHERE NOT is_ordered)
        |SELECT p_partkey, p_brand, p_size, nearest_partkey,
        |       nearest_size,
        |       abs(nearest_size - p_size) AS size_gap
        |FROM pick ORDER BY p_partkey""".stripMargin,

    "q212_supplier_attrition" ->
      """WITH mx AS (SELECT max(l_shipdate) AS t_max FROM lineitem)
        |SELECT l_suppkey, count(*)::BIGINT AS n_lines,
        |       date_diff('day', max(l_shipdate), t_max)::BIGINT
        |         AS days_idle
        |FROM lineitem, mx
        |GROUP BY l_suppkey, t_max
        |ORDER BY days_idle DESC, l_suppkey
        |LIMIT 10""".stripMargin,

    "q209_rfm_segmentation" ->
      """WITH mx AS (SELECT max(o_orderdate) AS t_max FROM orders),
        |rfm AS (
        |  SELECT o_custkey,
        |         date_diff('day', max(o_orderdate), t_max)::BIGINT AS r,
        |         count(*)::BIGINT AS f,
        |         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           ::BIGINT AS m_c
        |  FROM orders, mx GROUP BY o_custkey, t_max),
        |sc AS (
        |  SELECT o_custkey, r, f, m_c,
        |         6 - ntile(5) OVER (ORDER BY r ASC, o_custkey) AS score_r,
        |         6 - ntile(5) OVER (ORDER BY f DESC, o_custkey) AS score_f,
        |         6 - ntile(5) OVER (ORDER BY m_c DESC, o_custkey) AS score_m
        |  FROM rfm),
        |seg AS (
        |  SELECT r, m_c,
        |         CASE WHEN score_r >= 4 AND score_f >= 4 THEN 'champion'
        |              WHEN score_r >= 4 AND score_f < 4 THEN 'recent'
        |              WHEN score_r <= 2 AND score_f >= 4 THEN 'at_risk'
        |              WHEN score_r <= 2 AND score_f <= 2 THEN 'lost'
        |              ELSE 'regular' END AS segment
        |  FROM sc)
        |SELECT segment, count(*)::BIGINT AS n_custs,
        |       (sum(m_c) / 100.0)::DOUBLE AS monetary,
        |       floor(sum(r)::DOUBLE / count(*)::DOUBLE * 10000 + 0.5)
        |         / 10000 AS avg_recency_days
        |FROM seg GROUP BY 1 ORDER BY 1""".stripMargin,

    "q210_discount_lift" ->
      """WITH pb AS (
        |  SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc_pct,
        |         count(*)::BIGINT AS n_items,
        |         sum(l_quantity::BIGINT)::BIGINT AS qty
        |  FROM lineitem GROUP BY 1),
        |base AS (SELECT n_items AS n0, qty AS q0 FROM pb WHERE disc_pct = 0)
        |SELECT disc_pct, n_items,
        |       floor(qty::DOUBLE / n_items::DOUBLE * 10000 + 0.5) / 10000
        |         AS avg_qty,
        |       (qty * n0 * 1000 // (n_items * q0))::BIGINT AS lift_permille
        |FROM pb, base
        |ORDER BY disc_pct""".stripMargin,

    "q206_abc_classification" ->
      """WITH pp AS (
        |  SELECT l_partkey,
        |         sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100
        |                        + 0.5) AS BIGINT))::BIGINT AS rev_c
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT sum(rev_c)::HUGEINT AS total_c FROM pp),
        |c AS (
        |  SELECT rev_c,
        |         (sum(rev_c) OVER (ORDER BY rev_c DESC, l_partkey
        |            ROWS UNBOUNDED PRECEDING)::HUGEINT * 1000000
        |            // total_c)::BIGINT AS cum_ppm
        |  FROM pp, tot),
        |cl AS (
        |  SELECT rev_c, cum_ppm,
        |         CASE WHEN cum_ppm <= 800000 THEN 'A'
        |              WHEN cum_ppm <= 950000 THEN 'B'
        |              ELSE 'C' END AS abc_class
        |  FROM c)
        |SELECT abc_class, count(*)::BIGINT AS n_parts,
        |       (sum(rev_c) / 100.0)::DOUBLE AS revenue,
        |       min(cum_ppm)::BIGINT AS min_cum_ppm,
        |       max(cum_ppm)::BIGINT AS max_cum_ppm
        |FROM cl GROUP BY 1 ORDER BY 1""".stripMargin,

    "q207_demand_acceleration" ->
      """WITH mx AS (SELECT max(l_shipdate) AS t_max FROM lineitem),
        |agg AS (
        |  SELECT l_partkey,
        |         sum(CASE WHEN l_shipdate > t_max - INTERVAL 7 DAY
        |                  THEN l_quantity::BIGINT ELSE 0 END)::BIGINT AS q7,
        |         sum(CASE WHEN l_shipdate <= t_max - INTERVAL 7 DAY
        |                  THEN l_quantity::BIGINT ELSE 0 END)::BIGINT AS q28
        |  FROM lineitem, mx
        |  WHERE l_shipdate > t_max - INTERVAL 35 DAY
        |  GROUP BY 1)
        |SELECT l_partkey, q7, q28,
        |       (q7 * 28 * 1000 // (q28 * 7))::BIGINT AS accel_permille
        |FROM agg
        |WHERE q28 > 0 AND q7 * 28 > q28 * 14
        |ORDER BY accel_permille DESC, l_partkey
        |LIMIT 30""".stripMargin,

    "q208_double_charges" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts,
        |         CAST(floor(value) AS BIGINT) AS amount_d,
        |         lag(event_id) OVER w AS prev_id,
        |         (epoch_us(ts) - epoch_us(lag(ts) OVER w))
        |           // 1000000 AS gap_s
        |  FROM events
        |  WHERE event_type = 'purchase' AND value IS NOT NULL
        |  WINDOW w AS (PARTITION BY user_id, CAST(floor(value) AS BIGINT)
        |               ORDER BY ts, event_id))
        |SELECT user_id, event_id AS dup_event_id,
        |       prev_id AS orig_event_id, amount_d,
        |       gap_s::BIGINT AS gap_s
        |FROM o
        |WHERE prev_id IS NOT NULL AND gap_s <= 604800
        |ORDER BY user_id, dup_event_id""".stripMargin,

    "q204_event_runs" ->
      """WITH isl AS (
        |  SELECT user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id)
        |         - row_number() OVER (PARTITION BY user_id, event_type
        |                              ORDER BY ts, event_id) AS island
        |  FROM events),
        |runs AS (
        |  SELECT user_id, event_type, island, count(*)::BIGINT AS run_len
        |  FROM isl GROUP BY 1, 2, 3)
        |SELECT event_type, count(*)::BIGINT AS n_runs,
        |       max(run_len)::BIGINT AS max_run,
        |       floor(sum(run_len)::DOUBLE / count(*)::DOUBLE * 10000
        |             + 0.5) / 10000 AS avg_run
        |FROM runs GROUP BY 1 ORDER BY 1""".stripMargin,

    "q205_coordinated_pairs" ->
      """WITH um AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 60000000 AS minute
        |  FROM events),
        |capped AS (
        |  SELECT user_id, minute FROM (
        |    SELECT user_id, minute,
        |           count(*) OVER (PARTITION BY minute) AS m_n
        |    FROM um)
        |  WHERE m_n <= 50)
        |SELECT a.user_id AS user_a, b.user_id AS user_b,
        |       count(*)::BIGINT AS n_shared_minutes
        |FROM capped a JOIN capped b
        |  ON a.minute = b.minute AND a.user_id < b.user_id
        |GROUP BY 1, 2
        |HAVING count(*) >= 3
        |ORDER BY n_shared_minutes DESC, user_a, user_b
        |LIMIT 50""".stripMargin,

    "q203_gap_percentiles" ->
      """WITH g AS (
        |  SELECT event_type, event_id,
        |         ((epoch_us(ts) - epoch_us(lag(ts) OVER w)) // 1000000)
        |           ::BIGINT AS gap_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
        |r AS (
        |  SELECT event_type, gap_s,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY gap_s, event_id) AS rk,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM g WHERE gap_s IS NOT NULL)
        |SELECT event_type, max(n)::BIGINT AS n_gaps,
        |       max(CASE WHEN rk = (n - 1) * 50 // 100 + 1
        |                THEN gap_s END)::BIGINT AS p50_s,
        |       max(CASE WHEN rk = (n - 1) * 90 // 100 + 1
        |                THEN gap_s END)::BIGINT AS p90_s,
        |       max(CASE WHEN rk = (n - 1) * 99 // 100 + 1
        |                THEN gap_s END)::BIGINT AS p99_s
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,

    // q201: every format row must equal the parquet truth — the
    // oracle emits the same digest four times.
    "q201_format_consistency" ->
      """WITH d AS (
        |  SELECT count(*)::BIGINT AS n_docs,
        |         sum(length(text))::BIGINT AS sum_chars,
        |         count(DISTINCT md5(text))::BIGINT AS n_texts,
        |         sum(('0x' || substring(md5(text), 1, 8))::BIGINT)::BIGINT
        |           AS digest_sum
        |  FROM documents)
        |SELECT f.format, n_docs, sum_chars, n_texts, digest_sum
        |FROM (VALUES ('avro'), ('jsonl'), ('orc'), ('warc')) f(format), d
        |ORDER BY f.format""".stripMargin,

    "q202_trimmed_mean" ->
      """WITH rk AS (
        |  SELECT source, n_chars,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY n_chars, doc_id) AS rk,
        |         count(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        |SELECT source, count(*)::BIGINT AS n_kept,
        |       floor(sum(n_chars)::DOUBLE / count(*)::DOUBLE * 10000
        |             + 0.5) / 10000 AS trimmed_mean_chars
        |FROM rk
        |WHERE rk > n // 10 AND rk <= n - n // 10
        |GROUP BY source ORDER BY source""".stripMargin,

    "q198_epoch_interleave" ->
      """WITH si AS (
        |  SELECT source, row_number() OVER (ORDER BY source) - 1 AS src_idx
        |  FROM (SELECT DISTINCT source FROM documents)),
        |ns AS (SELECT count(*)::BIGINT AS n_src FROM si),
        |rk AS (
        |  SELECT doc_id, source,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY md5(text), doc_id) AS r
        |  FROM documents)
        |SELECT doc_id, rk.source, rk.r::BIGINT AS r,
        |       ((rk.r - 1) * n_src + src_idx)::BIGINT AS epoch_key
        |FROM rk JOIN si ON si.source = rk.source, ns
        |ORDER BY epoch_key""".stripMargin,

    // q199/q200: the same exact-integer rule set, mirrored with the
    // q22 oracle's count formulas.
    "q199_quality_gate" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(lower(text), ' '),
        |        x -> length(x) > 0))::BIGINT AS n_tok,
        |    length(text)::BIGINT AS n_chars,
        |    length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::BIGINT
        |      AS n_alpha,
        |    length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::BIGINT
        |      AS n_punct,
        |    len(list_filter(string_split(lower(text), ' '),
        |        x -> x IN ('the','a','of','and','in','to','is','it',
        |                   'that','for')))::BIGINT AS n_stop,
        |    len(list_transform(range(1,
        |        len(list_filter(string_split(lower(text),' '),
        |            x -> length(x) > 0)) - 1),
        |      i -> array_to_string(list_filter(string_split(lower(text),' '),
        |            x -> length(x) > 0)[i:i+2], ' ')))::BIGINT AS n_tri,
        |    len(list_distinct(list_transform(range(1,
        |        len(list_filter(string_split(lower(text),' '),
        |            x -> length(x) > 0)) - 1),
        |      i -> array_to_string(list_filter(string_split(lower(text),' '),
        |            x -> length(x) > 0)[i:i+2], ' '))))::BIGINT AS n_tri_d
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, n_tok, n_chars,
        |    (CASE WHEN n_tok < 5 THEN 1 ELSE 0 END
        |     + CASE WHEN n_alpha * 1000 < n_chars * 600 THEN 2 ELSE 0 END
        |     + CASE WHEN n_punct * 1000 > n_chars * 100 THEN 4 ELSE 0 END
        |     + CASE WHEN n_stop = 0 THEN 8 ELSE 0 END
        |     + CASE WHEN n_tri > 0 AND n_tri_d * 1000 < n_tri * 800
        |            THEN 16 ELSE 0 END)::BIGINT AS reason_mask
        |  FROM m)
        |SELECT doc_id, n_tok AS n_tokens, n_chars, reason_mask,
        |       (reason_mask = 0) AS kept
        |FROM v ORDER BY doc_id""".stripMargin,

    "q200_clean_pipeline" ->
      """WITH t AS (
        |  SELECT doc_id, source, text,
        |    list_filter(string_split(lower(text), ' '),
        |        x -> length(x) > 0) AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, source, text, len(toks)::BIGINT AS n_tok,
        |    length(text)::BIGINT AS n_chars,
        |    length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::BIGINT
        |      AS n_alpha,
        |    length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::BIGINT
        |      AS n_punct,
        |    len(list_filter(toks,
        |        x -> x IN ('the','a','of','and','in','to','is','it',
        |                   'that','for')))::BIGINT AS n_stop,
        |    len(list_transform(range(1, len(toks) - 1),
        |        i -> array_to_string(toks[i:i+2], ' ')))::BIGINT AS n_tri,
        |    len(list_distinct(list_transform(range(1, len(toks) - 1),
        |        i -> array_to_string(toks[i:i+2], ' '))))::BIGINT AS n_tri_d
        |  FROM t),
        |clean AS (
        |  SELECT doc_id, source, text, n_tok
        |  FROM m
        |  WHERE n_tok >= 5 AND n_alpha * 1000 >= n_chars * 600
        |    AND n_punct * 1000 <= n_chars * 100 AND n_stop > 0
        |    AND NOT (n_tri > 0 AND n_tri_d * 1000 < n_tri * 800)),
        |surv AS (
        |  SELECT doc_id, source, text, n_tok
        |  FROM (SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS sv
        |        FROM clean)
        |  WHERE doc_id = sv),
        |fill AS (
        |  SELECT doc_id, source, n_tok,
        |         ('0x' || substring(md5(text), 1, 8))::BIGINT AS priority
        |  FROM surv)
        |SELECT doc_id, source, n_tok AS n_tokens,
        |       sum(n_tok) OVER (PARTITION BY source
        |                        ORDER BY priority, doc_id
        |                        ROWS UNBOUNDED PRECEDING)::BIGINT
        |         AS cum_tokens,
        |       (sum(n_tok) OVER (PARTITION BY source
        |                         ORDER BY priority, doc_id
        |                         ROWS UNBOUNDED PRECEDING) <= 800)
        |         AS kept
        |FROM fill ORDER BY doc_id""".stripMargin,

    // q197: the WARC round-trip must reproduce the parquet truth,
    // char counts recomputed from the decoded payload.
    "q197_warc_roundtrip" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
        |       sum(length(text))::BIGINT AS sum_chars,
        |       count(DISTINCT md5(text))::BIGINT AS n_distinct_texts
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q196_generalization_ladder" ->
      """SELECT band_width, n_groups, n_risky, (n_risky = 0) AS compliant
        |FROM (
        |  SELECT w.band_width, count(*)::BIGINT AS n_groups,
        |         sum(CASE WHEN n < 5 THEN 1 ELSE 0 END)::BIGINT AS n_risky
        |  FROM (VALUES (1000), (5000), (10000)) w(band_width),
        |  LATERAL (
        |    SELECT count(*)::BIGINT AS n
        |    FROM customer
        |    GROUP BY c_nationkey, c_mktsegment,
        |             floor(c_acctbal / w.band_width)) g
        |  GROUP BY 1)
        |ORDER BY band_width""".stripMargin,
  )
}
