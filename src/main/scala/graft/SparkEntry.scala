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

  /** Tests reach the BM25 workload through SparkEntry; the definition
    * lives with the other shared fixtures in [[QueryHelpers]].
    */
  private[graft] val bm25Queries: Seq[(Long, Seq[String])] =
    QueryHelpers.bm25Queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_price_alerts_dsl")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 — merged from
    * the per-family registries under graft/queries/ (round-9 split of
    * the former 13.7k-line single file; keys and semantics unchanged,
    * no duplicate keys across registries — enforced by RegistrySpec).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++
    RelationalOpQueries.queries ++
    DedupQueries.queries ++
    SimilarityQueries.queries ++
    TextQueries.queries ++
    MultimodalQueries.queries ++
    StatsQueriesA.queries ++
    SketchQueries.queries ++
    GraphQueries.queries ++
    FormatQueries.queries ++
    TimeSeriesQueries.queries ++
    StatsQueriesB.queries ++
    StatsQueriesC.queries ++
    StatsQueriesD.queries ++
    StatsQueriesE.queries

  /** Bench-only twins: timed by [[Bench]] alongside `queries` but
    * NEVER part of the declared correctness surface — each exercises a
    * production path whose accuracy contract lives in the spec tier,
    * so the invariant "every `queries` entry is hash-certified" stays
    * intact while the path still gets a round-over-round wall-time
    * number in BENCH_r{N}.json.
    */
  val benchQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q61's PRODUCTION stopping rule: early-exit instead of the
    // oracle-pinned 10 rounds (the fixed count exists only because the
    // DuckDB oracle unrolls exactly 10). relTol thresholds the
    // NORMALIZED rank n·pr, the scale-invariant form (the r15 curve
    // caught absolute tol=3e-4 degenerating from 6 rounds at sf0.1 to
    // 1 round on the 10× graph — at production node counts it would
    // never iterate); relTol=4.8 ≡ the old 3e-4 at sf0.1's ~16k nodes,
    // so the twin exits at round ~6 at EVERY self-similar SF. The
    // ε·d/(1−d) distance bound vs the run-to-cap reference is
    // property-tested in GraphOpsSpec.
    "q61_pagerank_tol" -> ((s, dir) => {
      val edges = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (lit(100000L) + col("l_suppkey")).as("dst"))
      GraphOps.pageRank(edges, iters = 10, relTol = 4.8)
        .select(col("v").as("node_id"), col("pr").as("pagerank"))
        .orderBy("node_id")
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++
    RelationalOpQueries.oracleSql ++
    DedupQueries.oracleSql ++
    SimilarityQueries.oracleSql ++
    TextQueries.oracleSql ++
    MultimodalQueries.oracleSql ++
    StatsQueriesA.oracleSql ++
    SketchQueries.oracleSql ++
    GraphQueries.oracleSql ++
    FormatQueries.oracleSql ++
    TimeSeriesQueries.oracleSql ++
    StatsQueriesB.oracleSql ++
    StatsQueriesC.oracleSql ++
    StatsQueriesD.oracleSql ++
    StatsQueriesE.oracleSql
}
