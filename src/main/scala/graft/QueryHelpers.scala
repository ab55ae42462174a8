package graft

import org.apache.spark.sql.functions._

/** Shared fixtures and deterministic-rounding helpers used by the
  * query registries (split out of SparkEntry in round 9; semantics
  * unchanged).
  */
private[graft] object QueryHelpers {

  /** Render a timestamp column as a canonical UTC string — sidesteps
    * parquet timestamp physical-type (ns/us/INT96) mismatches between
    * Spark output and DuckDB oracle output.
    */
  private[graft] def tsStr(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Binary-arithmetic rounding (floor(x*10^n + 0.5)/10^n) — identical
    * on Spark and DuckDB because both evaluate it on the raw double.
    * Spark's round() goes through the decimal string representation
    * (BigDecimal HALF_UP) and disagrees with C-style engines on exact
    * .5 boundaries of the binary value.
    */
  private[graft] def r2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * 100 + lit(0.5)) / 100
  private[graft] def r4(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
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

  /** q98's fixed retrieval workload (mirrored as a VALUES clause in the
    * oracle) — in production the query table is whatever arrives, the
    * plan shape is identical.
    */
  private[graft] val bm25Queries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("join", "hash"),
    2L -> Seq("stream", "window"),
    3L -> Seq("spark", "filter", "scan"),
    4L -> Seq("customer", "batch"))
}
