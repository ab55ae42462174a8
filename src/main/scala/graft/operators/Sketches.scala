package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TextFunctions}

/** Bounded-memory sketch operators. The relational formulation IS the
  * sketch at Spark scale: a groupBy over a fixed (depth × width) key
  * space partial-aggregates map-side, so each task reduces its slice of
  * the corpus to at most depth·width counter rows before the shuffle —
  * exactly a per-partition sketch followed by a sketch merge, but
  * expressed declaratively so Catalyst keeps it inside
  * whole-stage codegen (no UDAF buffer serialization).
  */
object Sketches {

  /** Count-min sketch over the corpus token stream, reported on the
    * exact top-`k` tokens so the estimate sits next to its ground
    * truth: (token, exact count, CMS estimate). The estimate
    * upper-bounds the truth (one-sided error); with width 1024 and
    * depth 4 the expected overcount is ≤ e·N/width per row, and the
    * min across 4 independent rows concentrates sharply.
    *
    * Scale: the token explode never shuffles raw tokens for the
    * counters — partial aggregation collapses each partition to
    * ≤ depth·width rows (the per-partition sketch), the exchange moves
    * only merged counters. The exact side is one token shuffle (needed
    * here only to verify the sketch; production keeps the sketch and
    * drops the exact pass).
    */
  def cmsHeavyHitters(spark: SparkSession, documents: DataFrame,
                      depth: Int = 4, width: Int = 1024,
                      k: Int = 50): DataFrame = {
    GraftFunctions.register(spark)
    val toks = documents
      .select(explode(TextFunctions.wsTokens(col("text"))).as("token"))
    val rows = spark.range(depth).select(col("id").as("r"))
    def cell(token: org.apache.spark.sql.Column) =
      pmod(GraftFunctions.hash64Seeded(col("r"), token), lit(width.toLong))

    // depth copies of the token stream -> (row, cell) counters; the
    // groupBy's map-side combine is the per-partition sketch build
    val counters = toks.crossJoin(broadcast(rows))
      .select(col("r"), cell(col("token")).as("cell"))
      .groupBy(col("r"), col("cell"))
      .agg(count(lit(1)).as("c"))

    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val top = exact.orderBy(col("cnt").desc, col("token").asc).limit(k)

    top.crossJoin(broadcast(rows))
      .select(col("token"), col("cnt"), col("r"),
        cell(col("token")).as("cell"))
      .join(broadcast(counters), Seq("r", "cell"))
      .groupBy(col("token"), col("cnt"))
      .agg(min(col("c")).as("est_cms"))
      .select(col("token"), col("cnt"), col("est_cms"))
  }

  /** One-pass mergeable quantile estimation via a fixed-width
    * histogram: per group, bin counts (bin = floor(value/width)) are
    * the sketch state — trivially mergeable (vector add), built with
    * map-side partial aggregation so the shuffle carries at most
    * (groups × occupied bins) counter rows regardless of input size.
    * Each requested quantile q is answered with the inclusive upper
    * edge of the first bin whose cumulative count reaches ceil(q·n) —
    * the inverse-CDF rank definition — giving a deterministic
    * estimate within one `width` of the exact order statistic
    * (spec-asserted against the exact percentile).
    *
    * This is the 100 TB path where q33's exact interpolated
    * percentiles (a full sort per group) stop being affordable: the
    * histogram needs one narrow shuffle and no sort of the data, only
    * of the ≤|bins| counter rows inside each group's window. All
    * arithmetic is exact (integer counts, literal·integer edges), so
    * the oracle matches bit-for-bit.
    */
  def histogramQuantiles(df: DataFrame, valueCol: String, groupCol: String,
                         width: Double = 1000.0,
                         qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bins = df
      .groupBy(col(groupCol).as("grp"),
        floor(col(valueCol) / lit(width)).cast("long").as("bin"))
      .agg(count(lit(1)).as("cnt"))
    val wAll = Window.partitionBy(col("grp"))
    val wCum = wAll.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = bins
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    val picks = qs.map { q =>
      min(when(col("cum") >= ceil(lit(q) * col("n")),
        (col("bin") + lit(1)) * lit(width))).as(s"p${(q * 100).round}")
    }
    c.groupBy(col("grp"))
      .agg(max(col("n")).as("n"), picks: _*)
  }
}
