package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins (absent from the reference — SURVEY.md §2.5
  * lists them as a gap; an engine needs them for event-correlation
  * pipelines). Spark requires watermarks on both sides plus a time
  * bound in the join condition so each side's buffered state is
  * droppable — state is bounded by (watermark delay + interval) per
  * key, which is what makes this runnable forever at scale.
  */
object StreamJoins {

  /** Interval inner join: left events matched to right events of the
    * same key with right.ts in [left.ts - within, left.ts].
    * Both inputs must carry the given key/ts columns; output has
    * left.* and right columns prefixed `r_`.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   key: String, tsCol: String,
                   watermarkDelay: String, within: String): DataFrame = {
    val l = left.withWatermark(tsCol, watermarkDelay).alias("l")
    val rPrefixed = right.columns.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, s"r_$c")
    }
    val r = rPrefixed.withWatermark(s"r_$tsCol", watermarkDelay).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.r_$key") &&
        col(s"r.r_$tsCol") >= col(s"l.$tsCol") - expr(s"INTERVAL $within") &&
        col(s"r.r_$tsCol") <= col(s"l.$tsCol"))
  }
}
