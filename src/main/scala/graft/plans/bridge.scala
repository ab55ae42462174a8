package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the classic Dataset constructor (private[sql]) —
  * the standard pattern for libraries that inject custom LogicalPlans.
  */
object GraftPlanBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  /** Column ↔ Expression conversions (private[sql] in Spark 4). */
  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    ExpressionUtils.expression(c)
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    ExpressionUtils.column(e)

  /** Drop the origin statistics a checkpoint carries over.
    *
    * `Dataset.localCheckpoint` truncates LINEAGE but copies the
    * optimized plan's estimated `Statistics` onto the resulting
    * `LogicalRDD`. In an iterative loop (PageRank, connected
    * components) each round's estimate is a PRODUCT of the previous
    * round's (join/cross-join size estimation multiplies child sizes),
    * so the `BigInt` sizeInBytes estimate grows GEOMETRICALLY in digit
    * count round over round — by round ~15 the driver spends its time
    * in hundreds-of-MB BigInteger multiplications inside
    * SizeInBytesOnlyStatsPlanVisitor and the job effectively stalls.
    * Rebuilding the LogicalRDD with `originStats = None` resets each
    * round to the default estimate and keeps round cost flat; the
    * RDD/partitioning/ordering (the actual checkpoint) are untouched.
    * Loops that broadcast their small sides explicitly lose nothing.
    */
  def dropCheckpointStats(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.execution.LogicalRDD
    df.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val sess = df.sparkSession.asInstanceOf[SparkSession]
        Dataset.ofRows(sess,
          LogicalRDD(l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
            l.isStreaming, l.stream)(sess, None, None))
      case _ => df
    }
  }
}
