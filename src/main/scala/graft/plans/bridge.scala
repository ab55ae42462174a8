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

  /** Replace the origin statistics a checkpoint carries over with the
    * MEASURED size of the materialized blocks.
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
    *
    * Since the checkpoint is EAGER, the real block sizes are already
    * known to the block manager — so rather than dropping the stats
    * (which would also forfeit in-loop broadcast decisions: a small
    * rank/label table must keep broadcasting), the LogicalRDD is
    * rebuilt with `sizeInBytes` = the measured storage footprint,
    * which is both bounded (no compounding) and MORE accurate than
    * any estimate. Falls back to no stats if the blocks can't be
    * found (e.g. a non-eager checkpoint).
    */
  def dropCheckpointStats(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.Statistics
    import org.apache.spark.sql.execution.LogicalRDD
    df.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val sess = df.sparkSession.asInstanceOf[SparkSession]
        val measured = sess.sparkContext.getRDDStorageInfo
          .find(_.id == l.rdd.id)
          .map(i => Statistics(sizeInBytes = BigInt(i.memSize + i.diskSize).max(1)))
        Dataset.ofRows(sess,
          LogicalRDD(l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
            l.isStreaming, l.stream)(sess, measured, None))
      case _ => df
    }
  }

  /** Deterministically free the materialized blocks of a
    * localCheckpoint'd frame. `Dataset.unpersist` only talks to the
    * CacheManager (persist/cache registrations); a localCheckpoint
    * materializes at the RDD level and never registers there, so a
    * Dataset-level `unpersist()` on a checkpointed frame is a SILENT
    * NO-OP — the blocks linger until the driver GCs the Dataset and
    * the ContextCleaner reaps the RDD, i.e. storage grows with round
    * count in an iterative loop. This drops the underlying
    * checkpointed RDD's blocks directly. DANGER: the frame's lineage
    * was truncated at checkpoint time, so any plan still referencing
    * it fails with missing blocks — call only once every dependent
    * plan is materialized (the GraphOps loops' discipline).
    */
  def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
