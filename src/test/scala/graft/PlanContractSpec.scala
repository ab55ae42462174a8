package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Relational, Similarity, Sketches}
import graft.sources.Tables

/** Plan CONTRACTS for the round-5 operators: the scale claims in
  * SCALING.md asserted against the actual physical plan, so a
  * regression that silently adds an exchange (or pushes an aggregate
  * to the reduce side) fails CI instead of surviving until someone
  * reads an explain output. Same spirit as ScaleOpsSpec's
  * zero-exchange bucketed-join assertions.
  */
class PlanContractSpec extends SparkSpec {

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def countOccurrences(s: String, sub: String): Int =
    s.sliding(sub.length).count(_ == sub)

  test("q122 SCD2: both window passes share ONE hash exchange") {
    val plan = physical(Relational.scd2History(Tables.orders(spark, sf001)))
    assert(countOccurrences(plan, "Exchange hashpartitioning") == 1,
      s"expected exactly one hash exchange:\n$plan")
    assert(countOccurrences(plan, "Window") >= 2, "two window passes expected")
  }

  test("q123 random projection: zero exchanges — pure map") {
    val plan = physical(
      Similarity.randomProjection(Tables.embeddings(spark, sf001)))
    assert(!plan.contains("Exchange"),
      s"projection must not shuffle:\n$plan")
  }

  test("q126 SpaceSaving: sketch partial-aggregates BEFORE the exchange") {
    val df = Sketches.spaceSavingTopTokens(spark, Tables.documents(spark, sf001))
    val plan = physical(df)
    // the map-side ObjectHashAggregate must appear below (later in the
    // tree string = closer to the scan than) the exchange it feeds
    val firstAgg = plan.indexOf("ObjectHashAggregate")
    val lastAgg = plan.lastIndexOf("ObjectHashAggregate")
    val exch = plan.indexOf("Exchange hashpartitioning")
    assert(firstAgg >= 0 && lastAgg > firstAgg && exch > firstAgg && exch < lastAgg,
      s"expected partial ObjectHashAggregate on both sides of the exchange:\n$plan")
  }

  test("q124 hard negatives: corpus side joins without shuffling (broadcast anchors)") {
    val emb = Tables.embeddings(spark, sf001)
    val out = Similarity.hardNegatives(spark, emb, emb.filter(col("vec_id") < 3), 5)
    val plan = physical(out)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"anchors must broadcast:\n$plan")
    // the only hash exchange allowed is the per-anchor ranking window
    assert(countOccurrences(plan, "Exchange hashpartitioning") <= 1,
      s"corpus must not shuffle for the join:\n$plan")
  }
}
