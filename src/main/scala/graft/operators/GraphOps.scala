package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed graph primitives for the dedup pipeline — the step AFTER
  * pair generation: near-dup pairs (q17/q36/q37) form an undirected
  * graph, and keeping one canonical document per connected component is
  * what actually shrinks the corpus (pairwise survivors alone
  * over-delete: A~B and B~C must collapse to ONE survivor even when
  * A~C was never emitted).
  *
  * Algorithm: iterative min-label propagation — each vertex repeatedly
  * adopts the minimum label among itself and its neighbors until a
  * fixpoint. Every iteration is one shuffle on the vertex id;
  * convergence takes `diameter(component)` rounds. Near-dup components
  * are dense and tiny (near-cliques of template/boilerplate variants),
  * so diameter is single-digit in practice — for adversarial
  * long-chain graphs the log-round alternating star-contraction of
  * Kiveris et al. ("Connected Components in MapReduce and Beyond",
  * SoCC'14) is the drop-in upgrade; the per-round dataflow here (join →
  * groupBy-min) is the same building block.
  *
  * Scale posture: state per round is one (vertex, label) row per vertex
  * and the edge list — both spill-able, nothing driver-side but the
  * converged? flag (a count). Each round's labels are materialized with
  * an eager localCheckpoint: without lineage truncation the logical
  * plan doubles per round (labels feeds both the join and the union)
  * and planning itself goes exponential — the classic iterative-Spark
  * trap; on a cluster with an HDFS checkpoint dir, `checkpoint()` is
  * the fault-tolerant drop-in. Peak footprint is two label generations
  * regardless of round count (the previous round is unpersisted).
  */
object GraphOps {

  /** Connected components of the undirected graph given by `pairs`
    * (columns `doc_a`, `doc_b`; each undirected edge once). Returns one
    * row per vertex that appears in an edge: (doc_id, cluster_id) with
    * cluster_id = the component's minimum vertex id. Deterministic:
    * min-label is order- and partitioning-independent.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    // materialized once; every round re-reads the cached edge list
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(true)

    var labels = edges.select(col("src").as("v")).distinct()
      .withColumn("label", col("v"))
      .localCheckpoint(true)

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // each neighbor offers its current label; a vertex keeps the min
      // of its own label and all offers (one shuffle: the groupBy on v)
      val offers = edges
        .join(labels.withColumnRenamed("v", "src"), "src")
        .select(col("dst").as("v"), col("label"))
      // eager checkpoint: materializes THIS round and cuts the plan to
      // the materialized RDD, so round N+1 plans against a flat scan
      val next = labels.union(offers)
        .groupBy(col("v"))
        .agg(min(col("label")).as("label"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnsRenamed(
          Map("label" -> "old_label")), "v")
        .filter(col("label") < col("old_label"))
        .count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    labels.select(col("v").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Near-dup clusters with sizes: connected components of the pair
    * graph plus the component population (window count — rides the
    * cluster_id sort the output wants anyway).
    */
  def dedupClusters(pairs: DataFrame, maxIter: Int = 50): DataFrame =
    connectedComponents(pairs, maxIter)
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
}
