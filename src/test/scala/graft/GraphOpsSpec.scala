package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: (Long, Long)*) =
    rows.toDF("doc_a", "doc_b")

  test("connected components labels each vertex with its component min") {
    // two components: a 4-chain {1,2,3,4} and a triangle {10,11,12}
    val out = GraphOps.connectedComponents(pairs(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("long chain converges past a single propagation round") {
    // a 12-vertex path needs ~11 rounds of one-hop min propagation:
    // proves the fixpoint loop iterates until convergence, not once
    val chain = (1L until 12L).map(i => (i, i + 1))
    val out = GraphOps.connectedComponents(pairs(chain: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 12 && out.values.forall(_ == 1L))
  }

  test("pointer jumping converges a 64-vertex path in O(log n) rounds") {
    // propagation alone needs 63 rounds on a 64-path; path halving
    // must land far under that (each round: one hop + one jump)
    val chain = (1L until 64L).map(i => (i, i + 1))
    val (labels, iters) = GraphOps.ccWithStats(pairs(chain: _*))
    val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 64 && out.values.forall(_ == 1L))
    assert(iters <= 12, s"expected O(log n) rounds on a 64-path, took $iters")
  }

  test("cluster sizes count the full component") {
    val out = GraphOps.dedupClusters(pairs(
      (5L, 6L), (6L, 7L), (20L, 21L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((5L, 5L, 3L), (6L, 5L, 3L), (7L, 5L, 3L),
      (20L, 20L, 2L), (21L, 20L, 2L)))
  }

  test("vertices with no edges do not appear; result is deterministic under repartition") {
    val p = pairs((3L, 9L), (9L, 4L)).repartition(7)
    val a = GraphOps.connectedComponents(p).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == Seq((3L, 3L), (4L, 3L), (9L, 3L)))
  }
}
