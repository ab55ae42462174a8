package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural contract of the round-9 registry split: SparkEntry's maps
  * are merged from the per-family registries under graft/queries/, so a
  * duplicate key across two registries would silently drop a query from
  * the declared surface (Map ++ keeps the right-hand entry).
  */
class RegistrySpec extends AnyFunSuite {

  private val registries: Seq[(String, Map[String, _], Map[String, String])] =
    Seq(
      ("CoreQueries", CoreQueries.queries, CoreQueries.oracleSql),
      ("RelationalOpQueries", RelationalOpQueries.queries,
        RelationalOpQueries.oracleSql),
      ("DedupQueries", DedupQueries.queries, DedupQueries.oracleSql),
      ("SimilarityQueries", SimilarityQueries.queries,
        SimilarityQueries.oracleSql),
      ("TextQueries", TextQueries.queries, TextQueries.oracleSql),
      ("MultimodalQueries", MultimodalQueries.queries,
        MultimodalQueries.oracleSql),
      ("StatsQueriesA", StatsQueriesA.queries, StatsQueriesA.oracleSql),
      ("SketchQueries", SketchQueries.queries, SketchQueries.oracleSql),
      ("GraphQueries", GraphQueries.queries, GraphQueries.oracleSql),
      ("FormatQueries", FormatQueries.queries, FormatQueries.oracleSql),
      ("TimeSeriesQueries", TimeSeriesQueries.queries,
        TimeSeriesQueries.oracleSql),
      ("StatsQueriesB", StatsQueriesB.queries, StatsQueriesB.oracleSql),
      ("StatsQueriesC", StatsQueriesC.queries, StatsQueriesC.oracleSql),
      ("StatsQueriesD", StatsQueriesD.queries, StatsQueriesD.oracleSql),
      ("StatsQueriesE", StatsQueriesE.queries, StatsQueriesE.oracleSql))

  test("no query key appears in two registries") {
    val all = registries.flatMap { case (reg, q, _) =>
      q.keys.map(_ -> reg) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty, s"duplicate keys: ${dups.map { case (k, rs) =>
      s"$k in ${rs.map(_._2).mkString("+")}" }.mkString(", ")}")
  }

  test("merged surface is the sum of the registries") {
    val expected = registries.map(_._2.size).sum
    assert(SparkEntry.queries.size == expected,
      s"SparkEntry.queries ${SparkEntry.queries.size} != $expected")
  }

  test("every oracle key names a query in the same registry") {
    registries.foreach { case (reg, q, o) =>
      val orphans = o.keySet -- q.keySet
      assert(orphans.isEmpty, s"$reg oracle-only keys: $orphans")
    }
  }

  test("every query is oracle-backed (full hash-certified surface)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("bench-only twins never collide with the declared surface") {
    // Bench times `queries ++ benchQueries`: a key collision would make
    // Map ++ silently time the twin UNDER the certified query's name,
    // corrupting both the per-query timing and the ratio-vs-prior signal
    val clash = SparkEntry.benchQueries.keySet & SparkEntry.queries.keySet
    assert(clash.isEmpty, s"benchQueries shadowing declared queries: $clash")
  }

  test("every query has a dump-ordering cost (cheapest-first contract)") {
    // a missing entry silently falls back to mid-range cost — fine for
    // one-off additions, but drift here means QueryCosts wasn't
    // regenerated from BENCH.json after the surface changed
    val missing = SparkEntry.queries.keySet -- QueryCosts.sf01Seconds.keySet
    assert(missing.isEmpty, s"queries missing from QueryCosts: $missing")
  }
}
