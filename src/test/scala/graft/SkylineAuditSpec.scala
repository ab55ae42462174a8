package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** q170 skyline window-reduction vs the brute-force dominance
  * definition, and q175 Benford digit/deviation bookkeeping.
  */
class SkylineAuditSpec extends SparkSpec {
  import spark.implicits._

  private def bruteSkyline(rows: Seq[(String, Long, Long, Long)])
      : Set[(String, Long, Long, Long)] = {
    rows.filter { case (g, _, x, y) =>
      !rows.exists { case (g2, _, x2, y2) =>
        g2 == g && x2 >= x && y2 <= y && (x2 > x || y2 < y)
      }
    }.toSet
  }

  test("q170 skyline2d == brute-force dominance on seeded random frames") {
    val rng = new scala.util.Random(7)
    for (trial <- 0 until 5) {
      val rows = Seq.tabulate(120) { i =>
        (s"g${rng.nextInt(3)}", i.toLong,
          rng.nextInt(12).toLong, rng.nextInt(12).toLong)
      }
      val df = rows.toDF("g", "id", "x", "y").repartition(4)
      val got = Relational.skyline2d(df, "g", "x", "y")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(got == bruteSkyline(rows), s"trial $trial")
    }
  }

  test("q170 skyline2d keeps exact duplicates of a frontier point") {
    val df = Seq(
      ("a", 1L, 10L, 5L), ("a", 2L, 10L, 5L), // duplicate frontier point
      ("a", 3L, 10L, 6L), // dominated: same x, worse y
      ("a", 4L, 9L, 5L), // dominated: worse x, same y
      ("a", 5L, 9L, 4L) // frontier: smaller x but better y
    ).toDF("g", "id", "x", "y")
    val ids = Relational.skyline2d(df, "g", "x", "y")
      .select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 5L))
  }

  test("q175 benford: digit extraction and exact deviation arithmetic") {
    // amounts chosen so cents first-digits are 1,1,9,3 (19.99 -> 1999)
    val df = Seq(("g", 19.99), ("g", 1.0), ("g", 95.5), ("g", 3.0),
      ("g", -4.0), ("g", 0.0)) // non-positive rows drop
      .toDF("grp", "amount")
    val out = Relational.benfordAudit(df, "grp", "amount")
      .orderBy("digit")
      .select("digit", "obs", "n", "dev_micro")
      .as[(Int, Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(1, 3, 9))
    assert(out.forall(_._3 == 4L))
    val byDigit = out.map(r => r._1 -> r).toMap
    // dev = obs*1e6 - n*p_micro with p_micro from the shared literals
    assert(byDigit(1)._2 == 2L &&
      byDigit(1)._4 == 2L * 1000000L - 4L * 301030L)
    assert(byDigit(9)._4 == 1000000L - 4L * 45757L)
    // Benford micro-probabilities sum to ~1 (sanity on the literals)
    assert(math.abs(Relational.benfordMicro.map(_._2).sum - 1000000L) <= 2)
  }
}
