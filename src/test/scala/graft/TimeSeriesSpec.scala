package graft

import java.sql.Timestamp

import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, Double)*) =
    rows.map { case (id, u, sec, v) =>
      (id, u, new Timestamp(sec * 1000L), v)
    }.toDF("event_id", "user_id", "ts", "value")

  test("truncated EWMA matches the hand fold; rolling stats track the frame") {
    val out = TimeSeries.ewmaFeatures(ev(
      (1L, 1L, 10L, 1.0), (2L, 1L, 20L, 2.0),
      (3L, 1L, 30L, 3.0), (4L, 1L, 40L, 4.0)))
      .orderBy("event_id").collect()
    // ewma_t = sum_j vals[j] * 2^-(n-j+1), newest weight 1/2
    val expected = Seq(0.5, 1.25, 2.125, 3.0625)
    out.zip(expected).foreach { case (r, e) =>
      assert(r.getAs[Double]("ewma") == e, s"row $r")
    }
    val r3 = out(2)
    assert(r3.getAs[Double]("roll_mean") == 2.0)
    assert(r3.getAs[Double]("roll_min") == 1.0)
    assert(r3.getAs[Double]("roll_max") == 3.0)
  }

  test("window truncation drops history beyond w events; users are independent") {
    val out = TimeSeries.ewmaFeatures(ev(
      (1L, 1L, 10L, 100.0), (2L, 1L, 20L, 2.0), (3L, 1L, 30L, 3.0),
      (4L, 2L, 10L, 7.0)), w = 2)
      .orderBy("event_id").collect()
    // event 3 frame = [2,3]: the 100 at t1 is out of the window
    assert(out(2).getAs[Double]("ewma") == 2.0 * 0.25 + 3.0 * 0.5)
    assert(out(2).getAs[Double]("roll_max") == 3.0)
    // user 2 starts fresh
    assert(out(3).getAs[Double]("ewma") == 3.5)
  }

  test("outlier counts: strict 2-sigma boundary is exact in decimal space") {
    // four 10.00s and one extreme per type; for x=100.00 the extreme
    // sits EXACTLY at mean+2sigma ((cn-s)^2 = 4(n*ssq - s^2) =
    // 1.296e9 in cents), so strict > must exclude it — a boundary a
    // float formulation cannot decide reliably
    def rows(extreme: Double) = Seq(
      (1L, "t", 10.0), (2L, "t", 10.0), (3L, "t", 10.0),
      (4L, "t", 10.0), (5L, "t", extreme))
      .map { case (id, t, v) => (id, 1L, new Timestamp(id * 1000L), t, v) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val atBoundary = TimeSeries.outlierCounts(rows(100.0)).collect()
    assert(atBoundary.head.getAs[Long]("n_outliers") == 0L)
    // (100.01 would floor back to 10000 cents — IEEE 100.01 is just
    // below — and land on the boundary again)
    val pastBoundary = TimeSeries.outlierCounts(rows(101.0)).collect()
    assert(pastBoundary.head.getAs[Long]("n_outliers") == 1L)
    assert(pastBoundary.head.getAs[Long]("n_events") == 5L)
  }
}
