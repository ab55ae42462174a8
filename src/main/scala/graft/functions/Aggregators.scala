package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates — the Spark form of the reference's
  * Initializer/Aggregator lambda pair
  * (dsl/PriceAlertsApp.java:111-112: init `() -> 0D`, adder
  * `agg += quantity * price`; SURVEY.md §2.11). The built-in `sum`
  * covers the reference's case (and is what the pipelines use); these
  * exist as the general extension tier, registered via
  * `functions.udaf(...)`.
  */
object Aggregators {

  case class QtyPrice(quantity: Double, price: Double)

  /** The reference's aggregate verbatim as an Aggregator: zero = 0.0,
    * reduce adds quantity × price. Partial-merge-able (merge = +), so
    * Spark runs it map-side partial + final like any built-in.
    */
  object RevenueAggregator extends Aggregator[QtyPrice, Double, Double] {
    override def zero: Double = 0.0
    override def reduce(acc: Double, in: QtyPrice): Double =
      acc + in.quantity * in.price
    override def merge(a: Double, b: Double): Double = a + b
    override def finish(acc: Double): Double = acc
    override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Welford online variance — a genuinely stateful buffer (count,
    * mean, M2) that the built-ins don't expose in this numerically
    * stable form. Parallel-merge uses Chan's formula.
    */
  case class WelfordBuf(n: Long, mean: Double, m2: Double)

  object WelfordVariance extends Aggregator[Double, WelfordBuf, Double] {
    override def zero: WelfordBuf = WelfordBuf(0L, 0.0, 0.0)
    override def reduce(b: WelfordBuf, x: Double): WelfordBuf = {
      val n = b.n + 1
      val d = x - b.mean
      val mean = b.mean + d / n
      WelfordBuf(n, mean, b.m2 + d * (x - mean))
    }
    override def merge(a: WelfordBuf, b: WelfordBuf): WelfordBuf = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val d = b.mean - a.mean
        WelfordBuf(n, a.mean + d * b.n / n,
          a.m2 + b.m2 + d * d * a.n * b.n / n)
      }
    }
    override def finish(b: WelfordBuf): Double =
      if (b.n < 2) Double.NaN else b.m2 / (b.n - 1)
    override def bufferEncoder: Encoder[WelfordBuf] = Encoders.product[WelfordBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
