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

  /** Element-wise vector sum — the mergeable state behind moment/Gram
    * accumulation over embedding columns: each task folds its rows
    * into ONE fixed-length vector (map-side partial aggregation), so
    * the shuffle carries a single vector per task instead of the
    * corpus. The buffer is empty until the first row (dimension is
    * learned from the data); mismatched lengths fail fast.
    */
  case class VecBuf(v: Seq[Double])

  object VectorSum extends Aggregator[Seq[Double], VecBuf, Seq[Double]] {
    private def add(a: Seq[Double], b: Seq[Double]): Seq[Double] = {
      require(a.length == b.length,
        s"vector length mismatch: ${a.length} vs ${b.length}")
      val out = new Array[Double](a.length)
      var i = 0
      while (i < out.length) { out(i) = a(i) + b(i); i += 1 }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }
    override def zero: VecBuf = VecBuf(Seq.empty)
    override def reduce(b: VecBuf, in: Seq[Double]): VecBuf =
      if (in == null) b
      else if (b.v.isEmpty) VecBuf(in)
      else VecBuf(add(b.v, in))
    override def merge(a: VecBuf, b: VecBuf): VecBuf =
      if (a.v.isEmpty) b else if (b.v.isEmpty) a else VecBuf(add(a.v, b.v))
    override def finish(b: VecBuf): Seq[Double] = b.v
    override def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }
}
