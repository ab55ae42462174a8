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

  /** Fused second-moment fold for dimension-correlation: one pass over
    * the embeddings accumulating [n, sums(d), upper-tri gram(d(d+1)/2)]
    * into a single primitive buffer, mutated in place. Replaces the
    * HOF formulation (per-row `transform`/`flatten` building a boxed
    * d(d+1)/2-element array — ~16 KB of garbage per row at d=64) with
    * zero per-row allocation; per-element addition order is identical,
    * so results match the vecSum-over-products formulation to the bit.
    */
  case class GramBuf(v: Seq[Double])

  class GramMoments(dim: Int)
      extends Aggregator[Seq[Double], GramBuf, Seq[Double]] {
    private val len = 1 + dim + dim * (dim + 1) / 2
    // Primitive view of a Seq[Double]: zero-copy when the encoder hands
    // back a primitive-backed ArraySeq (the common in-task path), a
    // one-time copy otherwise (post-deserialization shapes).
    private def prim(s: Seq[Double]): Array[Double] = s match {
      case w: scala.collection.immutable.ArraySeq[_]
          if w.unsafeArray.isInstanceOf[Array[Double]] =>
        w.unsafeArray.asInstanceOf[Array[Double]]
      case _ => s.toArray
    }
    private def wrap(a: Array[Double]): Seq[Double] =
      scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
    override def zero: GramBuf = GramBuf(wrap(new Array[Double](len)))
    override def reduce(b: GramBuf, in: Seq[Double]): GramBuf = {
      if (in == null) return b
      require(in.length == dim, s"expected dim $dim, got ${in.length}")
      val buf = prim(b.v)
      val x = prim(in)
      buf(0) += 1.0
      var i = 0
      var g = 1 + dim
      while (i < dim) {
        val xi = x(i)
        buf(1 + i) += xi
        var j = i
        while (j < dim) { buf(g) += xi * x(j); g += 1; j += 1 }
        i += 1
      }
      GramBuf(wrap(buf))
    }
    override def merge(a: GramBuf, b: GramBuf): GramBuf = {
      val av = prim(a.v)
      val bv = prim(b.v)
      var i = 0
      while (i < len) { av(i) += bv(i); i += 1 }
      GramBuf(wrap(av))
    }
    override def finish(b: GramBuf): Seq[Double] = b.v
    override def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

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

  /** SpaceSaving (Metwally et al. 2005) top-k sketch as a typed,
    * MERGEABLE Aggregator — one-pass per-group heavy hitters whose
    * state is `capacity` counters, never the distinct-value set. The
    * partial-aggregation contract this buys at scale: each task folds
    * its partition into ≤ capacity entries per group BEFORE the
    * exchange, so the shuffle carries O(groups × capacity) rows no
    * matter how many tokens the corpus holds (contrast a naive
    * groupBy(group, token) whose shuffle is the full distinct pair
    * set). Guarantees (any input order, any partitioning):
    *   - count ≥ true frequency ≥ count − err (per entry),
    *   - any value with true frequency > n/capacity is present,
    *   - with capacity ≥ group distinct-count the sketch is EXACT
    *     (err 0 for all entries) — the configuration q126 runs under
    *     its DuckDB oracle; the approximate regime is property-tested.
    *
    * Replacement and trim tie-breaks are (count asc, token desc) /
    * (count desc, token asc) — fully deterministic.
    */
  case class SSEntry(token: String, cnt: Long, err: Long)
  case class SSBuf(entries: Seq[SSEntry])

  class SpaceSavingTopK(capacity: Int)
      extends Aggregator[String, SSBuf, Seq[SSEntry]] {
    override def zero: SSBuf = SSBuf(Vector.empty)

    override def reduce(b: SSBuf, tok: String): SSBuf = {
      if (tok == null) return b
      val es = b.entries
      val i = es.indexWhere(_.token == tok)
      if (i >= 0)
        SSBuf(es.updated(i, es(i).copy(cnt = es(i).cnt + 1)))
      else if (es.length < capacity)
        SSBuf(es :+ SSEntry(tok, 1L, 0L))
      else {
        // evict the min-count entry (tie: largest token, so the
        // SMALLEST tokens survive ties deterministically)
        val j = es.indices.minBy(ix => (es(ix).cnt, reverseOrd(es(ix).token)))
        val ev = es(j)
        SSBuf(es.updated(j, SSEntry(tok, ev.cnt + 1, ev.cnt)))
      }
    }

    // order-by-descending-string helper: wrap in a value that sorts
    // reverse-lexicographically via Ordered tuple composition
    private def reverseOrd(s: String): StringRev = StringRev(s)

    override def merge(a: SSBuf, b: SSBuf): SSBuf = {
      if (a.entries.isEmpty) return b
      if (b.entries.isEmpty) return a
      // standard mergeable-summaries combine: shared tokens add both
      // (cnt, err); tokens on one side only are offset by the other
      // side's worst-case miss (its min count, 0 if under capacity)
      val aMin = if (a.entries.length < capacity) 0L else a.entries.map(_.cnt).min
      val bMin = if (b.entries.length < capacity) 0L else b.entries.map(_.cnt).min
      val bm = b.entries.map(e => e.token -> e).toMap
      val merged = scala.collection.mutable.LinkedHashMap[String, SSEntry]()
      a.entries.foreach { e =>
        bm.get(e.token) match {
          case Some(be) =>
            merged(e.token) = SSEntry(e.token, e.cnt + be.cnt, e.err + be.err)
          case None =>
            merged(e.token) = SSEntry(e.token, e.cnt + bMin, e.err + bMin)
        }
      }
      b.entries.foreach { e =>
        if (!merged.contains(e.token))
          merged(e.token) = SSEntry(e.token, e.cnt + aMin, e.err + aMin)
      }
      val trimmed = merged.values.toVector
        .sortBy(e => (-e.cnt, e.token))
        .take(capacity)
      SSBuf(trimmed)
    }

    override def finish(b: SSBuf): Seq[SSEntry] =
      b.entries.sortBy(e => (-e.cnt, e.token))
    override def bufferEncoder: Encoder[SSBuf] = Encoders.product[SSBuf]
    override def outputEncoder: Encoder[Seq[SSEntry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SSEntry]]()
  }

  /** Reverse-lexicographic String ordering key (for deterministic
    * eviction tie-breaks).
    */
  case class StringRev(s: String) extends Ordered[StringRev] {
    override def compare(that: StringRev): Int = that.s.compareTo(s)
  }
}
