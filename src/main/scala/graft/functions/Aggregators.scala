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

  object WelfordVariance extends Aggregator[Double, WelfordBuf, java.lang.Double] {
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
    // NULL (not NaN) for n < 2 — exactly var_samp's contract: NaN
    // would survive IS NOT NULL filters and poison downstream
    // avg/sum, where the built-in this mirrors returns NULL
    override def finish(b: WelfordBuf): java.lang.Double =
      if (b.n < 2) null else java.lang.Double.valueOf(b.m2 / (b.n - 1))
    override def bufferEncoder: Encoder[WelfordBuf] = Encoders.product[WelfordBuf]
    override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
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

  /** MRL-style multi-level mergeable quantile sketch (Manku,
    * Rajagopalan & Lindsay, SIGMOD'98 — the deterministic ancestor of
    * KLL): level i holds ≤ 2k values each standing for 2^i originals;
    * an overflowing level sorts and keeps every other element
    * (alternating offset per compaction — the classic bias reducer),
    * promoting the survivors one level up. State is O(k · log(N/k))
    * values per group however large the group: the partial-aggregation
    * contract means each task folds its partition before the exchange,
    * the same shuffle bound as [[SpaceSavingTopK]].
    *
    * Guarantees: with no compaction (group count < 2k) the sketch is
    * EXACT — `finish` is then precisely DuckDB `quantile_disc`
    * (index max(0, ceil(q·n) − 1) of the sorted values), the regime
    * q128 runs under its oracle (per-customer groups are bounded by
    * construction: ~10 orders/customer at every SF). In the
    * approximate regime each level-i compaction perturbs any rank by
    * ≤ 2^i, so total rank error ≤ Σ c_i·2^i ≤ N·L/(2k) for L active
    * levels — property-tested under adversarial orders/partitionings.
    */
  case class QBuf(levels: Seq[Seq[Double]], comps: Seq[Int])

  class MrlQuantiles(k: Int, probs: Seq[Double])
      extends Aggregator[java.lang.Double, QBuf, Seq[Double]] {
    private val cap = 2 * k

    override def zero: QBuf = QBuf(Vector(Vector.empty), Vector(0))

    private def compactUp(levels: Vector[Vector[Double]],
                          comps: Vector[Int]): QBuf = {
      var ls = levels; var cs = comps; var i = 0
      while (i < ls.length) {
        if (ls(i).length >= cap) {
          val sorted = ls(i).sorted
          val offset = cs(i) % 2
          // survivors at indices offset, offset+2, … (merge can leave
          // an odd count; the ±1-item weight drift is ≤ one 2^i rank
          // unit per compaction, inside the error model)
          val survivors = Vector.tabulate((sorted.length - offset + 1) / 2)(
            j => sorted(offset + 2 * j))
          ls = ls.updated(i, Vector.empty[Double])
          cs = cs.updated(i, cs(i) + 1)
          if (i + 1 >= ls.length) { ls = ls :+ Vector.empty[Double]; cs = cs :+ 0 }
          ls = ls.updated(i + 1, ls(i + 1) ++ survivors)
        }
        i += 1
      }
      QBuf(ls, cs)
    }

    override def reduce(b: QBuf, x: java.lang.Double): QBuf = {
      // null-safe like SpaceSavingTopK: skipped values keep `n =
      // count(valCol)` and the sketched population in agreement
      if (x == null) return b
      // copy-on-compaction: the common row only touches level 0 (the
      // buffer object persists between reduce calls, so level 0 stays a
      // Vector and :+ is effectively O(1)); upper levels are only
      // rebuilt on the 1-in-cap row that triggers a compaction
      val l0 = b.levels.head.toVector :+ x.doubleValue()
      if (l0.length < cap) QBuf(b.levels.updated(0, l0), b.comps)
      else compactUp(
        b.levels.toVector.map(_.toVector).updated(0, l0), b.comps.toVector)
    }

    override def merge(a: QBuf, b: QBuf): QBuf = {
      if (a.levels.forall(_.isEmpty)) return b
      if (b.levels.forall(_.isEmpty)) return a
      val n = math.max(a.levels.length, b.levels.length)
      val ls = Vector.tabulate(n) { i =>
        (if (i < a.levels.length) a.levels(i).toVector else Vector.empty) ++
          (if (i < b.levels.length) b.levels(i).toVector else Vector.empty)
      }
      val cs = Vector.tabulate(n) { i =>
        (if (i < a.comps.length) a.comps(i) else 0) +
          (if (i < b.comps.length) b.comps(i) else 0)
      }
      compactUp(ls, cs)
    }

    override def finish(b: QBuf): Seq[Double] = {
      val weighted = b.levels.zipWithIndex.flatMap { case (lv, i) =>
        lv.map(v => (v, 1L << i))
      }.sortBy(_._1)
      if (weighted.isEmpty) return Vector.empty
      val total = weighted.map(_._2).sum
      probs.toVector.map { q =>
        val target = math.max(0L, math.ceil(q * total).toLong - 1L)
        var cum = 0L; var i = 0; var res = weighted.last._1
        while (i < weighted.length) {
          cum += weighted(i)._2
          if (cum > target) { res = weighted(i)._1; i = weighted.length }
          else i += 1
        }
        res
      }
    }

    override def bufferEncoder: Encoder[QBuf] = Encoders.product[QBuf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }
}
