package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the operators Spark's built-in
  * function library can't express efficiently (SURVEY.md §4.2c):
  * polynomial rolling hash, simhash, and dense-vector cosine. Each has
  * both an interpreted `eval` and `doGenCode` that stays inside
  * whole-stage codegen (the generated code is a single static call —
  * no boxing, no UDF serialization penalty).
  */
object HashImpl {
  /** FNV-1a 64-bit over UTF-8 bytes — stable, dependency-free. */
  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Seeded variant (mix the seed in first) for minhash families. */
  def fnv1a64Seeded(seed: Long, s: UTF8String): Long = {
    var h = 0xcbf29ce484222325L ^ (seed * 0x9e3779b97f4a7c15L)
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    // finalization avalanche (splitmix64)
    h ^= (h >>> 30); h *= 0xbf58476d1ce4e5b9L
    h ^= (h >>> 27); h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** Spread the low 32 bits of v to the even bit positions of a long
    * (the classic Morton-code bit-twiddle ladder).
    */
  def spreadBits32(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton / z-order interleave of the low 32 bits of x (even output
    * bits) and y (odd output bits) — a space-filling-curve clustering
    * key: sorting by it co-locates rows that are close in BOTH
    * dimensions, so min/max column statistics prune scans on either
    * predicate dimension.
    */
  def zorder64(x: Long, y: Long): Long =
    spreadBits32(x) | (spreadBits32(y) << 1)

  /** Polynomial (Karp-Rabin) rolling hash of the whole string. */
  def polyHash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * 1315423911L + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  /** Content-defined chunking (Rabin-style CDC): split the byte stream
    * at positions where the rolling Karp-Rabin hash of the trailing
    * `w`-byte window has its low bits (`mask`) all zero — boundaries
    * follow CONTENT, so an insertion early in a document shifts chunk
    * edges only locally and identical regions across documents yield
    * identical chunks (the storage-dedup primitive). Byte-level
    * semantics by definition; expected chunk length ≈ mask+1 bytes.
    * One rolling pass: h_i = h_{i-1}·B + b_i − b_{i−w}·B^w (mod 2^64).
    */
  def cdcChunks(s: UTF8String, w: Int, mask: Long): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (n > 0) {
      val B = 1315423911L
      var bw = 1L
      var k = 0
      while (k < w) { bw *= B; k += 1 }
      var h = 0L
      var start = 0
      var i = 0
      while (i < n) {
        h = h * B + (bytes(i) & 0xffL)
        if (i >= w) h -= (bytes(i - w) & 0xffL) * bw
        if (i >= w - 1 && (h & mask) == 0L) {
          out += UTF8String.fromBytes(
            java.util.Arrays.copyOfRange(bytes, start, i + 1))
          start = i + 1
        }
        i += 1
      }
      if (start < n) out += UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, start, n))
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** 64-bit simhash over an array of string tokens: each token hashed,
    * per-bit ±1 votes accumulated, sign of each bit-sum becomes the bit.
    */
  def simHash64(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv1a64(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Full k-component minhash signature in one pass: for each shingle,
    * one base hash + k cheap seed-mixes (splitmix64 finalizer per seed),
    * tracking k minima — O(|shingles|·k) with no allocation beyond the
    * output array. Replaces a nested transform/array_min HOF tree that
    * was ~50× slower (array allocation per seed per row).
    */
  def minhashSig(shingles: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val base = fnv1a64(shingles.getUTF8String(i))
        var j = 0
        while (j < k) {
          // mix seed j into the base hash (splitmix64 avalanche)
          var h = base ^ (j * 0x9e3779b97f4a7c15L)
          h ^= (h >>> 30); h *= 0xbf58476d1ce4e5b9L
          h ^= (h >>> 27); h *= 0x94d049bb133111ebL
          h ^= (h >>> 31)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  /** LSH band bucket keys from a minhash signature: hash each
    * rowsPerBand-slice of longs directly (no string round-trip).
    */
  def bandHash(sig: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L ^ (b * 0x9e3779b97f4a7c15L)
      var r = 0
      while (r < rowsPerBand) {
        var v = sig.getLong(b * rowsPerBand + r)
        var byteIdx = 0
        while (byteIdx < 8) {
          h ^= (v & 0xffL); h *= 0x100000001b3L
          v >>>= 8; byteIdx += 1
        }
        r += 1
      }
      out(b) = h
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Word n-gram shingles in one pass: shingle i = tokens[i..i+n-1]
    * joined by a single space (byte-identical to the
    * transform/sequence/slice/concat_ws HOF tree it replaces, which
    * allocated an interpreted lambda frame and a slice array per
    * shingle). Empty output when fewer than n tokens.
    */
  def wordShingles(tokens: ArrayData, n: Int): ArrayData = {
    val cnt = tokens.numElements()
    if (cnt < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(
      new Array[Any](0))
    val space = UTF8String.fromString(" ")
    val out = new Array[Any](cnt - n + 1)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= cnt - n) {
      var j = 0
      while (j < n) {
        window(j) = if (tokens.isNullAt(i + j)) null else tokens.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(space, window: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Index of the FIRST band whose band-hash matches between two
    * signatures, or -1. Used to emit each LSH candidate pair exactly
    * once (from its first shared band) instead of deduplicating pair
    * duplicates with a shuffle: `l.band === first_shared_band(l, r)` is
    * a per-row filter, so the post-join `distinct()` exchange
    * disappears entirely.
    */
  def firstSharedBand(a: ArrayData, b: ArrayData, bands: Int,
                      rowsPerBand: Int): Int = {
    val ha = bandHash(a, bands, rowsPerBand)
    val hb = bandHash(b, bands, rowsPerBand)
    var i = 0
    while (i < bands) {
      if (ha.getLong(i) == hb.getLong(i)) return i
      i += 1
    }
    -1
  }

  /** Index of the first position where two long arrays agree, or -1
    * (single-emission filter for hyperplane-bucket pairs — the fused
    * form of array_position(zip_with(a, b, _ === _), true) - 1).
    */
  def firstSharedIndex(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) return i
      i += 1
    }
    -1
  }

  /** First (table, probe) combination — scanned table-major,
    * probe-minor, probe 0 = no flip, probe p ≥ 1 = flip bit p-1 — at
    * which a query's bucket array collides with a corpus bucket array,
    * encoded as `table * (probes + 1) + probe`, or -1. The multi-probe
    * analogue of [[firstSharedIndex]]: a (query, neighbor) pair can
    * collide in several (table, flip) combinations, so emitting only
    * from the canonical first one replaces the post-join `distinct()`
    * exchange with a per-row filter.
    */
  def firstSharedProbe(qb: ArrayData, cb: ArrayData, probes: Int): Int = {
    val tables = math.min(qb.numElements(), cb.numElements())
    var t = 0
    while (t < tables) {
      val q = qb.getLong(t); val c = cb.getLong(t)
      var p = 0
      while (p <= probes) {
        val flip = if (p == 0) 0L else 1L << (p - 1)
        if ((q ^ flip) == c) return t * (probes + 1) + p
        p += 1
      }
      t += 1
    }
    -1
  }

  /** Fraction of equal components between two equal-length signatures. */
  def minhashEstimate(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var eq = 0; var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  /** Exact jaccard of two SORTED-DISTINCT string arrays via linear
    * merge — no per-pair hash sets.
    */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { inter += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  /** All LSH sign-bit buckets of a vector in one fused pass. */
  def lshBuckets(vec: ArrayData, planeSets: Array[Array[Array[Double]]]): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Long](planeSets.length)
    var t = 0
    while (t < planeSets.length) {
      val planes = planeSets(t)
      var bucket = 0L
      var p = 0
      while (p < planes.length) {
        val plane = planes(p)
        var dot = 0.0
        var i = 0
        val d = math.min(n, plane.length)
        while (i < d) { dot += vec.getFloat(i) * plane(i); i += 1 }
        if (dot >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Cosine similarity between two float/double arrays (each side's
    * element type independent), accumulated in double (element order =
    * array order, matching the DuckDB oracle's CAST(... AS DOUBLE[])
    * computation). Returns NaN-free 0.0 on zero-norm inputs.
    */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Symmetric int8 quantization stats of a float/double vector in one
    * pass: scale = max |x| (absmax quantization), q_i = floor(x_i /
    * scale * 127 + 0.5) ∈ [-127, 127], returned as (scale, Σq, min q,
    * max q). The binary-arithmetic rounding form is chosen so DuckDB
    * reproduces every bit (floor on the raw double, no ties-to-even).
    * Zero vectors quantize to all-zero (scale 0 guard).
    */
  def quantizeI8Stats(vec: ArrayData, isFloat: Boolean): InternalRow = {
    val n = vec.numElements()
    var scale = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i))
      if (x > scale) scale = x
      i += 1
    }
    var sum = 0L; var min = 0L; var max = 0L
    if (scale > 0.0) {
      min = Long.MaxValue; max = Long.MinValue
      i = 0
      while (i < n) {
        val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        val q = math.floor(x / scale * 127.0 + 0.5).toLong
        sum += q
        if (q < min) min = q
        if (q > max) max = q
        i += 1
      }
      if (n == 0) { min = 0L; max = 0L }
    }
    InternalRow(scale, sum, min, max)
  }

  /** Plain-array counterpart of [[cosine]] for the driver-side k-means
    * trainer — identical fold order and IEEE ops, so driver-trained
    * centroids reproduce in DuckDB.
    */
  def cosineArr(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** `polyhash64(str)` — rolling polynomial hash of a string. */
case class PolyHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    HashImpl.polyHash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.polyHash64($c)")
  override protected def withNewChildInternal(c: Expression): PolyHash64 = copy(c)
}

/** `simhash64(array<string>)` — 64-bit simhash of a token array. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    HashImpl.simHash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.simHash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

/** `hash64_seeded(seed, str)` — seeded 64-bit hash (minhash family). */
case class Hash64Seeded(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(seed: Any, s: Any): Any =
    HashImpl.fnv1a64Seeded(seed.asInstanceOf[Long], s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashImpl.fnv1a64Seeded($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Hash64Seeded =
    copy(l, r)
}

/** `zorder64(x, y)` — Morton interleave of two 32-bit dimensions into
  * one clustering key (see HashImpl.zorder64).
  */
case class ZOrder64(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(x: Any, y: Any): Any =
    HashImpl.zorder64(x.asInstanceOf[Long], y.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashImpl.zorder64($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrder64 =
    copy(l, r)
}

/** `cdc_chunks(text, w, mask)` — content-defined chunks of the byte
  * stream (see HashImpl.cdcChunks).
  */
case class CdcChunks(child: Expression, w: Int, mask: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashImpl.cdcChunks(input.asInstanceOf[UTF8String], w, mask)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashImpl.cdcChunks($c, $w, ${mask}L)")
  override protected def withNewChildInternal(c: Expression): CdcChunks =
    copy(child = c)
}

/** `minhash_sig(array<string>, k)` — k-component minhash signature. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashImpl.minhashSig(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.minhashSig($c, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** `band_hash(array<long>, bands, rowsPerBand)` — LSH band bucket keys. */
case class BandHash(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashImpl.bandHash(input.asInstanceOf[ArrayData], bands, rowsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashImpl.bandHash($c, $bands, $rowsPerBand)")
  override protected def withNewChildInternal(c: Expression): BandHash =
    copy(child = c)
}

/** `first_shared_index(array<long>, array<long>)` — first position where
  * the arrays agree, or -1.
  */
case class FirstSharedIndex(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashImpl.firstSharedIndex(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HashImpl.firstSharedIndex($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FirstSharedIndex =
    copy(l, r)
}

/** `word_shingles(tokens, n)` — single-pass word n-gram shingles. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashImpl.wordShingles(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.wordShingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

/** `first_shared_band(sigA, sigB)` — index of the first band whose
  * band-hash matches, or -1 (single-emission LSH pair filter).
  */
case class FirstSharedBand(left: Expression, right: Expression,
                           bands: Int, rowsPerBand: Int)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashImpl.firstSharedBand(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      bands, rowsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HashImpl.firstSharedBand($a, $b, $bands, $rowsPerBand)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FirstSharedBand =
    copy(l, r)
}

/** `first_shared_probe(qbuckets, cbuckets, probes)` — canonical first
  * (table, probe-flip) collision encoded as table*(probes+1)+probe, or
  * -1 (single-emission filter for multi-probe LSH candidate pairs).
  */
case class FirstSharedProbe(left: Expression, right: Expression, probes: Int)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashImpl.firstSharedProbe(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], probes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HashImpl.firstSharedProbe($a, $b, $probes)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FirstSharedProbe =
    copy(l, r)
}

/** `minhash_est(array<long>, array<long>)` — signature-overlap estimate. */
case class MinHashEst(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashImpl.minhashEstimate(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashImpl.minhashEstimate($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinHashEst =
    copy(l, r)
}

/** `jaccard_sorted(array<string>, array<string>)` — exact jaccard of
  * sorted-distinct arrays (linear merge).
  */
case class JaccardSorted(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashImpl.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashImpl.jaccardSorted($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSorted =
    copy(l, r)
}

/** `lsh_buckets(embedding)` — all hyperplane sign-bit buckets of a
  * vector in one pass: for `tables` plane sets of `planes` planes each,
  * returns array<long> of bucket ids (one per table). The plane matrix
  * rides along as a reference object into generated code
  * (ctx.addReferenceObj) — one fused loop instead of
  * tables×planes aggregate-HOF dot products.
  */
case class LshBuckets(child: Expression, planeSets: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashImpl.lshBuckets(input.asInstanceOf[ArrayData], planeSets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planeSets", planeSets,
      "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.lshBuckets($c, $planesRef)")
  }
  override protected def withNewChildInternal(c: Expression): LshBuckets =
    copy(child = c)
}

/** `quantize_i8_stats(array<float|double>)` — single-pass absmax int8
  * quantization stats: struct(scale, q_sum, q_min, q_max). The stats
  * are the oracle-checkable surface of the quantization (the integer
  * sums verify every quantized component); the array form for storage
  * is the same loop emitting bytes.
  */
case class QuantizeI8Stats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q_sum", LongType, nullable = false),
    StructField("q_min", LongType, nullable = false),
    StructField("q_max", LongType, nullable = false)))
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override protected def nullSafeEval(input: Any): Any =
    HashImpl.quantizeI8Stats(input.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashImpl.quantizeI8Stats($c, $isFloat)")
  override protected def withNewChildInternal(c: Expression): QuantizeI8Stats =
    copy(child = c)
}

/** `clz64(long)` — number of leading zero bits of the 64-bit value
  * (0 for negative inputs' MSB set, 64 for zero). The HyperLogLog
  * register primitive: rho = clz of the hash suffix, shifted by the
  * bucket-index width. A single static JDK intrinsic call, so the
  * expression stays inside whole-stage codegen.
  */
case class Clz64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.numberOfLeadingZeros(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Long.numberOfLeadingZeros($c)")
  override protected def withNewChildInternal(c: Expression): Clz64 =
    copy(child = c)
}

/** `cosine_sim(array<float|double>, array<float|double>)` — dense
  * cosine; the two sides may have different element types (e.g. a
  * float32 corpus against float64 trained centroids).
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashImpl.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HashImpl.cosine($a, $b, ${isFloat(left)}, ${isFloat(right)})")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(l, r)
}
