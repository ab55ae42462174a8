package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}
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

  /** Cosine similarity between two float/double arrays, accumulated in
    * double (element order = array order, matching the DuckDB oracle's
    * CAST(... AS DOUBLE[]) computation). Returns NaN-free 0.0 on
    * zero-norm inputs.
    */
  def cosine(a: ArrayData, b: ArrayData, isFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (isFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
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

/** `cosine_sim(array<float|double>, array<float|double>)` — dense cosine. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashImpl.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashImpl.cosine($a, $b, $isFloat)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(l, r)
}
