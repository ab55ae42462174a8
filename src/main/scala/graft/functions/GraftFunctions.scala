package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._

/** Registration + Column-level API for the custom expressions. Queries
  * call [[GraftFunctions.register]] (idempotent) and then use either the
  * Column wrappers or SQL names (`polyhash64`, `simhash64`,
  * `hash64_seeded`, `cosine_sim`).
  */
object GraftFunctions {
  private val builders: Map[String, Seq[Expression] => Expression] = Map(
    "polyhash64"    -> (es => PolyHash64(es.head)),
    "simhash64"     -> (es => SimHash64(es.head)),
    "hash64_seeded" -> (es => Hash64Seeded(es(0), es(1))),
    "cosine_sim"    -> (es => CosineSim(es(0), es(1))))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }

  def polyhash64(c: Column): Column = call_function("polyhash64", c)
  def simhash64(tokens: Column): Column = call_function("simhash64", tokens)
  def hash64Seeded(seed: Column, s: Column): Column = call_function("hash64_seeded", seed, s)
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
}
