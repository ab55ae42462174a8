package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Similarity search over an embedding column (array<float>).
  *
  * Two tiers (SURVEY.md §7.3 M3):
  *   - brute-force exact top-k — the correctness baseline: broadcast the
  *     (small) query set against the full corpus, rank per query. Cost
  *     is |queries|·|corpus| cosines, embarrassingly parallel over
  *     corpus partitions; no corpus shuffle at all (ranking shuffles
  *     only |queries|·k candidate rows after per-partition pre-pruning).
  *   - random-hyperplane LSH ANN — the scale path: each vector maps to a
  *     `planes`-bit bucket; queries only compare against vectors in the
  *     same bucket (multi-probe: plus single-bit-flip neighbors).
  *     Recall is tunable by planes/probes; verified ≥ baseline overlap
  *     in SimilaritySpec.
  */
object Similarity {

  private def cos(a: Column, b: Column): Column = GraftFunctions.cosineSim(a, b)

  /** Exact top-k neighbors for each query vector (self excluded). */
  def bruteForceTopK(spark: SparkSession, embeddings: DataFrame,
                     queries: DataFrame, k: Int): DataFrame = {
    GraftFunctions.register(spark)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = embeddings.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cos(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Deterministic random hyperplanes (seed-fixed Gaussian). */
  private def hyperplanes(planes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rng = new Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-bit LSH bucket id of an embedding column. */
  def lshBucket(embedding: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(
        zip_with(embedding, typedlit(p), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN top-k: bucket the corpus once, probe each query's bucket plus
    * its `probes` single-bit-flip neighbor buckets, exact-rerank within
    * the candidates. Returns the same shape as bruteForceTopK.
    */
  def annTopK(spark: SparkSession, embeddings: DataFrame, queries: DataFrame,
              k: Int, planes: Int = 12, dim: Int = 64, probes: Int = 4,
              seed: Long = 42L): DataFrame = {
    GraftFunctions.register(spark)
    val hp = hyperplanes(planes, dim, seed)
    val corpus = embeddings.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"), lshBucket(col("embedding"), hp).as("bucket"))
    val qBase = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"), lshBucket(col("embedding"), hp).as("qbucket"))
    // multi-probe: own bucket + first `probes` single-bit flips
    val probeOffsets = array((lit(0L) +: (0 until probes)
      .map(i => lit(1L << i))): _*)
    val q = qBase.select(col("query_id"), col("qv"),
        explode(transform(probeOffsets,
          flip => col("qbucket").bitwiseXOR(flip))).as("bucket"))
    q.join(corpus, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cos(col("qv"), col("cv")).as("cos"))
      .distinct()
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}
