package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TextFunctions}

/** Document-level text analysis for the training-data pipeline:
  * quality metrics, language ID, fingerprints. Pure per-row projections
  * — zero shuffles; at 100 TB these run at scan speed with column
  * pruning down to (doc_id, text).
  */
object TextAnalysis {

  /** Quality metrics per document: char/token/punct counts and the
    * composite quality score (TextFunctions.qualityScore).
    */
  def qualityMetrics(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      TextFunctions.tokenCountWs(col("text")).as("n_tokens_ws"),
      TextFunctions.tokenCountBpe(col("text")).as("n_tokens_bpe"),
      TextFunctions.punctCount(col("text")).as("n_punct"),
      TextFunctions.alphaCount(col("text")).as("n_alpha"),
      TextFunctions.qualityScore(col("text")).as("quality"))

  /** Language-ID scores + prediction per document. */
  def languageId(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      TextFunctions.langScore(col("text"), "en").as("score_en"),
      TextFunctions.langScore(col("text"), "de").as("score_de"),
      TextFunctions.langScore(col("text"), "fr").as("score_fr"),
      TextFunctions.langScore(col("text"), "es").as("score_es"),
      TextFunctions.langPredict(col("text")).as("lang_pred"))

  /** Content fingerprints: md5 (oracle-matchable) + Karp-Rabin rolling
    * hash (custom codegen expression).
    */
  def fingerprints(spark: SparkSession, documents: DataFrame): DataFrame = {
    GraftFunctions.register(spark)
    documents.select(
      col("doc_id"),
      TextFunctions.fingerprintMd5(col("text")).as("fp_md5"),
      TextFunctions.fingerprintRolling(col("text")).as("fp_rolling"))
  }
}
