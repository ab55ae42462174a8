package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TextFunctions}

/** Streaming deduplication for the ingest path of a training-data
  * pipeline: exact and fingerprint dedup with watermark-bounded state.
  *
  * `dropDuplicates` keeps ALL keys in state forever without a watermark
  * — unusable at 100 TB/day. With the watermark, state is bounded to
  * the delay horizon; `dropDuplicatesWithinWatermark` additionally
  * dedups keys whose duplicates may straddle the watermark boundary.
  */
object StreamingDedup {

  /** Exact streaming dedup on arbitrary key columns, state bounded by
    * the event-time watermark on `tsCol`.
    */
  def exact(stream: DataFrame, tsCol: String, delay: String,
            keyCols: String*): DataFrame =
    stream.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Content-fingerprint streaming dedup for documents: dedup on
    * md5(normalized text) — the 16-byte digest, not the document body,
    * is what the state store keys on.
    */
  def byFingerprint(docStream: DataFrame, tsCol: String, delay: String): DataFrame =
    exact(
      docStream.withColumn("fp", TextFunctions.fingerprintMd5(col("text"))),
      tsCol, delay, "fp")

  /** Near-dup streaming dedup on the 64-bit simhash: documents whose
    * token-level simhash collides exactly (hamming 0 — reorderings,
    * token-multiplicity noise) are dropped within the watermark
    * horizon. State keys on one long per doc. The full hamming≤3
    * neighborhood needs the batch pass (Dedup.simhashPairs) — a
    * streaming k-NN over sliding state is deliberately out of scope;
    * this is the standard cheap ingest-time guard in front of it.
    */
  def bySimhash(docStream: DataFrame, tsCol: String, delay: String): DataFrame = {
    GraftFunctions.register(docStream.sparkSession)
    exact(
      docStream.withColumn("sh",
        GraftFunctions.simhash64(TextFunctions.wsTokens(col("text")))),
      tsCol, delay, "sh")
  }
}
