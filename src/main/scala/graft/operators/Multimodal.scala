package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, batch-shaped decode/feature-extract over
  * `mapPartitions`.
  *
  * The DECODE STEP IS A STUB — the container has no image/audio codecs,
  * so `decodeStub` derives a deterministic fake feature vector from the
  * payload bytes. Everything around it (schema, Dataset encoders,
  * per-partition batching, partition sizing) is the real plumbing a
  * codec would drop into.
  *
  * Scale notes: payloads stay opaque binary end-to-end (no driver
  * collect); decode is mapPartitions so a real codec amortizes per-batch
  * init (model load, JNI handles) across the partition — the Scala
  * analogue of Arrow-batched pandas UDFs; partition size is controlled
  * upstream by `spark.sql.files.maxPartitionBytes`, which is how you
  * keep ~100 MB of media per task at 100 TB.
  */
object Multimodal {

  /** A media file: opaque payload + typed metadata. */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte],
                         n_bytes: Long)

  /** Extracted features: fixed-width vector + dims metadata +
    * byte_sum (integer payload checksum — exactly reproducible by the
    * oracle, unlike the f32-accumulated feature vector).
    */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           feature: Array[Float], width: Int, height: Int,
                           byte_sum: Long)

  /** One sampled frame of a "video" payload. */
  case class Frame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  /** Synthesize a media table from `documents` (text bytes as payload,
    * kind round-robin) — the fixture stand-in for a real binary-column
    * parquet/lance table.
    */
  def syntheticMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    documents.select(
        col("doc_id").as("media_id"),
        element_at(typedlit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        length(col("text")).cast("long").as("n_bytes"))
      .as[MediaRecord]
  }

  /** STUB decode: deterministic fake features from payload bytes.
    * A real implementation would replace ONLY this function body with a
    * codec call (JNI/ffmpeg/turbojpeg); signature and batching stay.
    */
  private def decodeStub(rec: MediaRecord): MediaFeatures = {
    val dim = 8
    val feature = new Array[Float](dim)
    var byteSum = 0L
    var i = 0
    while (i < rec.payload.length) {
      val b = rec.payload(i) & 0xff
      feature(i % dim) += b / 255.0f
      byteSum += b
      i += 1
    }
    var d = 0
    while (d < dim) {
      feature(d) = feature(d) / math.max(1, rec.payload.length / dim).toFloat
      d += 1
    }
    val width = 16 + (rec.media_id % 8).toInt * 16
    val height = 16 + (rec.media_id % 5).toInt * 16
    MediaFeatures(rec.media_id, rec.kind, rec.n_bytes, feature, width, height,
      byteSum)
  }

  /** Batch decode / feature extraction — mapPartitions so per-partition
    * init cost is amortized (the iterator is consumed lazily; no
    * per-record setup).
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codec: open handles here, close via iterator completion
      it.map(decodeStub)
    }
  }

  /** Frame sampling for "video" payloads: every `stride`-th 64-byte
    * chunk becomes a frame row (flatMap — one row in, many out).
    */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { rec =>
      rec.payload.grouped(64).zipWithIndex.collect {
        case (chunk, idx) if idx % stride == 0 => Frame(rec.media_id, idx, chunk)
      }
    }
  }

  /** A resized media payload (STUB resampler — see [[resize]]). */
  case class ResizedMedia(media_id: Long, kind: String, target_w: Int,
                          target_h: Int, resized: Array[Byte])

  /** STUB resize: deterministic byte-level downsample to targetW×targetH
    * "pixels" (nearest-neighbor over the payload bytes). A real
    * implementation replaces ONLY the per-record body with a codec
    * resample; the mapPartitions batching, schema, and binary-column
    * plumbing are the production contract (same shape as
    * [[extractFeatures]]).
    */
  def resize(media: Dataset[MediaRecord], targetW: Int,
             targetH: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codec: init resampler here, amortized across the partition
      it.map { rec =>
        val n = targetW * targetH
        val out = new Array[Byte](n)
        // empty payloads resize to all-zero pixels (no bytes to sample)
        if (rec.payload.nonEmpty) {
          val len = rec.payload.length
          var i = 0
          while (i < n) {
            out(i) = rec.payload((i.toLong * len / n).toInt % len)
            i += 1
          }
        }
        ResizedMedia(rec.media_id, rec.kind, targetW, targetH, out)
      }
    }
  }

  /** Per-kind integer statistics over the decoded media — the
    * oracle-backed query surfaced through SparkEntry (q24). Every
    * output column is integer arithmetic over the payload bytes, so
    * DuckDB reproduces it exactly from the same parquet while the data
    * still flows through the real mapPartitions decode path.
    */
  def featureStats(spark: SparkSession, documents: DataFrame): DataFrame = {
    val feats = extractFeatures(syntheticMedia(spark, documents))
    feats.toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("byte_sum")).as("byte_checksum"),
        sum(col("width").cast("long")).as("sum_width"),
        sum(col("height").cast("long")).as("sum_height"))
  }
}
