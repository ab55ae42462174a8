package graft

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {

  test("synthetic media: payload bytes round-trip, kinds partitioned") {
    val media = Multimodal.syntheticMedia(spark, Tables.documents(spark, sf001))
    val rows = media.collect()
    assert(rows.length == 500)
    assert(rows.map(_.kind).toSet == Set("image", "audio", "video"))
    assert(rows.forall(r => r.payload.length == r.n_bytes))
  }

  test("feature extraction: deterministic fixed-width vectors") {
    val media = Multimodal.syntheticMedia(spark, Tables.documents(spark, sf001))
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.forall(_.feature.length == 8))
    assert(f1.zip(f2).forall { case (a, b) => a.feature.sameElements(b.feature) })
    assert(f1.forall(f => f.width > 0 && f.height > 0))
  }

  test("frame sampling: only video, every stride-th chunk") {
    val media = Multimodal.syntheticMedia(spark, Tables.documents(spark, sf001))
    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_no % 2 == 0))
    val videoIds = media.filter(_.kind == "video").collect().map(_.media_id).toSet
    assert(frames.map(_.media_id).toSet.subsetOf(videoIds))
  }

  test("resize: fixed-size output, deterministic, plumbing stays distributed") {
    val media = Multimodal.syntheticMedia(spark,
      Tables.documents(spark, sf001).limit(20))
    val out = Multimodal.resize(media, 8, 4).collect()
    assert(out.length == 20)
    assert(out.forall(_.resized.length == 32), "every payload resized to 8x4")
    val again = Multimodal.resize(media, 8, 4).collect()
    assert(out.map(r => (r.media_id, r.resized.toSeq)).sortBy(_._1).toSeq ==
      again.map(r => (r.media_id, r.resized.toSeq)).sortBy(_._1).toSeq,
      "stub resampler is deterministic")
  }
}
