package graft.operators

import graft.SparkSpec
import graft.operators.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    MediaRow(0L, "image", Array.tabulate(100)(_.toByte),
      MediaMeta(Some(10), Some(10), None, None)),
    MediaRow(1L, "audio", Array.tabulate(50)(i => (i * 2).toByte),
      MediaMeta(None, None, Some(16000), Some(1000))),
    MediaRow(2L, "video", Array.tabulate(200)(_.toByte),
      MediaMeta(Some(64), Some(64), None, Some(100))),
  ).toDS()

  test("feature extraction is deterministic and batched") {
    val f = extractFeatures(media, batchSize = 2).collect()
      .map(m => m.media_id -> m).toMap
    assert(f.keySet == Set(0L, 1L, 2L))
    assert(f(0L).n_bytes == 100)
    assert(f(0L).feature.length == 4)
    assert(f(0L).feature(0) == 100.0f) // n
    assert(f(0L).feature(1) == 49.5f)  // mean of 0..99
    // determinism
    val again = extractFeatures(media, batchSize = 2).collect()
      .map(m => m.media_id -> m.checksum).toMap
    assert(again == f.view.mapValues(_.checksum).toMap)
  }

  test("resize shrinks only image payloads to the byte budget") {
    val r = resizeImages(media, targetBytes = 10).collect()
      .map(m => m.media_id -> m.bytes.length).toMap
    assert(r == Map(0L -> 10, 1L -> 50, 2L -> 200))
  }

  test("frame sampling fans out video rows only") {
    val frames = sampleFrames(media, everyMs = 25).collect()
    assert(frames.forall(_.media_id == 2L))
    assert(frames.length == 4) // 100ms / 25ms
    assert(frames.map(_.frame_ms).toSeq == Seq(0, 25, 50, 75))
  }

  test("documents-derived media table has the declared schema") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val m = mediaFromDocuments(spark, docs)
    assert(m.schema("bytes").dataType.typeName == "binary")
    assert(m.count() == docs.count())
    val feats = extractFeatures(m.limit(10).as[MediaRow])
    assert(feats.count() == 10)
  }
}
