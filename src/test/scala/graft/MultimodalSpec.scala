package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    MediaRow(1L, "image/png", Array.tabulate(130)(_.toByte), Map("k" -> "v")),
    MediaRow(2L, "audio/wav", Array.tabulate(64)(i => (i * 3).toByte), Map.empty),
    MediaRow(3L, "video/mp4", Array.tabulate(1024)(_.toByte), Map.empty)
  ).toDS()

  test("decodeImages: only images, deterministic dims, full pixel buffer") {
    val imgs = Multimodal.decodeImages(media).collect()
    assert(imgs.map(_.media_id).toSeq == Seq(1L))
    val img = imgs.head
    assert(img.width == 1 + 130 % 64 && img.height == 1 + (130 / 64) % 64)
    assert(img.pixels.length == img.width * img.height * img.channels)
  }

  test("extractFeatures: 16-bin histogram normalized by byte count") {
    val f = Multimodal.extractFeatures(media).collect().map(r => r.media_id -> r).toMap
    assert(f(1L).features.length == 16)
    assert(math.abs(f(1L).features.sum - 1.0f) < 1e-5)
    assert(f(3L).n_bytes == 1024L)
  }

  test("sampleFrames: stride-2 over 256-byte blocks of video only") {
    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    assert(frames.forall(_.media_id == 3L))
    assert(frames.map(_.frame_no).sorted.toSeq == Seq(0, 2)) // 4 blocks -> 0,2
    assert(frames.forall(_.frame_bytes.length == 256))
  }

  test("FakeCodec.resize keeps channels and retargets the buffer") {
    val img = FakeCodec.decode(9L, Array.tabulate(50)(_.toByte))
    val r = FakeCodec.resize(img, 8, 8)
    assert(r.width == 8 && r.height == 8 && r.pixels.length == 8 * 8 * 3)
  }

  test("end-to-end mediaFeatureStats groups by modality") {
    val stats = Multimodal.mediaFeatureStats(spark, sf).collect()
    assert(stats.map(_.getString(0)).toSet == Set("image/png", "audio/wav", "video/mp4"))
    assert(stats.map(_.getLong(1)).sum == 500L)
  }
}
