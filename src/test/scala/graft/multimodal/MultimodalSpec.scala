package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(rows: (Long, String, String)*) =
    rows.map { case (id, tpe, text) =>
      MediaRecord(id, tpe, text.getBytes("UTF-8"))
    }.toDS()

  test("decodeMeta produces typed, deterministic metadata per media type") {
    val ds = media(
      (1L, "image", "fake png bytes here"),
      (2L, "audio", "fake wav bytes here"),
      (3L, "video", "fake mp4 bytes here"))
    val metas = decodeMeta(ds).collect().map(m => m.mediaId -> m).toMap
    assert(metas(1L).durationMs === 0L, "stills have no duration")
    assert(metas(1L).width > 0 && metas(1L).height > 0)
    assert(metas(2L).width === 0 && metas(2L).height === 0)
    assert(metas(2L).durationMs > 0)
    assert(metas(3L).format === "mp4")
    // deterministic: same input → same output
    assert(decodeMeta(ds).collect().toSet === decodeMeta(ds).collect().toSet)
  }

  test("extractFeatures yields fixed-dim vectors, stable across runs") {
    val ds = media((1L, "image", "abcdef" * 100), (2L, "image", "ghijkl" * 100))
    val f1 = extractFeatures(ds, dim = 16).collect().map(f => f.mediaId -> f.features.toSeq).toMap
    val f2 = extractFeatures(ds, dim = 16).collect().map(f => f.mediaId -> f.features.toSeq).toMap
    assert(f1.values.forall(_.length == 16))
    assert(f1 === f2)
    assert(f1(1L) !== f1(2L), "different content → different features")
  }

  test("sampleFrames emits every stride-th 1KiB slice") {
    val ds = media((9L, "video", "x" * 5000))
    val frames = sampleFrames(ds, stride = 2).collect()
    // offsets 0, 2048, 4096 → 3 frames
    assert(frames.map(_.frameIdx).sorted.toSeq === Seq(0, 1, 2))
    assert(frames.forall(_.frame.length <= 1024))
  }

  test("resize truncates long blobs and zero-pads short ones to the byte budget") {
    val ds = media((1L, "image", "x" * 500), (2L, "image", "ab"))
    val out = resize(ds, targetBytes = 16).collect().map(r => r.mediaId -> r.content).toMap
    assert(out(1L).length === 16)
    assert(out(1L).forall(_ == 'x'.toByte))
    assert(out(2L).length === 16)
    assert(out(2L).take(2).toSeq === "ab".getBytes("UTF-8").toSeq)
    assert(out(2L).drop(2).forall(_ == 0.toByte), "padding must be zero bytes")
  }

  test("fromDocuments maps driver docs into the media schema") {
    graft.GraftSession.tune(spark)
    val ds = fromDocuments(spark, sfSmoke)
    val types = ds.groupByKey(_.mediaType).count().collect().toMap
    assert(types.keySet === Set("image", "audio", "video"))
    assert(ds.count() === 500)
  }
}
