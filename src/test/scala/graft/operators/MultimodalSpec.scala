package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.syntheticMedia(spark, 30).cache()

  test("feature extraction: right schema, fixed dim, deterministic") {
    val f1 = Multimodal.extractFeatures(media, dim = 16, batchSize = 7).collect()
      .sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, dim = 16, batchSize = 3).collect()
      .sortBy(_.media_id)
    assert(f1.length == 30)
    assert(f1.forall(_.features.length == 16))
    // batch size must not change results — the batching is plumbing only
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.content_hash == b.content_hash)
      assert(a.features.toSeq == b.features.toSeq)
    }
  }

  test("resizeMeta clamps to the box preserving aspect") {
    val out = Multimodal.resizeMeta(media.toDF(), maxSide = 128)
      .select("width", "height", "out_width", "out_height").collect()
    out.foreach { r =>
      val (w, h, ow, oh) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(ow <= 128 + 1 && oh <= 128 + 1) // ceil rounding slack
      assert(ow <= w && oh <= h)             // never upscale
      val inAspect = w.toDouble / h
      val outAspect = ow.toDouble / oh
      assert(math.abs(inAspect - outAspect) / inAspect < 0.05)
    }
  }

  test("sampleFrames: only video rows, fps-spaced timestamps") {
    val frames = Multimodal.sampleFrames(media, fps = 2.0).collect()
    assert(frames.nonEmpty)
    val videoIds = media.filter(_.kind == "video").collect().map(_.media_id).toSet
    assert(frames.map(_.media_id).toSet.subsetOf(videoIds))
    val byId = frames.groupBy(_.media_id)
    byId.values.foreach { fs =>
      val ts = fs.sortBy(_.frame_idx).map(_.ts_ms)
      ts.sliding(2).foreach { case Array(a, b) => assert(b - a == 500); case _ => }
    }
  }
}
