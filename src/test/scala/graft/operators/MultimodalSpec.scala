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

  test("BMP round-trip: parse recovers header fields and exact mean pixel") {
    val bytes = Multimodal.writeBmp(5, 3, (x, y) => x * 10 + y)
    val Some((w, h, bpp, mean)) = Multimodal.parseBmp(bytes)
    assert((w, h, bpp) == ((5, 3, 24)))
    val expected = (for { y <- 0 until 3; x <- 0 until 5 } yield x * 10 + y)
      .sum.toDouble / 15
    assert(math.abs(mean - expected) < 1e-9)
    assert(Multimodal.parseBmp("notabmp".getBytes).isEmpty)
  }

  test("WAV round-trip: parse recovers rate, duration, and RMS") {
    val samples = Array.tabulate(8000)(t =>
      (math.sin(2 * math.Pi * 440 * t / 8000.0) * 10000).toShort)
    val Some((rate, ch, durMs, rms)) =
      Multimodal.parseWav(Multimodal.writeWav(8000, samples))
    assert(rate == 8000 && ch == 1 && durMs == 1000)
    // RMS of a sine is amplitude/sqrt(2)
    assert(math.abs(rms - 10000 / math.sqrt(2)) / rms < 0.01)
    assert(Multimodal.parseWav(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("Y4M round-trip: parse recovers dims, frame count, duration, mean luma") {
    val bytes = Multimodal.writeY4m(6, 4, fpsNum = 25, fpsDen = 1, nFrames = 50,
      (f, x, y) => x + y + f)
    val Some((w, h, nf, durMs, luma)) = Multimodal.parseY4m(bytes)
    assert((w, h, nf, durMs) == ((6, 4, 50, 2000)))
    val expected = (for { f <- 0 until 50; y <- 0 until 4; x <- 0 until 6 }
      yield (x + y + f) & 0xff).sum.toDouble / (50 * 24)
    assert(math.abs(luma - expected) < 1e-9)
    assert(Multimodal.parseY4m("nota y4m stream".getBytes).isEmpty)
    // truncated payload (half the last frame missing) must not parse
    assert(Multimodal.parseY4m(bytes.take(bytes.length - 10)).isEmpty)
  }

  test("JPEG/PNG round-trip: imageio decode recovers dims and mean pixel") {
    def expectedMean(w: Int, h: Int) =
      (for { y <- 0 until h; x <- 0 until w } yield (x * 3 + y * 5) % 200)
        .sum.toDouble / (w * h)
    // PNG is lossless: the mean must come back exact
    val png = Multimodal.writeImage(9, 7, "png", (x, y) => (x * 3 + y * 5) % 200)
    val Some((pw, ph, pbpp, pmean)) = Multimodal.parseImage(png)
    assert((pw, ph) == ((9, 7)) && pbpp > 0)
    assert(math.abs(pmean - expectedMean(9, 7)) < 1e-9)
    // JPEG is lossy: dims exact, mean within a small tolerance (gray input)
    val jpg = Multimodal.writeImage(16, 12, "jpg", (x, y) => (x * 3 + y * 5) % 200)
    val Some((jw, jh, _, jmean)) = Multimodal.parseImage(jpg)
    assert((jw, jh) == ((16, 12)))
    assert(math.abs(jmean - expectedMean(16, 12)) < 3.0)
    // corrupt payloads -> None, never an exception
    assert(Multimodal.parseImage("notanimage".getBytes).isEmpty)
    assert(Multimodal.parseImage(jpg.take(20)).isEmpty)
  }

  test("decodeMedia: every payload of all five kinds decodes") {
    val decoded = Multimodal.decodeMedia(media, batchSize = 7).collect()
    assert(decoded.length == 30)
    val byKind = decoded.groupBy(_.kind)
    assert(byKind.keySet == Set("image", "audio", "video", "jpeg", "png"))
    assert(byKind("image").forall(d => d.ok && d.bpp == 24 &&
      d.width >= 4 && d.height >= 4))
    assert(byKind("audio").forall(d => d.ok && d.sample_rate == 8000 &&
      d.duration_ms > 0 && d.signal_stat > 0))
    assert(byKind("video").forall(d => d.ok && d.n_frames >= 25 &&
      d.bpp == 12 && d.signal_stat > 0))
    assert(byKind("jpeg").forall(d => d.ok && d.bpp > 0 && d.signal_stat > 0))
    assert(byKind("png").forall(d => d.ok && d.bpp > 0 && d.signal_stat > 0))
    // decoded headers agree with the generator's metadata columns
    val meta = media.collect().map(r => r.media_id -> r).toMap
    (byKind("image") ++ byKind("jpeg") ++ byKind("png")).foreach { d =>
      assert(d.width == meta(d.media_id).width &&
        d.height == meta(d.media_id).height)
    }
    byKind("audio").foreach { d =>
      assert(d.duration_ms == meta(d.media_id).duration_ms)
    }
    byKind("video").foreach { d =>
      assert(d.width == meta(d.media_id).width &&
        d.height == meta(d.media_id).height &&
        d.duration_ms == meta(d.media_id).duration_ms)
    }
    // a corrupted payload degrades to ok=false, not a task failure
    import spark.implicits._
    val bad = Multimodal.decodeMedia(Seq(
      Multimodal.MediaRow(99L, "video", Array[Byte](1, 2, 3), 0, 0, 0, 0)).toDS())
      .collect()
    assert(bad.length == 1 && !bad(0).ok)
  }

  test("resizeMeta clamps to the box preserving aspect") {
    // audio rows carry no pixel dims (width = 0) — resize applies to visual kinds
    val out = Multimodal.resizeMeta(media.filter(_.kind != "audio").toDF(), maxSide = 128)
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

  test("goldens: the real decode reproduces the independent expectations " +
    "item by item, EXACTLY") {
    val n = 100
    val expected = Multimodal.goldens(n).map(g => g.media_id -> g).toMap
    val fixture = Multimodal.syntheticMedia(spark, n)
    val decoded = Multimodal.decodeMedia(fixture).collect()
    assert(decoded.length == n)
    decoded.foreach { d =>
      val g = expected(d.media_id)
      assert(d.ok, s"item ${d.media_id} (${d.kind}) failed to decode")
      assert(d.kind == g.kind)
      // bit-for-bit: both sides sum the same integers / squares in the
      // same order, so the doubles are identical, not merely close
      assert(d.signal_stat == g.signal_stat,
        s"item ${d.media_id} (${d.kind}): decode ${d.signal_stat} != golden ${g.signal_stat}")
    }
    // payload sizes: generation-side lengths match the goldens' closed
    // forms (and the encoder output for jpeg/png)
    val sizes = fixture.collect().map(r => r.media_id -> r.bytes.length).toMap
    expected.values.foreach(g => assert(sizes(g.media_id) == g.n_bytes,
      s"item ${g.media_id} (${g.kind}): n_bytes ${sizes(g.media_id)} != golden ${g.n_bytes}"))
    // frame sampling at 1 fps matches the closed-form count per video
    val frameCounts = Multimodal.sampleFrames(fixture, fps = 1.0).collect()
      .groupBy(_.media_id).view.mapValues(_.length).toMap
    expected.values.filter(_.kind == "video").foreach(g =>
      assert(frameCounts(g.media_id) == g.n_frames_1fps))
  }

  test("goldens: the gated aggregate equals the inline-VALUES oracle") {
    // the oracle SQL is generated FROM the independent computation, so
    // this pins the whole chain: real pipeline -> aggregate -> literals
    val out = graft.SparkEntry.queries("q_x_multimodal")(spark, "unused")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5)))
    val sql = graft.SparkEntry.oracleSql("q_x_multimodal")
    // Spark parses the same inline-table syntax DuckDB runs
    val oracle = spark.sql(sql)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5)))
    assert(out.toSeq == oracle.toSeq)
  }
}
