package graft.operators

import graft.SparkSpec

class AdtsSpec extends SparkSpec {

  test("frame round-trip: header fields recovered for every rate/channel combo") {
    for {
      sfi <- 0 until Adts.SampleRates.length
      channels <- Seq(1, 2, 6)
      profile <- Seq(0, 1, 3)
    } {
      val frame = Adts.writeFrame(profile, sfi, channels, 100, j => j)
      val Some(m) = Adts.parse(frame)
      assert(m.profile == profile && m.sampleRate == Adts.SampleRates(sfi))
      assert(m.channels == channels && m.nFrames == 1)
      assert(m.nSamples == 1024L && m.avgFrameBytes == 107.0)
    }
  }

  test("hand-packed header parses (independent byte construction)") {
    // 48 kHz (sfi=3) stereo LC, frameLen=135, one 128-byte payload —
    // bytes packed by hand from the 56-bit ADTS layout, not writeFrame
    val frameLen = 135
    val hdr = Array(
      0xff, 0xf1,
      (1 << 6) | (3 << 2) | 0, // profile LC=1, sfi=3, ch hi bit 0
      (2 << 6) | ((frameLen >> 11) & 0x3), // ch lo=2, len hi
      (frameLen >> 3) & 0xff,
      ((frameLen & 0x7) << 5) | 0x1f,
      0xfc).map(_.toByte)
    val bytes = hdr ++ Array.fill[Byte](128)(0x41)
    val Some(m) = Adts.parse(bytes)
    assert(m == Adts.AdtsMeta(1, 48000, 2, 1, 1024L,
      1024 * 1000 / 48000, 135.0))
  }

  test("stream walk agrees with closed-form goldens (the oracle pillar)") {
    val n = 20
    val goldens = Adts.goldens(n, seed = 13L)
    (0L until n.toLong).foreach { i =>
      val rnd = new scala.util.Random(13L + i)
      val sfi = 3 + rnd.nextInt(9)
      val channels = 1 + rnd.nextInt(2)
      val nFrames = 20 + rnd.nextInt(200)
      val bytes = Adts.writeStream(1, sfi, channels, nFrames, rnd, i.toInt)
      val g = goldens(i.toInt)
      assert(bytes.length.toLong == g.n_bytes, s"total bytes, item $i")
      val Some(m) = Adts.parse(bytes)
      assert(m.sampleRate == g.sample_rate && m.channels == g.n_channels)
      assert(m.nFrames == g.n_frames && m.nSamples == g.n_samples)
      assert(m.durationMs == g.duration_ms)
      assert(math.abs(m.avgFrameBytes - g.avg_frame_bytes) < 1e-9)
    }
  }

  test("junk prefix is scanned past; truncation yields prefix semantics") {
    val rnd = new scala.util.Random(3L)
    val clean = Adts.writeStream(1, 4, 2, 10, rnd, 0)
    val withJunk = "ID3junkpadding".getBytes ++ clean
    val Some(a) = Adts.parse(clean)
    val Some(b) = Adts.parse(withJunk)
    assert(a == b)
    // cut mid-frame: the walk stops at the break, keeping whole frames
    val cut = java.util.Arrays.copyOf(clean, clean.length - 5)
    val Some(c) = Adts.parse(cut)
    assert(c.nFrames == 9 && c.sampleRate == a.sampleRate)
    assert(Adts.parse("no sync here at all".getBytes).isEmpty)
    assert(Adts.parse(Array.empty[Byte]).isEmpty)
  }

  test("decodeAdts + generic decodeMedia surface; batch-size invariant") {
    val media = Adts.syntheticAdts(spark, 12, seed = 13L).cache()
    val d1 = Adts.decodeAdts(media, batchSize = 5).collect().sortBy(_.media_id)
    val d2 = Adts.decodeAdts(media, batchSize = 64).collect().sortBy(_.media_id)
    assert(d1.toSeq == d2.toSeq)
    val goldens = Adts.goldens(12, 13L)
    d1.zip(goldens).foreach { case (d, g) =>
      assert(d.ok && d.sample_rate == g.sample_rate &&
        d.n_channels == g.n_channels && d.n_frames == g.n_frames &&
        d.duration_ms == g.duration_ms)
    }
    val viaGeneric = Multimodal.decodeMedia(media).collect().sortBy(_.media_id)
    viaGeneric.zip(goldens).foreach { case (d, g) =>
      assert(d.ok && d.kind == "aac" && d.sample_rate == g.sample_rate &&
        d.n_frames == g.n_frames)
      assert(math.abs(d.signal_stat - g.avg_frame_bytes) < 1e-9)
    }
  }

  test("golden aggregate SQL covers the drawn sample-rate groups") {
    val sql = Adts.goldenAggregateSql(60)
    assert(sql.contains("VALUES") && sql.contains("sample_rate"))
    val rates = Adts.goldens(60).map(_.sample_rate).distinct.sorted
    rates.foreach(r => assert(sql.contains(s"($r, "), s"rate $r missing"))
  }
}
