package graft.operators

import graft.SparkSpec

class Mp4Spec extends SparkSpec {

  private def oneFile(w: Int = 128, h: Int = 96, fps: Int = 25,
      nFrames: Int = 50, profile: Int = 66, rate: Int = 44100,
      ch: Int = 2, samples: Long = 81920L): Array[Byte] =
    Mp4.writeMp4(w, h, fps, nFrames, profile, rate, ch, samples,
      mdatLen = 600, fillerOf = j => j)

  test("probe recovers both tracks: dims, timing, codec, and avcC SPS cross-check") {
    val tracks = Mp4.probe(7L, oneFile()).sortBy(_.track_id)
    assert(tracks.length == 2)
    val Seq(v, a) = tracks
    assert(v.ok && v.handler == "vide" && v.codec == "avc1")
    assert(v.width == 128 && v.height == 96)
    assert(v.n_samples == 50 && v.duration_ms == 2000)
    // the avcC-embedded SPS agrees with the container-declared dims
    assert(v.sps_width == 128 && v.sps_height == 96 && v.sps_profile == 66)
    assert(a.ok && a.handler == "soun" && a.codec == "mp4a")
    assert(a.sample_rate == 44100 && a.n_channels == 2)
    assert(a.n_samples == 80 && a.duration_ms == (81920L * 1000 / 44100).toInt)
  }

  test("cropped dims survive the container round-trip via the real SPS") {
    // 1918x1080 is not MB-aligned — the SPS carries frame cropping
    val tracks = Mp4.probe(1L, oneFile(w = 1918, h = 1080, profile = 100))
    val v = tracks.find(_.codec == "avc1").get
    assert(v.width == 1918 && v.height == 1080)
    assert(v.sps_width == 1918 && v.sps_height == 1080 && v.sps_profile == 100)
  }

  test("hand-built box tree parses (independent construction, 64-bit and v1 paths)") {
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def bx(t: String, p: Array[Byte]) = be32(8L + p.length) ++ t.getBytes ++ p
    // version-1 mdhd (64-bit times) and version-1 tkhd
    val mdhdV1 = bx("mdhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(1000) ++ be64(7500) ++ be16(0x55c4) ++ be16(0))
    val tkhdV1 = bx("tkhd", Array[Byte](1, 0, 0, 7) ++ be64(0) ++ be64(0) ++
      be32(9) ++ be32(0) ++ be64(7500) ++ Array.fill[Byte](8)(0) ++
      be16(0) ++ be16(0) ++ be16(0) ++ be16(0) ++ Array.fill[Byte](36)(0) ++
      be32(640L << 16) ++ be32(480L << 16))
    val hdlr = bx("hdlr", Array.fill[Byte](8)(0) ++ "vide".getBytes ++
      Array.fill[Byte](13)(0))
    val trak = bx("trak", tkhdV1 ++ bx("mdia", mdhdV1 ++ hdlr))
    // moov wrapped in a 64-bit largesize box
    val moovPayload = trak
    val moov64 = be32(1L) ++ "moov".getBytes ++ be64(16L + moovPayload.length) ++
      moovPayload
    val file = bx("ftyp", "mini".getBytes ++ be32(0)) ++ moov64
    val tracks = Mp4.probe(3L, file)
    assert(tracks.length == 1)
    val t = tracks.head
    assert(t.track_id == 9 && t.handler == "vide")
    assert(t.width == 640 && t.height == 480)
    assert(t.duration_ms == 7500 && t.brand == "mini")
  }

  test("malformed payloads degrade: junk, truncation, missing moov") {
    assert(Mp4.probe(0L, "this is not an mp4 file".getBytes).isEmpty)
    assert(Mp4.probe(0L, Array.empty[Byte]).isEmpty)
    val good = oneFile()
    // cut inside moov: the truncated box fails its size check → no tracks
    val cutInMoov = java.util.Arrays.copyOf(good, 60)
    assert(Mp4.probe(0L, cutInMoov).isEmpty)
    // cut inside mdat only: moov is intact, both tracks still probe
    val cutInMdat = java.util.Arrays.copyOf(good, good.length - 100)
    assert(Mp4.probe(0L, cutInMdat).length == 2)
  }

  test("probe agrees with closed-form goldens (the oracle pillar)") {
    val n = 16
    val goldens = Mp4.goldens(n, seed = 17L).groupBy(_.media_id)
    val media = Mp4.syntheticMp4(spark, n, seed = 17L).collect()
    media.foreach { r =>
      val tracks = Mp4.probe(r.media_id, r.bytes)
      val g = goldens(r.media_id).map(x => x.codec -> x).toMap
      assert(tracks.length == 2)
      val v = tracks.find(_.codec == "avc1").get
      val gv = g("avc1")
      assert(r.bytes.length.toLong == gv.n_bytes)
      assert(v.width == gv.width && v.height == gv.height)
      assert(v.n_samples == gv.n_samples && v.duration_ms == gv.duration_ms)
      assert((v.sps_width == v.width && v.sps_height == v.height) ==
        (gv.sps_matches == 1))
      val a = tracks.find(_.codec == "mp4a").get
      val ga = g("mp4a")
      assert(a.sample_rate == ga.sample_rate && a.n_channels == ga.n_channels)
      assert(a.n_samples == ga.n_samples && a.duration_ms == ga.duration_ms)
    }
  }

  test("probeMp4 dataset surface: one row per track, batch-size invariant") {
    val media = Mp4.syntheticMp4(spark, 10, seed = 17L).cache()
    val t1 = Mp4.probeMp4(media, batchSize = 3).collect()
      .sortBy(r => (r.media_id, r.track_id))
    val t2 = Mp4.probeMp4(media, batchSize = 64).collect()
      .sortBy(r => (r.media_id, r.track_id))
    assert(t1.toSeq == t2.toSeq)
    assert(t1.length == 20 && t1.forall(_.ok))
  }
}
