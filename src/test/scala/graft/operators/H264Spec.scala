package graft.operators

import graft.SparkSpec

class H264Spec extends SparkSpec {

  /** Independent MSB-first bit builder — deliberately NOT the production
    * BitWriter, so hand-built SPS tests don't share encode logic. */
  private final class Bits {
    private val sb = new StringBuilder
    def b(v: Int): Bits = { sb.append(if (v == 0) '0' else '1'); this }
    def u(v: Long, w: Int): Bits = {
      (w - 1 to 0 by -1).foreach(i => b(((v >> i) & 1L).toInt)); this
    }
    def ue(k: Int): Bits = {
      val v = k + 1
      val len = 32 - Integer.numberOfLeadingZeros(v)
      u(0, len - 1); u(v.toLong, len)
    }
    def se(k: Int): Bits = ue(if (k > 0) 2 * k - 1 else -2 * k)
    def toBytes: Array[Byte] = {
      sb.append('1') // rbsp stop bit
      while (sb.length % 8 != 0) sb.append('0')
      sb.toString.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    }
  }

  test("SPS round-trip: profile/level/dims/fps recovered, crop exercised") {
    for {
      (w, h) <- Seq((64, 48), (160, 128), (1920, 1080), (34, 98), (1280, 720))
      profile <- Seq(66, 100)
      fps <- Seq(24, 30)
    } {
      val rbsp = H264.writeSps(profile, 31, w, h, fps, 1)
      val Some(sps) = H264.parseSps(rbsp)
      assert(sps.profileIdc == profile && sps.levelIdc == 31)
      assert(sps.width == w && sps.height == h, s"dims for ${w}x$h")
      // fps = fpsNum/fpsDen; writer stores time_scale=2*fps, tick=1
      assert(sps.fpsNum == 2 * fps && sps.fpsDen == 2)
    }
  }

  test("hand-built SPS parses (independent bit construction)") {
    // baseline 66, level 30, 4 MBs x 3 map units = 64x48, poc type 0,
    // no crop, no VUI — built WITHOUT the production writer
    val rbsp = new Bits()
      .u(66, 8).u(0, 8).u(30, 8)
      .ue(0) // sps id
      .ue(0) // log2_max_frame_num_minus4
      .ue(0) // pic_order_cnt_type 0
      .ue(0) //   log2_max_pic_order_cnt_lsb_minus4
      .ue(2) // max_num_ref_frames
      .b(0) // gaps
      .ue(3).ue(2) // 4 x 3 macroblocks
      .b(1) // frame_mbs_only
      .b(1) // direct_8x8
      .b(0) // no crop
      .b(0) // no vui
      .toBytes
    val Some(sps) = H264.parseSps(rbsp)
    assert(sps == H264.SpsInfo(66, 30, 64, 48, 0, 0))
  }

  test("hand-built high-profile SPS with scaling matrix and poc type 1") {
    val bits = new Bits()
      .u(100, 8).u(0, 8).u(40, 8)
      .ue(0) // sps id
      .ue(1) // chroma_format_idc 4:2:0
      .ue(0).ue(0) // bit depths
      .b(0) // transform bypass
      .b(1) // seq_scaling_matrix_present
    // list 0 present with a short non-trivial run, lists 1-7 absent
    bits.b(1)
    (0 until 16).foreach(_ => bits.se(1)) // nextScale walks 9,10,...
    (1 until 8).foreach(_ => bits.b(0))
    bits
      .ue(4) // log2_max_frame_num_minus4
      .ue(1) // pic_order_cnt_type 1
      .b(0).se(-1).se(2) // delta_always_zero, two offsets
      .ue(2).se(3).se(-4) // 2-entry ref-frame offset cycle
      .ue(1) // max_num_ref_frames
      .b(0)
      .ue(7).ue(4) // 8 x 5 MBs = 128x80
      .b(1).b(1)
      .b(1).ue(1).ue(2).ue(0).ue(1) // crop l1 r2 t0 b1 (units of 2)
      .b(0) // no vui
    val Some(sps) = H264.parseSps(bits.toBytes)
    // width 128 - 2*(1+2) = 122; height 80 - 2*(0+1) = 78
    assert(sps == H264.SpsInfo(100, 40, 122, 78, 0, 0))
  }

  test("emulation prevention round-trips adversarial byte runs") {
    val cases = Seq(
      Array[Byte](0, 0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 9),
      Array[Byte](0, 0, 0),
      Array[Byte](1, 0, 0, 0, 0, 0, 1),
      Array.fill[Byte](64)(0))
    cases.foreach { rbsp =>
      val ebsp = H264.emulationPrevent(rbsp)
      // no start-code-forming 00 00 0x remains
      assert(!ebsp.sliding(3).exists(t =>
        t.length == 3 && t(0) == 0 && t(1) == 0 && (t(2) & 0xff) <= 2))
      val back = H264.emulationStrip(ebsp, 0, ebsp.length)
      assert(back.toSeq == rbsp.toSeq)
    }
  }

  test("stream parse agrees with closed-form goldens (the oracle pillar)") {
    val n = 24
    val goldens = H264.goldens(n, seed = 11L)
    (0L until n.toLong).foreach { i =>
      val rnd = new scala.util.Random(11L + i)
      val w = 32 + 2 * rnd.nextInt(65)
      val h = 32 + 2 * rnd.nextInt(49)
      val fps = Seq(24, 25, 30)(rnd.nextInt(3))
      val nFrames = 8 + rnd.nextInt(41)
      val profile = if (i % 2 == 0) 66 else 100
      val bytes = H264.writeStream(profile, 31, w, h, fps, nFrames, rnd, i.toInt)
      val g = goldens(i.toInt)
      assert(bytes.length == g.n_bytes, s"total bytes, item $i")
      val Some(m) = H264.parse(bytes)
      assert(m.sps.width == g.width && m.sps.height == g.height)
      assert(m.sps.profileIdc == g.profile_idc)
      assert(m.nFrames == g.n_frames && m.nIdr == g.n_idr && m.nVcl == g.n_vcl)
      assert(m.durationMs == g.duration_ms)
      assert(math.abs(m.avgVclBytes - g.avg_vcl_bytes) < 1e-9)
    }
  }

  test("3-byte start codes and trailing zero padding parse identically") {
    val rnd = new scala.util.Random(5L)
    val four = H264.writeStream(66, 31, 64, 64, 25, 9, rnd, 0)
    // rewrite every 4-byte start code as 3-byte, append zero padding
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < four.length) {
      if (i + 3 < four.length && four(i) == 0 && four(i + 1) == 0 &&
        four(i + 2) == 0 && four(i + 3) == 1) {
        out.write(Array[Byte](0, 0, 1)); i += 4
      } else { out.write(four(i)); i += 1 }
    }
    out.write(Array[Byte](0, 0))
    val Some(a) = H264.parse(four)
    val Some(b) = H264.parse(out.toByteArray)
    assert(a.sps == b.sps && a.nFrames == b.nFrames && a.nVcl == b.nVcl)
  }

  test("malformed and truncated payloads degrade, never throw") {
    assert(H264.parse("nothing here".getBytes).isEmpty)
    assert(H264.parse(Array[Byte](0, 0, 1)).isEmpty)
    assert(H264.parse(Array.empty[Byte]).isEmpty)
    val rnd = new scala.util.Random(6L)
    val good = H264.writeStream(100, 31, 96, 64, 24, 12, rnd, 1)
    // truncations must either parse a prefix or return None — no throw
    Seq(1, 7, 20, good.length / 2, good.length - 3).foreach { cut =>
      H264.parse(java.util.Arrays.copyOf(good, cut)) // must not throw
    }
    // SPS-less stream (slices only) is unparseable by contract
    val spsEnd = {
      var idx = -1
      (4 until good.length - 3).find(j =>
        good(j) == 0 && good(j + 1) == 0 && good(j + 2) == 0 && good(j + 3) == 1)
        .foreach(idx = _)
      idx
    }
    val noSps = java.util.Arrays.copyOfRange(good, spsEnd, good.length)
    assert(H264.parse(noSps).isEmpty)
  }

  test("keyframeIndex: one row per picture, usable as a byte-range seek table") {
    val media = H264.syntheticH264(spark, 10, seed = 11L)
    val rows = H264.keyframeIndex(media).collect().groupBy(_.media_id)
    val bytesById = media.collect().map(r => r.media_id -> r.bytes).toMap
    val goldens = H264.goldens(10, 11L).map(g => g.media_id -> g).toMap
    rows.foreach { case (id, frames) =>
      val sorted = frames.sortBy(_.frame_idx)
      assert(sorted.length == goldens(id).n_frames)
      assert(sorted.head.is_idr, "stream must open on a keyframe")
      assert(sorted.count(_.is_idr) == goldens(id).n_idr)
      // offsets strictly increase and each range IS a NAL of the right kind
      val b = bytesById(id)
      sorted.sliding(2).foreach {
        case Array(x, y) => assert(x.byte_offset < y.byte_offset)
        case _ =>
      }
      sorted.foreach { fr =>
        val sc = if (b(fr.byte_offset + 2) == 1) 3 else 4
        val nalType = b(fr.byte_offset + sc) & 0x1f
        assert(nalType == (if (fr.is_idr) 5 else 1))
      }
    }
  }

  test("decodeH264 + decodeMedia surface: ok rows match goldens; batch-size invariant") {
    val media = H264.syntheticH264(spark, 12, seed = 11L).cache()
    val d1 = H264.decodeH264(media, batchSize = 5).collect().sortBy(_.media_id)
    val d2 = H264.decodeH264(media, batchSize = 64).collect().sortBy(_.media_id)
    assert(d1.toSeq == d2.toSeq)
    val goldens = H264.goldens(12, 11L)
    d1.zip(goldens).foreach { case (d, g) =>
      assert(d.ok && d.width == g.width && d.height == g.height &&
        d.n_frames == g.n_frames && d.duration_ms == g.duration_ms)
    }
    // uniform surface: the generic decodeMedia handles kind=h264 too
    val viaGeneric = Multimodal.decodeMedia(media).collect().sortBy(_.media_id)
    viaGeneric.zip(goldens).foreach { case (d, g) =>
      assert(d.ok && d.kind == "h264" && d.width == g.width &&
        d.n_frames == g.n_frames)
      assert(math.abs(d.signal_stat - g.avg_vcl_bytes) < 1e-9)
    }
  }

  test("golden aggregate SQL is well-formed and consistent with goldens") {
    val sql = H264.goldenAggregateSql(40)
    assert(sql.contains("VALUES") && sql.contains("profile_idc"))
    val goldens = H264.goldens(40)
    // two profile groups (even ids 66, odd 100), 20 items each
    assert(goldens.count(_.profile_idc == 66) == 20)
    assert(goldens.count(_.profile_idc == 100) == 20)
    assert(sql.linesIterator.count(_.contains("(66,")) == 1)
  }
}
