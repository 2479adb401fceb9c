package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** ISO-BMFF / MP4 (ISO/IEC 14496-12/-14) container probe — the at-rest
  * format video corpora actually arrive in. Completes the structural
  * decode family: [[H264]] reads elementary streams, this reads the
  * container those streams ship inside.
  *
  * REAL (pure big-endian byte arithmetic, works on real-world `.mp4`
  * files): the box-tree walk (32-bit and 64-bit `largesize` boxes,
  * to-end-of-file size-0 boxes), `ftyp` brand, per-`trak` parsing —
  * `tkhd` track id + 16.16 fixed-point presentation dims (versions 0
  * and 1), `mdhd` media timescale/duration (versions 0 and 1), `hdlr`
  * handler type, `stsd` sample-entry fourcc,
  * `stts` sample census — and, for `avc1` video tracks, the
  * `avcC` AVCDecoderConfigurationRecord: its embedded SPS is handed to
  * [[H264.parseSps]], so container-declared dims are CROSS-CHECKED
  * against bitstream-declared dims (the mismatch ffprobe flags on
  * mangled files). For `mp4a` audio, channel count and 16.16 sample
  * rate come from the AudioSampleEntry. Sample DATA (`mdat`) is never
  * touched — the probe reads structure only, which is what lets a
  * 100 TB corpus be inventoried by codec/resolution/duration with
  * range-GETs of a few KB per file.
  */
object Mp4 {

  /** One track row: container-declared metadata + (for avc1) the
    * bitstream-declared SPS dims parsed from avcC. `sps_width`/
    * `sps_height` are 0 for non-video tracks. */
  final case class Mp4Track(media_id: Long, ok: Boolean, brand: String,
      track_id: Int, handler: String, codec: String,
      width: Int, height: Int, sample_rate: Int, n_channels: Int,
      n_samples: Long, duration_ms: Int,
      sps_width: Int, sps_height: Int, sps_profile: Int)

  // ───────────────────────── byte-level helpers ─────────────────────────

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Walks sibling boxes in [from, until); `f(type, payloadFrom,
    * payloadUntil)`. Malformed sizes end the walk (prefix semantics). */
  private def forEachBox(b: Array[Byte], from: Int, until: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var i = from
    var ok = true
    while (ok && i + 8 <= until) {
      val size32 = u32(b, i)
      val typ = fourcc(b, i + 4)
      val (size, hdr) =
        if (size32 == 1L && i + 16 <= until) (u64(b, i + 8), 16)
        else if (size32 == 0L) ((until - i).toLong, 8) // box extends to end
        else (size32, 8)
      if (size < hdr || i + size > until) ok = false
      else {
        f(typ, i + hdr, i + size.toInt)
        i += size.toInt
      }
    }
  }

  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl")

  /** Probes one MP4 payload into its track rows. Empty when no `moov`
    * parses. All failures degrade, never throw. */
  def probe(mediaId: Long, bytes: Array[Byte]): Seq[Mp4Track] =
    try {
      var brand = ""
      var tracks = List.empty[Mp4Track]
      // per-trak accumulator state, reset at each trak boundary
      def walkTrak(from: Int, until: Int): Option[Mp4Track] = {
        var trackId = -1; var w = 0; var h = 0
        var timescale = 0L; var duration = 0L
        var handler = ""; var codec = ""
        var rate = 0; var channels = 0; var nSamples = 0L
        var spsW = 0; var spsH = 0; var spsProfile = 0
        def walk(f: Int, u: Int): Unit = forEachBox(bytes, f, u) { (t, pf, pu) =>
          t match {
            case c if Containers.contains(c) => walk(pf, pu)
            case "tkhd" =>
              val v = bytes(pf) & 0xff
              val base = pf + 4 // past version/flags
              if (v == 1) { // 64-bit times: ct8+mt8+id4+res4+dur8 then layout
                trackId = u32(bytes, base + 16).toInt
                w = (u32(bytes, pu - 8) >> 16).toInt
                h = (u32(bytes, pu - 4) >> 16).toInt
              } else {
                trackId = u32(bytes, base + 8).toInt
                w = (u32(bytes, pu - 8) >> 16).toInt // 16.16 fixed point
                h = (u32(bytes, pu - 4) >> 16).toInt
              }
            case "mdhd" =>
              val v = bytes(pf) & 0xff
              if (v == 1) {
                timescale = u32(bytes, pf + 4 + 16)
                duration = u64(bytes, pf + 4 + 20)
              } else {
                timescale = u32(bytes, pf + 4 + 8)
                duration = u32(bytes, pf + 4 + 12)
              }
            case "hdlr" =>
              handler = fourcc(bytes, pf + 8)
            case "stts" =>
              val entries = u32(bytes, pf + 4).toInt
              var e = 0
              while (e < entries && pf + 8 + e * 8 + 8 <= pu) {
                nSamples += u32(bytes, pf + 8 + e * 8)
                e += 1
              }
            case "stsd" =>
              val entries = u32(bytes, pf + 4).toInt
              if (entries > 0 && pf + 16 <= pu) {
                val entryStart = pf + 8
                codec = fourcc(bytes, entryStart + 4)
                if (codec == "mp4a" && entryStart + 36 <= pu) {
                  channels = u16(bytes, entryStart + 24)
                  rate = (u32(bytes, entryStart + 32) >> 16).toInt
                } else if (codec == "avc1") {
                  // VisualSampleEntry is 86 bytes; child boxes follow
                  forEachBox(bytes, entryStart + 86,
                    entryStart + u32(bytes, entryStart).toInt) { (ct, cf, cu) =>
                    if (ct == "avcC" && cu - cf >= 8) {
                      // cfgVer, profile, compat, level, lenSize, numSPS
                      val numSps = bytes(cf + 5) & 0x1f
                      if (numSps >= 1) {
                        val spsLen = u16(bytes, cf + 6)
                        if (cf + 8 + spsLen <= cu && spsLen > 1) {
                          // strip the NAL header byte, de-emulate, parse
                          H264.parseSps(H264.emulationStrip(
                            bytes, cf + 9, cf + 8 + spsLen)).foreach { s =>
                            spsW = s.width; spsH = s.height
                            spsProfile = s.profileIdc
                          }
                        }
                      }
                    }
                  }
                }
              }
            case _ => // mdat/free/stco/stsz/... — structure we don't need
          }
        }
        walk(from, until)
        if (trackId < 0 || timescale <= 0) None
        else Some(Mp4Track(mediaId, ok = true, brand, trackId, handler,
          codec, w, h, rate, channels, nSamples,
          (duration * 1000L / timescale).toInt, spsW, spsH, spsProfile))
      }
      forEachBox(bytes, 0, bytes.length) { (t, pf, pu) =>
        t match {
          case "ftyp" => brand = fourcc(bytes, pf)
          case "moov" => forEachBox(bytes, pf, pu) { (mt, mf, mu) =>
            if (mt == "trak") walkTrak(mf, mu).foreach(tr => tracks ::= tr)
          }
          case _ =>
        }
      }
      tracks.reverse
    } catch { case _: Exception => Seq.empty }

  // ───────────────────────────── writer ─────────────────────────────

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val total = 8 + payload.map(_.length).sum
    val out = new java.io.ByteArrayOutputStream(total)
    out.write(be32(total.toLong))
    out.write(typ.getBytes("US-ASCII"))
    payload.foreach(out.write)
    out.toByteArray
  }
  private def full(ver: Int): Array[Byte] = Array(ver.toByte, 0, 0, 0)

  private def mvhd(timescale: Long, duration: Long): Array[Byte] = {
    val matrix = (Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L,
      0x40000000L)).flatMap(be32(_)).toArray
    box("mvhd", full(0), be32(0), be32(0), be32(timescale), be32(duration),
      be32(0x00010000L), be16(0x0100), be16(0), be32(0), be32(0), matrix,
      Array.fill[Byte](24)(0), be32(3))
  }

  private def tkhd(trackId: Int, duration: Long, w: Int, h: Int): Array[Byte] = {
    val matrix = (Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L,
      0x40000000L)).flatMap(be32(_)).toArray
    box("tkhd", Array(0.toByte, 0, 0, 7), be32(0), be32(0),
      be32(trackId.toLong), be32(0), be32(duration),
      Array.fill[Byte](8)(0), be16(0), be16(0), be16(0), be16(0), matrix,
      be32(w.toLong << 16), be32(h.toLong << 16))
  }

  private def mdhd(timescale: Long, duration: Long): Array[Byte] =
    box("mdhd", full(0), be32(0), be32(0), be32(timescale), be32(duration),
      be16(0x55c4), be16(0))

  private def hdlr(handler: String): Array[Byte] =
    box("hdlr", full(0), be32(0), handler.getBytes("US-ASCII"),
      Array.fill[Byte](12)(0), Array(0.toByte))

  private def stts(nSamples: Long, delta: Long): Array[Byte] =
    box("stts", full(0), be32(1), be32(nSamples), be32(delta))

  private def stsz(nSamples: Long, fixedSize: Long): Array[Byte] =
    box("stsz", full(0), be32(fixedSize), be32(nSamples))

  private def stco(): Array[Byte] = box("stco", full(0), be32(0))

  /** avc1 VisualSampleEntry (86 bytes) + avcC carrying a REAL SPS from
    * [[H264.writeSps]] (emulation-prevented like an in-stream NAL). */
  private def avc1Entry(w: Int, h: Int, profile: Int, level: Int,
      fps: Int): Array[Byte] = {
    val sps = 0x67.toByte +:
      H264.emulationPrevent(H264.writeSps(profile, level, w, h, fps, 1))
    val pps = 0x68.toByte +: H264.emulationPrevent(H264.writePps())
    val avcc = box("avcC",
      Array(1.toByte, profile.toByte, 0.toByte, level.toByte,
        0xff.toByte, 0xe1.toByte),
      be16(sps.length), sps, Array(1.toByte), be16(pps.length), pps)
    box("avc1", Array.fill[Byte](6)(0), be16(1),
      Array.fill[Byte](16)(0), be16(w), be16(h),
      be32(0x00480000L), be32(0x00480000L), be32(0), be16(1),
      Array.fill[Byte](32)(0), be16(24), be16(0xffff), avcc)
  }

  /** mp4a AudioSampleEntry (36 bytes; esds omitted — the probe reads
    * rate/channels from the entry itself, as ffprobe does first). */
  private def mp4aEntry(rate: Int, channels: Int): Array[Byte] =
    box("mp4a", Array.fill[Byte](6)(0), be16(1),
      Array.fill[Byte](8)(0), be16(channels), be16(16), be16(0), be16(0),
      be32(rate.toLong << 16))

  private def trak(trackId: Int, handler: String, timescale: Long,
      duration: Long, w: Int, h: Int, nSamples: Long,
      entry: Array[Byte]): Array[Byte] =
    box("trak", tkhd(trackId, duration, w, h),
      box("mdia", mdhd(timescale, duration), hdlr(handler),
        box("minf", box("stbl",
          box("stsd", full(0), be32(1), entry),
          stts(nSamples, if (nSamples > 0) duration / math.max(1, nSamples) else 0),
          stsz(nSamples, 256), stco()))))

  /** Minimal valid two-track MP4: `isom` brand, avc1 video (REAL SPS in
    * avcC) + mp4a audio, plus a fake `mdat`. Structure a real demuxer's
    * metadata pass accepts; sample data is the plug-in seam. */
  private[operators] def writeMp4(w: Int, h: Int, fps: Int, nFrames: Int,
      profile: Int, audioRate: Int, audioChannels: Int, audioSamples: Long,
      mdatLen: Int, fillerOf: Int => Int): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes, be32(512),
      "isomavc1".getBytes)
    val moov = box("moov",
      mvhd(timescale = fps.toLong, duration = nFrames.toLong),
      trak(1, "vide", fps.toLong, nFrames.toLong, w, h, nFrames.toLong,
        avc1Entry(w, h, profile, 31, fps)),
      trak(2, "soun", audioRate.toLong, audioSamples, 0, 0,
        audioSamples / 1024, mp4aEntry(audioRate, audioChannels)))
    val mdatBody = Array.tabulate[Byte](mdatLen)(j => (0x20 + (fillerOf(j) % 95)).toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp); out.write(moov); out.write(box("mdat", mdatBody))
    out.toByteArray
  }

  // ─────────────────────── dataset-level operators ───────────────────────

  /** Seeded synthetic MP4 corpus (metadata zeroed — recovery is the
    * operator under test). Draw order (w, h, fps, nFrames, audioRate,
    * channels, mdatLen) is the shared generation spec. */
  def syntheticMp4(spark: SparkSession, n: Int, seed: Long = 17L): Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val rnd = new scala.util.Random(seed + i)
      val w = 32 + 2 * rnd.nextInt(65)
      val h = 32 + 2 * rnd.nextInt(49)
      val fps = Seq(24, 25, 30)(rnd.nextInt(3))
      val nFrames = 24 + rnd.nextInt(240)
      val audioRate = Seq(22050, 44100, 48000)(rnd.nextInt(3))
      val channels = 1 + rnd.nextInt(2)
      val audioSamples = (40 + rnd.nextInt(160)).toLong * 1024L
      val profile = if (i % 2 == 0) 66 else 100
      val mdatLen = 512 + rnd.nextInt(2048)
      val bytes = writeMp4(w, h, fps, nFrames, profile, audioRate,
        channels, audioSamples, mdatLen, j => i.toInt * 37 + j * 7)
      Multimodal.MediaRow(i, "mp4", bytes, width = 0, height = 0,
        sample_rate = 0, duration_ms = 0)
    }
  }

  /** Batched partition-preserving container probe: one output row per
    * TRACK (flatMap — a file can carry any number of tracks); files
    * with no parseable moov yield a single `ok = false` row so failure
    * counts stay visible to aggregates. */
  def probeMp4(media: Dataset[Multimodal.MediaRow],
      batchSize: Int = 64): Dataset[Mp4Track] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val tracks = probe(r.media_id, r.bytes)
          if (tracks.nonEmpty) tracks
          else Seq(Mp4Track(r.media_id, ok = false, "", 0, "", "",
            0, 0, 0, 0, 0L, 0, 0, 0, 0))
        }
      }
    }
  }

  // ──────────────────────────── goldens/oracle ────────────────────────────

  /** Expected per-track stats WITHOUT the probe: all generation
    * parameters + arithmetic; total file bytes via the shared writer
    * (the jpeg precedent — the PROBE never runs in goldens). */
  final case class Mp4Golden(media_id: Long, codec: String, width: Int,
      height: Int, sample_rate: Int, n_channels: Int, n_samples: Long,
      duration_ms: Int, sps_matches: Int, n_bytes: Long)

  def goldens(n: Int, seed: Long = 17L): Seq[Mp4Golden] =
    (0L until n.toLong).flatMap { i =>
      val rnd = new scala.util.Random(seed + i)
      val w = 32 + 2 * rnd.nextInt(65)
      val h = 32 + 2 * rnd.nextInt(49)
      val fps = Seq(24, 25, 30)(rnd.nextInt(3))
      val nFrames = 24 + rnd.nextInt(240)
      val audioRate = Seq(22050, 44100, 48000)(rnd.nextInt(3))
      val channels = 1 + rnd.nextInt(2)
      val audioSamples = (40 + rnd.nextInt(160)).toLong * 1024L
      val profile = if (i % 2 == 0) 66 else 100
      val mdatLen = 512 + rnd.nextInt(2048)
      val fileBytes = writeMp4(w, h, fps, nFrames, profile, audioRate,
        channels, audioSamples, mdatLen, j => i.toInt * 37 + j * 7).length.toLong
      Seq(
        Mp4Golden(i, "avc1", w, h, 0, 0, nFrames.toLong,
          nFrames * 1000 / fps, sps_matches = 1, fileBytes),
        Mp4Golden(i, "mp4a", 0, 0, audioRate, channels, audioSamples / 1024,
          (audioSamples * 1000L / audioRate).toInt, sps_matches = 0, 0L))
    }

  /** Per-codec aggregate of [[goldens]] as an inline-VALUES oracle.
    * `n_bytes` is attributed to the avc1 row only (one file total per
    * media item, counted once). `sps_consistent` counts video tracks
    * whose avcC-SPS dims equal the tkhd dims — the cross-check. */
  def goldenAggregateSql(n: Int, seed: Long = 17L): String = {
    val rows = goldens(n, seed).groupBy(_.codec).toSeq.sortBy(_._1)
      .map { case (codec, items) =>
        s"('$codec', ${items.size}, ${items.map(_.n_bytes).sum}, " +
          s"${items.map(_.width.toLong).sum}, ${items.map(_.height.toLong).sum}, " +
          s"${items.map(_.sample_rate.toLong).sum}, " +
          s"${items.map(_.n_channels.toLong).sum}, " +
          s"${items.map(_.n_samples).sum}, " +
          s"${items.map(_.duration_ms.toLong).sum}, " +
          s"${items.map(_.sps_matches.toLong).sum})"
      }
    s"""SELECT codec,
       |  CAST(n AS BIGINT) AS n,
       |  CAST(total_bytes AS BIGINT) AS total_bytes,
       |  CAST(sum_width AS BIGINT) AS sum_width,
       |  CAST(sum_height AS BIGINT) AS sum_height,
       |  CAST(sum_rate AS BIGINT) AS sum_rate,
       |  CAST(sum_channels AS BIGINT) AS sum_channels,
       |  CAST(n_samples AS BIGINT) AS n_samples,
       |  CAST(duration_ms AS BIGINT) AS duration_ms,
       |  CAST(sps_consistent AS BIGINT) AS sps_consistent
       |FROM (VALUES ${rows.mkString(",\n  ")})
       |  AS t(codec, n, total_bytes, sum_width, sum_height, sum_rate,
       |       sum_channels, n_samples, duration_ms, sps_consistent)
       |ORDER BY codec""".stripMargin
  }
}
