package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** AAC ADTS (ISO/IEC 14496-3 / 13818-7) STRUCTURAL decode — the
  * compressed-audio counterpart of [[H264]], completing the multimodal
  * codec family: images (BMP + JPEG/PNG), audio (PCM WAV + AAC-ADTS),
  * video (Y4M + H.264 Annex-B).
  *
  * REAL (pure bit arithmetic, works on real-world `.aac` transport
  * streams): the ADTS frame walk — 0xFFF syncword scan, the fixed-header
  * parse (MPEG version, profile/audio-object-type, the 13-entry
  * sampling-frequency-index table, channel configuration,
  * `protection_absent` CRC sizing) and the variable-header
  * `aac_frame_length` hop from frame to frame. Each raw data block
  * carries 1024 PCM samples per channel, so the walk alone yields exact
  * duration and mean frame size (bitrate proxy) — the ffprobe-level scan
  * that lets a 100 TB audio corpus be filtered by rate/channels/duration
  * without a decoder. Huffman spectral decode (actual PCM) stays behind
  * the same per-batch plug-in seam as H.264 slice data; the synthetic
  * fixture's frame PAYLOADS are structural fakes accordingly.
  */
object Adts {

  /** Per ISO/IEC 14496-3 Table 1.18 (sampling_frequency_index). */
  private[operators] val SampleRates: Array[Int] = Array(
    96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350)

  /** Structural stream metadata. `profile` is the 2-bit ADTS profile
    * (0=Main, 1=LC, 2=SSR, 3=LTP); `nSamples` counts raw data blocks ×
    * 1024; `avgFrameBytes` includes each frame's header. */
  final case class AdtsMeta(profile: Int, sampleRate: Int, channels: Int,
      nFrames: Int, nSamples: Long, durationMs: Int, avgFrameBytes: Double)

  final case class AdtsDecoded(media_id: Long, ok: Boolean, profile: Int,
      sample_rate: Int, n_channels: Int, n_frames: Int, n_samples: Long,
      duration_ms: Int, avg_frame_bytes: Double)

  /** Walks ADTS frames from the first syncword. Frames must be
    * contiguous (the transport format) — a broken hop ends the walk;
    * whatever parsed up to there is returned (prefix semantics, like a
    * truncated download). None when no valid first header exists. */
  def parse(bytes: Array[Byte]): Option[AdtsMeta] = {
    def u(o: Int): Int = bytes(o) & 0xff
    // scan to the first syncword with a sane header behind it
    var start = 0
    var found = false
    while (!found && start + 7 <= bytes.length) {
      if (u(start) == 0xff && (u(start + 1) & 0xf6) == 0xf0 &&
        ((u(start + 2) >> 2) & 0xf) < SampleRates.length) found = true
      else start += 1
    }
    if (!found) return None
    var profile = -1; var rate = -1; var channels = -1
    var nFrames = 0; var blocks = 0L; var totalBytes = 0L
    var i = start
    var ok = true
    while (ok && i + 7 <= bytes.length) {
      if (!(u(i) == 0xff && (u(i + 1) & 0xf6) == 0xf0)) ok = false
      else {
        val sfi = (u(i + 2) >> 2) & 0xf
        if (sfi >= SampleRates.length) ok = false
        else {
          val p = (u(i + 2) >> 6) & 0x3
          val ch = ((u(i + 2) & 0x1) << 2) | ((u(i + 3) >> 6) & 0x3)
          val frameLen = ((u(i + 3) & 0x3) << 11) | (u(i + 4) << 3) |
            ((u(i + 5) >> 5) & 0x7)
          val rawBlocks = (u(i + 6) & 0x3) + 1
          val headerLen = if ((u(i + 1) & 0x1) == 1) 7 else 9 // CRC when absent=0
          if (frameLen < headerLen || i + frameLen > bytes.length) ok = false
          else {
            if (nFrames == 0) { profile = p; rate = SampleRates(sfi); channels = ch }
            nFrames += 1
            blocks += rawBlocks
            totalBytes += frameLen
            i += frameLen
          }
        }
      }
    }
    if (nFrames == 0) None
    else {
      val nSamples = blocks * 1024L
      Some(AdtsMeta(profile, rate, channels, nFrames, nSamples,
        (nSamples * 1000L / rate).toInt, totalBytes.toDouble / nFrames))
    }
  }

  /** One ADTS frame: 7-byte fixed+variable header (protection_absent=1,
    * one raw data block) + `payloadLen` filler bytes in 0x20..0x7e (no
    * accidental 0xFFF syncword can form — filler high nibbles < 0x8). */
  private[operators] def writeFrame(profile: Int, sfi: Int, channels: Int,
      payloadLen: Int, fillerOf: Int => Int): Array[Byte] = {
    val frameLen = 7 + payloadLen
    require(frameLen < (1 << 13), "ADTS frame length is 13 bits")
    val b = new Array[Byte](frameLen)
    b(0) = 0xff.toByte
    b(1) = 0xf1.toByte // MPEG-4, layer 00, protection_absent=1
    b(2) = (((profile & 0x3) << 6) | ((sfi & 0xf) << 2) |
      ((channels >> 2) & 0x1)).toByte
    b(3) = (((channels & 0x3) << 6) | ((frameLen >> 11) & 0x3)).toByte
    b(4) = ((frameLen >> 3) & 0xff).toByte
    b(5) = (((frameLen & 0x7) << 5) | 0x1f).toByte // buffer fullness hi (VBR)
    b(6) = 0xfc.toByte // fullness lo ++ one raw data block (00)
    var j = 0
    while (j < payloadLen) {
      b(7 + j) = (0x20 + (fillerOf(j) % 95)).toByte; j += 1
    }
    b
  }

  /** Deterministic ADTS stream: `nFrames` contiguous frames with seeded
    * payload lengths (the goldens re-draw them closed-form). */
  private[operators] def writeStream(profile: Int, sfi: Int, channels: Int,
      nFrames: Int, rnd: scala.util.Random, itemTag: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) {
      val payloadLen = 64 + rnd.nextInt(320)
      out.write(writeFrame(profile, sfi, channels, payloadLen,
        j => itemTag * 29 + f * 13 + j * 5))
      f += 1
    }
    out.toByteArray
  }

  /** Seeded synthetic AAC corpus as [[Multimodal.MediaRow]]s with zeroed
    * metadata — bitstream recovery is the operator under test. Draw
    * order (sfi, channels, nFrames, then per-frame payload lengths) is
    * the shared generation spec [[goldens]] re-draws. */
  def syntheticAdts(spark: SparkSession, n: Int, seed: Long = 13L): Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val rnd = new scala.util.Random(seed + i)
      val sfi = 3 + rnd.nextInt(9) // 48000 down to 11025
      val channels = 1 + rnd.nextInt(2)
      val nFrames = 20 + rnd.nextInt(200)
      val profile = 1 // AAC-LC, the transport default
      val bytes = writeStream(profile, sfi, channels, nFrames, rnd, i.toInt)
      Multimodal.MediaRow(i, "aac", bytes, width = 0, height = 0,
        sample_rate = 0, duration_ms = 0)
    }
  }

  /** Batched partition-preserving structural decode (same seam shape as
    * [[Multimodal.decodeMedia]]); malformed → `ok = false`. */
  def decodeAdts(media: Dataset[Multimodal.MediaRow],
      batchSize: Int = 64): Dataset[AdtsDecoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup seam (a real Huffman/spectral decoder inits here)
        batch.iterator.map { r =>
          parse(r.bytes) match {
            case Some(m) => AdtsDecoded(r.media_id, ok = true, m.profile,
              m.sampleRate, m.channels, m.nFrames, m.nSamples,
              m.durationMs, m.avgFrameBytes)
            case None => AdtsDecoded(r.media_id, ok = false, 0, 0, 0, 0, 0L, 0, 0.0)
          }
        }
      }
    }
  }

  // ──────────────────────────── goldens/oracle ────────────────────────────

  /** Expected structural stats computed WITHOUT the parser: everything
    * is generation parameters + arithmetic (frame bytes = 7 + payload). */
  final case class AdtsGolden(media_id: Long, sample_rate: Int,
      n_bytes: Long, n_channels: Int, n_frames: Int, n_samples: Long,
      duration_ms: Int, avg_frame_bytes: Double)

  def goldens(n: Int, seed: Long = 13L): Seq[AdtsGolden] =
    (0L until n.toLong).map { i =>
      val rnd = new scala.util.Random(seed + i)
      val sfi = 3 + rnd.nextInt(9)
      val channels = 1 + rnd.nextInt(2)
      val nFrames = 20 + rnd.nextInt(200)
      var total = 0L
      var f = 0
      while (f < nFrames) { total += 7L + 64L + rnd.nextInt(320); f += 1 }
      val rate = SampleRates(sfi)
      val nSamples = nFrames * 1024L
      AdtsGolden(i, rate, total, channels, nFrames, nSamples,
        (nSamples * 1000L / rate).toInt, total.toDouble / nFrames)
    }

  /** Per-sample-rate aggregate of [[goldens]] as an inline-VALUES oracle
    * (engine-seeded payloads — the expectations ARE the table). Average
    * follows the repo float-parity rule: decimal(·,12)-quantized
    * per-item doubles, exact sum, DOUBLE divide, round 3. */
  def goldenAggregateSql(n: Int, seed: Long = 13L): String = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val rows = goldens(n, seed).groupBy(_.sample_rate).toSeq.sortBy(_._1)
      .map { case (rate, items) =>
        val cnt = items.size
        val sumDec = items
          .map(g => new JBD(java.lang.Double.toString(g.avg_frame_bytes))
            .setScale(12, RoundingMode.HALF_UP))
          .reduce(_.add(_))
        val avg = sumDec.doubleValue() / cnt
        val avgRounded = new JBD(java.lang.Double.toString(avg))
          .setScale(3, RoundingMode.HALF_UP).doubleValue()
        s"($rate, $cnt, $cnt, ${items.map(_.n_bytes).sum}, " +
          s"${items.map(_.n_channels.toLong).sum}, " +
          s"${items.map(_.n_frames.toLong).sum}, ${items.map(_.n_samples).sum}, " +
          s"${items.map(_.duration_ms.toLong).sum}, $avgRounded)"
      }
    s"""SELECT CAST(sample_rate AS INT) AS sample_rate,
       |  CAST(n AS BIGINT) AS n, CAST(n_decoded AS BIGINT) AS n_decoded,
       |  CAST(total_bytes AS BIGINT) AS total_bytes,
       |  CAST(sum_channels AS BIGINT) AS sum_channels,
       |  CAST(n_frames AS BIGINT) AS n_frames,
       |  CAST(n_samples AS BIGINT) AS n_samples,
       |  CAST(duration_ms AS BIGINT) AS duration_ms,
       |  CAST(avg_frame_bytes AS DOUBLE) AS avg_frame_bytes
       |FROM (VALUES ${rows.mkString(",\n  ")})
       |  AS t(sample_rate, n, n_decoded, total_bytes, sum_channels,
       |       n_frames, n_samples, duration_ms, avg_frame_bytes)
       |ORDER BY sample_rate""".stripMargin
  }
}
