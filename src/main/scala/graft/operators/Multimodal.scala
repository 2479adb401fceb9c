package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (build brief): image/audio/video as opaque
  * `binary` columns plus typed metadata, with decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side plumbing — schema, partition-preserving mapPartitions,
  * fixed batch shape, typed output schema — is real and tested. The codec
  * work itself is STUBBED with a deterministic hash-driven fake (this
  * container has no image/audio libraries); `decodeStub` is the single seam
  * where a real decoder (or a Python `mapInPandas` stage in a PySpark
  * deployment) would plug in.
  */
object Multimodal {

  /** One media row: payload + typed metadata, the at-rest model for
    * multimodal corpora (binary stays opaque to Catalyst; metadata columns
    * are filterable/prunable so scans can skip payload bytes entirely). */
  final case class MediaRow(
      media_id: Long,
      kind: String,          // image | audio | video
      bytes: Array[Byte],
      width: Int, height: Int,
      sample_rate: Int, duration_ms: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      content_hash: Long,
      features: Array[Float]) // fixed-size embedding-shaped output

  final case class FrameSample(media_id: Long, frame_idx: Int, ts_ms: Int,
      frame_hash: Long)

  /** Deterministic synthetic media table (the fixture generator for this
    * surface — payloads are seeded pseudo-random bytes). */
  def syntheticMedia(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val rnd = new scala.util.Random(seed + i)
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val len = 256 + rnd.nextInt(1024)
      val bytes = Array.fill(len)(rnd.nextInt().toByte)
      MediaRow(i, kind, bytes,
        width = 64 + rnd.nextInt(512), height = 64 + rnd.nextInt(512),
        sample_rate = 16000, duration_ms = 1000 + rnd.nextInt(30000))
    }
  }

  /** STUB decode: a deterministic feature vector derived from the payload
    * bytes. Replace with a real codec; everything around it (batching,
    * schema, partitioning) is production plumbing. */
  private[operators] def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    var h = 1125899906842597L // deterministic FNV-ish roll over the payload
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val out = new Array[Float](dim)
    var j = 0
    var s = h
    while (j < dim) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out(j) = (s >>> 40).toFloat / (1 << 24).toFloat - 0.5f
      j += 1
    }
    out
  }

  /** Feature extraction: partition-preserving, batched like an Arrow-based
    * `mapInPandas` stage — rows are pulled in fixed-size batches so a real
    * decoder could amortize model/codec setup per batch, not per row. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup seam (codec/model init) goes here
        batch.iterator.map { r =>
          MediaFeatures(r.media_id, r.kind, r.bytes.length,
            content_hash = java.util.Arrays.hashCode(r.bytes).toLong,
            features = decodeStub(r.bytes, dim))
        }
      }
    }
  }

  /** Resize: pure-metadata transform (the pixel op is inside the decode
    * seam); clamps to the target box preserving aspect ratio. */
  def resizeMeta(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide.toDouble) / greatest(col("width"), col("height")))
    media
      .withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  /** Frame sampling for video rows: `fps`-spaced timestamps from the
    * duration metadata — a generator expression (explode of a sequence), so
    * it scales row-wise without custom code. The per-frame decode is again
    * the stub seam. */
  def sampleFrames(media: Dataset[MediaRow], fps: Double = 1.0): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    val stepMs = math.max(1, (1000.0 / fps).toInt)
    media.filter(_.kind == "video").flatMap { r =>
      val n = math.max(1, r.duration_ms / stepMs)
      (0 until n).iterator.map { f =>
        val ts = f * stepMs
        FrameSample(r.media_id, f, ts,
          frame_hash = java.util.Arrays.hashCode(r.bytes).toLong * 31 + ts)
      }
    }
  }
}
