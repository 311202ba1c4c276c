package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** Multimodal binary-column plumbing (LLM-data-pipeline north star):
  * image/audio/video carried as opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted/frame-sampled with distributed
  * per-partition transforms.
  *
  * The DECODE STEP IS A STUB — real codec libraries (image/audio) are
  * not available in this environment, so [[StubCodec]] derives
  * deterministic fake features from the raw bytes. Everything around it
  * is real and tested (`MultimodalBinarySpec`): the schema, the typed
  * Dataset API, the mapPartitions batch shape (one iterator pass, no
  * per-row session/codec setup), and the narrow (shuffle-free)
  * execution — the properties that matter at 100 TB, where decode is
  * embarrassingly parallel and must never shuffle payload bytes.
  */
object MultimodalBinary {

  /** Typed metadata carried beside the opaque payload. */
  final case class MediaMeta(
      width: Int, height: Int, sampleRate: Int, durationMs: Long)

  /** One media object: payload is an opaque binary column at rest. */
  final case class MediaFile(
      media_id: Long, modality: String, payload: Array[Byte], meta: MediaMeta)

  /** One decoded frame: fixed-width feature vector per frame. */
  final case class Frame(media_id: Long, frame_idx: Int, feature: Array[Float])

  val featureDim = 8

  implicit val mediaEnc: Encoder[MediaFile] = Encoders.product[MediaFile]
  implicit val frameEnc: Encoder[Frame] = Encoders.product[Frame]

  /** STUB decoder — deterministic fake standing in for a real codec.
    * Real implementation would hand `payload` to an image/audio decoder;
    * the fake hashes each byte stride so outputs are reproducible and
    * content-sensitive (tests can assert real data flow). */
  object StubCodec {
    def frameFeature(bytes: Array[Byte], from: Int, until: Int): Array[Float] = {
      var h = 1125899906842597L
      var i = from
      while (i < until && i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
      Array.tabulate(featureDim)(k => ((h >>> (k * 8)) & 0xffL).toFloat / 255f)
    }
  }

  /** Decode every media file into frames of `frameStride` payload bytes.
    * mapPartitions (not map): codec state would be initialized once per
    * partition, and the iterator never materializes a partition in
    * memory. Narrow transform — no shuffle of payload bytes. */
  def decodeFrames(ds: Dataset[MediaFile], frameStride: Int): Dataset[Frame] =
    ds.mapPartitions { files =>
      files.flatMap { m =>
        // Ceil division: the tail remainder becomes a final partial
        // frame (frameFeature clamps at payload end), so EVERY payload
        // byte reaches a feature — flooring dropped the trailing
        // len % stride bytes and content sensitivity didn't cover them.
        val n = math.max(1,
          (m.payload.length + frameStride - 1) / frameStride)
        (0 until n).iterator.map { i =>
          Frame(m.media_id, i,
            StubCodec.frameFeature(m.payload, i * frameStride, (i + 1) * frameStride))
        }
      }
    }

  /** Keep every `every`-th frame — temporal downsampling for video-like
    * payloads. Narrow (predicate on frame_idx). */
  def frameSample(ds: Dataset[Frame], every: Int): Dataset[Frame] =
    ds.filter(_.frame_idx % every == 0)

  /** "Resize" a frame's feature vector to `dim` by average-pooling
    * adjacent components — the stub stand-in for spatial image resize
    * (a real codec would resize pixels before feature extraction).
    * Narrow per-row map; deterministic. */
  def resize(ds: Dataset[Frame], dim: Int): Dataset[Frame] = {
    require(dim > 0 && featureDim % dim == 0,
      s"dim must divide featureDim=$featureDim")
    val stride = featureDim / dim
    ds.map { f =>
      val pooled = Array.tabulate(dim) { i =>
        var s = 0.0f
        var j = i * stride
        while (j < (i + 1) * stride) { s += f.feature(j); j += 1 }
        s / stride
      }
      Frame(f.media_id, f.frame_idx, pooled)
    }
  }

  /** Per-media frame count + mean feature L1 — the aggregate that a
    * feature-extraction pipeline would feed downstream. One shuffle on
    * media_id with partial aggregation. */
  def frameStats(spark: SparkSession, ds: Dataset[Frame]) = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    ds.toDF()
      .select($"media_id", $"frame_idx",
        aggregate(transform($"feature", x => abs(x.cast("double"))),
          lit(0.0), _ + _).as("l1"))
      .groupBy($"media_id")
      .agg(count(lit(1)).as("n_frames"), round(avg($"l1"), 6).as("mean_l1"))
  }
}
