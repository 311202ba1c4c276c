package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** Multimodal binary-column plumbing (LLM-data-pipeline north star):
  * image/audio/video carried as opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted/frame-sampled with distributed
  * per-partition transforms.
  *
  * The decode step is REAL: two pure-JVM codecs for public formats —
  * [[PpmCodec]] parses/writes binary netpbm P6 (the `P6\nW H\n255\n`
  * header followed by a raw RGB raster; format spec is public netpbm
  * documentation) and [[WavCodec]] parses/writes RIFF/WAVE PCM16 mono
  * (the public Microsoft RIFF container: `RIFF…WAVE` + `fmt ` chunk +
  * `data` chunk, little-endian). Frame features are genuine pixel and
  * sample statistics (channel means, luma contrast, edge energy;
  * RMS, zero-crossing rate, lag-1 autocorrelation), so the pipeline is
  * honest end to end: payloads are real encoded media, the decoder
  * validates real headers, and the features move when pixels move.
  *
  * Scale properties (the part that matters at 100 TB): decode and
  * frame-sampling are NARROW mapPartitions/filter transforms — payload
  * bytes never shuffle; only (media_id, 8-float feature) rows reach the
  * one aggregation shuffle in [[frameStats]]. Codec state is plain
  * static code (no per-row init), the iterator never materializes a
  * partition, and a malformed payload fails LOUDLY with the media_id in
  * the message (a silent skip would undercount training data).
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

  /** Decoded image: 8-bit RGB raster, row-major, `pixels.length == w*h*3`. */
  final case class RgbImage(width: Int, height: Int, pixels: Array[Byte]) {
    require(width > 0 && height > 0, s"empty raster ${width}x$height")
    // Long arithmetic: w and h each parse up to 1e6, so w·h·3 can reach
    // 3e12 — an Int product would wrap and validate a garbage length
    // "consistently" here and in the decoder.
    require(pixels.length.toLong == width.toLong * height * 3,
      s"raster ${width}x$height needs ${width.toLong * height * 3} bytes, " +
        s"got ${pixels.length}")
  }

  /** Binary netpbm P6 codec (public format; maxval fixed at 255, the
    * 1-byte-per-sample case). The parser implements the real grammar:
    * `P6`, then whitespace-separated width/height/maxval where `#`
    * comments run to end-of-line anywhere between tokens, then exactly
    * ONE whitespace byte, then `w*h*3` raw RGB bytes. Strict on
    * violations — truncated rasters and non-255 maxval throw. */
  object PpmCodec {
    def encode(img: RgbImage): Array[Byte] = {
      val header = s"P6\n${img.width} ${img.height}\n255\n"
        .getBytes("US-ASCII")
      val out = new Array[Byte](header.length + img.pixels.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
      out
    }

    def decode(bytes: Array[Byte]): RgbImage = {
      require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
        "not a P6 ppm payload (bad magic)")
      var i = 2
      def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
      // Whitespace and '#'-to-EOL comments are both legal between tokens.
      def skipWsAndComments(): Unit = {
        var moved = true
        while (moved) {
          moved = false
          while (i < bytes.length && isWs(bytes(i))) { i += 1; moved = true }
          if (i < bytes.length && bytes(i) == '#') {
            while (i < bytes.length && bytes(i) != '\n') i += 1
            moved = true
          }
        }
      }
      def readInt(): Int = {
        skipWsAndComments()
        require(i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9',
          s"ppm header: expected digit at offset $i")
        var v = 0
        while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
          v = v * 10 + (bytes(i) - '0'); i += 1
          require(v <= 1000000, "ppm header value out of range")
        }
        v
      }
      val w = readInt(); val h = readInt(); val maxval = readInt()
      require(maxval == 255, s"only maxval=255 supported, got $maxval")
      // Exactly one whitespace byte separates the header from the raster
      // (a raster byte may itself look like whitespace, so no skipping).
      require(i < bytes.length && isWs(bytes(i)), "ppm: missing raster separator")
      i += 1
      // Long product: header dims up to 1e6 each make w·h·3 overflow
      // Int (wrapping to a small "need" a crafted payload could match,
      // pushing the failure into feature-extraction index math instead
      // of this loud check).
      val need = w.toLong * h * 3
      require(bytes.length.toLong - i == need,
        s"ppm raster: need $need bytes for ${w}x$h, have ${bytes.length - i}")
      val px = java.util.Arrays.copyOfRange(bytes, i, i + need.toInt)
      RgbImage(w, h, px)
    }
  }

  /** Decoded audio clip: PCM16 mono samples. */
  final case class PcmAudio(sampleRate: Int, samples: Array[Short]) {
    require(sampleRate > 0, "sampleRate must be positive")
    require(samples.nonEmpty, "empty clip")
  }

  /** RIFF/WAVE PCM16-mono codec (public Microsoft container format).
    * Encode writes the canonical 44-byte header (`RIFF` size `WAVE`,
    * `fmt ` 16 {PCM=1, ch=1, rate, byteRate, align=2, bits=16},
    * `data` size) + little-endian samples. Decode walks the chunk list
    * (tolerating extra chunks like `LIST`, with the spec's odd-size
    * pad byte), validates PCM/mono/16-bit, and reads `data`. */
  object WavCodec {
    private def le32(out: Array[Byte], at: Int, v: Int): Unit = {
      out(at) = (v & 0xff).toByte; out(at + 1) = ((v >>> 8) & 0xff).toByte
      out(at + 2) = ((v >>> 16) & 0xff).toByte
      out(at + 3) = ((v >>> 24) & 0xff).toByte
    }
    private def le16(out: Array[Byte], at: Int, v: Int): Unit = {
      out(at) = (v & 0xff).toByte; out(at + 1) = ((v >>> 8) & 0xff).toByte
    }
    private def rd32(b: Array[Byte], at: Int): Int =
      (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8) |
        ((b(at + 2) & 0xff) << 16) | ((b(at + 3) & 0xff) << 24)
    private def rd16(b: Array[Byte], at: Int): Int =
      (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8)
    private def tag(b: Array[Byte], at: Int): String =
      new String(b, at, 4, "US-ASCII")

    def encode(a: PcmAudio): Array[Byte] = {
      val dataLen = a.samples.length * 2
      val out = new Array[Byte](44 + dataLen)
      "RIFF".getBytes.copyToArray(out, 0); le32(out, 4, 36 + dataLen)
      "WAVE".getBytes.copyToArray(out, 8)
      "fmt ".getBytes.copyToArray(out, 12); le32(out, 16, 16)
      le16(out, 20, 1) // PCM
      le16(out, 22, 1) // mono
      le32(out, 24, a.sampleRate)
      le32(out, 28, a.sampleRate * 2) // byte rate
      le16(out, 32, 2)  // block align
      le16(out, 34, 16) // bits per sample
      "data".getBytes.copyToArray(out, 36); le32(out, 40, dataLen)
      var i = 0
      while (i < a.samples.length) { le16(out, 44 + i * 2, a.samples(i) & 0xffff); i += 1 }
      out
    }

    def decode(bytes: Array[Byte]): PcmAudio = {
      require(bytes.length >= 44 && tag(bytes, 0) == "RIFF" &&
        tag(bytes, 8) == "WAVE", "not a RIFF/WAVE payload")
      var i = 12
      var rate = -1
      var data: Array[Byte] = null
      while (i + 8 <= bytes.length) {
        val id = tag(bytes, i); val sz = rd32(bytes, i + 4)
        // Long sum: a crafted size near Int.MaxValue wraps `i + 8 + sz`
        // negative and slips past an Int comparison, crashing later in
        // index math without the media_id (the same overflow class the
        // PPM raster check guards against — both codecs now match).
        require(sz >= 0 && i.toLong + 8 + sz <= bytes.length,
          s"wav chunk '$id' overruns payload")
        id match {
          case "fmt " =>
            require(sz >= 16, "wav fmt chunk too short")
            require(rd16(bytes, i + 8) == 1, "only PCM wav supported")
            require(rd16(bytes, i + 10) == 1, "only mono wav supported")
            rate = rd32(bytes, i + 12)
            require(rd16(bytes, i + 22) == 16, "only 16-bit wav supported")
          case "data" =>
            data = java.util.Arrays.copyOfRange(bytes, i + 8, i + 8 + sz)
          case _ => () // LIST/INFO/etc — legal, skipped
        }
        i += 8 + sz + (sz & 1) // odd-sized chunks carry a pad byte
      }
      require(rate > 0, "wav: no fmt chunk")
      require(data != null && data.length >= 2 && data.length % 2 == 0,
        "wav: missing or odd-length data chunk")
      val samples = new Array[Short](data.length / 2)
      var k = 0
      while (k < samples.length) {
        samples(k) = ((data(k * 2) & 0xff) | (data(k * 2 + 1) << 8)).toShort
        k += 1
      }
      PcmAudio(rate, samples)
    }
  }

  /** Integer Rec.709 luma of one pixel, in [0, 255]. */
  @inline private def luma(r: Int, g: Int, b: Int): Int =
    (2126 * r + 7152 * g + 722 * b) / 10000

  /** Real pixel statistics of rows [rowFrom, rowUntil) of an image:
    * {mean R, mean G, mean B, mean luma, luma stddev (contrast),
    * mean |horizontal luma gradient| (edge energy), min luma, max luma},
    * all scaled to [0, 1]. Sums run in Long (band ≤ 1e6 px × 255² fits
    * with ~1e5× headroom); the only floats are the final divisions. */
  def imageBandFeature(img: RgbImage, rowFrom: Int, rowUntil: Int): Array[Float] = {
    val w = img.width
    var sumR, sumG, sumB, sumL, sumL2, sumGrad = 0L
    var minL = 255; var maxL = 0
    var y = rowFrom
    while (y < rowUntil) {
      var x = 0
      var prevL = -1
      while (x < w) {
        val o = (y * w + x) * 3
        val r = img.pixels(o) & 0xff
        val g = img.pixels(o + 1) & 0xff
        val b = img.pixels(o + 2) & 0xff
        val l = luma(r, g, b)
        sumR += r; sumG += g; sumB += b
        sumL += l; sumL2 += l.toLong * l
        if (l < minL) minL = l
        if (l > maxL) maxL = l
        if (prevL >= 0) sumGrad += math.abs(l - prevL)
        prevL = l
        x += 1
      }
      y += 1
    }
    val n = (rowUntil - rowFrom).toLong * w
    val meanL = sumL.toDouble / n
    val varL = sumL2.toDouble / n - meanL * meanL
    val nGrad = (rowUntil - rowFrom).toLong * (w - 1)
    Array(
      (sumR.toDouble / n / 255.0).toFloat,
      (sumG.toDouble / n / 255.0).toFloat,
      (sumB.toDouble / n / 255.0).toFloat,
      (meanL / 255.0).toFloat,
      (math.sqrt(math.max(0.0, varL)) / 255.0).toFloat,
      (if (nGrad == 0) 0.0 else sumGrad.toDouble / nGrad / 255.0).toFloat,
      (minL / 255.0).toFloat,
      (maxL / 255.0).toFloat)
  }

  /** Real sample statistics of samples [from, until) of a clip:
    * {mean |amplitude|, RMS, zero-crossing rate, min, max,
    * mean |first difference|, lag-1 autocorrelation, window fill
    * fraction}. Amplitudes normalize by 2¹⁵, the first difference by
    * 2¹⁶ (its range), so every component lies in [-1, 1]. Sums run in
    * Long (window ≤ 1e6 × 32768² fits). */
  def audioWindowFeature(a: PcmAudio, from: Int, until: Int,
      windowSamples: Int): Array[Float] = {
    var sumAbs, sumSq, sumDiff, sumLag = 0L
    var minS = Int.MaxValue; var maxS = Int.MinValue
    var crossings = 0L
    var i = from
    while (i < until) {
      val s = a.samples(i).toInt
      sumAbs += math.abs(s); sumSq += s.toLong * s
      if (s < minS) minS = s
      if (s > maxS) maxS = s
      if (i + 1 < until) {
        val t = a.samples(i + 1).toInt
        sumDiff += math.abs(t - s)
        sumLag += s.toLong * t
        if ((s < 0) != (t < 0)) crossings += 1
      }
      i += 1
    }
    val n = until - from
    val pairs = math.max(1, n - 1)
    Array(
      (sumAbs.toDouble / n / 32768.0).toFloat,
      (math.sqrt(sumSq.toDouble / n) / 32768.0).toFloat,
      (crossings.toDouble / pairs).toFloat,
      (minS / 32768.0).toFloat,
      (maxS / 32768.0).toFloat,
      (sumDiff.toDouble / pairs / 65536.0).toFloat,
      (if (sumSq == 0) 0.0
       else math.max(-1.0, math.min(1.0, sumLag.toDouble / sumSq))).toFloat,
      (n.toDouble / windowSamples).toFloat)
  }

  /** Frames of one image: horizontal bands of `bandRows` rows; the tail
    * remainder becomes a final partial band so EVERY pixel reaches a
    * feature (flooring would leave height % bandRows rows feature-blind). */
  def imageFrames(m: MediaFile, bandRows: Int): Iterator[Frame] = {
    val img =
      try PpmCodec.decode(m.payload)
      catch { case e: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"media_id=${m.media_id}: ${e.getMessage}", e) }
    val n = (img.height + bandRows - 1) / bandRows
    (0 until n).iterator.map { i =>
      Frame(m.media_id, i, imageBandFeature(img,
        i * bandRows, math.min((i + 1) * bandRows, img.height)))
    }
  }

  /** Frames of one audio clip: windows of `windowSamples` samples; the
    * tail remainder becomes a final partial window (its fill-fraction
    * component records how partial). */
  def audioFrames(m: MediaFile, windowSamples: Int): Iterator[Frame] = {
    val clip =
      try WavCodec.decode(m.payload)
      catch { case e: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"media_id=${m.media_id}: ${e.getMessage}", e) }
    val n = (clip.samples.length + windowSamples - 1) / windowSamples
    (0 until n).iterator.map { i =>
      Frame(m.media_id, i, audioWindowFeature(clip,
        i * windowSamples,
        math.min((i + 1) * windowSamples, clip.samples.length), windowSamples))
    }
  }

  /** Decode every media file into feature frames, dispatching on the
    * modality tag: `image` → P6 bands, `audio` → WAV windows; an
    * unknown modality fails loudly. mapPartitions (not map): the
    * iterator never materializes a partition in memory. Narrow
    * transform — no shuffle of payload bytes. */
  def decodeFrames(ds: Dataset[MediaFile], bandRows: Int = 8,
      windowSamples: Int = 400): Dataset[Frame] =
    ds.mapPartitions { files =>
      files.flatMap { m =>
        m.modality match {
          case "image" => imageFrames(m, bandRows)
          case "audio" => audioFrames(m, windowSamples)
          case other => throw new IllegalArgumentException(
            s"media_id=${m.media_id}: unknown modality '$other'")
        }
      }
    }

  /** Keep every `every`-th frame — temporal downsampling for video-like
    * payloads. Narrow (predicate on frame_idx). */
  def frameSample(ds: Dataset[Frame], every: Int): Dataset[Frame] =
    ds.filter(_.frame_idx % every == 0)

  /** Resize a frame's feature vector to `dim` by average-pooling
    * adjacent components — the feature-space analogue of spatial
    * downscale (a production pipeline would also resize pixels before
    * extraction; band features pool the same way). Narrow per-row map;
    * deterministic. */
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

  /** 64-bit AVERAGE-HASH perceptual fingerprint of an image (aHash,
    * the classic pHash-family member that needs no DCT): partition the
    * luma raster into an 8×8 grid of area cells; bit (gy·8+gx) is set
    * iff that cell's MEAN luma exceeds the global mean. Entirely exact
    * integer arithmetic — the two means never materialize, the
    * comparison cross-multiplies (cellSum·totalPx > totalSum·cellPx),
    * so the hash is bit-deterministic across platforms. Robust to
    * small pixel perturbations by construction (a cell's bit flips
    * only when its mean crosses the global mean). */
  def imageAHash(img: RgbImage): Long = {
    val w = img.width; val h = img.height
    require(w >= 8 && h >= 8, s"aHash needs >= 8x8, got ${w}x$h")
    val cellSum = new Array[Long](64)
    val cellPx = new Array[Long](64)
    var totalSum = 0L
    var y = 0
    while (y < h) {
      val gy = y * 8 / h
      var x = 0
      while (x < w) {
        val gx = x * 8 / w
        val o = (y * w + x) * 3
        val l = luma(img.pixels(o) & 0xff, img.pixels(o + 1) & 0xff,
          img.pixels(o + 2) & 0xff).toLong
        cellSum(gy * 8 + gx) += l
        cellPx(gy * 8 + gx) += 1L
        totalSum += l
        x += 1
      }
      y += 1
    }
    val totalPx = w.toLong * h
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (cellSum(i) * totalPx > totalSum * cellPx(i)) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** 64-bit average-hash SOUNDPRINT of a PCM clip: 64 contiguous
    * sample windows; bit i is set iff window i's mean ENERGY (Σs²/len)
    * exceeds the clip's mean energy — the same cross-multiplied
    * exact-integer comparison as [[imageAHash]]. Windows partition by
    * the i·n/64 rule so uneven clip lengths still yield 64 bits. */
  def audioAHash(a: PcmAudio): Long = {
    val n = a.samples.length
    require(n >= 64, s"aHash needs >= 64 samples, got $n")
    var total = 0L
    val winSum = new Array[Long](64)
    val winLen = new Array[Long](64)
    var i = 0
    while (i < n) {
      val w = i * 64 / n
      val s = a.samples(i).toLong
      winSum(w) += s * s
      winLen(w) += 1L
      total += s * s
      i += 1
    }
    var hash = 0L
    var w = 0
    while (w < 64) {
      if (winSum(w) * n > total * winLen(w)) hash |= 1L << w
      w += 1
    }
    hash
  }

  /** Modality-dispatched fingerprint of an encoded media file (decode
    * first — the hash is a function of the CONTENT, not the container
    * bytes, so a re-encoded byte-identical raster hashes the same). */
  def perceptualHash(m: MediaFile): Long = m.modality match {
    case "image" => imageAHash(PpmCodec.decode(m.payload))
    case "audio" => audioAHash(WavCodec.decode(m.payload))
    case other   => throw new IllegalArgumentException(
      s"no perceptual hash for modality '$other'")
  }
}
