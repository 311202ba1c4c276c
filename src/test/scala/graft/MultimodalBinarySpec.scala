package graft

import graft.operators.MultimodalBinary
import graft.operators.MultimodalBinary._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary plumbing with REAL pure-JVM codecs: netpbm P6
  * round trip + header grammar, RIFF/WAVE PCM16 round trip + chunk
  * walking, exact hand-computed pixel/sample statistics, and the
  * plan-shape properties (narrow decode, typed mapPartitions) that
  * matter at scale. */
class MultimodalBinarySpec extends AnyFunSuite with SparkFixture {

  private def img(w: Int, h: Int, f: Int => Int): RgbImage =
    RgbImage(w, h, Array.tabulate(w * h * 3)(k => f(k).toByte))

  private def ds(files: MediaFile*) = spark.createDataset(files)(mediaEnc)

  private def imageFile(id: Long, im: RgbImage): MediaFile =
    MediaFile(id, "image", PpmCodec.encode(im),
      MediaMeta(im.width, im.height, 0, 0L))

  // ---- PPM codec ----

  test("ppm: encode→decode round-trips width, height and every pixel") {
    val im = img(5, 7, k => (k * 37 + 11) % 256)
    val back = PpmCodec.decode(PpmCodec.encode(im))
    assert(back.width == 5 && back.height == 7)
    assert(back.pixels.toSeq == im.pixels.toSeq)
  }

  test("ppm: parser accepts comments and mixed whitespace in the header") {
    val raster = Array.tabulate(2 * 1 * 3)(_.toByte)
    val header = "P6 # a comment\n# another\n 2\t1 # dims\n255\n"
      .getBytes("US-ASCII")
    val back = PpmCodec.decode(header ++ raster)
    assert(back.width == 2 && back.height == 1)
    assert(back.pixels.toSeq == raster.toSeq)
  }

  test("ppm: raster bytes that look like whitespace survive the round trip") {
    // '\n' (10) and ' ' (32) as PIXEL values — a parser that skipped
    // whitespace after the header would mis-align the raster.
    val im = RgbImage(1, 2, Array[Byte](10, 32, 10, 32, 10, 32))
    assert(PpmCodec.decode(PpmCodec.encode(im)).pixels.toSeq ==
      im.pixels.toSeq)
  }

  test("ppm: malformed payloads fail loudly") {
    val ok = PpmCodec.encode(img(2, 2, identity))
    intercept[IllegalArgumentException](PpmCodec.decode("P5\n1 1\n255\n".getBytes ++ Array[Byte](0)))
    intercept[IllegalArgumentException](PpmCodec.decode(ok.dropRight(1))) // truncated raster
    intercept[IllegalArgumentException](PpmCodec.decode(
      ("P6\n2 2\n127\n".getBytes("US-ASCII")) ++ Array.fill[Byte](12)(0))) // maxval
  }

  // ---- WAV codec ----

  test("wav: encode→decode round-trips rate and every sample") {
    val a = PcmAudio(16000, Array.tabulate(100)(i => (i * 523 - 17000).toShort))
    val back = WavCodec.decode(WavCodec.encode(a))
    assert(back.sampleRate == 16000)
    assert(back.samples.toSeq == a.samples.toSeq)
  }

  test("wav: decoder walks extra chunks (LIST) and odd-size padding") {
    val a = PcmAudio(8000, Array[Short](1, -2, 3))
    val canonical = WavCodec.encode(a)
    // Splice a 5-byte LIST chunk (odd → 1 pad byte) between fmt and data.
    val list = "LIST".getBytes ++ Array[Byte](5, 0, 0, 0) ++
      Array[Byte]('I', 'N', 'F', 'O', 7) ++ Array[Byte](0) // pad
    val spliced = canonical.take(36) ++ list ++ canonical.drop(36)
    // Fix the RIFF size field (bytes 4..7, little-endian).
    val total = spliced.length - 8
    spliced(4) = (total & 0xff).toByte
    spliced(5) = ((total >> 8) & 0xff).toByte
    val back = WavCodec.decode(spliced)
    assert(back.sampleRate == 8000 && back.samples.toSeq == Seq[Short](1, -2, 3))
  }

  test("wav: stereo / non-PCM / truncated payloads fail loudly") {
    val ok = WavCodec.encode(PcmAudio(8000, Array[Short](1, 2)))
    val stereo = ok.clone(); stereo(22) = 2
    intercept[IllegalArgumentException](WavCodec.decode(stereo))
    val alaw = ok.clone(); alaw(20) = 6
    intercept[IllegalArgumentException](WavCodec.decode(alaw))
    intercept[IllegalArgumentException](WavCodec.decode(ok.dropRight(1)))
  }

  // ---- real feature math ----

  test("image features are the actual pixel statistics (hand-computed)") {
    // 2x1 image: pure red then pure green pixels.
    val im = RgbImage(2, 1, Array[Byte](-1, 0, 0, 0, -1, 0)) // (255,0,0),(0,255,0)
    val f = MultimodalBinary.imageBandFeature(im, 0, 1)
    assert(math.abs(f(0) - 127.5f / 255f) < 1e-6, "mean R")
    assert(math.abs(f(1) - 127.5f / 255f) < 1e-6, "mean G")
    assert(f(2) == 0f, "mean B")
    // Rec.709 integer luma: red = 2126*255/10000 = 54, green = 7152*255/10000 = 182.
    assert(math.abs(f(3) - (54 + 182) / 2f / 255f) < 1e-6, "mean luma")
    assert(math.abs(f(5) - (182 - 54) / 255f) < 1e-6, "edge energy = |Δluma|")
    assert(math.abs(f(6) - 54f / 255f) < 1e-6 &&
      math.abs(f(7) - 182f / 255f) < 1e-6, "min/max luma")
  }

  test("a flat image has zero contrast and edge energy; bands see their rows only") {
    val flat = img(4, 4, _ => 100)
    val f = MultimodalBinary.imageBandFeature(flat, 0, 4)
    assert(f(4) == 0f && f(5) == 0f)
    // Top band black, bottom band white: band features must differ.
    val split = RgbImage(2, 4, Array.tabulate(2 * 4 * 3)(k =>
      if (k < 12) 0.toByte else -1.toByte))
    val top = MultimodalBinary.imageBandFeature(split, 0, 2)
    val bot = MultimodalBinary.imageBandFeature(split, 2, 4)
    assert(top(3) == 0f && bot(3) == 1f, "band stats are row-scoped")
  }

  test("audio features are the actual sample statistics (hand-computed)") {
    val a = PcmAudio(8000, Array[Short](100, -100, 100, -100))
    val f = MultimodalBinary.audioWindowFeature(a, 0, 4, 4)
    assert(math.abs(f(0) - 100f / 32768f) < 1e-6, "mean abs")
    assert(math.abs(f(1) - 100f / 32768f) < 1e-6, "rms of constant magnitude")
    assert(f(2) == 1f, "alternating signs → zcr 1")
    assert(math.abs(f(3) + 100f / 32768f) < 1e-6 &&
      math.abs(f(4) - 100f / 32768f) < 1e-6, "min/max")
    assert(math.abs(f(5) - 200f / 65536f) < 1e-6, "mean |diff|")
    // Σ s_i·s_{i+1} has 3 pairs of -1e4 against Σ s_i² = 4e4 → -0.75
    // (the unnormalized-window edge effect; a full window → -1).
    assert(f(6) == -0.75f, "alternation lag-1 autocorr over 3 pairs / 4 terms")
    assert(f(7) == 1f, "full window")
  }

  // ---- framing ----

  test("image decode yields ceil(height/bandRows) frames; tail band is partial") {
    val frames = MultimodalBinary.decodeFrames(
      ds(imageFile(1L, img(4, 16, identity)), imageFile(2L, img(4, 20, identity))),
      bandRows = 8).collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId(1L).length == 2) // 16/8 exact
    assert(byId(2L).length == 3) // 20/8 → two full bands + 4-row tail
    assert(frames.forall(_.feature.length == MultimodalBinary.featureDim))
  }

  test("tail rows reach the partial band (content sensitivity has no blind spot)") {
    val base = img(4, 10, k => k % 97)
    val px = base.pixels.clone()
    px(4 * 9 * 3 + 2) = (px(4 * 9 * 3 + 2) + 64).toByte // a pixel in row 9
    val tweaked = RgbImage(4, 10, px)
    val fs = MultimodalBinary.decodeFrames(
        ds(imageFile(1L, base), imageFile(2L, tweaked)), bandRows = 8)
      .collect().groupBy(_.media_id)
    assert(fs(1L).find(_.frame_idx == 0).get.feature.toSeq ==
      fs(2L).find(_.frame_idx == 0).get.feature.toSeq,
      "identical leading bands must match")
    assert(fs(1L).find(_.frame_idx == 1).get.feature.toSeq !=
      fs(2L).find(_.frame_idx == 1).get.feature.toSeq,
      "a tail-row pixel difference must change the tail band")
  }

  test("audio decode windows the clip; partial tail records its fill fraction") {
    val clip = PcmAudio(16000, Array.tabulate(250)(i => (i - 125).toShort))
    val frames = MultimodalBinary.decodeFrames(
      ds(MediaFile(1L, "audio", WavCodec.encode(clip), MediaMeta(0, 0, 16000, 0L))),
      windowSamples = 100).collect()
    assert(frames.length == 3) // 100+100+50
    assert(frames.find(_.frame_idx == 2).get.feature(7) == 0.5f, "tail fill 50/100")
  }

  test("unknown modality and undecodable payload fail loudly with media_id") {
    val bad = ds(MediaFile(7L, "video", Array[Byte](1, 2, 3), MediaMeta(0, 0, 0, 0L)))
    val e = intercept[org.apache.spark.SparkException](
      MultimodalBinary.decodeFrames(bad).collect())
    assert(e.getMessage.contains("media_id=7") ||
      e.getCause.getMessage.contains("media_id=7"))
    val garbled = ds(MediaFile(9L, "image", Array[Byte](1, 2, 3), MediaMeta(0, 0, 0, 0L)))
    val e2 = intercept[org.apache.spark.SparkException](
      MultimodalBinary.decodeFrames(garbled).collect())
    assert(e2.getMessage.contains("media_id=9") ||
      e2.getCause.getMessage.contains("media_id=9"))
  }

  test("frame sampling keeps every Nth frame") {
    val frames = MultimodalBinary.decodeFrames(
      ds(imageFile(1L, img(4, 80, identity))), bandRows = 8)
    val sampled = MultimodalBinary.frameSample(frames, 3).collect()
    assert(sampled.map(_.frame_idx).sorted.toSeq == Seq(0, 3, 6, 9))
  }

  test("decode+sample plan is narrow (no shuffle of payload bytes)") {
    val frames = MultimodalBinary.frameSample(
      MultimodalBinary.decodeFrames(ds(imageFile(1L, img(4, 16, identity)))), 2)
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"decode must not shuffle payloads:\n$plan")
  }

  test("resize average-pools features to the target width") {
    val frames = MultimodalBinary.decodeFrames(ds(imageFile(1L, img(4, 8, identity))))
    val resized = MultimodalBinary.resize(frames, 4).collect()
    assert(resized.forall(_.feature.length == 4))
    val orig = frames.collect().head.feature
    val got = resized.find(_.frame_idx == 0).get.feature
    assert(math.abs(got(0) - (orig(0) + orig(1)) / 2) < 1e-6)
  }

  test("frameStats aggregates per media with partial aggregation") {
    val frames = MultimodalBinary.decodeFrames(
      ds(imageFile(1L, img(4, 16, identity)), imageFile(2L, img(4, 32, identity))),
      bandRows = 8)
    val stats = MultimodalBinary.frameStats(spark, frames)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stats == Map(1L -> 2L, 2L -> 4L))
  }

  test("catalog query q_multimodal_frames: one row per doc, deterministic") {
    val q = Catalog.byName("q_multimodal_frames")
    val rows = q.build(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.length == nDocs, "every document becomes one media row")
    rows.foreach { r =>
      assert(r.getLong(1) >= 1, "at least one sampled frame per media")
      // Every feature component lies in [-1, 1], so mean L1 ∈ (0, 8].
      assert(r.getDouble(2) > 0 && r.getDouble(2) <= 8.0)
    }
    // Deterministic: real codecs over fixed text bytes, no randomness.
    val again = q.build(spark, sfDir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // Content-sensitive: not all medias share the same mean feature.
    assert(rows.map(_.getDouble(2)).distinct.length > 1)
  }
  test("ppm: giant header dims fail the raster check, not index math") {
    // 1e6 x 1e6 needs 3e12 raster bytes; an Int product would wrap and
    // accept a crafted short payload. The Long check must refuse it.
    val hdr = "P6\n1000000 1000000\n255\n".getBytes("US-ASCII")
    val e = intercept[IllegalArgumentException](
      PpmCodec.decode(hdr ++ Array.fill[Byte](64)(1)))
    assert(e.getMessage.contains("3000000000000"),
      s"expected the un-wrapped byte need in: ${e.getMessage}")
  }

  // ---- perceptual hash (q_multimodal_phash) ----

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("aHash is stable under re-encoding and flips on content change") {
    val base = img(32, 16, k => k * 7 + 3)
    val h1 = imageAHash(base)
    // decode(encode(img)) is the same raster -> identical hash
    val h2 = imageAHash(PpmCodec.decode(PpmCodec.encode(base)))
    assert(h1 == h2, "container round trip must not move the hash")
    // inverted content must move many bits
    val inv = img(32, 16, k => 255 - (k * 7 + 3) % 256)
    assert(hamming(h1, imageAHash(inv)) > 16,
      "inverted raster should be far in Hamming space")
  }

  test("aHash is robust to a small local perturbation") {
    val base = img(32, 16, k => (k * 13) % 256)
    val px = base.pixels.clone()
    px(100) = (px(100) + 4).toByte // nudge one channel of one pixel
    val h = hamming(imageAHash(base), imageAHash(RgbImage(32, 16, px)))
    assert(h <= 1, s"one nudged pixel moved $h bits")
  }

  test("audio aHash: re-encode stable, loud-window bits set where planted") {
    val quiet = Array.fill[Short](640)(16)
    // plant energy in the second half: windows 32..63 must dominate
    val samples = quiet.zipWithIndex.map { case (s, i) =>
      if (i >= 320) (s * 900).toShort else s
    }
    val a = PcmAudio(16000, samples)
    val h1 = audioAHash(a)
    assert(h1 == audioAHash(WavCodec.decode(WavCodec.encode(a))))
    assert((h1 >>> 32) == 0xffffffffL && (h1 & 0xffffffffL) == 0L,
      f"exactly the loud half's windows must be set, got $h1%016x")
  }

  test("banding finds every Hamming<=3 pair and nothing above 8 (fixture corpus)") {
    import spark.implicits._
    val (hashesDf, pairsDf) = graft.operators.VectorQueries
      .phashPairs(spark, sfDir)
    val hs = hashesDf.as[(Long, String, Long)].collect()
    val got = pairsDf
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Long)]
      .collect().map(p => (p._1, p._2) -> p._3).toMap
    // brute force within modality
    val byMod = hs.groupBy(_._2)
    val brute = byMod.values.flatMap { g =>
      for {
        i <- g.indices; j <- g.indices if i < j
        a = g(i); b = g(j)
        d = hamming(a._3, b._3) if d <= 8
      } yield (math.min(a._1, b._1), math.max(a._1, b._1)) -> d.toLong
    }.toMap
    // guarantee zone: every pair within 3 bits MUST be found
    brute.filter(_._2 <= 3).foreach { case (k, d) =>
      assert(got.contains(k), s"banded join missed guaranteed pair $k ($d)")
    }
    // soundness: everything reported is a real <=8 pair with the right d
    got.foreach { case (k, d) =>
      assert(brute.get(k).contains(d), s"pair $k reported d=$d vs ${brute.get(k)}")
    }
  }

  test("catalog row q_multimodal_phash: planted near-dup semantics hold") {
    import spark.implicits._
    // a synthetic corpus with one planted near-dup pair and one far pair
    val base = img(32, 16, k => (k * 11) % 256)
    val nearPx = base.pixels.clone()
    nearPx(10) = (nearPx(10) + 3).toByte
    val far = img(32, 16, k => 255 - (k * 11) % 256)
    val h0 = imageAHash(base)
    val h1 = imageAHash(RgbImage(32, 16, nearPx))
    val h2 = imageAHash(far)
    assert(hamming(h0, h1) <= 3, "planted perturbation must stay near")
    assert(hamming(h0, h2) > 8, "planted inversion must stay far")
    // and the fixture-backed catalog row stays total + deterministic
    val rows = Catalog.byName("q_multimodal_phash").build(spark, sfDir)
      .collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.length == nDocs, "one fingerprint row per document")
    val again = Catalog.byName("q_multimodal_phash").build(spark, sfDir)
      .collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
