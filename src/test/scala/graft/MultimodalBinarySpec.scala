package graft

import graft.operators.MultimodalBinary
import graft.operators.MultimodalBinary.{Frame, MediaFile, MediaMeta}
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary plumbing (stubbed decode): the schema, typed
  * mapPartitions shape, determinism and shuffle-freeness are the real
  * contract here — the codec itself is an explicit stub. */
class MultimodalBinarySpec extends AnyFunSuite with SparkFixture {

  private def media(id: Long, n: Int, mod: String = "image"): MediaFile =
    MediaFile(id, mod,
      Array.tabulate(n)(i => ((id * 131 + i) % 251).toByte),
      MediaMeta(64, 64, 0, 0L))

  private def ds(files: MediaFile*) = {
    import MultimodalBinary._
    spark.createDataset(files)(mediaEnc)
  }

  test("decode yields ceil(payload/stride) frames with fixed-width features") {
    val frames = MultimodalBinary.decodeFrames(ds(media(1L, 256), media(2L, 100)), 64)
      .collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId(1L).length == 4) // 256/64 exact
    assert(byId(2L).length == 2) // 100/64 → full frame + 36-byte tail frame
    assert(frames.forall(_.feature.length == MultimodalBinary.featureDim))
  }

  test("tail bytes reach a partial frame (content sensitivity has no blind spot)") {
    // Two 100-byte payloads agreeing on the first 64 bytes but differing
    // at byte 70: with floor framing both decoded identically (the tail
    // was dropped); ceil framing must separate them in frame 1.
    val base = Array.tabulate(100)(_.toByte)
    val tweaked = base.clone(); tweaked(70) = (tweaked(70) + 1).toByte
    val fs = MultimodalBinary.decodeFrames(ds(
        MediaFile(1L, "image", base, MediaMeta(64, 64, 16000, 100)),
        MediaFile(2L, "image", tweaked, MediaMeta(64, 64, 16000, 100))), 64)
      .collect().groupBy(_.media_id)
    assert(fs(1L).find(_.frame_idx == 0).get.feature.toSeq ==
      fs(2L).find(_.frame_idx == 0).get.feature.toSeq,
      "identical leading frames must match")
    assert(fs(1L).find(_.frame_idx == 1).get.feature.toSeq !=
      fs(2L).find(_.frame_idx == 1).get.feature.toSeq,
      "a tail-byte difference must change the tail frame")
  }

  test("decode is deterministic and content-sensitive") {
    val a = MultimodalBinary.decodeFrames(ds(media(1L, 256)), 64).collect()
    val b = MultimodalBinary.decodeFrames(ds(media(1L, 256)), 64).collect()
    assert(a.map(_.feature.toSeq).toSeq == b.map(_.feature.toSeq).toSeq)
    val other = MultimodalBinary.decodeFrames(ds(media(3L, 256)), 64).collect()
    assert(a.map(_.feature.toSeq).toSet != other.map(_.feature.toSeq).toSet,
      "different payloads must produce different features")
  }

  test("frame sampling keeps every Nth frame") {
    val frames = MultimodalBinary.decodeFrames(ds(media(1L, 640)), 64)
    val sampled = MultimodalBinary.frameSample(frames, 3).collect()
    assert(sampled.map(_.frame_idx).sorted.toSeq == Seq(0, 3, 6, 9))
  }

  test("decode+sample plan is narrow (no shuffle of payload bytes)") {
    val frames = MultimodalBinary.frameSample(
      MultimodalBinary.decodeFrames(ds(media(1L, 256)), 64), 2)
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"decode must not shuffle payloads:\n$plan")
  }

  test("resize average-pools features to the target width") {
    val frames = MultimodalBinary.decodeFrames(ds(media(1L, 128)), 64)
    val resized = MultimodalBinary.resize(frames, 4).collect()
    assert(resized.forall(_.feature.length == 4))
    val orig = frames.collect().head.feature
    val got = resized.find(_.frame_idx == 0).get.feature
    assert(math.abs(got(0) - (orig(0) + orig(1)) / 2) < 1e-6)
  }

  test("frameStats aggregates per media with partial aggregation") {
    val frames = MultimodalBinary.decodeFrames(
      ds(media(1L, 256), media(2L, 512)), 64)
    val stats = MultimodalBinary.frameStats(spark, frames)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stats == Map(1L -> 4L, 2L -> 8L))
  }

  test("catalog query q_multimodal_frames: one row per doc, deterministic") {
    import org.apache.spark.sql.functions._
    val q = Catalog.byName("q_multimodal_frames")
    val rows = q.build(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.length == nDocs, "every document becomes one media row")
    rows.foreach { r =>
      assert(r.getLong(1) >= 1, "at least one sampled frame per media")
      // StubCodec features are in [0,1]^8, so mean L1 lies in (0, 8].
      assert(r.getDouble(2) > 0 && r.getDouble(2) <= 8.0)
    }
    // Deterministic: the stub codec hashes payload bytes, no randomness.
    val again = q.build(spark, sfDir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // Content-sensitive: not all medias share the same mean feature.
    assert(rows.map(_.getDouble(2)).distinct.length > 1)
  }
}
