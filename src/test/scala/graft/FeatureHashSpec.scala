package graft

import org.scalatest.funsuite.AnyFunSuite
import java.security.MessageDigest

/** Independent ground truth for q_vec_feature_hash: recompute the
  * signed projection with JVM MessageDigest (no Spark, no SQL md5) and
  * require exact agreement, plus the structural laws of the sketch. */
class FeatureHashSpec extends AnyFunSuite with SparkFixture {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def bucketSign(dim: Int): (Int, Long) = {
    val h = md5hex(s"fh-v1:$dim")
    val b = (h(0).toInt % 4) * 4 + h(1).toInt % 4
    val sg = if (h(2).toInt % 2 == 0) 1L else -1L
    (b, sg)
  }

  test("per-(label,bucket) sums equal a MessageDigest-based recompute") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, Int, Seq[Float])].collect()
    val proj = (1 to 64).map(bucketSign)
    val perVec = vecs.map { case (_, label, emb) =>
      val b = new Array[Long](16)
      emb.zipWithIndex.foreach { case (x, i) =>
        val (bk, sg) = proj(i)
        b(bk) += sg * math.floor(x.toDouble * 1e6).toLong
      }
      (label, b)
    }
    val naive = perVec.groupBy(_._1).view.mapValues { vs =>
      val sums = new Array[Long](16); val l1 = new Array[Long](16)
      vs.foreach { case (_, b) =>
        (0 until 16).foreach { k => sums(k) += b(k); l1(k) += math.abs(b(k)) }
      }
      (sums, l1)
    }.toMap
    val got = Catalog.byName("q_vec_feature_hash").build(spark, sfDir)
      .collect()
      .map(r => ((r.getInt(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(got.length == naive.size * 16, "every label hits all 16 buckets")
    got.foreach { case ((label, bk), (n, fs, fl1)) =>
      val (sums, l1s) = naive(label)
      assert(n == perVec.count(_._1 == label))
      assert(fs == sums(bk.toInt), s"$label/$bk sum")
      assert(fl1 == l1s(bk.toInt), s"$label/$bk l1")
      // cancellation across vectors: |sum| <= l1, strict somewhere
      assert(math.abs(fs) <= fl1)
    }
    assert(got.exists { case (_, (_, fs, fl1)) => math.abs(fs) < fl1 },
      "cross-vector cancellation must be visible (else per-vec stage is fake)")
  }

  test("the derived projection matrix covers all 16 buckets with both signs") {
    val proj = (1 to 64).map(bucketSign)
    assert(proj.map(_._1).distinct.sorted == (0 until 16))
    assert(proj.map(_._2).distinct.sorted == Seq(-1L, 1L))
  }
}
