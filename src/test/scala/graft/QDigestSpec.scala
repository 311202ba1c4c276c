package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.QDigest

/** Q-digest guarantees, pinned against exact order statistics — the
  * sketch has no DuckDB oracle (engine-specific state), so everything
  * it promises is proven here: rank-error bound, exact mergeability,
  * partitioning-invariance, size/weight bounds, domain rejection. */
class QDigestSpec extends AnyFunSuite with SparkFixture {

  private lazy val cents: Array[Long] = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select((Dsl.dec2($"value") * 100).cast("long")).as[Long]
      .collect()
  }

  private def histOf(v: Seq[Long]): Array[Long] = {
    val h = new Array[Long](QDigest.U)
    v.foreach(x => h(x.toInt) += 1L)
    h
  }

  test("every quantile's rank error clears the bits*N/k bound") {
    val sorted = cents.sorted
    val n = sorted.length.toLong
    val digest = QDigest.compress(histOf(cents))
    val bound = QDigest.bits.toLong * n / QDigest.k + 1
    Seq(100000L, 250000L, 500000L, 750000L, 900000L, 990000L).foreach { p =>
      val est = QDigest.quantile(digest, n, p)
      val target = math.max(1L, p * n / 1000000L)
      // rank window of the estimate value in the exact sorted list
      val rankLo = sorted.count(_ < est).toLong
      val rankHi = sorted.count(_ <= est).toLong
      val err =
        if (target < rankLo) rankLo - target
        else if (target > rankHi) target - rankHi
        else 0L
      assert(err <= bound, s"p=$p: est $est rank err $err > bound $bound")
    }
  }

  test("union of partition histograms equals the whole-data digest bit for bit") {
    val (a, b) = cents.splitAt(cents.length / 3)
    val merged = QDigest.Hist.merge(histOf(a), histOf(b))
    assert(QDigest.compress(merged) == QDigest.compress(histOf(cents)))
  }

  test("digest is a pure function of the multiset: any permutation agrees") {
    val shuffled = scala.util.Random.javaRandomToRandom(
      new java.util.Random(7)).shuffle(cents.toVector)
    assert(QDigest.compress(histOf(shuffled)) ==
      QDigest.compress(histOf(cents)))
  }

  test("node count stays under 3k and internal nodes respect the weight cap") {
    val n = cents.length.toLong
    val digest = QDigest.compress(histOf(cents))
    assert(digest.nonEmpty && digest.length <= 3 * QDigest.k,
      s"${digest.length} nodes")
    assert(digest.map(_.count).sum == n, "digest must conserve total weight")
    val threshold = (n + QDigest.k - 1) / QDigest.k
    digest.filter(nd => nd.hi != nd.lo).foreach { nd =>
      assert(nd.count <= threshold,
        s"internal node [${nd.lo},${nd.hi}] weight ${nd.count} > $threshold")
    }
  }

  test("out-of-domain values are rejected loudly, not clamped") {
    intercept[IllegalArgumentException] {
      QDigest.Hist.reduce(new Array[Long](QDigest.U), QDigest.U.toLong)
    }
    intercept[IllegalArgumentException] {
      QDigest.Hist.reduce(new Array[Long](QDigest.U), -1L)
    }
  }

  test("an empty events table yields zero rows, not an exception") {
    // The degenerate the WHERE-guarded rows handle declaratively:
    // quantile of nothing is no row. Drive the real catalog row over an
    // empty (schema-identical) events.parquet.
    val dir = java.nio.file.Files.createTempDirectory("graft_qd_empty")
      .toString
    Tables.events(spark, sfDir).limit(0).write.parquet(s"$dir/events.parquet")
    val out = Catalog.byName("q_agg_qdigest").build(spark, dir)
    assert(out.count() == 0L)
    assert(out.columns.toSeq ==
      Seq("p_pct", "est_cents", "digest_nodes", "n"))
    // And the readout itself refuses an empty digest loudly.
    intercept[IllegalArgumentException] {
      QDigest.quantile(Vector.empty, 0L, 500000L)
    }
  }

  test("the catalog row reports plausible p50 < p90 < p99 with the pinned size") {
    val rows = Catalog.byName("q_agg_qdigest").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(50L, 90L, 99L))
    val ests = rows.map(_._2)
    assert(ests(0) < ests(1) && ests(1) <= ests(2),
      s"quantiles must be monotone: ${ests.mkString(",")}")
    assert(rows.forall(_._4 == cents.length.toLong))
    assert(rows.forall(_._3 <= 3L * QDigest.k))
  }
}
