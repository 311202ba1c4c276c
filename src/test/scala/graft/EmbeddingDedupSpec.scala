package graft

import graft.operators.VectorQueries.EmbeddingDedup
import org.scalatest.funsuite.AnyFunSuite

/** q_dedup_embedding (T): the fixtures are spread (no near-dup vectors),
  * so behavior is pinned on planted synthetic near-identical vectors. */
class EmbeddingDedupSpec extends AnyFunSuite with SparkFixture {

  private def unit(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    v.map(_ / n)
  }

  /** Deterministic pseudo-random unit vector. */
  private def vec(seed: Int): Array[Float] = {
    val rnd = new java.util.Random(seed)
    unit(Array.fill(64)(rnd.nextGaussian().toFloat))
  }

  private def df(rows: (Long, Array[Float])*) = {
    import spark.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  test("planted near-identical vectors are detected") {
    val base = vec(1)
    val near = unit(base.zipWithIndex.map { case (x, i) =>
      if (i == 0) x + 0.01f else x }) // cosine ≈ 0.99995
    val d = df(0L -> base, 1L -> near, 2L -> vec(2), 3L -> vec(3))
    val pairs = EmbeddingDedup.nearPairs(d, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((0L, 1L)))
  }

  test("exact duplicates always collide (identical buckets)") {
    val base = vec(7)
    val d = df(0L -> base, 1L -> base, 2L -> vec(9))
    val pairs = EmbeddingDedup.nearPairs(d, 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((0L, 1L)))
    assert(pairs.head._3 >= 0.999999)
  }

  test("unrelated random vectors produce no pairs at a high threshold") {
    val d = df((0L to 20L).map(i => i -> vec(100 + i.toInt)): _*)
    assert(EmbeddingDedup.nearPairs(d, 0.9).collect().isEmpty)
  }

  test("catalog query recovers every planted jittered twin, nothing else") {
    import spark.implicits._
    val n = Tables.embeddings(spark, sfDir).count()
    val rows = Catalog.byName("q_dedup_embedding").build(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.98)
      assert(r.getLong(0) < r.getLong(1))
    }
    // The planted corpus has exactly one near-dup per fixture vector
    // (its +10⁶ jittered copy) and the originals are spread — so the
    // output should be exactly the n planted pairs. LSH recall is
    // probabilistic in general but deterministic given the seeded
    // planes; a shortfall here means a plane grazes a vector.
    val planted = rows.filter(r => r.getLong(1) == r.getLong(0) + 1000000L)
    assert(planted.length == rows.length, "no non-planted pair can reach 0.98")
    assert(rows.length >= (n * 9) / 10,
      s"planted-twin recall ${rows.length}/$n below 90%")
  }

  test("fixture embeddings are spread: a 0.9 dedup threshold finds nothing") {
    import spark.implicits._
    val d = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    assert(EmbeddingDedup.nearPairs(d, 0.9).collect().isEmpty)
  }

  test("semantic dedup matches a driver-side recompute exactly and " +
    "keeps every cluster's first member") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, Int, Array[Float])].collect()
    // Same ascending-index double fold as vec_dot, same HALF_UP round.
    def sim(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byLabel = emb.groupBy(_._2)
    val expected = emb.map { case (id, lab, v) =>
      val priors = byLabel(lab).filter(_._1 < id)
      val mx = if (priors.isEmpty) None
               else Some(priors.map(p => sim(p._3, v)).max)
      id -> ((mx, if (mx.exists(_ >= 0.30)) 0L else 1L))
    }.toMap
    val got = Catalog.byName("q_dedup_semantic").build(spark, sfDir)
      .select($"vec_id", $"max_prior_sim", $"kept")
      .collect()
    assert(got.length == emb.length)
    got.foreach { r =>
      val id = r.getLong(0)
      val (expSim, expKept) = expected(id)
      val gotSim = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      assert(gotSim == expSim, s"vec $id sim")
      assert(r.getLong(2) == expKept, s"vec $id kept")
    }
    // the lowest id of every cluster has no prior: always kept
    byLabel.values.map(_.map(_._1).min).foreach { first =>
      assert(expected(first)._2 == 1L, s"first member $first dropped")
    }
    // non-degenerate both ways at fixture scale
    assert(got.count(_.getLong(2) == 0L) > 0, "no duplicates flagged")
    assert(got.count(_.getLong(2) == 1L) > got.length / 2,
      "most of a spread corpus must survive")
  }
}
