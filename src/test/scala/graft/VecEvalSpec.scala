package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent verification of the embedding-evaluation rows
  * (q_vec_centroid_sims, q_vec_silhouette) — driver-side recompute from
  * the raw vectors, no DuckDB involved. */
class VecEvalSpec extends AnyFunSuite with SparkFixture {

  private lazy val vecs: Map[Int, Array[(Long, Array[Double])]] = {
    import spark.implicits._
    Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"label", $"embedding")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
      .groupBy(_._2)
      .map { case (l, rs) => l -> rs.map(r => (r._1, r._3)) }
  }

  private lazy val centroids: Map[Int, Array[Double]] =
    vecs.map { case (l, rs) =>
      val d = rs.head._2.length
      val c = Array.tabulate(d)(i => rs.map(_._2(i)).sum / rs.length)
      l -> c
    }

  test("q_vec_centroid_sims matches a driver cosine recompute at 4 dp") {
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => a(i) * b(i)).sum
    val got = Catalog.byName("q_vec_centroid_sims").build(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val labels = centroids.keys.toSeq.sorted
    for (a <- labels; b <- labels if a < b) {
      val want = dot(centroids(a), centroids(b)) /
        (math.sqrt(dot(centroids(a), centroids(a))) *
          math.sqrt(dot(centroids(b), centroids(b))))
      assert(math.abs(got((a, b)) - want) < 5e-4,
        s"pair ($a,$b): got ${got((a, b))}, want $want")
    }
    assert(got.size == labels.size * (labels.size - 1) / 2)
  }

  test("q_vec_silhouette matches a driver recompute and stays in [-1, 1]") {
    def dist(x: Array[Double], c: Array[Double]): Double = {
      // Same unit-norm identity the query uses: ||x-c||^2 = 1+||c||^2-2x.c
      val cn2 = c.map(v => v * v).sum
      val d = x.indices.map(i => x(i) * c(i)).sum
      math.sqrt(1.0 + cn2 - 2.0 * d)
    }
    val want = vecs.map { case (l, rs) =>
      val sils = rs.map { case (_, x) =>
        val a = dist(x, centroids(l))
        val b = centroids.collect { case (o, c) if o != l => dist(x, c) }.min
        (b - a) / math.max(a, b)
      }
      l -> (rs.length.toLong, sils.sum / sils.length)
    }
    val got = Catalog.byName("q_vec_silhouette").build(spark, sfDir)
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (l, (n, s)) =>
      assert(n == want(l)._1)
      assert(math.abs(s - want(l)._2) < 5e-4, s"label $l: $s vs ${want(l)._2}")
      assert(s >= -1.0 && s <= 1.0)
    }
  }

  test("q_ts_cross_corr lag 0 equals a driver Pearson over aligned days") {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.date_trunc("day", $"ts")).as("day"))
      .agg(
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when($"event_type" === "view", 1L)
            .otherwise(0L)).as("x"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when($"event_type" === "purchase", 1L)
            .otherwise(0L)).as("y"))
      .collect().map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble))
    val n = daily.length
    val (sx, sy) = (daily.map(_._1).sum, daily.map(_._2).sum)
    val sxy = daily.map(p => p._1 * p._2).sum
    val sxx = daily.map(p => p._1 * p._1).sum
    val syy = daily.map(p => p._2 * p._2).sum
    val want = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    val got = Catalog.byName("q_ts_cross_corr").build(spark, sfDir)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(math.abs(got(0) - want) < 1e-5, s"lag0 ${got(0)} vs $want")
    assert(got.keySet == Set(0, 1, 2, 3))
  }

  test("q_vec_diversity equals the brute-force pairwise mean over quantized vectors") {
    val got = Catalog.byName("q_vec_diversity").build(spark, sfDir)
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got.keySet == vecs.keySet.map(_.toInt))
    vecs.foreach { case (label, vs) =>
      val q = vs.map(_._2.map(x => math.floor(x * 1e6).toLong))
      val n = q.length
      val (nGot, msdGot) = got(label)
      assert(nGot == n)
      // brute force: all ordered pairs, exact integer squared distances
      var sum = BigInt(0)
      for (i <- 0 until n; j <- 0 until n if i != j) {
        var d2 = 0L
        var k = 0
        while (k < 64) {
          val d = q(i)(k) - q(j)(k); d2 += d * d; k += 1
        }
        sum += d2
      }
      val msd = (BigDecimal(sum) / (n.toLong * (n - 1L))).toDouble / 1e12
      assert(math.abs(msdGot - msd) < 1e-5,
        s"label $label: $msdGot != brute-force $msd")
      // unit vectors: mean pairwise sq dist = 2 - 2*mean cos sim, in [0, 4]
      assert(msdGot > 0.0 && msdGot < 4.0)
    }
  }
}
