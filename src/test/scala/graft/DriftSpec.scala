package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent verification of the corpus-level drift/shape monitors
  * (q_dq_psi, q_text_zipf) — driver-side recompute from the raw
  * fixtures with the SAME declared quantization contract (integer ppm
  * shares, micro-nat logs), no DuckDB involved. */
class DriftSpec extends AnyFunSuite with SparkFixture {

  test("q_dq_psi equals a naive two-half binned recompute") {
    import spark.implicits._
    val rows = Tables.events(spark, sfDir)
      .select((Dsl.dec2($"value") * 100).cast("long"),
        to_date($"ts").cast("string"))
      .as[(Long, String)].collect()
    val binned = rows.map { case (c, d) =>
      (math.min(c / 3300, 9L), d < "2024-01-16")
    }
    val np = binned.count(_._2).toLong
    val nq = binned.size - np
    assert(np > 0 && nq > 0, "both halves populated")
    val got = Catalog.byName("q_dq_psi").build(spark, sfDir).collect()
    var psiAcc = 0L
    got.foreach { r =>
      val bin = r.getLong(0)
      val cp = binned.count(b => b._1 == bin && b._2).toLong
      val cq = binned.count(b => b._1 == bin && !b._2).toLong
      assert(r.getLong(2) == cp && r.getLong(3) == cq, s"bin $bin counts")
      val pPpm = cp * 1000000L / np
      val qPpm = cq * 1000000L / nq
      assert(r.getLong(4) == pPpm && r.getLong(5) == qPpm, s"bin $bin ppm")
      if (cp > 0 && cq > 0) {
        assert(r.getLong(6) == 0L)
        val lr = math.floor(math.log(cp.toDouble * nq /
          (cq.toDouble * np)) * 1e6).toLong
        val contribQ = (pPpm - qPpm) * lr
        assert(math.abs(r.getDouble(7) - contribQ / 1e12) < 1e-6,
          s"bin $bin contrib")
        psiAcc += contribQ
      } else assert(r.getLong(6) == 1L)
    }
    got.foreach { r =>
      assert(math.abs(r.getDouble(8) - psiAcc / 1e12) < 1e-6,
        "psi total mismatches the per-bin sum")
    }
    // the two halves of a stationary synthetic stream should be close
    // but the statistic must be a real number, not degenerate-zero
    assert(got.nonEmpty && got.map(_.getLong(2)).sum == np)
  }

  test("q_text_zipf equals a naive rank-frequency OLS recompute") {
    import spark.implicits._
    val texts = Tables.documents(spark, sfDir)
      .select($"text").as[String].collect()
    val cnt = texts.flatMap(_.toLowerCase.split(" "))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ranked = cnt.toSeq.sortBy { case (t, c) => (-c, t) }.zipWithIndex
      .map { case ((_, c), i) => (i + 1L, c) }
    val pts = ranked.map { case (r, c) =>
      (math.floor(math.log(r.toDouble) * 1e6).toLong,
        math.floor(math.log(c.toDouble) * 1e6).toLong)
    }
    val n = pts.size.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val row = Catalog.byName("q_text_zipf").build(spark, sfDir).collect()
    assert(row.length == 1)
    val r = row(0)
    assert(r.getLong(0) == n, "vocabulary size")
    assert(r.getLong(1) == cnt.values.sum, "total token count")
    assert(math.abs(r.getDouble(2) - slope) < 1e-5,
      s"slope ${r.getDouble(2)} != naive $slope")
    // a natural-ish frequency curve slopes downward, sanity-bounded
    assert(r.getDouble(2) < 0.0 && r.getDouble(2) > -3.0)
  }
}
