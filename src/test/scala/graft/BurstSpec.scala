package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for q_ts_bursts beyond the oracle hash-match: the
  * fixture's near-uniform daily counts never burst (the oracle proves
  * the two engines decode identically, not that the decoder works), so
  * these tests plant synthetic series through the factored
  * [[operators.AnalyticsQueries.burstChain]] and check against a
  * BRUTE-FORCE enumeration of all 2^T state sequences — the exact
  * Viterbi optimum, computed without any DP. */
class BurstSpec extends AnyFunSuite with SparkFixture {

  private def day(i: Int): java.sql.Date =
    java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))

  private def decode(ns: Seq[Long]): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    operators.AnalyticsQueries
      .burstChain(spark,
        ns.zipWithIndex.map { case (n, i) => ("t", day(i), n) }
          .toDF("event_type", "day", "n"))
      .collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
  }

  /** Exact brute-force optimum over all 2^T sequences with the same
    * quantized integer costs the operator uses. Returns (minCost,
    * bestSeqs) — all argmin sequences, since tie-breaks are the DP's
    * own business; the DP result must be one of them. */
  private def bruteForce(ns: Seq[Long]): (Long, Set[Seq[Int]]) = {
    val t = ns.length.toLong
    val r = ns.sum
    val lam0 = r * 1000000L / t
    val lam1 = 3L * r * 1000000L / t
    val l0 = math.floor(math.log(r.toDouble / t) * 1000000L).toLong
    val l1 = math.floor(math.log(3.0 * r / t) * 1000000L).toLong
    val g = math.floor(math.log(t.toDouble) * 1000000L).toLong
    def cost(seq: Seq[Int]): Long = {
      var c = 0L; var prev = 0
      seq.zip(ns).foreach { case (st, n) =>
        if (st == 1 && prev == 0) c += g
        c += (if (st == 0) lam0 - n * l0 else lam1 - n * l1)
        prev = st
      }
      c
    }
    val all = (0 until (1 << ns.length)).map { bits =>
      val seq = ns.indices.map(i => (bits >> i) & 1)
      (seq, cost(seq))
    }
    val min = all.map(_._2).min
    (min, all.filter(_._2 == min).map(_._1).toSet)
  }

  test("planted burst: DP decode is a brute-force argmin and flags the episode") {
    // 4 quiet days, 4 at 6x the base rate, 4 quiet
    val ns = Seq[Long](5, 5, 5, 5, 30, 30, 30, 30, 5, 5, 5, 5)
    val got = decode(ns)
    val (minCost, argmins) = bruteForce(ns)
    assert(argmins.contains(got.map(_._2.toInt)),
      s"DP sequence ${got.map(_._2)} not among brute-force optima")
    // verify the DP's own reported path cost reaches the optimum
    val lastD = math.min(got.last._3, got.last._4)
    assert(lastD == minCost, s"DP terminal cost $lastD != brute $minCost")
    assert(got.map(_._2) == Seq(0L, 0, 0, 0, 1, 1, 1, 1, 0, 0, 0, 0),
      "the elevated run and only the elevated run must be flagged")
  }

  test("hysteresis: a shallow dip inside a sustained burst does not split the episode") {
    // Bridging is optimal only when the dip's stay-in-burst penalty
    // (lam1 - lam0 - n_dip * ln 3) is below the re-entry cost ln T -
    // quiet 2/day, burst 9/day, one mid-burst day at 6 sits just under
    // that line at T = 14 (a deep dip SHOULD split; that case is the
    // planted-burst test's clean exit).
    val ns = Seq[Long](2, 2, 2, 2, 2, 9, 9, 6, 9, 9, 2, 2, 2, 2)
    val got = decode(ns)
    val (_, argmins) = bruteForce(ns)
    assert(argmins.contains(got.map(_._2.toInt)))
    assert(got.map(_._2) ==
      Seq(0L, 0, 0, 0, 0, 1, 1, 1, 1, 1, 0, 0, 0, 0),
      s"the dip at day 8 must stay inside the burst: ${got.map(_._2)}")
  }

  test("uniform series never bursts; catalog row agrees on the fixture") {
    val flat = decode(Seq.fill(12)(7L))
    assert(flat.forall(_._2 == 0L))
    val fx = Catalog.byName("q_ts_bursts").build(spark, sfDir).collect()
    assert(fx.length > 0)
    assert(fx.map(_.getString(0)).distinct.length == 5)
  }
}
