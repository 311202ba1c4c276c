package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AggQueries, TextQueries}

/** Independent-recompute contracts for the r13 evaluation/aggregation
  * engines, on planted sets where the truth is computable by hand:
  * the two-phase weighted median equals the brute-force ordered scan
  * AND is invariant to its bucket width (the width is a performance
  * knob, never a semantics knob); exact AUC equals brute-force pair
  * counting with ties at ½, flips under label inversion, and hits the
  * 1.0 / 0.5 anchors on separated / all-tied sets. */
class WeightedStatsSpec extends AnyFunSuite with SparkFixture {

  // ---- weighted median ----

  /** Brute force: smallest v with 2·cum(v) ≥ total, per group. */
  private def bruteMedian(rows: Seq[(String, Long, Long)])
      : Map[String, (Long, Long)] =
    rows.groupBy(_._1).map { case (g, rs) =>
      val tw = rs.map(_._3).sum
      val byV = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      var cum = 0L
      val med = byV.collectFirst {
        case (v, w) if { cum += w; 2 * cum >= tw } => v
      }.get
      g -> (tw, med)
    }

  private def shippedMedian(rows: Seq[(String, Long, Long)], width: Long)
      : Map[String, (Long, Long)] = {
    import spark.implicits._
    AggQueries.weightedMedianFrame(rows.toDF("g", "v", "w"), width)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
  }

  // Deterministic planted rows: clustered values, adversarial weights
  // (one giant weight, runs of ties, negatives-free), three groups of
  // very different shapes.
  private val planted: Seq[(String, Long, Long)] = {
    val a = (1 to 200).map(i => ("a", (i * 37 % 90 + 10).toLong * 1000L,
      (i % 7 + 1).toLong))
    val b = Seq(("b", 5L, 1L), ("b", 1000000L, 1000000L), ("b", 7L, 3L))
    val c = (1 to 50).map(i => ("c", 42L, i.toLong)) // all ties on v
    a ++ b ++ c
  }

  test("two-phase weighted median == brute force on planted groups, " +
      "for every bucket width (width is a performance knob, not a " +
      "semantics knob)") {
    val want = bruteMedian(planted)
    Seq(1L, 7L, 1000L, 1000000L, Long.MaxValue / 4).foreach { w =>
      assert(shippedMedian(planted, w) == want,
        s"bucket width $w must not change the result")
    }
    // The dominating-weight group resolves to the giant's value, the
    // all-ties group to the tied value — hand-checkable anchors.
    assert(want("b")._2 == 1000000L)
    assert(want("c")._2 == 42L)
  }

  test("weighted median with unit weights equals the plain lower " +
      "median") {
    val vals = Seq(9L, 1L, 5L, 3L, 7L)
    val rows = vals.map(v => ("g", v, 1L))
    assert(shippedMedian(rows, 2L)("g")._2 == 5L)
    val even = (vals :+ 11L).map(v => ("g", v, 1L))
    // Even count: the LOWER median (first v crossing half).
    assert(shippedMedian(even, 2L)("g")._2 == 5L)
  }

  // ---- exact AUC ----

  private def shippedAuc(rows: Seq[(Long, Long)]): (Long, Long, Option[Double]) = {
    import spark.implicits._
    val r = TextQueries.aucFrame(rows.toDF("s", "y")).head()
    (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))
  }

  /** Brute force: (#(pos > neg) + ½·#(pos = neg)) / (P·N). */
  private def bruteAuc(rows: Seq[(Long, Long)]): Option[Double] = {
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    if (pos.isEmpty || neg.isEmpty) None
    else {
      val wins = (for (p <- pos; n <- neg)
        yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      Some(BigDecimal(wins / (pos.size.toDouble * neg.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  private val aucPlanted: Seq[(Long, Long)] =
    (1 to 120).map { i =>
      val s = (i * 53 % 40).toLong
      // Label correlated with score but noisy — ties across classes
      // guaranteed (40 distinct scores, 120 rows).
      (s, if ((s + i) % 3 != 0 && s > 12) 1L else 0L)
    }

  test("exact AUC == brute-force pair counting with ties at 1/2, on a " +
      "noisy planted set") {
    val (p, n, got) = shippedAuc(aucPlanted)
    assert(p > 0 && n > 0 && p + n == 120)
    assert(got == bruteAuc(aucPlanted))
  }

  test("label inversion flips AUC around 1/2 (auc + auc' == 1)") {
    val flipped = aucPlanted.map { case (s, y) => (s, 1L - y) }
    val a = shippedAuc(aucPlanted)._3.get
    val b = shippedAuc(flipped)._3.get
    assert(math.abs(a + b - 1.0) < 2e-6, s"$a + $b must be 1")
  }

  test("anchors: perfectly separated = 1.0; all-tied scores = 0.5; " +
      "single-class = NULL") {
    val sep = (1 to 20).map(i => (i.toLong, if (i > 10) 1L else 0L))
    assert(shippedAuc(sep)._3.contains(1.0))
    val tied = (1 to 20).map(i => (7L, (i % 2).toLong))
    assert(shippedAuc(tied)._3.contains(0.5))
    assert(shippedAuc((1 to 5).map(i => (i.toLong, 1L)))._3.isEmpty)
  }

  // ---- leave-one-out encoding ----

  test("LOO encode == brute-force mean-of-others on the fixture, and " +
      "singleton categories are NULL") {
    import spark.implicits._
    val rows = Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_orderpriority",
        (graft.Dsl.dec2($"o_totalprice") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byCat = rows.groupBy(_._2)
    val want = rows.map { case (k, cat, c) =>
      val others = byCat(cat)
      k -> (if (others.size == 1) None
        else Some(BigDecimal((others.map(_._3).sum - c).toDouble /
          (others.size - 1) / 100.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
    val got = Catalog.byName("q_prep_loo_encode").build(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got == want)
  }
}
