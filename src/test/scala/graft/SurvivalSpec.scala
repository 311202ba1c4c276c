package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent ground truth for q_survival_km: recompute the KM curve
  * naively on the driver from the raw session list (re-sessionized
  * with plain Scala, no Spark windows) and require agreement, plus the
  * structural laws a survival curve must obey. */
class SurvivalSpec extends AnyFunSuite with SparkFixture {

  private lazy val sessions: Seq[(Long, Boolean)] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id")
      .as[(Long, Long, Long)].collect()
    val maxUs = ev.map(_._2).max
    ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val sess = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var first = sorted.head._2; var last = sorted.head._2
      sorted.tail.foreach { r =>
        if (r._2 - last > 1800000000L) { sess += ((first, last)); first = r._2 }
        last = r._2
      }
      sess += ((first, last))
      sess.map { case (f, l) =>
        ((l - f) / 60000000L, l > maxUs - 1800000000L)
      }
    }.toSeq
  }

  test("KM curve equals the naive product-limit recompute") {
    val got = Catalog.byName("q_survival_km").build(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))))
    val byDur = sessions.groupBy(_._1).view.mapValues { ss =>
      (ss.count(!_._2).toLong, ss.count(_._2).toLong)
    }.toMap
    val durs = byDur.keys.toSeq.sorted
    assert(got.map(_._1).toSeq == durs, "one row per distinct duration")
    var atRisk = sessions.size.toLong
    var s = 1.0
    val naive = durs.map { t =>
      val (d, c) = byDur(t)
      val row = (t, atRisk, d, c)
      s = if (d == atRisk) 0.0 else s * (1.0 - d.toDouble / atRisk)
      atRisk -= d + c
      (row, s)
    }
    got.zip(naive).foreach { case ((t, (n, d, c, sGot)), ((nt, nn, nd, nc), sN)) =>
      assert(t == nt && n == nn && d == nd && c == nc, s"counts at $t")
      // engine S carries the 1e-6-per-factor quantization; tolerance
      // scales with the number of factors (<= durs.size)
      assert(math.abs(sGot - sN) < 1e-4, s"dur $t: S $sGot != naive $sN")
    }
  }

  test("survival curve laws: monotone non-increasing from 1, risk set telescopes") {
    val got = Catalog.byName("q_survival_km").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.head._5 <= 1.0 && got.forall(_._5 >= 0.0))
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._5 <= a._5 + 1e-12, s"S increased at ${b._1}")
      assert(b._2 == a._2 - a._3 - a._4, s"risk set broken at ${b._1}")
    }
    assert(got.exists(_._4 > 0), "censoring must actually occur")
    assert(got.last._5 < 0.05, "the fixture curve descends")
  }
}
