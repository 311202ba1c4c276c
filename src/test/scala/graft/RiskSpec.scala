package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Independent ground truth for the risk rows: recompute Sharpe and
  * beta/alpha driver-side from the raw daily series with plain Scala
  * doubles and require agreement to rounding tolerance, plus the CAPM
  * sanity law that value-weighted betas average to ~1 across the
  * market's components. */
class RiskSpec extends AnyFunSuite with SparkFixture {

  /** (type → ordered daily cents), via the same exact-decimal read. */
  private lazy val daily: Map[String, Seq[Long]] = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"event_type", to_date(date_trunc("day", $"ts")).as("day"))
      .agg((Dsl.dec2(sum(Dsl.dec2($"value"))) * 100).cast("long").as("y"))
      .select($"event_type", $"day".cast("string"), $"y")
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
  }

  private def rets(ys: Seq[Long]): Seq[Long] =
    ys.sliding(2).map { case Seq(a, b) =>
      math.floor(math.log(b.toDouble / a) * 1e6).toLong
    }.toSeq

  test("Sharpe equals the textbook mean/std recompute") {
    val got = Catalog.byName("q_ts_sharpe").build(spark, sfDir)
      .collect().map(r => (r.getString(0), (r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    assert(got.size == 5)
    got.foreach { case (t, (meanGot, volGot, shGot)) =>
      val r = rets(daily(t)).map(_.toDouble)
      val n = r.size
      val mean = r.sum / n
      val vol = math.sqrt(r.map(x => (x - mean) * (x - mean)).sum / (n - 1))
      assert(math.abs(meanGot - mean) < 1e-3, s"$t mean")
      assert(math.abs(volGot - vol) < 1e-3, s"$t vol")
      assert(math.abs(shGot - mean / vol * math.sqrt(365.0)) < 1e-3,
        s"$t sharpe")
    }
  }

  test("beta/alpha equal the covariance recompute; weighted betas ~ 1") {
    // market series = pooled daily totals (sum across types per day-index;
    // every type covers all 30 fixture days, pinned by RecursiveSpec)
    val mkt = rets(daily.values.transpose.map(_.sum).toSeq).map(_.toDouble)
    val got = Catalog.byName("q_ts_beta").build(spark, sfDir)
      .collect().map(r => (r.getString(0), (r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got.size == 5)
    val mm = mkt.sum / mkt.size
    val varM = mkt.map(x => (x - mm) * (x - mm)).sum / mkt.size
    got.foreach { case (t, (betaGot, alphaGot)) =>
      val r = rets(daily(t)).map(_.toDouble)
      val mr = r.sum / r.size
      val cov = r.zip(mkt).map { case (a, b) => (a - mr) * (b - mm) }
        .sum / r.size
      val beta = cov / varM
      assert(math.abs(betaGot - beta) < 1e-3, s"$t beta $betaGot != $beta")
      assert(math.abs(alphaGot - (mr - beta * mm)) < 1e-3, s"$t alpha")
    }
    // CAPM closure: betas of the market's own components, weighted by
    // anything reasonable, center on 1 — equal weights suffice here as a
    // sign-and-scale sanity check (loose band: log-return additivity
    // across components is only approximate).
    val avgBeta = got.values.map(_._1).sum / got.size
    assert(avgBeta > 0.5 && avgBeta < 1.5, s"avg beta $avgBeta far from 1")
  }
}
