package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for the Benford audit beyond the oracle: digit
  * extraction really is the first significant digit (scale-invariant),
  * the nine groups partition the rows, and the expectation column is
  * the actual Benford law. */
class BenfordSpec extends AnyFunSuite with SparkFixture {

  private lazy val rows: Array[(Long, Long, Long, Long, Double)] =
    Catalog.byName("q_dq_benford").build(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))

  test("digits 1..9 partition the positive rows; ppm shares telescope") {
    import spark.implicits._
    assert(rows.map(_._1).toSeq == (1L to 9L))
    val nPos = Tables.events(spark, sfDir)
      .select((Dsl.dec2($"value") * 100).cast("long").as("c"))
      .where($"c" > 0).count()
    assert(rows.map(_._2).sum == nPos, "every positive row lands in a digit")
    val ppmSum = rows.map(_._3).sum
    // truncating div loses < 1 ppm per digit
    assert(ppmSum > 1000000L - 9 && ppmSum <= 1000000L)
  }

  test("first-digit extraction is scale-invariant and expectation is Benford") {
    import spark.implicits._
    // recompute digits from the raw double via normalization, not strings
    val naive = Tables.events(spark, sfDir)
      .select($"value").as[Double].collect()
      .filter(_ > 0.0)
      .map { v =>
        var x = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        while (x < 1) x *= 10
        while (x >= 10) x /= 10
        x.toLong
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { case (d, n, _, expPpm, _) =>
      assert(n == naive(d), s"digit $d count")
      val benford = math.floor(math.log(1.0 + 1.0 / d) / math.log(10.0) * 1e6)
      assert(expPpm == benford.toLong, s"digit $d expectation")
    }
  }
}
