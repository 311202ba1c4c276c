package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** #21 q_agg_approx_hll (T): the HLL++ sketch has no DuckDB twin, so the
  * contract is accuracy vs the exact distinct count (SURVEY.md §2.4). */
class HllSpec extends AnyFunSuite with SparkFixture {

  test("approx_count_distinct is within tolerance of exact per event_type") {
    import spark.implicits._
    val approx = Catalog.byName("q_agg_approx_hll").build(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (et, n) =>
      val a = approx(et)
      // rsd=0.02 requested; allow a generous 5x margin (still catches a
      // broken sketch, never flakes — the seed is deterministic anyway).
      assert(math.abs(a - n) <= math.max(1L, (0.1 * n).toLong),
        s"event_type=$et approx=$a exact=$n")
    }
  }

  test("approx distinct is exact at tiny cardinality (15 users at sf0.001)") {
    import spark.implicits._
    val a = Tables.events(spark, sfDir)
      .agg(approx_count_distinct($"user_id", 0.02)).as[Long].head()
    val e = Tables.events(spark, sfDir)
      .agg(countDistinct($"user_id")).as[Long].head()
    assert(a == e, s"HLL should be exact at cardinality $e, got $a")
  }
}
