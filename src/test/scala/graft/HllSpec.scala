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

  test("sketch union over day sketches matches direct sketching and exact counts") {
    import spark.implicits._
    val rows = Catalog.byName("q_agg_sketch_union").build(spark, sfDir)
      .collect()
    val (dayRows, unionRows) = rows.partition(!_.isNullAt(0))
    assert(unionRows.length == 1 && dayRows.nonEmpty)

    // Per-day estimates track the exact per-day distincts (lgK=12 ⇒
    // ~1.6% rsd; fixture cardinalities are tiny so HLL is near-exact —
    // allow 5%).
    dayRows.foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approx - exact) <= math.max(1L, (0.05 * exact).toLong),
        s"day=${r.get(0)} approx=$approx exact=$exact")
    }

    // THE mergeability contract: the union of per-day sketches tracks
    // sketching the whole table directly. Datasketches only guarantees
    // NEAR-identity (union can transition sketch modes), so assert the
    // same 5% envelope as the per-day rows rather than exact equality —
    // exact == held at this fixture's tiny cardinality but is not part
    // of the HLL contract and would break on an SF or lgK change.
    val direct = Tables.events(spark, sfDir)
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id", lit(12))))
      .as[Long].head()
    assert(math.abs(unionRows.head.getLong(1) - direct) <=
      math.max(1L, (0.05 * direct).toLong),
      "union-of-parts must track sketch-of-whole within 5%")
    val exactMonth = unionRows.head.getLong(2)
    assert(math.abs(unionRows.head.getLong(1) - exactMonth) <=
      math.max(1L, (0.05 * exactMonth).toLong))
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
