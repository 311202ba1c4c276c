package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the two maintenance/quality rows added in r8's second pass:
  * q_profile_table (one-pass column profiling) and
  * q_view_incremental_join (delta-join view maintenance). */
class ProfileViewSpec extends AnyFunSuite with SparkFixture {

  test("profile statistics agree with per-column direct computation") {
    val s = spark
    import s.implicits._
    val prof = Catalog.byName("q_profile_table").build(s, sfDir)
      .collect().map(r => r.getString(1) -> r).toMap
    val li = Tables.lineitem(s, sfDir)
    val n = li.count()
    assert(prof.keySet == Set("l_quantity", "l_extendedprice",
      "l_discount", "l_returnflag", "l_linestatus"))
    prof.values.foreach { r =>
      assert(r.getLong(2) == n, "n_rows must be the table row count")
      assert(r.getLong(3) == 0L, "fixture has no nulls")
    }
    // independent distinct counts recomputed here one column at a time
    // (the row's plan is deliberately per-column single-distinct scans,
    // NEVER the multi-distinct Expand path — PlanAuditSpec pins that;
    // either way these numbers must match)
    Seq("l_quantity", "l_returnflag", "l_linestatus").foreach { c =>
      val d = li.select(countDistinct(col(c))).head().getLong(0)
      assert(prof(c).getLong(4) == d, s"n_distinct($c)")
    }
    // typed slots: numeric rows carry null strings and vice versa
    assert(prof("l_quantity").isNullAt(7) && prof("l_quantity").isNullAt(8))
    assert(prof("l_returnflag").isNullAt(5) &&
      prof("l_returnflag").isNullAt(6))
    assert(prof("l_returnflag").getString(7) == "A" &&
      prof("l_returnflag").getString(8) == "R")
  }

  test("profile null accounting is real, not vacuous") {
    // The fixture has zero nulls, so pin the n_nulls = n_rows − count(c)
    // arithmetic on data that HAS them: same stack mechanics, synthetic
    // frame with a known null pattern.
    val s = spark
    import s.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (null, "b"), (3L, null), (null, null))
      .toDF("x", "y")
    val prof = df.agg(
      count(lit(1)).as("n"), count($"x").as("xn"), count($"y").as("yn"))
      .select(expr("stack(2, 'x', n - xn, 'y', n - yn)")
        .as(Seq("c", "nulls")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prof == Map("x" -> 2L, "y" -> 2L))
  }

  test("maintained join view equals the full recompute") {
    val s = spark
    import s.implicits._
    val maintained =
      Catalog.byName("q_view_incremental_join").build(s, sfDir)
    val direct = Tables.orders(s, sfDir)
      .join(Tables.customer(s, sfDir), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"o_custkey", $"c_mktsegment",
        $"c_nationkey", $"o_totalprice")
    assert(maintained.count() == direct.count())
    assert(maintained.exceptAll(direct).isEmpty &&
      direct.exceptAll(maintained).isEmpty,
      "append-then-merge must be indistinguishable from rebuild")
    // both sides of the split are genuinely populated at this fixture —
    // otherwise the incremental claim is tested against an empty delta
    val snap = lit("1999-01-01").cast("timestamp")
    val o = Tables.orders(s, sfDir)
    assert(o.where($"o_orderdate" < snap).count() > 0)
    assert(o.where($"o_orderdate" >= snap).count() > 0)
  }
}
