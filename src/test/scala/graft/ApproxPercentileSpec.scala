package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_agg_approx_percentile's T-row contract: percentile_approx carries a
  * RANK-error guarantee (<= 1/accuracy), not a value-error one, so the
  * right assertion is a bracket between nearby exact quantiles — and, at
  * accuracy 1000 on fixture group sizes, determinism across partition
  * layouts (the sketch merge is deterministic for a deterministic scan). */
class ApproxPercentileSpec extends AnyFunSuite with SparkFixture {

  test("approx p50 lies between the exact 0.49 and 0.51 quantiles per group") {
    import spark.implicits._
    val approx = Catalog.byName("q_agg_approx_percentile")
      .build(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        percentile($"l_extendedprice", lit(0.49)).as("lo"),
        percentile($"l_extendedprice", lit(0.51)).as("hi"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (g, v) =>
      val (lo, hi) = exact(g)
      assert(v >= lo && v <= hi,
        s"group $g: approx p50 $v outside exact [0.49, 0.51] bracket [$lo, $hi]")
    }
    assert(approx.nonEmpty)
  }

  test("the rank guarantee holds at every partition layout (values may differ)") {
    // Measured: the digest is NOT partition-invariant — merge order
    // shifts which sample represents a centroid, so exact output values
    // differ between layouts (this is why the row is T, not oracle).
    // What the sketch DOES contract is the rank error, under any merge
    // order: assert the same exact-quantile bracket per layout.
    import spark.implicits._
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        percentile($"l_extendedprice", lit(0.49)).as("lo"),
        percentile($"l_extendedprice", lit(0.51)).as("hi"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for (parts <- Seq(1, 8)) {
      val approx = Tables.lineitem(spark, sfDir)
        .repartition(parts, $"l_orderkey")
        .groupBy($"l_returnflag")
        .agg(percentile_approx($"l_extendedprice", lit(0.5), lit(1000))
          .as("p"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      approx.foreach { case (g, v) =>
        val (lo, hi) = exact(g)
        assert(v >= lo && v <= hi, s"parts=$parts group $g: $v not in [$lo, $hi]")
      }
    }
  }
}
