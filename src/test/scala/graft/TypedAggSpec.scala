package graft

import graft.functions.TypedAggs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** #22 q_agg_custom_typed: pins the WeightedAvgCents Aggregator to its SQL
  * definition sum(x·w)/sum(w) (SURVEY.md §2.4), its 2-decimal input
  * contract, and its fail-fast non-finite behavior. */
class TypedAggSpec extends AnyFunSuite with SparkFixture {

  test("WeightedAvgCents == sum(x*w)/sum(w) per group on lineitem") {
    import spark.implicits._
    val wavg = udaf(TypedAggs.WeightedAvgCents)
    val got = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(round(wavg($"l_extendedprice", $"l_quantity"), 4).as("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(round(
        sum($"l_extendedprice" * $"l_quantity") / sum($"l_quantity"), 4)
        .as("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == want)
  }

  test("WeightedAvgCents handles the empty-weight edge (NaN, not crash)") {
    import spark.implicits._
    val wavg = udaf(TypedAggs.WeightedAvgCents)
    val r = Seq((1.0, 0.0), (2.0, 0.0)).toDF("x", "w")
      .agg(wavg($"x", $"w")).head().getDouble(0)
    assert(r.isNaN)
  }

  test("2-decimal contract: >2-decimal inputs quantize to hundredths") {
    // The "Cents" in the name is a precondition, not a hint: 1.005 is
    // quantized to 1.00 (rint half-even on the exact double 1.00499...),
    // so callers with finer-grained inputs must not use this aggregator.
    import spark.implicits._
    val wavg = udaf(TypedAggs.WeightedAvgCents)
    val r = Seq((1.005, 1.0)).toDF("x", "w")
      .agg(wavg($"x", $"w")).head().getDouble(0)
    assert(r == 1.0, s"expected quantization to 1.00, got $r")
  }

  test("non-finite input fails fast instead of silently becoming 0") {
    import spark.implicits._
    val wavg = udaf(TypedAggs.WeightedAvgCents)
    val e = intercept[Exception] {
      Seq((Double.NaN, 1.0)).toDF("x", "w").agg(wavg($"x", $"w")).head()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.isInstanceOf[IllegalArgumentException]),
      s"expected IllegalArgumentException in cause chain, got $e")
  }

  test("catalog query q_agg_custom_typed runs and is sane") {
    val rows = Catalog.byName("q_agg_custom_typed").build(spark, sfDir).collect()
    assert(rows.length == 3) // returnflags A, N, R
    rows.foreach(r => assert(r.getDouble(1) > 0))
  }
}
