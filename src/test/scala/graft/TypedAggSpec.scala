package graft

import graft.functions.TypedAggs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** #22 q_agg_custom_typed (T): pins the WeightedAvg Aggregator to its SQL
  * definition sum(x·w)/sum(w) (SURVEY.md §2.4). */
class TypedAggSpec extends AnyFunSuite with SparkFixture {

  test("WeightedAvg == sum(x*w)/sum(w) per group on lineitem") {
    import spark.implicits._
    val wavg = udaf(TypedAggs.WeightedAvg)
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

  test("WeightedAvg handles the empty-weight edge (NaN, not crash)") {
    import spark.implicits._
    val wavg = udaf(TypedAggs.WeightedAvg)
    val r = Seq((1.0, 0.0), (2.0, 0.0)).toDF("x", "w")
      .agg(wavg($"x", $"w")).head().getDouble(0)
    assert(r.isNaN)
  }

  test("catalog query q_agg_custom_typed runs and is sane") {
    val rows = Catalog.byName("q_agg_custom_typed").build(spark, sfDir).collect()
    assert(rows.length == 3) // returnflags A, N, R
    rows.foreach(r => assert(r.getDouble(1) > 0))
  }
}
