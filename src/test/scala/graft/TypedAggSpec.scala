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

  test("TopKByScore is a pure function of the input set: any order, any split") {
    // The batch-kNN contract: the bounded-heap aggregate must land on
    // the same top-k no matter how rows are ordered or partitioned —
    // including ties, which break by ascending id.
    val agg = new TypedAggs.TopKByScore(3)
    val rows: Seq[(Double, Long)] =
      Seq((0.9, 7L), (0.9, 3L), (0.5, 1L), (0.7, 9L), (0.7, 2L), (0.1, 8L))
    val expected = Seq((0.9, 3L), (0.9, 7L), (0.7, 2L))
    def run(order: Seq[(Double, Long)], splitAt: Int): Seq[(Double, Long)] = {
      val (l, r) = order.splitAt(splitAt)
      agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
    }
    for (p <- rows.permutations.take(50); s <- 0 to rows.size)
      assert(run(p, s) == expected, s"perm $p split $s")
  }

  test("catalog query q_vec_knn_batch ranks 1..5 per probe, sims non-increasing") {
    val rows = Catalog.byName("q_vec_knn_batch").build(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length % 5 == 0)
    rows.grouped(5).foreach { g =>
      assert(g.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      val sims = g.map(_.getDouble(3)).toSeq
      assert(sims == sims.sorted.reverse, s"sims not ranked: $sims")
    }
  }
}
