package graft

import graft.functions.TypedAggs
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Space-Saving heavy-hitters summary (TypedAggs.SpaceSaving): the exact
  * regime is oracle-checked by q_agg_heavy_hitters; this spec pins the
  * approximation CONTRACT — the part no SQL twin can express — plus
  * partition-invariance of the exact regime. */
class HeavyHittersSpec extends AnyFunSuite with SparkFixture {

  private def summary(r: Row): (Map[String, Long], Map[String, Long]) =
    (r.getMap[String, Long](0).toMap, r.getMap[String, Long](1).toMap)

  test("exact regime: k >= vocabulary is exact with zero err at any partitioning") {
    import spark.implicits._
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(lower($"text"), " ")).as("term"))
    val want = toks.groupBy($"term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(want.size < 64, "fixture vocabulary must fit k for this regime")
    for (p <- Seq(1, 4, 32)) {
      val ss = udaf(TypedAggs.SpaceSaving64)
      val (counts, errs) = summary(
        toks.repartition(p).agg(ss($"term").as("ss"))
          .select($"ss.counts", $"ss.errs").head())
      assert(counts == want, s"at $p partitions")
      assert(errs.values.forall(_ == 0L), s"exact regime must carry err 0 at $p")
    }
  }

  test("approximate regime: recall and count bounds hold on a skewed corpus") {
    import spark.implicits._
    // 1000 occurrences: two heavy terms far above n/k = 125, a 200-term
    // cold tail far below. Any merge order must (a) retain every term
    // with true frequency > n/k, (b) bracket every reported count by
    // reported - err <= true <= reported.
    val rows = Seq.fill(500)("hot1") ++ Seq.fill(300)("hot2") ++
      (1 to 200).map(i => s"cold$i")
    val n = rows.size
    val k = 8
    val truth = rows.groupBy(identity).map { case (t, v) => t -> v.size.toLong }
    val ss = udaf(new TypedAggs.SpaceSaving(k))
    val (counts, errs) = summary(
      rows.toDF("term").repartition(7)
        .agg(ss($"term").as("ss")).select($"ss.counts", $"ss.errs").head())
    assert(counts.size <= k)
    truth.filter(_._2 > n / k).keys.foreach { t =>
      assert(counts.contains(t), s"heavy term $t (freq ${truth(t)}) evicted")
    }
    counts.foreach { case (t, c) =>
      val f = truth.getOrElse(t, 0L)
      assert(c >= f, s"$t reported $c below true $f (overestimate broken)")
      assert(c - errs(t) <= f, s"$t lower bound ${c - errs(t)} above true $f")
    }
  }

  test("single-buffer eviction is deterministic and k-bounded") {
    // Driver-side unit check of the reduce path: feed a stream larger
    // than k through one buffer and require the classic SS invariants —
    // size never exceeds k, the evicting term inherits min+1/min.
    val agg = new TypedAggs.SpaceSaving(3)
    var b = agg.zero
    Seq("a", "a", "b", "c").foreach(t => b = agg.reduce(b, t))
    // Full buffer: d evicts the (count, term)-min entry, which is b.
    b = agg.reduce(b, "d")
    assert(b.counts.keySet == Set("a", "c", "d"))
    assert(b.counts("d") == 2L && b.errs("d") == 1L)
    assert(b.counts.size <= 3)
  }
}
