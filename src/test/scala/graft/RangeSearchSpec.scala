package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for q_vec_range_search (VectorQueries.scala): the threshold
  * semantics recomputed independently — plain Scala dot products over
  * the collected fixture, no Spark expressions — must select exactly
  * the same vector set. */
class RangeSearchSpec extends AnyFunSuite with SparkFixture {

  test("range result equals an independent Scala recomputation") {
    val s = spark
    import s.implicits._
    val vecs = Tables.embeddings(s, sfDir)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val p = vecs.find(_._1 == 0L).get._2
    val expect = vecs.filter(_._1 != 0L).flatMap { case (id, v) =>
      val sim = BigDecimal(
        v.zip(p).map { case (a, b) => a.toDouble * b.toDouble }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (sim >= 0.25) Some(id -> sim) else None
    }.toMap
    val got = Catalog.byName("q_vec_range_search").build(s, sfDir)
      .as[(Long, Double)].collect()
    assert(got.nonEmpty, "tau must select something at every fixture SF")
    assert(got.toMap == expect,
      s"range-search set mismatch: got ${got.length}, expect ${expect.size}")
    // ordered by sim desc then id — the contract consumers page through
    assert(got.sortBy(t => (-t._2, t._1)).toSeq == got.toSeq)
  }
}
