package graft

import org.apache.spark.sql.functions.lower
import org.scalatest.funsuite.AnyFunSuite

/** Pins for q_dedup_ppjoin's candidate pruning (DedupQueries.scala)
  * beyond the oracle hash-match (whose DuckDB twin is the brute-force
  * all-pairs ground truth): the r9 POSITIONAL filter must strictly
  * shrink the candidate set the prefix+length filters admit, and must
  * do so LOSSLESSLY — every pair the weaker stack verifies similar
  * survives the stronger stack. */
class PpjoinSpec extends AnyFunSuite with SparkFixture {

  private lazy val without =
    operators.DedupQueries.ppjoinCandidates(spark, sfDir, positional = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  private lazy val withPos =
    operators.DedupQueries.ppjoinCandidates(spark, sfDir, positional = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("positional filter strictly reduces the candidate count") {
    assert(withPos.subsetOf(without),
      "positional stack admitted a pair the weaker stack didn't — " +
        "the filters must only ever remove candidates")
    assert(withPos.size < without.size,
      s"no reduction: ${withPos.size} with vs ${without.size} without — " +
        "the positional bound is vacuous on this corpus")
  }

  test("pruning is lossless: every truly-similar pair survives") {
    // Ground truth from the weaker (already oracle-proven-complete)
    // candidate set: exact Jaccard >= 0.5 over the shingle sets.
    val s = spark
    import org.apache.spark.sql.functions._
    import s.implicits._
    val docs = operators.DedupQueries.Shingled(s, sfDir)
      .select($"doc_id", array_distinct($"sh").as("sh"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[String](1).toSet).toMap
    def jac(p: (Long, Long)): Double = {
      val (a, b) = (docs(p._1), docs(p._2))
      val i = (a intersect b).size.toDouble
      i / (a.size + b.size - i)
    }
    val truth = without.filter(jac(_) >= 0.5)
    assert(truth.nonEmpty, "fixture must contain similar pairs")
    assert(truth.subsetOf(withPos),
      s"positional filter dropped truly-similar pairs: " +
        s"${(truth diff withPos).take(5)}")
  }

  test("q_dedup_containment equals a naive recompute and catches what Jaccard misses") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", lower($"text")).as[(Long, String)].collect()
    // mirror Shingles.of exactly: indices 1..max(n-2, 1), slice-truncated
    def shingles(t: String): Set[String] = {
      val w = t.split(" ", -1)
      (1 to math.max(w.length - 2, 1))
        .map(i => w.slice(i - 1, i + 2).mkString(" ")).toSet
    }
    val byKey = docs.map { case (id, t) =>
      (id, t.take(40), shingles(t))
    }
    // boundary note: na <= a few hundred, so no ratio can land inside
    // [0.8 - 5e-7, 0.8) where the 6-dp round could flip the gate
    val naive = (for {
      a <- byKey; b <- byKey
      if a._2 == b._2 && a._1 != b._1
      ni = (a._3 intersect b._3).size
      if ni.toDouble / a._3.size >= 0.8
    } yield (a._1, b._1)).toSet
    val got = Catalog.byName("q_dedup_containment").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // allow the 0.8-boundary rounding hair: compare the clear interiors
    assert(got == naive,
      s"containment sets differ: extra=${(got diff naive).take(5)} " +
        s"missing=${(naive diff got).take(5)}")
  }
}
