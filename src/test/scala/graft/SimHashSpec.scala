package graft

import graft.operators.DedupQueries.SimHash
import org.scalatest.funsuite.AnyFunSuite

/** q_dedup_simhash (T): engine-specific hashing, so the contract is
  * behavioral — all deterministic (fixed hash, fixed data). */
class SimHashSpec extends AnyFunSuite with SparkFixture {

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val base =
    "the quick brown fox jumps over the lazy dog while spark shuffles data across the cluster nodes tonight"

  test("identical texts have identical fingerprints (hamming 0)") {
    val pairs = SimHash.nearPairs(docsDf(Seq(0L -> base, 1L -> base)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((0L, 1L, 0)))
  }

  test("a prefix near-dup lands within the hamming threshold") {
    val nearDup = base.split(" ").dropRight(1).mkString(" ")
    val pairs = SimHash.nearPairs(docsDf(Seq(0L -> base, 1L -> nearDup)))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L)))
  }

  test("disjoint texts are rejected") {
    val other =
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma"
    val pairs = SimHash.nearPairs(docsDf(Seq(0L -> base, 1L -> other)))
      .collect()
    assert(pairs.isEmpty)
  }

  test("fixture prefix near-dups are recalled (majority)") {
    val prefixPairs = Catalog.byName("q_dedup_near").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val simhashPairs = Catalog.byName("q_dedup_simhash").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalled = prefixPairs.count(simhashPairs.contains)
    assert(recalled * 2 >= prefixPairs.size,
      s"recalled $recalled of ${prefixPairs.size}")
  }

  test("ngram-jaccard agrees with scala-computed jaccard on a known pair") {
    import spark.implicits._
    val rows = Catalog.byName("q_dedup_ngram_jaccard").build(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rows.nonEmpty)
    // recompute one pair by hand
    val ((a, b), got) = rows.head
    val texts = Tables.documents(spark, sfDir)
      .where($"doc_id".isin(a, b)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(t: String) =
      t.toLowerCase.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val sa = shingles(texts(a)); val sb = shingles(texts(b))
    val want = sa.intersect(sb).size.toDouble / sa.union(sb).size
    assert(math.abs(got - want) < 1e-6, s"pair ($a,$b): got $got want $want")
  }
}
