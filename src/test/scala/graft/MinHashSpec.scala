package graft

import graft.operators.DedupQueries.MinHashLsh
import org.scalatest.funsuite.AnyFunSuite

/** #51 q_dedup_minhash (T): hash functions are engine-specific, so the
  * contract is recall on planted near-duplicates (SURVEY.md §2.10). All
  * assertions are deterministic — the 16 xxhash64 seeds are fixed. */
class MinHashSpec extends AnyFunSuite with SparkFixture {

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val base =
    "the quick brown fox jumps over the lazy dog while spark shuffles data across the cluster nodes"

  test("identical token sets always collide (all bands equal)") {
    val df = docsDf(Seq(
      0L -> base,
      1L -> base, // exact duplicate
      2L -> "completely different vocabulary about databases indexes pages buffers locks transactions"))
    val pairs = MinHashLsh.candidatePairs(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("planted near-duplicate (prefix truncation) is recalled") {
    // Same shape as the fixture near-dups: one doc is a prefix of the
    // other. Shingle Jaccard ≈ 14/15 ⇒ band-collision prob ≈ 0.997
    // (deterministic here — seeds are fixed).
    val nearDup = base.split(" ").dropRight(1).mkString(" ")
    val df = docsDf(Seq(0L -> base, 1L -> nearDup))
    val pairs = MinHashLsh.candidatePairs(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)),
      "high-Jaccard pair must share at least one of 4 bands")
  }

  test("disjoint vocabularies do not collide") {
    val df = docsDf(Seq(
      0L -> base,
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
    val pairs = MinHashLsh.candidatePairs(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.contains((0L, 1L)))
  }

  test("fixture prefix near-dups are recalled by MinHash (subset check)") {
    // The 40-char-prefix groups (FIXTURES.md: 21 groups at sf0.001) are
    // documents sharing a long leading token run — high Jaccard, so LSH
    // should recall a large majority of those pairs.
    val prefixPairs = Catalog.byName("q_dedup_near").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val minhashPairs = Catalog.byName("q_dedup_minhash").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prefixPairs.nonEmpty)
    val recalled = prefixPairs.count(minhashPairs.contains)
    assert(recalled * 2 >= prefixPairs.size,
      s"recalled only $recalled of ${prefixPairs.size} prefix near-dup pairs")
  }

  test("candidate generation is idempotent (distinct pairs)") {
    val df = docsDf(Seq(0L -> base, 1L -> base, 2L -> base))
    val pairs = MinHashLsh.candidatePairs(df).collect()
    assert(pairs.length == pairs.distinct.length)
    assert(pairs.length == 3) // (0,1) (0,2) (1,2), each once
  }
}
