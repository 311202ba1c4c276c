package graft

import graft.operators.DedupQueries.SimHash
import org.scalatest.funsuite.AnyFunSuite

/** q_dedup_simhash (T): engine-specific hashing, so the contract is
  * behavioral — all deterministic (fixed hash, fixed data).
  *
  * The shipped sketch is 64-bit / hamming ≤ 3 (the production width
  * rule — see SimHashSketch). At that width only near-IDENTICAL texts
  * land inside the threshold, so the near-dup plants are long documents
  * with a single-word edit: hundreds of stable features, ~6 perturbed,
  * which keeps the expected bit-flip count well under 3 of 64. */
class SimHashSpec extends AnyFunSuite with SparkFixture {

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Deterministic n-word document (Knuth-hash vocabulary indices). */
  private def longDoc(n: Int): Array[String] =
    (0 until n).map(i => "w" + ((i * 2654435761L) % 997)).toArray

  private val base = longDoc(400).mkString(" ")

  test("identical texts have identical fingerprints (hamming 0)") {
    val pairs = SimHash.nearPairs(docsDf(Seq(0L -> base, 1L -> base)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((0L, 1L, 0)))
  }

  test("a single-word-edit near-dup lands within the hamming threshold") {
    val words = longDoc(400)
    words(200) = "edited"
    val nearDup = words.mkString(" ")
    val pairs = SimHash.nearPairs(docsDf(Seq(0L -> base, 1L -> nearDup)))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L)))
  }

  test("disjoint texts are rejected") {
    val other = (0 until 400).map(i => "x" + ((i * 40503L) % 991)).mkString(" ")
    val pairs = SimHash.nearPairs(docsDf(Seq(0L -> base, 1L -> other)))
      .collect()
    assert(pairs.isEmpty)
  }

  test("planted exact twins in the fixture corpus are always recalled") {
    // Identical text ⇒ identical fingerprint ⇒ hamming 0 ⇒ pigeonhole
    // guarantees a chunk collision — recall here is a THEOREM for the
    // shipped config, so every planted twin must appear.
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val twins = docs.where($"doc_id" % 25 === 0)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text")
    val expected = twins
      .select(($"doc_id" - 1000000L).as("a"), $"doc_id".as("b"))
      .as[(Long, Long)].collect().toSet
    val pairs = SimHash.nearPairs(docs.unionAll(twins))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)
    val missed = expected.diff(pairs)
    assert(missed.isEmpty, s"missed ${missed.size} of ${expected.size} twins")
    info(s"recalled all ${expected.size} planted twins; " +
      s"${pairs.size - expected.size} additional fixture pairs within hamming 3")
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
