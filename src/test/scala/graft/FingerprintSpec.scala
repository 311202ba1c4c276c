package graft

import graft.operators.TextQueries.Fingerprint
import org.scalatest.funsuite.AnyFunSuite

/** q_doc_fingerprint (T): winnowing fingerprints have no DuckDB twin
  * (xxhash64), so the contract is behavioral — including the sliding-
  * window guarantee: any match of length ≥ window + gram − 1 chars
  * shares a fingerprint regardless of offset. */
class FingerprintSpec extends AnyFunSuite with SparkFixture {

  /** doc_id → set of (pos, fp) selected pairs. */
  private def fps(rows: Seq[(Long, String)]): Map[Long, Set[(Long, Long)]] = {
    import spark.implicits._
    Fingerprint.fingerprints(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  private def hashesOf(m: Map[Long, Set[(Long, Long)]], id: Long): Set[Long] =
    m(id).map(_._2)

  private val base =
    "the quick brown fox jumps over the lazy dog while spark shuffles data across the cluster"

  test("identical texts produce identical fingerprint sets") {
    val m = fps(Seq(0L -> base, 1L -> base))
    assert(m(0L) == m(1L), "same text ⇒ same selected (pos, hash) pairs")
  }

  test("a prefix near-dup shares most leading fingerprints") {
    val truncated = base.substring(0, base.length - 8)
    val m = fps(Seq(0L -> base, 1L -> truncated))
    val shared = hashesOf(m, 0L).intersect(hashesOf(m, 1L))
    assert(shared.size * 2 >= hashesOf(m, 1L).size,
      s"expected most fingerprints shared, got ${shared.size}/${hashesOf(m, 1L).size}")
  }

  test("disjoint texts share no fingerprints") {
    val other = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val m = fps(Seq(0L -> base, 1L -> other))
    assert(hashesOf(m, 0L).intersect(hashesOf(m, 1L)).isEmpty)
  }

  test("boundary-straddling match is caught (the sliding-window guarantee)") {
    // A shared run of window + gram - 1 = 23 chars, planted at offsets
    // that straddle the r5 disjoint 16-gram bucket boundaries (offset 5
    // vs offset 29 — different buckets, different alignments). True
    // winnowing guarantees a shared fingerprint: the run contains a
    // full sliding window on both sides and the window min is a pure
    // function of content. The disjoint-bucket scheme missed exactly
    // this (its bucket mins mix match content with unrelated context).
    val shared = "zqxjkwvfpbgmdhztrlcnsyq" // 23 chars, not in the fillers
    require(shared.length == Fingerprint.window + Fingerprint.gram - 1)
    val docA = "aaaaa" + shared + "eeeeeeeeeeeeeeeeeeeeeeeeeeeeee"
    val docB = "iiiiiiiiiiiiiiiiiiiiiiiiiiiii" + shared + "ooooo"
    val m = fps(Seq(0L -> docA, 1L -> docB))
    val common = hashesOf(m, 0L).intersect(hashesOf(m, 1L))
    assert(common.nonEmpty,
      "a ≥ w+g−1 match must share a fingerprint at ANY offset")
  }

  test("short documents (< window grams) still fingerprint") {
    val tiny = "short text!" // 11 chars → 4 grams < 16
    val m = fps(Seq(0L -> tiny))
    assert(m(0L).size == 1, "one whole-document fingerprint expected")
  }

  test("density: selected fingerprints stay ~2/(w+1), not one per gram") {
    val m = fps(Seq(0L -> (base + " " + base + " " + base)))
    val grams = (base.length * 3 + 2) - Fingerprint.gram + 1
    assert(m(0L).size * (Fingerprint.window + 1) <= grams * 3,
      s"${m(0L).size} fingerprints from $grams grams — winnowing density blown")
  }

  test("typed winnowing is bit-identical to the declarative WindowExec form") {
    // Same XXH64 (seed 42, UTF8String bytes), same packing, same
    // selection rule — on the whole fixture corpus the two
    // implementations must produce EXACTLY the same (doc_id, pos, fp)
    // set. This is what licenses shipping the mapPartitions form.
    val docs = Tables.documents(spark, sfDir)
    val typed = Fingerprint.fingerprints(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val declarative = Fingerprint.fingerprintsDeclarative(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(typed == declarative)
    assert(typed.nonEmpty)
  }

  test("catalog query runs on the fixture corpus with bounded output") {
    val df = Catalog.byName("q_doc_fingerprint").build(spark, sfDir)
    val n = df.count()
    val docs = Tables.documents(spark, sfDir).count()
    assert(n > docs, "multiple windows per doc expected")
    assert(n < docs * 60, "fingerprints per doc must stay bounded")
  }
}
