package graft

import graft.operators.TextQueries.Fingerprint
import org.scalatest.funsuite.AnyFunSuite

/** q_doc_fingerprint (T): winnowing fingerprints have no DuckDB twin
  * (xxhash64), so the contract is behavioral. */
class FingerprintSpec extends AnyFunSuite with SparkFixture {

  private def fps(rows: Seq[(Long, String)]): Map[Long, Set[(Long, Long)]] = {
    import spark.implicits._
    Fingerprint.fingerprints(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  private val base =
    "the quick brown fox jumps over the lazy dog while spark shuffles data across the cluster"

  test("identical texts produce identical fingerprint sets") {
    val m = fps(Seq(0L -> base, 1L -> base))
    assert(m(0L).map(_._2) == m(1L).map(_._2))
  }

  test("a prefix near-dup shares most leading fingerprints") {
    val truncated = base.substring(0, base.length - 8)
    val m = fps(Seq(0L -> base, 1L -> truncated))
    val shared = m(0L).intersect(m(1L))
    assert(shared.size * 2 >= m(1L).size,
      s"expected most windows shared, got ${shared.size}/${m(1L).size}")
  }

  test("disjoint texts share no fingerprints") {
    val other = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val m = fps(Seq(0L -> base, 1L -> other))
    assert(m(0L).map(_._2).intersect(m(1L).map(_._2)).isEmpty)
  }

  test("catalog query runs on the fixture corpus with bounded output") {
    val df = Catalog.byName("q_doc_fingerprint").build(spark, sfDir)
    val n = df.count()
    val docs = Tables.documents(spark, sfDir).count()
    assert(n > docs, "multiple windows per doc expected")
    assert(n < docs * 40, "fingerprints per doc must stay bounded (1 per window)")
  }
}
