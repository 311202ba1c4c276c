package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the trained BPE tokenizer (BpeTokenizer.scala) —
  * the T-row's correctness contract: deterministic training, the exact
  * classic merge sequence on the Sennrich planted corpus, lossless
  * round-trips, and sane fixture-level count-table invariants. */
class BpeSpec extends AnyFunSuite with SparkFixture {

  import operators.BpeTokenizer._

  // The worked example from Sennrich et al. 2016 (§3.2): with these
  // word frequencies the first merges are forced and hand-checkable.
  private val sennrich = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("training is deterministic and reproduces the classic merge " +
    "sequence on the planted corpus") {
    val m1 = trainMerges(sennrich, 10)
    val m2 = trainMerges(sennrich, 10)
    assert(m1 == m2, "same input must train identical merges")
    // Hand-derived: 'es' appears 6+3 = 9 times (newest, widest) — the
    // unique most frequent pair; then 'es'+'t' (9), then 'est'+'</w>'
    // (9), then 'l'+'o' (low 5 + lower 2 = 7).
    assert(m1.take(4) == Vector(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")),
      s"first merges diverge from the worked example: ${m1.take(4)}")
  }

  test("encoding round-trips: concatenated tokens reproduce the word") {
    val ranks = trainMerges(sennrich, 10).zipWithIndex.toMap
    for (w <- Seq("low", "lower", "newest", "widest", "lowest", "wider",
      "unseen", "x", "")) {
      val toks = encode(w, ranks)
      assert(toks.mkString == w + EndMark,
        s"round-trip broke for '$w': $toks")
      assert(toks.nonEmpty && toks.length <= w.length + 1)
    }
    // a frequent trained word collapses far below characters; the
    // exact segmentation is pinned (est merged fully, low merged)
    assert(encode("newest", ranks).length < "newest".length)
    assert(encode("lowest", ranks) == Vector("low", "est</w>"),
      "greedy rank-order encode should find low + est</w>")
  }

  test("merge table is bounded model state and ranks are dense") {
    val ranks = Models(spark, sfDir)
    assert(ranks.nonEmpty && ranks.size <= nMerges)
    assert(ranks.values.toSeq.sorted == (0 until ranks.size).toSeq,
      "ranks must be the dense training order")
  }

  test("catalog row: counts bounded by words and characters, ratio " +
    "exact, ordered by doc_id") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val rows = Catalog.byName("q_text_bpe_tokens").build(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getLong(0)).toSeq
    assert(ids == ids.sorted, "rows must come back ordered by doc_id")
    rows.foreach { r =>
      val nw = r.getLong(1); val nb = r.getLong(2); val ratio = r.getDouble(3)
      assert(nb >= nw, s"fewer subwords than words for doc ${r.getLong(0)}")
      assert(math.abs(ratio - nb.toDouble / nw) < 1e-6)
      assert(ratio >= 1.0)
    }
    // cross-check one doc against a direct driver-side encode
    val ranks = Models(spark, sfDir)
    val doc = Tables.documents(spark, sfDir)
      .where($"doc_id" === ids.head).select($"text").as[String].head()
    val words = doc.toLowerCase.split(" ").filter(_.nonEmpty)
    val expect = words
      .map(w => operators.BpeTokenizer.encode(w, ranks).length.toLong).sum
    val got = rows.find(_.getLong(0) == ids.head).get.getLong(2)
    assert(got == expect,
      s"doc ${ids.head}: row says $got bpe tokens, direct encode $expect")
  }
}
