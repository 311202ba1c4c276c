package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the two r10 corpus-assembly rows — value-level
  * truth is oracle-checked; these assert the PROPERTIES the oracle
  * can't see: the temperature mix actually flattens the language
  * distribution, and packing produces a gapless, reconstructible
  * token-stream layout. */
class MixPackSpec extends AnyFunSuite with SparkFixture {

  test("temperature mix flattens: high-resource langs lose share, " +
    "low-resource langs gain") {
    import spark.implicits._
    val corpus = Tables.documents(spark, sfDir)
      .groupBy($"lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val total = corpus.values.sum.toDouble
    val sampled = Catalog.byName("q_sample_temperature").build(spark, sfDir)
      .groupBy($"lang").agg(count(lit(1)).as("k"))
      .as[(String, Long)].collect().toMap
    val budget = sampled.values.sum.toDouble
    // α = ½ < 1 strictly flattens relative to proportional sampling:
    // the biggest language's sampled share must drop below its corpus
    // share, the smallest language's must rise (up to the ±1 floor of
    // integer targets).
    val big = corpus.maxBy(_._2)._1
    val small = corpus.minBy(_._2)._1
    assert(sampled(big) / budget < corpus(big) / total,
      s"$big share did not shrink: ${sampled(big)}/$budget vs " +
        s"${corpus(big)}/$total")
    assert(sampled(small) / budget > corpus(small) / total,
      s"$small share did not grow")
    // Integer targets sum close to the budget (div flooring loses < 1
    // per language).
    assert(budget > 200 - corpus.size && budget <= 200)
    // Never oversample a language beyond its corpus.
    sampled.foreach { case (l, k) => assert(k <= corpus(l)) }
  }

  test("temperature targets follow the sqrt law exactly") {
    import spark.implicits._
    val corpus = Tables.documents(spark, sfDir)
      .groupBy($"lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val t = corpus.map { case (l, n) =>
      l -> math.floor(math.sqrt(n.toDouble) * 1e6).toLong }
    val tt = t.values.sum
    val expected = t.map { case (l, v) => l -> 200L * v / tt }
    val got = Catalog.byName("q_sample_temperature").build(spark, sfDir)
      .select($"lang", $"k_target").distinct()
      .as[(String, Long)].collect().toMap
    // Languages whose target is 0 produce no rows; everything present
    // must match the driver-side recompute bit for bit.
    got.foreach { case (l, k) => assert(k == expected(l), s"$l") }
  }

  test("packing is gapless and reconstructs the per-source token stream") {
    import spark.implicits._
    val rows = Catalog.byName("q_text_pack").build(spark, sfDir)
      .select($"source", $"doc_id", $"n_tok", $"chunk_id", $"chunk_off")
      .as[(String, Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, docs) =>
      val ordered = docs.sortBy(_._2)
      var start = 0L
      ordered.foreach { case (_, _, nTok, chunkId, chunkOff) =>
        // Every doc starts exactly where the previous one ended: the
        // concatenated stream has no holes and no overlaps.
        assert(chunkId == start / 512 && chunkOff == start % 512)
        assert(chunkOff >= 0 && chunkOff < 512)
        start += nTok
      }
    }
  }

  test("packing fills chunks: every non-final chunk spans the full " +
    "512-token budget") {
    import spark.implicits._
    val rows = Catalog.byName("q_text_pack").build(spark, sfDir)
      .select($"source", $"n_tok", $"chunk_id")
      .as[(String, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (src, docs) =>
      val totalToks = docs.map(_._2).sum
      val lastChunk = docs.map(_._3).max
      // concat-then-chunk: chunk ids must cover 0..floor((T-1)/512)
      // with no chunk skipped (a doc can span several chunks, so ids
      // may jump within the ASSIGNMENT column, but the stream itself
      // covers every chunk — the last START must sit in the last or an
      // earlier chunk and the total token count bounds the id).
      assert(lastChunk <= (totalToks - 1) / 512, s"$src overflowed chunks")
    }
  }
}
