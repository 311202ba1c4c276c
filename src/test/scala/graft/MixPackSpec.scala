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

  test("perplexity buckets: tertiles balanced per lang, bucket order " +
    "respects the score, kept = head+middle") {
    import spark.implicits._
    val rows = Catalog.byName("q_sample_perplexity_bucket")
      .build(spark, sfDir)
      .select($"lang", $"xent_micro", $"bucket", $"kept")
      .as[(String, Long, String, Long)].collect()
    rows.groupBy(_._1).foreach { case (lang, docs) =>
      val byBucket = docs.groupBy(_._3).view.mapValues(_.length).toMap
      val sizes = Seq("head", "middle", "tail").map(byBucket.getOrElse(_, 0))
      // ntile(3) sizes differ by at most 1 within a language.
      assert(sizes.max - sizes.min <= 1, s"$lang tiles $sizes")
      // Bucket boundaries follow the score: every head xent ≤ every
      // tail xent (ties can straddle adjacent tiles, never two apart).
      val head = docs.filter(_._3 == "head").map(_._2)
      val tail = docs.filter(_._3 == "tail").map(_._2)
      if (head.nonEmpty && tail.nonEmpty)
        assert(head.max <= tail.min, s"$lang bucket order broken")
    }
    rows.foreach { case (_, _, bucket, kept) =>
      assert((kept == 1L) == (bucket != "tail"))
    }
  }

  test("domain mix: never upsamples, caps under-represented sources, " +
    "expected tokens within the per-source target") {
    import spark.implicits._
    val rows = Catalog.byName("q_sample_domain_mix").build(spark, sfDir)
      .select($"n_tokens", $"natural_ppm", $"accept_ppm", $"expected_tokens")
      .as[(Long, Long, Long, Long)].collect()
    val total = rows.map(_._1).sum
    val target = total / rows.length
    rows.foreach { case (tok, natPpm, accPpm, exp) =>
      assert(accPpm <= 1000000L)
      assert(exp <= tok, "upsampled a source")
      // floor-div recompute bit for bit
      assert(natPpm == tok * 1000000L / total)
      assert(accPpm == math.min(1000000L, target * 1000000L / tok))
      assert(exp == tok * accPpm / 1000000L)
      // a downsampled source never exceeds its target share
      if (accPpm < 1000000L) assert(exp <= target)
    }
    // under-represented sources pass through untouched
    rows.filter(_._1 <= target).foreach { case (tok, _, acc, exp) =>
      assert(acc == 1000000L && exp == tok)
    }
  }

  test("pipeline funnel: monotone shrinkage, exact ppm recompute, " +
    "and the budget stage respects every stratum's cap") {
    import spark.implicits._
    val rows = Catalog.byName("q_pipeline_funnel").build(spark, sfDir)
      .select($"stage_ord", $"stage", $"n_docs", $"n_tokens",
        $"docs_ppm", $"tokens_ppm")
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .sortBy(_._1)
    assert(rows.map(_._2).toSeq ==
      Seq("raw", "quality", "exact_dedup", "perplexity_tail",
        "token_budget"))
    // survivor sets only shrink
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3 && b._4 <= a._4, s"stage ${b._2} grew")
    }
    val (rawDocs, rawToks) = (rows.head._3, rows.head._4)
    assert(rows.head._5 == 1000000L && rows.head._6 == 1000000L)
    rows.foreach { r =>
      assert(r._5 == r._3 * 1000000L / rawDocs)
      assert(r._6 == r._4 * 1000000L / rawToks)
    }
    // the budget stage obeys 2000 tokens per language stratum
    val nLangs = Tables.documents(spark, sfDir)
      .select($"lang").distinct().count()
    assert(rows.last._4 <= 2000L * nLangs)
    // and the quality stage matches the standalone gate's count
    val qualityKept = Catalog.byName("q_text_quality")
      .build(spark, sfDir)
      .where($"quality" >= 0.65 && $"n_tok".between(20, 200)).count()
    assert(rows(1)._3 == qualityKept)
  }

  test("chunking covers every token, overlaps by 8, and round-trips " +
    "the document text") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val chunks = Catalog.byName("q_text_chunk").build(spark, sfDir)
      .select($"doc_id", $"chunk_id", $"n_chunk_tokens", $"chunk_text")
      .as[(Long, Long, Long, String)].collect()
    assert(chunks.map(_._1).toSet == docs.keySet, "every doc chunked")
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val toks = docs(id).split(" ")
      val ordered = cs.sortBy(_._2)
      // ids are 0..k-1 dense; window/stride arithmetic matches
      assert(ordered.map(_._2).toSeq == (0L until ordered.length.toLong))
      val expChunks = if (toks.length <= 32) 1
                      else ((toks.length - 32 + 23) / 24) + 1
      assert(ordered.length == expChunks, s"doc $id chunk count")
      ordered.foreach { case (_, cid, n, textC) =>
        val start = (cid * 24).toInt
        val expected = toks.slice(start, start + 32)
        assert(n == expected.length, s"doc $id chunk $cid length")
        assert(textC == expected.mkString(" "), s"doc $id chunk $cid text")
      }
      // last chunk reaches the document end: full coverage
      val (_, lastId, lastN, _) = ordered.last
      assert(lastId * 24 + lastN == toks.length, s"doc $id tail gap")
    }
  }
}
