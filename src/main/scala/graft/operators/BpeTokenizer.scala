package graft.operators

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer trained on the corpus itself — the real
  * subword segmentation an LLM-data pipeline runs on every document
  * (the r8 verdict's north-star gap #1; q_text_token_count's regex
  * segmentation approximates the SHAPE of subword counts, this is the
  * actual trained-merges algorithm, Sennrich et al. 2016).
  *
  * Training (word-level BPE): start from characters + an end-of-word
  * marker, repeatedly merge the most frequent adjacent symbol pair.
  * The pair statistics live on the DISTINCT-WORD frequency table, which
  * is vocabulary-bounded — the corpus collapses to (word, count) in one
  * keyed agg, the table is capped to the top `maxVocab` words under the
  * deterministic (count DESC, word) order, and only that bounded table
  * reaches the driver (the AnnIvf-codebook rule: model state may
  * collect, data may not). Merge selection tie-breaks (count DESC, pair
  * lexicographic), so training is a pure function of the corpus.
  *
  * Encoding at scale: documents are NOT encoded row-by-row. Each
  * DISTINCT word is encoded once (vocab-domain mapPartitions with the
  * broadcast rank table), and the per-doc token count is a broadcast
  * join of the token stage against that vocab-sized table + one keyed
  * sum — encode cost ∝ vocabulary, corpus cost = one broadcast join.
  * At 100 TB the merge table (bounded, ~merges entries) and the encoded
  * vocab both broadcast; nothing quadratic, no driver data state.
  *
  * No DuckDB twin: training is an iterative argmax (not expressible as
  * a deterministic SQL fixpoint), so the row is a T-row; BpeSpec pins
  * merge determinism, the exact Sennrich-style merge sequence on a
  * planted corpus, round-trips, and the count-table invariants. */
object BpeTokenizer {

  /** Train `nMerges` BPE merges from a (word, count) table. Pure,
    * deterministic driver-side function of a BOUNDED input. */
  def trainMerges(
      wordCounts: Seq[(String, Long)], nMerges: Int): Vector[(String, String)] = {
    // word → symbol sequence (chars + end marker); duplicate words fold
    var seqs: Vector[(Vector[String], Long)] = wordCounts.iterator
      .map { case (w, c) => (w.map(_.toString).toVector :+ EndMark) -> c }
      .toVector
      .groupMapReduce(_._1)(_._2)(_ + _)
      .toVector
    val out = Vector.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < nMerges && !done) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      seqs.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          counts((syms(i), syms(i + 1))) += c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.iterator.minBy { case ((a, b), c) => (-c, a, b) }._1
        out += best
        seqs = seqs.map { case (syms, c) => (mergePair(syms, best), c) }
        k += 1
      }
    }
    out.result()
  }

  /** Replace every non-overlapping left-to-right occurrence of the
    * adjacent pair with its concatenation. */
  private def mergePair(
      syms: Vector[String], p: (String, String)): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == p._1 && syms(i + 1) == p._2) {
        b += syms(i) + syms(i + 1); i += 2
      } else { b += syms(i); i += 1 }
    }
    b.result()
  }

  val EndMark = "</w>"

  /** Encode one word with a trained rank table: repeatedly merge the
    * LOWEST-RANKED adjacent pair present (all its occurrences), until
    * no adjacent pair is ranked — the standard greedy BPE encoder,
    * deterministic given the ranks. */
  def encode(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector :+ EndMark
    var continue = syms.length > 1
    while (continue) {
      var best: (String, String) = null
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) continue = false
      else syms = mergePair(syms, best)
    }
    syms
  }

  /** The capped (word, count) TRAINING TABLE both subword tokenizers
    * (BPE here, [[UnigramLm]]) learn from — one code path, memoized per
    * (session, dir), so "trained on the same table" is enforced by
    * sharing, not by two parallel copies of the scan that could
    * silently desynchronize (r12 review finding). Top `maxVocab` words
    * under the deterministic (count DESC, word) order; only this
    * bounded table ever reaches the driver. */
  private val wcCache =
    new graft.Memo[(SparkSession, String), Seq[(String, Long)]]

  private[graft] def cappedWordCounts(
      s: SparkSession, dir: String): Seq[(String, Long)] =
    wcCache((s, dir)) {
      import s.implicits._
      TextQueries.Tokenized(s, dir)
        .select(explode(col("lw")).as("w"))
        .where(length($"w") > 0)
        .groupBy($"w").agg(count(lit(1)).as("c"))
        .orderBy($"c".desc, $"w")
        .limit(maxVocab)
        .as[(String, Long)].collect().toSeq
    }

  /** Per-document subword accounting under a VOCAB-LEVEL encoder: each
    * distinct word is encoded once on the executors, the vocab-sized
    * (word, piece-count) table broadcast-joins back onto the token
    * stage, one keyed sum per doc. Shared by the BPE and unigram rows
    * so the two fertility reports differ ONLY in the encoder (r12
    * review finding — the shared-stage rule). */
  private[graft] def subwordAccounting(s: SparkSession, dir: String,
      tokensCol: String, ratioCol: String)(
      encodeVocab: Iterator[String] => Iterator[(String, Long)])
      : DataFrame = {
    import s.implicits._
    val words = TextQueries.Tokenized(s, dir)
      .select($"doc_id", explode($"lw").as("w"))
      .where(length($"w") > 0)
    val vocabCounts = words.select($"w").distinct().as[String]
      .mapPartitions(encodeVocab)
      .toDF("w", "n_sub")
    words.join(broadcast(vocabCounts), "w")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"), sum($"n_sub").as(tokensCol))
      .withColumn(ratioCol,
        round(col(tokensCol).cast("double") / $"n_words", 6))
      .orderBy($"doc_id")
  }

  /** Trained merge-rank table per (session, dir): bounded model state
    * (≤ nMerges entries), built once from the capped word-count table.
    * maxVocab caps what reaches the driver; 200 merges is plenty to
    * give frequent fixture words single-token encodings while keeping
    * training cost trivial. */
  val maxVocab = 4096
  val nMerges = 200
  private val modelCache =
    new graft.Memo[(SparkSession, String), Map[(String, String), Int]]

  def Models(s: SparkSession, dir: String): Map[(String, String), Int] =
    modelCache((s, dir)) {
      trainMerges(cappedWordCounts(s, dir), nMerges).zipWithIndex.toMap
    }

  /** q_text_bpe_tokens — per-document subword token accounting under
    * the corpus-trained BPE: word count, BPE token count, and the
    * tokens-per-word ratio (the fertility metric tokenizer evaluations
    * report). Docs contribute via their words, so the scan is the
    * shared token stage; the vocab-level encode + broadcast join keeps
    * every heavy op corpus-linear. T-row (training is un-SQL-able);
    * BpeSpec owns the semantics. */
  val qTextBpeTokens: Q = Q(
    "q_text_bpe_tokens",
    (s, dir) => {
      val bc = s.sparkContext.broadcast(Models(s, dir))
      subwordAccounting(s, dir, "n_bpe_tokens", "bpe_per_word") { it =>
        val ranks = bc.value
        it.map(w => (w, encode(w, ranks).length.toLong))
      }
    })

  val all: Vector[Q] = Vector(qTextBpeTokens)
}
