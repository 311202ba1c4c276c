package graft.operators

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (SentencePiece-style, Kudo 2018) — the
  * other tokenizer half of modern LLM stacks beside BPE (r11 verdict
  * ask #3): instead of learning a merge sequence, learn a PIECE
  * PROBABILITY MODEL and segment each word by Viterbi under it.
  *
  * Same driver-bounded-model discipline as [[BpeTokenizer]]: the corpus
  * collapses to the capped (word, count) table in one keyed agg (top
  * `maxVocab` words, deterministic (count DESC, word) order), and only
  * that bounded table reaches the driver; training is a pure driver-side
  * function of it. The trained model is ≤ `maxSeed` (piece → log-prob)
  * entries — broadcast state, like the BPE rank table.
  *
  * Training (hard/Viterbi EM, the deterministic variant):
  *  1. SEED: every substring of length 1..`maxPieceLen` of every vocab
  *     word, weighted by word count × occurrences; capped to the top
  *     `maxSeed` pieces under (count DESC, piece) — single characters
  *     always kept so every word stays segmentable.
  *  2. E-step: segment each vocab word by integer Viterbi under the
  *     current model; piece counts accumulate word-count-weighted hard
  *     counts from the best segmentation.
  *  3. M-step: re-normalize counts to log-probs. Pieces that won no
  *     segmentation are pruned (characters are floored at count 1
  *     instead — pruning a character could strand a word).
  *  Repeated `emRounds` times. All probabilities are MICRO-NAT FIXED
  *  POINT (floor(ln(c/total)·10⁶) as Long): Viterbi compares integer
  *  sums, so training and encoding are exactly reproducible — no float
  *  accumulation order anywhere (the repo-wide micro-unit rule).
  *  Viterbi ties break (higher score, then FEWER pieces, then
  *  lexicographic piece sequence) — total order, so the segmentation is
  *  a pure function of (word, model).
  *
  * Encoding at scale: vocab-level, exactly the BPE discipline — each
  * DISTINCT word segments once on the executors (mapPartitions over the
  * vocab domain with the broadcast model), and per-doc accounting is a
  * broadcast join of the shared token stage against that vocab-sized
  * table + one keyed sum. Encode cost ∝ vocabulary; corpus cost = one
  * broadcast join. At 100 TB nothing quadratic, no driver data state.
  *
  * T-row (iterative EM is un-SQL-able); UnigramLmSpec pins determinism,
  * a hand-worked EM example, Viterbi optimality against brute-force
  * enumeration, and fertility accounting against BPE on the same
  * corpus. */
object UnigramLm {

  val maxPieceLen = 6
  val maxSeed = 2048
  val emRounds = 3

  /** Corpus-weighted counts of every substring piece (length 1..max) of
    * every vocab word — the EM seed. Capped to `cap` pieces under
    * (count DESC, piece); single characters are exempt from the cap. */
  def seedVocab(wordCounts: Seq[(String, Long)],
      cap: Int = maxSeed): Map[String, Long] = {
    val counts = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    wordCounts.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var j = i + 1
        while (j <= math.min(w.length, i + maxPieceLen)) {
          counts(w.substring(i, j)) += c
          j += 1
        }
        i += 1
      }
    }
    val (chars, multi) = counts.toVector.partition(_._1.length == 1)
    val kept = multi.sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, cap - chars.size))
    (chars ++ kept).toMap
  }

  /** Micro-nat log-probabilities: floor(ln(count/total)·10⁶). */
  def logProbs(counts: Map[String, Long]): Map[String, Long] = {
    val total = counts.valuesIterator.sum.toDouble
    counts.map { case (p, c) =>
      p -> math.floor(math.log(c / total) * 1e6).toLong
    }
  }

  /** Integer Viterbi segmentation: maximize the summed micro-nat
    * log-prob; ties break to fewer pieces, then the lexicographically
    * smallest piece sequence.
    *
    * OUT-OF-VOCAB characters segment as themselves at a FALLBACK score
    * of model-min − 10⁶ (the SentencePiece unk/byte-fallback device,
    * r12 review finding): the capped training vocabulary guarantees
    * character coverage only for the top-`maxVocab` words it saw,
    * while encoding runs over EVERY distinct corpus word — a rare word
    * carrying a character absent from all capped words must degrade
    * (one unk piece per unknown char), never crash the query. The
    * fallback is a pure function of the model, so encoding stays
    * deterministic, and it scores strictly worse than any modeled
    * piece, so modeled segmentations always win where they exist. */
  def viterbi(word: String, lp: Map[String, Long]): Vector[String] = {
    require(word.nonEmpty, "cannot segment an empty word")
    require(lp.nonEmpty, "cannot segment under an empty model")
    val fallback = lp.valuesIterator.min - 1000000L
    val n = word.length
    // dp(i): best (score, nPieces, segmentation) for word.take(i)
    val dp = new Array[(Long, Int, Vector[String])](n + 1)
    dp(0) = (0L, 0, Vector.empty)
    var i = 1
    while (i <= n) {
      var best: (Long, Int, Vector[String]) = null
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (dp(j) != null) {
          val piece = word.substring(j, i)
          val score = lp.get(piece)
            .orElse(if (piece.length == 1) Some(fallback) else None)
          score.foreach { w =>
            val cand = (dp(j)._1 + w, dp(j)._2 + 1, dp(j)._3 :+ piece)
            val better = best == null ||
              cand._1 > best._1 ||
              (cand._1 == best._1 && (cand._2 < best._2 ||
                (cand._2 == best._2 &&
                  seqLt(cand._3, best._3))))
            if (better) best = cand
          }
        }
        j += 1
      }
      dp(i) = best
      i += 1
    }
    // Single-char fallback makes every position reachable; this is an
    // internal invariant, not a data-dependent failure mode.
    assert(dp(n) != null, s"viterbi dp chain broke on '$word'")
    dp(n)._3
  }

  private def seqLt(a: Vector[String], b: Vector[String]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val c = a(i).compareTo(b(i))
      if (c != 0) return c < 0
      i += 1
    }
    a.length < b.length
  }

  /** Hard-EM training: returns the final piece → micro-nat log-prob
    * model. Pure deterministic driver-side function of the bounded
    * (word, count) table. */
  def train(wordCounts: Seq[(String, Long)],
      rounds: Int = emRounds, cap: Int = maxSeed): Map[String, Long] = {
    var counts = seedVocab(wordCounts, cap)
    for (_ <- 0 until rounds) {
      val lp = logProbs(counts)
      val next = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      wordCounts.foreach { case (w, c) =>
        viterbi(w, lp).foreach(p => next(p) += c)
      }
      // Characters survive pruning at count ≥ 1 (a pruned character
      // would strand any word containing it); multi-char pieces that
      // won no segmentation are dropped.
      counts = counts.keysIterator.flatMap { p =>
        val c = next(p)
        if (c > 0) Some(p -> c)
        else if (p.length == 1) Some(p -> 1L)
        else None
      }.toMap
    }
    logProbs(counts)
  }

  /** Trained model per (session, dir), built from the SAME capped
    * word-count table as the BPE model — the shared
    * [[BpeTokenizer.cappedWordCounts]] stage, one code path for both
    * tokenizers. */
  private val modelCache =
    new graft.Memo[(SparkSession, String), Map[String, Long]]

  def Models(s: SparkSession, dir: String): Map[String, Long] =
    modelCache((s, dir)) {
      train(BpeTokenizer.cappedWordCounts(s, dir))
    }

  /** q_text_unigram_tokens — per-document subword accounting under the
    * corpus-trained unigram LM through the SHARED
    * [[BpeTokenizer.subwordAccounting]] frame: word count, unigram-LM
    * token count, tokens-per-word fertility — the q_text_bpe_tokens
    * shape with only the encoder swapped, so the two tokenizers are
    * directly comparable on the same corpus (UnigramLmSpec does exactly
    * that comparison). */
  val qTextUnigramTokens: Q = Q(
    "q_text_unigram_tokens",
    (s, dir) => {
      val bc = s.sparkContext.broadcast(Models(s, dir))
      BpeTokenizer.subwordAccounting(s, dir, "n_uni_tokens",
        "uni_per_word") { it =>
        val lp = bc.value
        it.map(w => (w, viterbi(w, lp).length.toLong))
      }
    })

  val all: Vector[Q] = Vector(qTextUnigramTokens)
}
