package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregators — SURVEY.md §2.11 (UDAF surface).
  *
  * Scale note: an [[Aggregator]] participates in partial aggregation —
  * `reduce` runs map-side, `merge` combines per-partition buffers across
  * the shuffle — so a custom aggregate shuffles one buffer per
  * (partition × group), same as a built-in. This is the only UDAF shape
  * that is safe at 100 TB (an RDD-based fold would not partial-aggregate).
  */
object TypedAggs {

  /** Exact weighted average sum(x·w)/sum(w) for inputs that are exact
    * 2-decimal ("cents") doubles — the fixture money/quantity profile
    * (FIXTURES.md "Decimal-precision profile"). The name carries the
    * precondition: inputs with more than 2 decimals are quantized to
    * hundredths, and non-finite inputs are rejected (fail-fast beats the
    * silent rint(NaN)→0 a generic name would hide).
    *
    * Values are scaled to integer hundredths on entry, so reduce/merge is
    * pure integer arithmetic: the result is independent of row order and
    * partitioning, which is what lets q_agg_custom_typed hash-match its
    * DuckDB DECIMAL twin (AggQueries.qAggCustomTyped's oracle) — a
    * double-buffered sum would drift by ulps across partition counts and
    * engines.
    *
    * `finish` mirrors the twin's shape exactly — decimal→double per sum,
    * then one double division: (sumXW/1e4) / (sumW/1e2). Headroom: the
    * 1e-4-unit product sum overflows Long at ~9.2e18, i.e. ~1.2e9 rows
    * per group at fixture magnitudes (≈ sf200 per group); beyond that,
    * widen the buffer to two Longs per sum (hi/lo) or BigDecimal.
    * Semantics pinned by `TypedAggSpec`. */
  object WeightedAvgCents extends Aggregator[(Double, Double), (Long, Long), Double] {
    @inline private def c(v: Double): Long = {
      if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v))
        throw new IllegalArgumentException(
          s"WeightedAvgCents requires finite 2-decimal inputs, got $v")
      // math.round = floor(x+0.5) (half toward +∞); SQL round() is half
      // AWAY FROM ZERO — they differ only on exact negative .5 ties,
      // which 2-dp-exact inputs cannot produce (v*100 of a 2-dp value is
      // never a .5 tie, only integers ± float error ≪ 0.5). If inputs
      // ever gain sub-cent precision, switch to BigDecimal HALF_UP.
      math.round(v * 100.0)
    }
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: (Double, Double)): (Long, Long) =
      (b._1 + c(a._1) * c(a._2), b._2 + c(a._2))
    override def merge(b1: (Long, Long), b2: (Long, Long)): (Long, Long) =
      (b1._1 + b2._1, b1._2 + b2._2)
    override def finish(r: (Long, Long)): Double =
      if (r._2 == 0L) Double.NaN
      else (r._1.toDouble / 1e4) / (r._2.toDouble / 1e2)
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Space-Saving heavy-hitters summary (Metwally et al.'s stream-summary,
    * merged per the mergeable-summaries result): tracks at most `k`
    * (term, count, err) entries. State is O(k) REGARDLESS of the term
    * universe — this is how "top terms over 100 TB" runs without
    * shuffling the vocabulary: each partition keeps k counters, the
    * shuffle carries one k-entry buffer per partition, and the merged
    * summary guarantees
    *   - overestimate: reported ≥ true frequency ≥ reported − err;
    *   - recall: every term with true frequency > n/k is present.
    * Two regimes, both shipped: with k ≥ |vocabulary| no eviction ever
    * happens, every err is 0 and the counts are EXACT and
    * merge-order-independent (q_agg_heavy_hitters oracle-checks this
    * regime against plain GROUP BY counts — the fixture vocabulary is 31
    * lowered tokens, k = 64); with k < |vocabulary| the output depends
    * on merge order but the guarantees above hold under ANY order —
    * `HeavyHittersSpec` pins them on a planted skewed corpus.
    *
    * Eviction and the merge's kept-set tiebreak are deterministic
    * ((count, term) ordering) so per-buffer behavior is reproducible. */
  case class SSBuf(counts: Map[String, Long], errs: Map[String, Long])

  class SpaceSaving(k: Int) extends Aggregator[String, SSBuf, SSBuf] {
    require(k > 0, s"k must be positive, got $k")
    override def zero: SSBuf = SSBuf(Map.empty, Map.empty)

    override def reduce(b: SSBuf, term: String): SSBuf =
      b.counts.get(term) match {
        case Some(c) => b.copy(counts = b.counts.updated(term, c + 1))
        case None if b.counts.size < k =>
          SSBuf(b.counts.updated(term, 1L), b.errs.updated(term, 0L))
        case None =>
          // Classic Space-Saving step: the new term inherits the minimum
          // counter (its worst-case prior frequency) as count m+1/err m.
          val (mt, mc) = b.counts.minBy { case (t, c) => (c, t) }
          SSBuf(
            b.counts - mt + (term -> (mc + 1)),
            b.errs - mt + (term -> mc))
      }

    override def merge(a: SSBuf, b: SSBuf): SSBuf = {
      // A term absent from a FULL summary may still have occurred up to
      // that summary's minimum counter times — credit it that upper
      // bound (and the same uncertainty). A non-full summary stores
      // every term it saw, so absence there truly means zero.
      def floor(s: SSBuf): Long =
        if (s.counts.size < k) 0L else s.counts.values.min
      val (fa, fb) = (floor(a), floor(b))
      val merged = (a.counts.keySet ++ b.counts.keySet).toSeq.map { t =>
        (t,
          a.counts.getOrElse(t, fa) + b.counts.getOrElse(t, fb),
          a.errs.getOrElse(t, fa) + b.errs.getOrElse(t, fb))
      }
      val kept = merged.sortBy { case (t, c, _) => (-c, t) }.take(k)
      SSBuf(
        kept.map(x => x._1 -> x._2).toMap,
        kept.map(x => x._1 -> x._3).toMap)
    }

    override def finish(r: SSBuf): SSBuf = r
    override def bufferEncoder: Encoder[SSBuf] = Encoders.product[SSBuf]
    override def outputEncoder: Encoder[SSBuf] = Encoders.product[SSBuf]
  }

  /** The shipped instance: k = 64 ≥ the 31-token fixture vocabulary —
    * the exact, order-independent regime (see [[SpaceSaving]]). */
  object SpaceSaving64 extends SpaceSaving(64)

  /** Bounded top-k by (score DESC, id ASC) — the aggregate that makes
    * batch kNN scale: grouping scored candidates by probe with this
    * aggregator ships AT MOST k rows per (partition, probe) across the
    * shuffle, where the window-function form (`row_number() ≤ k`)
    * shuffles EVERY score row first. State is a k-bounded sorted vector;
    * reduce/merge keep it trimmed, and the (−score, id) tiebreak makes
    * the result a pure function of the input SET — partitioning- and
    * merge-order-invariant, which is what lets q_vec_knn_batch
    * hash-match a DuckDB row_number() twin. (Exact doubles compare
    * exactly: scores are round(6)-ed BEFORE aggregation on both
    * engines, so ordering decisions are bit-identical.) */
  class TopKByScore(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    require(k > 0, s"k must be positive, got $k")
    private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortBy { case (score, id) => (-score, id) }.take(k)
    /** (−score, id) order: a BEATS b iff higher score, or equal score
      * and smaller id. */
    @inline private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    override def zero: Seq[(Double, Long)] = Vector.empty
    override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      // Hot path: the buffer is trim-sorted, so once it's full the
      // overwhelmingly common case — a score no better than the current
      // k-th — is a single comparison, no copy, no sort. Only genuine
      // top-k entrants (≤ k·ln n expected over a stream of n) pay the
      // re-sort.
      if (b.size >= k && !beats(a, b.last)) b else trim(b :+ a)
    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(a ++ b)
    override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  object Top5ByScore extends TopKByScore(5)

  /** The shared "exact top-k per key by (score DESC, id ASC)" ranking:
    * input columns named by the `keyCol`/`scoreCol`/`idCol` parameters
    * (long/double/long), output (keyOut, rank, vec_id, sim) with rank
    * 1..k. One definition because q_vec_knn_batch (batch probe set) and
    * q_stream_vec_search (streamed query log) must rank identically —
    * and because the k is a PARAMETER here, a caller's declared top-k
    * constant cannot silently desynchronize from a hardcoded
    * aggregator instance. Columns are selected BY NAME before the
    * typed decode (r12 advice): the earlier positional contract would
    * silently mis-rank a caller passing (key, id, score) order with
    * compatible numeric types instead of failing analysis. */
  def rankTopKByScore(scored: org.apache.spark.sql.DataFrame, k: Int,
      keyCol: String, scoreCol: String, idCol: String,
      keyOut: String): org.apache.spark.sql.DataFrame = {
    val s = scored.sparkSession
    import org.apache.spark.sql.functions._
    import s.implicits._
    scored
      .select(col(keyCol), col(scoreCol), col(idCol))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new TopKByScore(k).toColumn.name("top"))
      .toDF(keyOut, "top")
      .select(col(keyOut), posexplode($"top"))
      .select(col(keyOut), ($"pos" + 1).cast("long").as("rank"),
        $"col._2".as("vec_id"), $"col._1".as("sim"))
  }
}
