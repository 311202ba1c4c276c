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
      math.rint(v * 100.0).toLong
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
}
