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

  /** Exact weighted average: sum(x·w)/sum(w), buffered as two doubles.
    * Semantics pinned by `TypedAggSpec` against the SQL formulation. */
  object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
      (b1._1 + b2._1, b1._2 + b2._2)
    override def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) Double.NaN else r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
