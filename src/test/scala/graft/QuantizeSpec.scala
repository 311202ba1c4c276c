package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic bounds for q_vec_quantize (the oracle pins exact values;
  * this pins the MEANING): affine int8 codes must stay in [0, 255] and
  * the reconstruction error can never exceed half a quantization step
  * per component. */
class QuantizeSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("codes span [0,255] and MSE respects the half-step bound") {
    val rows = Catalog.byName("q_vec_quantize").build(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cMin, cMax) = (r.getLong(2), r.getLong(3))
      assert(cMin >= 0L && cMax <= 255L, s"codes out of range: $r")
    }
    // Someone hits both rails (lo and hi are corpus-global extremes).
    assert(rows.exists(_.getLong(2) == 0L))
    assert(rows.exists(_.getLong(3) == 255L))

    // Per-component |error| ≤ step/2 ⇒ MSE ≤ step²/4.
    val Array(lo, hi) = Tables.embeddings(spark, sfDir).agg(
      min(array_min(transform($"embedding", _.cast("double")))),
      max(array_max(transform($"embedding", _.cast("double")))))
      .head.toSeq.map(_.asInstanceOf[Double]).toArray
    val step = (hi - lo) / 255.0
    val bound = step * step / 4.0 + 1e-9
    rows.foreach { r =>
      assert(r.getDouble(4) <= bound,
        s"MSE ${r.getDouble(4)} exceeds step²/4 = $bound for vec ${r.getLong(0)}")
    }
  }
}
