package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for q_vec_pca (operators/Pca.scala) — the T-row has
  * no DuckDB twin (iterative Jacobi eigensolve), so this spec is its
  * correctness gate: an independent driver-side recompute of the
  * covariance and its leading eigenpair, the eigenpair residuals, and
  * exact cross-partitioning repeatability of the integer moment path.
  */
class PcaSpec extends AnyFunSuite with SparkFixture {

  private val d = operators.Pca.d

  /** Driver-side ground truth: mean + covariance straight from the
    * collected float vectors (double accumulation — fine at 500 rows),
    * no shared code with the operator's distributed moment pass. */
  private lazy val (groundMean, groundCov, raw) = {
    val rows = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val n = rows.length
    val mean = Array.tabulate(d)(i => rows.map(_(i)).sum / n)
    val cov = Array.tabulate(d * d) { k =>
      val (i, j) = (k / d, k % d)
      rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n
    }
    (mean, cov, rows)
  }

  private lazy val (mean, vals, vecs) = operators.Pca.model(spark, sfDir)

  test("distributed integer moments reproduce the driver-side " +
    "covariance to quantization precision") {
    // q = round(x·2^20) ⇒ per-coordinate error ≤ 2^-21; covariance cell
    // error is bounded well under 1e-5 at unit-scale coordinates.
    val cells = (0 until d).flatMap(i => (i until d).map(j => (i, j)))
    cells.foreach { case (i, j) =>
      val got = {
        // reconstruct the operator's covariance from its model output:
        // model() returns eigenpairs; recompute its cov via V^T Λ V
        val c = (0 until d).map(k => vals(k) * vecs(k)(i) * vecs(k)(j)).sum
        c
      }
      assert(math.abs(got - groundCov(i * d + j)) < 1e-5,
        s"cov($i,$j): $got vs ${groundCov(i * d + j)}")
    }
    (0 until d).foreach { i =>
      assert(math.abs(mean(i) - groundMean(i)) < 1e-5, s"mean($i)")
    }
  }

  test("eigenpairs satisfy Cv = λv and are orthonormal") {
    // residual against the operator's own covariance reconstruction is
    // circular; use the DRIVER covariance: ‖C_ground·v − λv‖∞ small.
    (0 to 1).foreach { k =>
      val v = vecs(k)
      val cv = Array.tabulate(d)(i =>
        (0 until d).map(j => groundCov(i * d + j) * v(j)).sum)
      val res = (0 until d).map(i => math.abs(cv(i) - vals(k) * v(i))).max
      assert(res < 1e-5, s"eigenpair $k residual $res")
      val norm = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(norm - 1) < 1e-9, s"v$k not unit: $norm")
    }
    val dot = (0 until d).map(i => vecs(0)(i) * vecs(1)(i)).sum
    assert(math.abs(dot) < 1e-9, s"v1·v2 = $dot")
  }

  test("eigenvalues are sorted and the projections carry the variance " +
    "they promise") {
    assert(vals(0) >= vals(1) && vals(1) >= vals(d - 1),
      "eigenvalues not sorted descending")
    val rows = Catalog.byName("q_vec_pca").build(spark, sfDir)
      .collect().map(r => (r.getDouble(2), r.getDouble(3)))
    val n = rows.length
    def variance(xs: Array[Double]): Double = {
      val m = xs.sum / n
      xs.map(x => (x - m) * (x - m)).sum / n
    }
    val v1 = variance(rows.map(_._1))
    val v2 = variance(rows.map(_._2))
    assert(v1 >= v2 - 1e-9, "pc1 carries less variance than pc2")
    // sample variance along pc_k IS λ_k (that's what an eigenpair of
    // the covariance means); float projection + round(6) leaves slack
    assert(math.abs(v1 - vals(0)) < 1e-4, s"var(pc1)=$v1 vs λ1=${vals(0)}")
    assert(math.abs(v2 - vals(1)) < 1e-4, s"var(pc2)=$v2 vs λ2=${vals(1)}")
  }

  test("projections match a per-row driver recompute") {
    val got = Catalog.byName("q_vec_pca").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    got.take(50).foreach { case (id, pc1, pc2) =>
      val x = raw(id.toInt)
      def proj(k: Int) =
        (0 until d).map(i => (x(i) - mean(i)) * vecs(k)(i)).sum
      assert(math.abs(pc1 - proj(0)) < 1e-4, s"vec $id pc1")
      assert(math.abs(pc2 - proj(1)) < 1e-4, s"vec $id pc2")
    }
  }

  test("integer moment path is exactly repeatable across partitionings") {
    // The whole point of quantize-then-sum: identical model bits no
    // matter how the data was partitioned. Compare eigenvalues from a
    // repartitioned clone of the table against the cached model.
    def gramCells(parts: Int): Map[Long, Long] = {
      import org.apache.spark.sql.functions._
      Tables.embeddings(spark, sfDir).repartition(parts)
        .select(expr(
          s"transform(embedding, x -> CAST(round(x * ${1L << 20}) AS BIGINT))")
          .as("q"))
        .select(explode(expr(
          s"""flatten(transform(q, (xi, i) ->
             |  transform(slice(q, i + 1, $d - i), (xj, j) ->
             |    named_struct('cell', CAST(i * $d + i + j AS BIGINT),
             |                 'v', xi * xj))))""".stripMargin)).as("c"))
        .groupBy(col("c.cell")).agg(sum(col("c.v")).as("v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(gramCells(7) == gramCells(3),
      "integer Gram cells differ across partitionings — exactness broken")
  }

  test("DECIMAL(38,0) promotion is exact where the Long path wraps") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Planted magnitudes past the Long headroom: two all-ones vectors
    // quantized at 2^31 make every Gram product 2^62, so the 2-row Long
    // sum is exactly 2^63 — one past Long.MaxValue. Under Spark 4's
    // default ANSI mode the narrow accumulator RAISES
    // ARITHMETIC_OVERFLOW (a loud job failure — this empirically
    // corrected the comment's earlier "wraps silently" claim); the
    // widened accumulator must instead carry the true value.
    val planted = Seq.fill(2)(Array.fill(d)(1.0f)).toDF("embedding")
    val wideCell = operators.Pca
      .momentCells(planted, wide = true, unitScale = math.pow(2, 31))
      .where(col("cell") === 0L).head().getDecimal(1)
    assert(BigDecimal(wideCell) == BigDecimal(2).pow(63),
      s"wide accumulator lost exactness: $wideCell")
    // SparkArithmeticException extends ArithmeticException (not
    // SparkException); in local mode it surfaces directly.
    val e = intercept[Exception] {
      operators.Pca
        .momentCells(planted, wide = false, unitScale = math.pow(2, 31))
        .where(col("cell") === 0L).head()
    }
    assert(e.getMessage.contains("ARITHMETIC_OVERFLOW") ||
      String.valueOf(e.getCause).contains("ARITHMETIC_OVERFLOW"),
      s"expected the planted ANSI overflow, got: $e — " +
        "threshold assumptions need re-deriving")
  }

  test("promotion switch is semantics-preserving in the safe range") {
    // Same fixture, both accumulators: every cell must agree exactly —
    // flipping `wide` may never move a result, only extend headroom.
    val emb = Tables.embeddings(spark, sfDir)
    val narrow = operators.Pca.momentCells(emb)
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getLong(1))).toMap
    val wide = operators.Pca.momentCells(emb, wide = true)
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
    assert(narrow == wide)
    // And the documented bound really is the last provably-safe count.
    val bound = BigInt(operators.Pca.longSafeRows) * BigInt(2).pow(40)
    assert(bound <= BigInt(Long.MaxValue) &&
      (bound + BigInt(2).pow(40)) > BigInt(Long.MaxValue))
  }
}
