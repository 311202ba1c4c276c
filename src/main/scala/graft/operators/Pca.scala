package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Principal component analysis over the embedding table — the
  * dimensionality-reduction half of the vector-pipeline north star
  * (IVF/PQ quantize for STORAGE; PCA projects for ANALYSIS: drift
  * dashboards, cluster visualization, decorrelation before whitening).
  * Emits each vector's coordinates on the top-2 principal axes of the
  * corpus covariance.
  *
  * Architecture (the 100 TB part): PCA factors into
  *   (1) one DISTRIBUTED moment pass — the d×d Gram matrix, the d sums
  *       and the count, all mergeable monoid state: 2,145 cells for
  *       d = 64, aggregated with map-side partial aggregation so the
  *       shuffle carries partitions × cells rows, never the data;
  *   (2) a DRIVER eigensolve on the d×d covariance — bounded MODEL
  *       state (the AnnIvf-codebook rule: d² = 4,096 doubles, not
  *       data);
  *   (3) one broadcast-projection scan (two codegen'd vec_dot's per
  *       row against the eigenvector float literals).
  * This is how distributed PCA is built on any engine; nothing here is
  * local-mode-only.
  *
  * Determinism: double summation across partitions is order-dependent,
  * so the moment pass does NOT sum doubles — each coordinate is
  * quantized ONCE per value to an integer (q = round(x·2²⁰); |x| ≤ 1
  * for the unit-norm fixture vectors, so |q| ≤ 2²⁰) and the Gram/sum
  * accumulation is EXACT long arithmetic, invariant to partitioning
  * (the q_graph_pagerank discipline applied to linear algebra).
  * Products bound: 2⁴⁰·n < 2⁶³ holds to n < 2²³ ≈ 8.4M rows; past that
  * [[model]] switches the cell SUMs to DECIMAL(38,0) in the same plan
  * (per-row products still fit Long; only the accumulator widens —
  * headroom then ~9e25 rows). The switch is decided from the table's
  * row count (a metadata-cheap pass), and PcaSpec proves exactness on
  * planted magnitudes where the Long path demonstrably wraps.
  * The eigensolve is cyclic Jacobi with a fixed sweep
  * schedule and threshold — a pure function of the exact integer
  * moments. Eigenvector SIGN is canonicalized (largest-|component|
  * coordinate made positive) so the output never flips between runs.
  *
  * T-row: the iterative Jacobi eigensolve is not expressible in
  * DuckDB SQL; PcaSpec pins (a) an independent driver-side covariance
  * + power-iteration recompute (eigenvalues, projections), (b)
  * eigenpair residuals ‖Cv−λv‖, (c) orthonormality, (d) variance
  * ordering var(pc1) ≥ var(pc2) with the eigengap, (e) exact
  * repeatability across partitionings.
  */
object Pca {

  val d = 64
  private val scaleBits = 20
  private val unit = (1L << scaleBits).toDouble

  /** Largest row count for which the Long cell sums provably cannot
    * wrap: |q| ≤ 2²⁰ (unit-norm inputs) → |qᵢqⱼ| ≤ 2⁴⁰, and
    * (2²³−1)·2⁴⁰ < 2⁶³−1. */
  private[graft] val longSafeRows: Long = (1L << 23) - 1

  /** Exact integer moment cells of the embedding table in ONE
    * aggregation pass: cell i·d+j (i ≤ j) = Σ qᵢqⱼ; cell d²+i = Σ qᵢ;
    * cell d²+d = n. The per-row cell array is built with array HOFs
    * (no UDF): upper-triangle products via a nested transform over the
    * quantized array, flattened, concatenated with the sum/count
    * cells, exploded, then one groupBy(cell) with map-side combine.
    *
    * `wide` switches the SUM accumulator to DECIMAL(38,0) — the
    * promotion for corpora past [[longSafeRows]], where the Long sum
    * overflows and Spark 4's default ANSI mode RAISES
    * ARITHMETIC_OVERFLOW: loud rather than silently wrong, but still a
    * dead job at exactly the corpus sizes PCA is for — the promotion
    * removes the failure mode. Per-row products always stay Long
    * (≤ 2⁴⁰); only the accumulator widens, so the narrow path's speed
    * is kept where it is provably safe. `unitScale` is parameterized
    * for the spec's planted overflow case only; production uses
    * [[unit]]. */
  private[graft] def momentCells(df: DataFrame, wide: Boolean = false,
      unitScale: Double = unit): DataFrame =
    df.select(expr(
        s"transform(embedding, x -> CAST(round(x * $unitScale) AS BIGINT))")
        .as("q"))
      .select(explode(concat(
        flatten(expr(
          s"""transform(q, (xi, i) ->
             |  transform(slice(q, i + 1, $d - i), (xj, j) ->
             |    named_struct('cell', CAST(i * $d + i + j AS BIGINT),
             |                 'v', xi * xj)))""".stripMargin)),
        expr(s"transform(q, (xi, i) -> " +
          s"named_struct('cell', CAST(${d * d} + i AS BIGINT), 'v', xi))"),
        expr(s"array(named_struct('cell', CAST(${d * d + d} AS BIGINT), " +
          "'v', CAST(1 AS BIGINT)))"))).as("c"))
      .groupBy(col("c.cell").as("cell"))
      .agg((if (wide)
          sum(col("c.v").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
        else sum(col("c.v"))).as("v"))

  /** Cyclic Jacobi eigensolve of a symmetric row-major n×n matrix.
    * Fixed (p,q) sweep order and fixed thresholds make it a pure
    * function of its input. Returns (eigenvalues, eigenvectors as
    * rows), sorted by eigenvalue descending with index tie-break,
    * each vector sign-canonicalized. */
  private[graft] def jacobiEigen(a0: Array[Double], n: Int)
      : (Array[Double], Array[Array[Double]]) = {
    val a = a0.clone()
    // accumulate V' = Jᵀ…Jᵀ·I so that A_final = V·A0·Vᵀ — ROWS of V
    // are the eigenvectors (consistent with the row updates below)
    val v = Array.tabulate(n * n)(k => if (k / n == k % n) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var p = 0
      while (p < n) {
        var q = p + 1
        while (q < n) { s += 2 * a(p * n + q) * a(p * n + q); q += 1 }
        p += 1
      }
      s
    }
    var sweep = 0
    while (sweep < 50 && off() > 1e-18) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p * n + q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q * n + q) - a(p * n + p)) / (2 * apq)
            val sgn = if (theta >= 0) 1.0 else -1.0
            val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1))
            val c = 1 / math.sqrt(t * t + 1)
            val s = t * c
            var k = 0
            while (k < n) { // A ← A·J (column rotation)
              val akp = a(k * n + p); val akq = a(k * n + q)
              a(k * n + p) = c * akp - s * akq
              a(k * n + q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) { // A ← Jᵀ·A and V ← Jᵀ·V (row rotations)
              val apk = a(p * n + k); val aqk = a(q * n + k)
              a(p * n + k) = c * apk - s * aqk
              a(q * n + k) = s * apk + c * aqk
              val vpk = v(p * n + k); val vqk = v(q * n + k)
              v(p * n + k) = c * vpk - s * vqk
              v(q * n + k) = s * vpk + c * vqk
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => (-a(i * n + i), i))
    val vals = order.map(i => a(i * n + i)).toArray
    val vecs = order.map { i =>
      val row = Array.tabulate(n)(k => v(i * n + k))
      val m = row.indices.maxBy(k => (math.abs(row(k)), -k))
      if (row(m) < 0) row.map(x => -x) else row
    }.toArray
    (vals, vecs)
  }

  private val cache = new graft.Memo[(SparkSession, String),
    (Array[Double], Array[Double], Array[Array[Double]])]

  /** Covariance eigenmodel of the embedding table: (mean, eigenvalues,
    * eigenvector rows), derived from the exact integer moment cells.
    * Bounded model state, cached per (session, dir) like every trained
    * model in the repo. */
  private[graft] def model(s: SparkSession, dir: String)
      : (Array[Double], Array[Double], Array[Array[Double]]) =
    cache((s, dir)) {
      val emb = Tables.embeddings(s, dir)
      // The promotion switch: one metadata-cheap count decides whether
      // the Long accumulators can provably hold the Gram sums. (A
      // BigDecimal cell equal to a Long converts to the identical
      // double, so flipping `wide` never moves a safe-range result —
      // PcaSpec pins both facts.)
      val wide = emb.count() > longSafeRows
      val cells = momentCells(emb, wide)
        .collect().map { r =>
          val v = if (wide) BigDecimal(r.getDecimal(1))
                  else BigDecimal(r.getLong(1))
          r.getLong(0) -> v
        }.toMap
      val n = cells(d.toLong * d + d).toDouble
      val mean = Array.tabulate(d)(i =>
        cells(d.toLong * d + i).toDouble / (n * unit))
      val cov = new Array[Double](d * d)
      for (i <- 0 until d; j <- i until d) {
        val g = cells(i.toLong * d + j).toDouble / (n * unit * unit)
        val c = g - mean(i) * mean(j)
        cov(i * d + j) = c
        cov(j * d + i) = c
      }
      val (vals, vecs) = jacobiEigen(cov, d)
      (mean, vals, vecs)
    }

  /** q_vec_pca — project every embedding onto the top-2 principal
    * axes: pc_k = vec_dot(x, v_k) − m·v_k, the eigenvector as a
    * broadcast float-literal inside the codegen'd vec_dot scan and the
    * scalar mean offset constant-folded. One narrow pass, no shuffle
    * beyond the output sort. */
  val qVecPca: Q = Q(
    "q_vec_pca",
    (s, dir) => {
      import s.implicits._
      val (mean, _, vecs) = model(s, dir)
      def vcol(k: Int) = array(vecs(k).map(x => lit(x.toFloat)): _*)
      def offset(k: Int): Double =
        (0 until d).map(i => mean(i) * vecs(k)(i).toFloat).sum
      Tables.embeddings(s, dir)
        .withColumn("_v1", vcol(0))
        .withColumn("_v2", vcol(1))
        .select($"vec_id", $"label",
          round(expr("vec_dot(embedding, _v1)") - offset(0), 6).as("pc1"),
          round(expr("vec_dot(embedding, _v2)") - offset(1), 6).as("pc2"))
        .orderBy($"vec_id")
    })

  val all: Vector[Q] = Vector(qVecPca)
}
