package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Trained document-quality classifier — the learned counterpart of the
  * hand-weighted [[TextQueries.QualityScore]] gate, closing the standard
  * corpus-pipeline loop (heuristic gate → labels → trained model →
  * distributed scoring).
  *
  * Training is logistic regression by NEWTON/IRLS with a FIXED
  * iteration schedule (no convergence test, no randomness): per round
  * ONE distributed aggregation computes gradient + Hessian cells and
  * the driver solves a 4×4 system — model state is `dim` doubles,
  * exactly the bounded-model-state discipline of [[AnnIvf]] (codebook)
  * and [[PqQuantizer]]. Determinism is STRONGER than AnnIvf's rounded
  * float means: each row's contribution is quantized to integer
  * MICRO-UNITS and summed as Long, so every per-round aggregate is
  * exact integer arithmetic — bit-identical under any partitioning,
  * task order, or cluster size (repartition probes pin it).
  *
  * Scoring is ONE narrow codegen'd expression — σ(w·x) over the feature
  * columns via built-in exp, no UDF, no shuffle: at 100 TB the scoring
  * pass is a map over the corpus with 4 doubles of broadcast-in-plan
  * state, and the per-epoch training cost is one partial-aggregated
  * shuffle of `dim` longs (the data never moves).
  */
object QualityClassifier {

  /** Bounded per-doc features from the shared Tokenized/QualityScore
    * columns (n_tok, n_distinct, n_stop): lexical diversity, stopword
    * rate, saturating length. All int/int double ratios in [0, 1] —
    * deterministic per row, and bounded so the micro-unit gradient
    * quantization bound |err·x| ≤ 1 holds by construction. */
  def withFeatures(df: DataFrame): DataFrame =
    df.withColumn("f_distinct",
        col("n_distinct").cast(DoubleType) / col("n_tok"))
      .withColumn("f_stop", col("n_stop").cast(DoubleType) / col("n_tok"))
      .withColumn("f_len",
        least(col("n_tok").cast(DoubleType) / 50.0, lit(1.0)))

  val featureCols: Seq[String] = Seq("f_distinct", "f_stop", "f_len")
  val dim: Int = featureCols.length + 1 // + bias

  final case class Model(w: Seq[Double]) {
    require(w.length == dim, s"model needs $dim weights, got ${w.length}")

    /** w·x as one column expression (bias first). */
    def margin: Column = featureCols.zipWithIndex.foldLeft(lit(w.head)) {
      case (acc, (f, j)) => acc + lit(w(j + 1)) * col(f)
    }

    /** σ(w·x) — the narrow scoring expression. */
    def prob: Column = lit(1.0) / (lit(1.0) + exp(-margin))

    def pred: Column = (prob >= 0.5).cast("int")
  }

  /** Fit on a frame carrying the feature columns and an int/long 0-1
    * `label`, by NEWTON/IRLS — not plain gradient descent, which needs
    * thousands of full-batch passes to sharpen a near-thresholded
    * decision boundary (measured: GD at 200 epochs still kept 18/20 of
    * the clearest rejects; IRLS separates all extremes by iteration 4).
    * Each of the fixed `iters` rounds runs ONE distributed aggregation
    * computing the log-loss gradient X^T(y−p) and the 10 unique cells
    * of the Hessian X^T·diag(p(1−p))·X, then the driver solves the
    * ridge-damped 4×4 Newton system (Gaussian elimination, fixed pivot
    * scan — pure O(dim³) driver math). Per-row contributions are
    * quantized to integer MICRO-UNITS and summed as Long, so every
    * aggregate is exact under any partitioning (headroom: |err·x| ≤ 1,
    * |r·x_j·x_k| ≤ ¼ → Long holds ≥ 9e12 labeled rows/cell). */
  def train(labeled: DataFrame, iters: Int = 8, ridge: Double = 1e-3): Model =
    trainWeighted(labeled, lit(1L), iters, ridge)

  /** Weighted IRLS over a (features, label, weight) frame — the
    * refit-from-histogram path ([[graft.streaming.ModelRefit]]): rows
    * with identical features contribute identical per-row micro
    * products, so `Σ_rows round(c·10⁶)` over the corpus equals
    * `Σ_hist cnt · round(c·10⁶)` over the distinct-triple histogram
    * BIT-FOR-BIT — weighted training on the maintained state IS batch
    * training on the corpus (ModelRefitSpec pins the equality; the
    * weight-1 path is the original train()). */
  def trainWeighted(labeled: DataFrame, weight: Column,
      iters: Int = 8, ridge: Double = 1e-3): Model = {
    val n = labeled.agg(coalesce(sum(weight), lit(0L)))
      .head().getLong(0)
    require(n > 0, "cannot train on an empty labeled set")
    val xs = lit(1.0) +: featureCols.map(col)
    var w = Vector.fill(dim)(0.0)
    for (_ <- 0 until iters) {
      val p = Model(w).prob
      val err = col("label").cast(DoubleType) - p
      val r = p * (lit(1.0) - p)
      def micro(c: Column) = sum(weight * round(c * 1e6).cast(LongType))
      val gCols = xs.zipWithIndex.map { case (x, j) =>
        micro(err * x).as(s"g$j") }
      val hCols = for { j <- 0 until dim; k <- j until dim }
        yield micro(r * xs(j) * xs(k)).as(s"h${j}_$k")
      val cols = gCols ++ hCols
      val row = labeled.agg(cols.head, cols.tail: _*).head()
      val g = Array.tabulate(dim)(j => row.getLong(j) / 1e6)
      val h = Array.ofDim[Double](dim, dim)
      var idx = dim
      for (j <- 0 until dim; k <- j until dim) {
        val v = row.getLong(idx) / 1e6
        h(j)(k) = v; h(k)(j) = v; idx += 1
      }
      // Ridge damping keeps the system well-posed when p saturates
      // (diag(p(1-p)) → 0) — scaled by n so the damping strength is
      // corpus-size-invariant.
      for (j <- 0 until dim) h(j)(j) += ridge * n
      val step = solve(h, g)
      w = Vector.tabulate(dim)(j => w(j) + step(j))
    }
    Model(w)
  }

  /** Deterministic dense solve (Gaussian elimination, partial pivoting
    * with a fixed scan order): pure driver math over the exact
    * aggregate sums, so training stays bit-reproducible end to end.
    * The ridge-damped Hessian is symmetric positive definite, so a
    * zero pivot cannot occur; the guard is a loud invariant check. */
  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val m = b.length
    val x = b.clone()
    for (c <- 0 until m) {
      var piv = c
      for (r2 <- c + 1 until m)
        if (math.abs(a(r2)(c)) > math.abs(a(piv)(c))) piv = r2
      if (piv != c) {
        val t = a(c); a(c) = a(piv); a(piv) = t
        val tb = x(c); x(c) = x(piv); x(piv) = tb
      }
      require(a(c)(c) != 0.0, "singular Newton system despite ridge damping")
      for (r2 <- c + 1 until m) {
        val f = a(r2)(c) / a(c)(c)
        for (k <- c until m) a(r2)(k) -= f * a(c)(k)
        x(r2) -= f * x(c)
      }
    }
    for (c <- m - 1 to 0 by -1) {
      for (k <- c + 1 until m) x(c) -= a(c)(k) * x(k)
      x(c) /= a(c)(c)
    }
    x
  }

  /** Trained-model cache per (session, sfDir): the weights are MODEL
    * STATE — trained once on the md5-gated labeled split and reused by
    * every scoring pass and bench rep (the AnnIvf.Models locked-build
    * pattern). */
  object Models {
    private val cache = new graft.Memo[(SparkSession, String), Model]

    /** ~40 % deterministic labeled split: docs whose md5(doc_id) 2-hex
      * prefix < "66" (the repo's engine-portable sampling gate). Labels
      * come from the heuristic keep gate — the weak-supervision setup
      * where the trained model generalizes a hand-tuned rule. */
    val gateThresh = "66"

    def labeled(s: SparkSession, dir: String): DataFrame =
      withFeatures(
        TextQueries.QualityScore.fromTokens(TextQueries.Tokenized(s, dir)))
        .where(graft.Dsl.md5Gate(col("doc_id"), gateThresh))
        .withColumn("label", TextQueries.QualityScore.keep.cast("int"))

    def apply(s: SparkSession, dir: String): Model =
      cache((s, dir))(train(labeled(s, dir)))
  }
}
