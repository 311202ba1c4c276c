package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index — the coarse-quantizer scale path for
  * similarity search, complementing the hyperplane LSH variant
  * (VectorQueries.AnnLsh). A small k-means codebook partitions vectors
  * into cells; a probe searches only the `nprobe` nearest cells and
  * re-ranks exactly with the codegen'd vec_dot.
  *
  * Scale notes (100 TB): the codebook is model state — k×64 floats —
  * broadcast to every task; assignment is a per-row argmin over k cells
  * (narrow, codegen'd); training recomputes centroids with one
  * partial-aggregated shuffle per Lloyd iteration (k×64 rows cross the
  * wire, not the data); search filters on the cell id before any
  * pairwise math. Initialization is deterministic (first k vectors by
  * vec_id), so the index is reproducible run-to-run.
  */
object AnnIvf {

  /** Assign each row to its nearest centroid: adds integer `outCol`.
    * Column names are parameters so PQ's per-subspace encoding reuses
    * this same cost/argmin instead of re-implementing it.
    *
    * Plan width is O(1) in k (fixed r8): the whole codebook binds as ONE
    * 2-D array literal and the per-cell cost ‖c_j‖² − 2·x·c_j is a
    * single indexed `transform` over it (vec_dot stays codegen'd inside
    * the lambda), then argmin via array_position(array_min). The r7
    * form materialized one `_cost$j` projection column per centroid —
    * fine at k=8, fatal at the documented production k ≈ 32 768, where
    * a 32k-column projection would kill the analyzer and codegen. Here
    * the plan carries exactly two extra expressions at any k; the k×d
    * literal itself is a few MB at production sizes — the same payload
    * a broadcast variable would carry, just embedded in the plan. */
  def assign(df: DataFrame, centroids: Seq[Array[Float]],
      vecCol: String = "embedding", outCol: String = "cell"): DataFrame = {
    require(centroids.nonEmpty, "cannot assign against an empty codebook")
    val cb = typedLit(centroids.map(_.toSeq))
    val cn = typedLit(centroids.map(_.map(x => x.toDouble * x).sum))
    val costs = transform(cb, (c, j) =>
      element_at(cn, j + 1) -
        lit(2.0) * call_function("vec_dot", col(vecCol), c))
    df.withColumn(outCol,
      (array_position(costs, array_min(costs)) - 1).cast("int"))
  }

  /** Train a k-cell codebook with `iters` Lloyd iterations.
    * Deterministic init: the k lowest-vec_id vectors.
    *
    * Sizing rule: production IVF uses k ≈ √n cells so cell size and
    * codebook size balance at √n — search cost is then
    * O(k·d + nprobe·(n/k)·d) ≈ O(√n·d·(1+nprobe)). At 100 TB
    * (n ≈ 10⁹ vectors) that is k ≈ 32 768 — the codebook stays a few MB
    * of broadcast state and each cell holds ~30 k vectors. The fixture
    * catalog query uses k=8 (not √500 ≈ 22) only because tiny cells at
    * tiny n destabilize recall; AnnIvfSpec pins behavior at k=64 too,
    * where empty cells necessarily appear. Empty cells keep their
    * previous centroid, so k never silently shrinks. */
  def train(df: DataFrame, k: Int, iters: Int): Seq[Array[Float]] = {
    require(k > 0, s"k must be positive, got $k")
    require(iters >= 0, s"iters must be non-negative, got $iters")
    var centroids: Seq[Array[Float]] = df
      .orderBy(col("vec_id")).limit(k)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray).toSeq
    // "k never silently shrinks" (spec-pinned): a corpus smaller than k
    // must fail loudly, not hand back a truncated codebook.
    require(centroids.size == k,
      s"corpus has only ${centroids.size} vectors, cannot train k=$k cells")
    for (_ <- 0 until iters) {
      val assigned = assign(df, centroids)
      val means = assigned
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("x").cast("double")).as("m"))
        .collect()
      val byCell = means.groupBy(_.getInt(0))
      centroids = centroids.indices.map { c =>
        byCell.get(c) match {
          case Some(rows) =>
            val arr = new Array[Float](centroids(c).length)
            // Round the mean at 1e-6 before the float cast: raw double
            // avg() partial-sum order varies with shuffle partitioning,
            // and an ulp of centroid drift can flip a borderline cell
            // assignment on the next iteration — rounding makes the
            // trained codebook partitioning-invariant (same rule every
            // oracle row applies to float aggregates).
            rows.foreach(r => arr(r.getInt(1)) =
              (math.rint(r.getDouble(2) * 1e6) / 1e6).toFloat)
            arr
          case None => centroids(c) // empty cell keeps its centroid
        }
      }
    }
    centroids
  }

  /** Trained-codebook cache per (session, sfDir, k, iters): the
    * centroids are MODEL STATE — k×64 floats trained once and reused
    * by every search, exactly as a production index persists its
    * quantizer (same locked-build pattern as PqQuantizer.Codebooks).
    * Without it each bench rep re-runs the full Lloyd loop. */
  object Models {
    private val cache = new graft.Memo[
      (org.apache.spark.sql.SparkSession, String, Int, Int),
      Seq[Array[Float]]]

    def apply(s: org.apache.spark.sql.SparkSession, dir: String,
        k: Int, iters: Int): Seq[Array[Float]] =
      cache((s, dir, k, iters)) {
        train(graft.Tables.embeddings(s, dir)
          .select(col("vec_id"), col("embedding")), k, iters)
      }
  }

  /** The `nprobe` cells nearest (L2) to a probe vector — the coarse
    * routing decision of every IVF search; factored so q_pipeline_rag's
    * shortlist stage shares the identical cell selection. Driver-side
    * over the bounded codebook (k distances), deterministic (stable
    * sort, index tiebreak implicit in sortBy stability). */
  def probeCells(centroids: Seq[Array[Float]], probeVec: Array[Float],
      nprobe: Int): Seq[Int] =
    centroids.zipWithIndex
      .map { case (c, j) =>
        val d = c.zip(probeVec).map { case (a, b) =>
          (a.toDouble - b) * (a.toDouble - b) }.sum
        (d, j)
      }
      .sortBy(_._1).take(nprobe).map(_._2)

  /** Exact top-`topK` by dot product among vectors in the `nprobe`
    * cells nearest to the probe vector (excluding the probe row). */
  def search(
      df: DataFrame,
      centroids: Seq[Array[Float]],
      probeId: Long,
      nprobe: Int,
      topK: Int): DataFrame = {
    require(nprobe >= 1 && topK >= 1,
      s"nprobe/topK must be positive, got $nprobe/$topK")
    val assigned = assign(df, centroids)
    val probeRow = df.where(col("vec_id") === probeId)
      .select(col("embedding")).head()
    val probeVec = probeRow.getSeq[Float](0).toArray
    val cells = probeCells(centroids, probeVec, nprobe)
    assigned
      .where(col("cell").isin(cells: _*) && col("vec_id") =!= probeId)
      .withColumn("_p", typedLit(probeVec.toSeq))
      .select(col("vec_id"), round(expr("vec_dot(embedding, _p)"), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(topK)
  }
}
