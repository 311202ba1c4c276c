package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the OTHER half of the classic IVF-PQ ANN
  * stack (AnnIvf is the coarse half): split each 64-d embedding into
  * m = 8 contiguous 8-d subvectors, train an independent 16-centroid
  * codebook per subspace (Lloyd, reusing AnnIvf.train on the sliced
  * column), and encode every vector as 8 four-bit centroid ids — 32
  * bits per vector, a 64× compression of the 256-byte float payload.
  * Approximate distances then come from per-subspace lookup tables
  * (ADC): 8 table probes + adds per candidate, no float vector ever
  * touched at query time.
  *
  * Scale notes (100 TB): the model state is m·k·dsub = 1024 floats —
  * broadcast-trivial; training cost is m small Lloyd runs whose
  * shuffles carry k×dsub partial means each (not the data); encoding
  * is one narrow codegen'd pass (vec_dot per centroid per subspace);
  * and the 4-byte codes are what a billion-vector index actually keeps
  * in memory — the floats stay in cold storage for optional re-rank.
  * Deterministic end to end: AnnIvf.train's init is vec_id-ordered and
  * its centroid means are rounded at 1e-6 (partitioning-invariant), so
  * the codebook — and therefore every code — is reproducible.
  */
object PqQuantizer {

  val m = 8      // subspaces
  val dsub = 8   // dims per subspace
  val ksub = 16  // centroids per subspace → 4-bit codes

  /** The j-th subvector (1-based slice) of the embedding column. */
  private def sub(j: Int): Column =
    slice(col("embedding"), j * dsub + 1, dsub)

  /** Per-subspace codebooks: m independent Lloyd runs on the sliced
    * column (AnnIvf.train sees each slice as its own tiny corpus). */
  def train(df: DataFrame, iters: Int): Seq[Seq[Array[Float]]] =
    (0 until m).map { j =>
      AnnIvf.train(
        df.select(col("vec_id"), sub(j).as("embedding")), ksub, iters)
    }

  /** Argmin centroid id for `vecCol` against one subspace codebook —
    * same ‖c‖² − 2·x·c cost as AnnIvf.assign, codegen'd via vec_dot. */
  private def argminCode(
      df: DataFrame, vecCol: String,
      cents: Seq[Array[Float]], out: String): DataFrame = {
    val withCosts = cents.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      val cNorm2 = c.map(x => x.toDouble * x).sum
      d.withColumn("_pq_c", typedLit(c.toSeq))
        .withColumn(s"_pqcost$i",
          lit(cNorm2) - lit(2.0) * expr(s"vec_dot($vecCol, _pq_c)"))
        .drop("_pq_c")
    }
    val arr = array(cents.indices.map(i => col(s"_pqcost$i")): _*)
    withCosts
      .withColumn(out,
        (array_position(arr, array_min(arr)) - 1).cast("int"))
      .drop(cents.indices.map(i => s"_pqcost$i"): _*)
  }

  /** Encode every vector: adds `code` (the 8 ids packed 4 bits each
    * into one long) and `mse` (round-6 per-dim reconstruction error —
    * the compression acceptance metric). */
  def encode(df: DataFrame, codebooks: Seq[Seq[Array[Float]]]): DataFrame = {
    val coded = (0 until m).foldLeft(df) { case (d, j) =>
      argminCode(
        d.withColumn(s"_sub$j", sub(j)), s"_sub$j",
        codebooks(j), s"_code$j")
    }
    val packed = (0 until m)
      .map(j => shiftleft(col(s"_code$j").cast("long"), 4 * j))
      .reduce(_ bitwiseOR _)
    // Reconstruction = the selected centroid per subspace (codebook as
    // a literal lookup array); error = Σ (x − recon)² via codegen'd
    // array HOFs — narrow, no shuffle.
    val withRecon = (0 until m).foldLeft(coded) { case (d, j) =>
      d.withColumn(s"_recon$j",
        element_at(typedLit(codebooks(j).map(_.toSeq)), col(s"_code$j") + 1))
    }
    val withErrs = (0 until m).foldLeft(withRecon) { case (d, j) =>
      d.withColumn(s"_err$j",
        expr(s"aggregate(zip_with(_sub$j, _recon$j, (a, b) -> " +
          s"(CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)), " +
          s"CAST(0 AS DOUBLE), (acc, x) -> acc + x)"))
    }
    val totalErr = (0 until m).map(j => col(s"_err$j")).reduce(_ + _)
    withErrs
      .withColumn("code", packed)
      .withColumn("mse", round(totalErr / lit(m * dsub), 6))
      .drop((0 until m).flatMap(j =>
        Seq(s"_sub$j", s"_code$j", s"_recon$j", s"_err$j")): _*)
  }

  /** ADC (asymmetric distance computation) top-k: the probe stays
    * float; each subspace contributes a 16-entry lookup table of
    * probe·centroid dots (driver-computed — 128 doubles of model
    * state), and a candidate's approximate similarity is 8 table
    * probes + adds over its CODES alone. This is the query path that
    * never touches a stored float vector. */
  def adcSearch(
      encoded: DataFrame, codebooks: Seq[Seq[Array[Float]]],
      probeVec: Array[Float], probeId: Long, topK: Int): DataFrame = {
    val luts: Seq[Seq[Double]] = (0 until m).map { j =>
      val p = probeVec.slice(j * dsub, (j + 1) * dsub)
      codebooks(j).map(c =>
        c.zip(p).map { case (a, b) => a.toDouble * b }.sum)
    }
    val approx = (0 until m).map { j =>
      element_at(typedLit(luts(j)),
        (shiftright(col("code"), 4 * j).bitwiseAND(lit(15L)) + 1L)
          .cast("int"))
    }.reduce(_ + _)
    encoded
      .where(col("vec_id") =!= probeId)
      .select(col("vec_id"), round(approx, 6).as("sim_adc"))
      .orderBy(col("sim_adc").desc, col("vec_id"))
      .limit(topK)
  }

  /** q_vec_pq (T) — the PQ index as a catalog row: per-vector packed
    * 32-bit code + reconstruction MSE over the embeddings table.
    * Engine-specific k-means state ⇒ no DuckDB oracle; PqSpec pins
    * determinism across partitionings, code-range validity, MSE
    * beating the predict-the-mean baseline, and ADC recall against
    * the exact brute-force top-k. */
  val qVecPq: Q = Q(
    "q_vec_pq",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val codebooks = train(emb, iters = 3)
      encode(emb, codebooks)
        .select(col("vec_id"), col("code"), col("mse"))
        .orderBy(col("vec_id"))
    })

  val all: Vector[Q] = Vector(qVecPq)
}
