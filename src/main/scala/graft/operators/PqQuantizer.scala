package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the OTHER half of the classic IVF-PQ ANN
  * stack (AnnIvf is the coarse half): split each 64-d embedding into
  * m = 8 contiguous 8-d subvectors, train an independent 16-centroid
  * codebook per subspace (a joint Lloyd loop — all subspaces per
  * iteration in one job; see train()), and encode every vector as 8
  * four-bit centroid ids — 32
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

  /** Per-subspace codebooks, all m trained JOINTLY: every Lloyd
    * iteration is ONE Spark job — assign all 8 subspaces in a single
    * narrow pass, then recover all m·k·dsub centroid means from a
    * single posexplode aggregate (pos div 8 = subspace, pos mod 8 =
    * local dim, the matching code column = the cell). A per-subspace
    * loop would launch m×iters driver round-trips for the same math —
    * the first cut did, and it dominated the bench row at 6.7 s.
    * Same determinism rules as AnnIvf.train: vec_id-ordered init,
    * means rounded at 1e-6 (partitioning-invariant), empty cells keep
    * their previous centroid. */
  def train(df: DataFrame, iters: Int): Seq[Seq[Array[Float]]] = {
    val initRows = df.orderBy(col("vec_id")).limit(ksub)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    require(initRows.length == ksub,
      s"corpus has only ${initRows.length} vectors, cannot train k=$ksub")
    var books: Seq[Seq[Array[Float]]] = (0 until m).map(j =>
      initRows.toSeq.map(_.slice(j * dsub, (j + 1) * dsub)))
    for (_ <- 0 until iters) {
      val coded = (0 until m).foldLeft(df) { case (d, j) =>
        argminCode(
          d.withColumn(s"_sub$j", sub(j)), s"_sub$j", books(j), s"_code$j")
      }
      val codes = array((0 until m).map(j => col(s"_code$j")): _*)
      val means = coded
        .select(codes.as("codes"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .withColumn("j", (col("pos") / dsub).cast("int"))
        .withColumn("cell", element_at(col("codes"), col("j") + 1))
        .withColumn("lpos", (col("pos") % dsub).cast("int"))
        .groupBy(col("j"), col("cell"), col("lpos"))
        .agg(avg(col("x").cast("double")).as("mean"))
        .collect() // ≤ m·k·dsub = 1024 rows of model state
      val byKey = means.map(r =>
        (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
      books = (0 until m).map { j =>
        books(j).zipWithIndex.map { case (old, c) =>
          if (byKey.contains((j, c, 0))) {
            val arr = new Array[Float](dsub)
            var p = 0
            while (p < dsub) {
              arr(p) = (math.rint(byKey((j, c, p)) * 1e6) / 1e6).toFloat
              p += 1
            }
            arr
          } else old // empty cell keeps its centroid
        }
      }
    }
    books
  }

  /** Trained-model cache per (session, sfDir) — the codebook is MODEL
    * STATE (1024 floats): trained once, stored, and reused by every
    * encode/search, exactly as a production index would persist it.
    * Same locked-build pattern as the layout and shingle caches. */
  object Codebooks {
    private val cache = new graft.Memo[
      (org.apache.spark.sql.SparkSession, String), Seq[Seq[Array[Float]]]]

    def apply(s: org.apache.spark.sql.SparkSession, dir: String)
        : Seq[Seq[Array[Float]]] =
      cache((s, dir))(train(Tables.embeddings(s, dir), iters = 3))
  }

  /** Argmin centroid id for `vecCol` against one subspace codebook —
    * AnnIvf.assign's ‖c‖² − 2·x·c cost/argmin, reused with per-subspace
    * column names. */
  private def argminCode(
      df: DataFrame, vecCol: String,
      cents: Seq[Array[Float]], out: String): DataFrame =
    AnnIvf.assign(df, cents, vecCol, out)

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

  /** The encoded CODES TABLE per (session, sfDir), persisted once: at
    * 100 TB the 4-byte codes are a WRITTEN intermediate (the in-memory
    * index every ANN query scans) — encoding per query would re-read
    * the float corpus and re-run a ~500-column analysis-heavy plan
    * each time. Local analog: MEMORY_AND_DISK persist, same lifetime
    * discipline as DedupQueries.Shingled. */
  object Encoded {
    private val cache = new graft.Memo[
      (org.apache.spark.sql.SparkSession, String), DataFrame]

    def apply(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
      cache((s, dir)) {
        encode(Tables.embeddings(s, dir), Codebooks(s, dir))
          .select(col("vec_id"), col("code"), col("mse"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
  }

  /** The COMPOSED IVF-PQ index per (session, sfDir): one narrow pass
    * assigns every vector its coarse IVF cell AND its packed PQ code,
    * persisted as the (vec_id, cell, code) triple — the exact shape a
    * production 10⁹-vector index keeps hot (4-byte code + small int
    * cell per vector; floats stay cold). Cell count k=8 matches the
    * catalog IVF row's codebook so the two share the trained model. */
  object IvfPqIndex {
    val ivfK = 8
    val ivfIters = 3
    private val cache = new graft.Memo[
      (org.apache.spark.sql.SparkSession, String), DataFrame]

    def apply(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
      cache((s, dir)) {
        val cells = AnnIvf.assign(
          Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
          AnnIvf.Models(s, dir, ivfK, ivfIters))
        encode(cells, Codebooks(s, dir))
          .select(col("vec_id"), col("cell"), col("code"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
  }

  /** The production ANN query pipeline, composed end to end: coarse IVF
    * cell filter (touch only `nprobe` of k cells) → ADC over the 32-bit
    * codes of the surviving candidates (no floats) → EXACT re-rank of
    * the ADC top-`rerankN` against the float corpus (a broadcast-joined
    * 50-row probe set — the only point floats are read, and for 50
    * rows, not n). This is what a 10⁹-vector index actually executes
    * per query; the standalone IVF and ADC rows exist to pin each half.
    *
    * Scale: candidates never leave their partitions until the ADC
    * top-`rerankN` limit (a TakeOrderedAndProject — partial per
    * partition, tiny final); the re-rank side is `rerankN` rows
    * broadcast against a vec_id-keyed point lookup. */
  def ivfPqSearch(
      index: DataFrame, floats: DataFrame,
      ivfCodebook: Seq[Array[Float]], pqCodebooks: Seq[Seq[Array[Float]]],
      probeVec: Array[Float], probeId: Long,
      nprobe: Int, rerankN: Int, topK: Int): DataFrame = {
    require(nprobe >= 1 && rerankN >= topK && topK >= 1,
      s"need nprobe>=1, rerankN>=topK>=1; got $nprobe/$rerankN/$topK")
    val probeCells = ivfCodebook.zipWithIndex
      .map { case (c, j) =>
        (c.zip(probeVec).map { case (a, b) =>
          (a.toDouble - b) * (a.toDouble - b) }.sum, j)
      }
      .sortBy(_._1).take(nprobe).map(_._2)
    val shortlist = adcSearch(
      index.where(col("cell").isin(probeCells: _*)),
      pqCodebooks, probeVec, probeId, rerankN)
    floats
      .join(broadcast(shortlist), "vec_id")
      .withColumn("_p", typedLit(probeVec.toSeq))
      .select(col("vec_id"), col("sim_adc"),
        round(expr("vec_dot(embedding, _p)"), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(topK)
  }

  /** q_vec_knn_ivfpq (T) — the composed pipeline as a catalog row:
    * top-5 neighbors of probe vec_id=0 via cell filter → ADC top-50 →
    * exact re-rank. Engine-specific model state ⇒ no DuckDB oracle;
    * PqSpec pins multi-probe recall vs brute force (composition ≥
    * ADC-only) and that returned sims equal the exact brute-force
    * values (the re-rank contract). */
  val qVecKnnIvfPq: Q = Q(
    "q_vec_knn_ivfpq",
    (s, dir) => {
      val probeVec = Tables.embeddings(s, dir).where(col("vec_id") === 0L)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      ivfPqSearch(
        IvfPqIndex(s, dir), Tables.embeddings(s, dir),
        AnnIvf.Models(s, dir, IvfPqIndex.ivfK, IvfPqIndex.ivfIters),
        Codebooks(s, dir), probeVec, probeId = 0L,
        nprobe = 3, rerankN = 50, topK = 5)
    })

  /** q_vec_pq (T) — the PQ index as a catalog row: per-vector packed
    * 32-bit code + reconstruction MSE over the embeddings table (read
    * through the persisted codes table). Engine-specific k-means state
    * ⇒ no DuckDB oracle; PqSpec pins determinism across partitionings,
    * code-range validity, MSE beating the predict-the-mean baseline,
    * and ADC recall against the exact brute-force top-k. */
  val qVecPq: Q = Q(
    "q_vec_pq",
    (s, dir) => Encoded(s, dir).orderBy(col("vec_id")))

  /** q_vec_knn_pq (T) — the PQ SEARCH path as a catalog row, completing
    * the ANN trio (q_vec_knn_lsh buckets, q_vec_knn_ivf cells, this one
    * codes): top-5 neighbors of probe vec_id=0 by ADC over the cached
    * codebook — candidates are scored from their 32-bit codes alone.
    * PqSpec pins recall/order-agreement vs the exact brute force. */
  val qVecKnnPq: Q = Q(
    "q_vec_knn_pq",
    (s, dir) => {
      val probeVec = Tables.embeddings(s, dir).where(col("vec_id") === 0L)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      adcSearch(Encoded(s, dir), Codebooks(s, dir), probeVec,
        probeId = 0L, topK = 5)
    })

  val all: Vector[Q] = Vector(qVecPq, qVecKnnPq, qVecKnnIvfPq)
}
