package graft.streaming

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF CODEBOOK REFIT — the offline maintenance event that closes the
  * index-lifecycle loop (r12 verdict ask #1): [[StreamVecIndex]]
  * maintains per-(cell, dim) exact-integer sufficient statistics and
  * serves the drift report — the dashboard that says a refit is DUE —
  * and this operator EXECUTES the refit:
  *
  *  1. M-STEP — re-train the codebook FROM the maintained (count,
  *     micro-sum) state: those statistics are exactly Lloyd's M-step
  *     inputs, so the new centroid is the per-cell micro-mean
  *     `rint(s/n)` — ONE driver-side k×d computation over the
  *     model-bounded state table (≤ k·d rows collect; no pass over the
  *     data at all — the entire point of maintaining sufficient
  *     statistics instead of re-reading vectors). Empty cells keep the
  *     frozen centroid (the `AnnIvf.train` "k never silently shrinks"
  *     rule).
  *  2. DELTA RE-ASSIGN — one NARROW pass over the postings re-assigns
  *     against the new codebook (broadcast literal, no shuffle), and
  *     only the AFFECTED cells — those that gained or lost at least
  *     one vector — are rewritten; an unaffected cell's committed
  *     files are never opened for write, listed, or copied (the
  *     UpsertState untouched-bucket discipline, spec-pinned by file
  *     identity). Write cost ∝ the affected cells' content, which the
  *     one-M-step contract keeps near the moved set.
  *  3. GENERATION SWAP — codebook + every rewritten cell publish in
  *     ONE [[Snapshot]] manifest commit: a crash at ANY point before
  *     the pointer swap leaves readers on the complete old generation
  *     (torn version dirs are orphans the next commit sweeps), and the
  *     retention window keeps a reader that resolved old paths safe
  *     across the swap. After the swap the maintenance stream restarts
  *     against the new codebook literal (the StreamVecIndex:13–16
  *     offline/online contract — batch 0 resets the stats table).
  *
  * Exactness: the refit codebook is a pure integer function of the
  * maintained state — `rint(s/n)` in micro-units — so refit-from-stats
  * equals the same M-step recomputed from scratch in batch, whatever
  * micro-batching built the state (IvfRefitSpec pins both, plus the
  * ≤ 1-micro-unit envelope vs the float-path `AnnIvf.train` update:
  * per-component micro-rounding before the sum shifts the mean by at
  * most the mean rounding error, |δ̄| ≤ 0.5 micro, so the two paths'
  * rounded centroids differ by at most one micro-unit per dimension).
  *
  * Scale (10⁹-vector index, k ≈ 32 768): the M-step touches k·d state
  * rows (~2M — model-sized); re-assignment is the one narrow
  * full-corpus map every refit fundamentally needs (finding the moved
  * set IS an E-step); the rewrite is bounded by the affected cells —
  * after a drift-triggered refit that is the drifted fraction of the
  * corpus, not the corpus. Nothing else moves: unchanged cells swap
  * generations by manifest pointer alone.
  *
  * Bench-cost honesty (~3.3 s at sf0.1): each rep resets and
  * re-bootstraps the generation store (~8 driver jobs of parquet
  * commits at fixture scale where the data is milliseconds) so every
  * rep refits the SAME generation — a production refit keeps its
  * store and pays only the M-step + delta + swap. The one-time
  * stats replay lands behind the run-once latch, in warmup.
  *
  * T-row (Lloyd training + the generation store are un-SQL-able):
  * IvfRefitSpec pins refit-from-stats == batch M-step == train(iters+1)
  * within the documented micro envelope, postings == from-scratch
  * assignment under the new codebook, untouched-cell file identity on
  * a planted corpus, quantization-cost improvement, crash-injected
  * atomicity of the swap, and re-run idempotence. */
object IvfRefit {

  import graft.operators.AnnIvf

  /** Lloyd's M-step from the maintained sufficient statistics: per
    * (cell, pos), centroid micro-value = rint(s / n) — the truncation-
    * free rounded mean of the micro-quantized components. Cells absent
    * from the state (no vectors) keep their frozen centroid. Driver-
    * side over ≤ k·d rows (model state, the AnnIvf.Models rule). */
  def mStep(state: DataFrame, frozen: Seq[Array[Float]])
      : Seq[Array[Float]] = {
    val rows = state.select(col("cell"), col("pos"), col("n"), col("s"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val byCell = rows.groupBy(_._1)
    frozen.indices.map { c =>
      byCell.get(c) match {
        case Some(cellRows) =>
          val arr = frozen(c).clone()
          cellRows.foreach { case (_, pos, n, s) =>
            arr(pos) = (math.rint(s.toDouble / n) / 1e6).toFloat
          }
          arr
        case None => frozen(c)
      }
    }
  }

  /** The generation store layout under a [[Snapshot]] root:
    *   `codebook`   → parquet of (cell, pos, c_micro) — the frozen model
    *   `cell<j>`    → that cell's postings directory (vec_id, embedding,
    *                  cell) — one manifest key per OCCUPIED cell, so a
    *                  refit commits exactly the touched keys (the
    *                  UpsertState per-bucket-manifest shape). */
  object Gen {

    def codebookRows(s: SparkSession, cb: Seq[Array[Float]]): DataFrame = {
      import s.implicits._
      cb.zipWithIndex.flatMap { case (arr, c) =>
        arr.zipWithIndex.map { case (x, p) =>
          (c, p, math.rint(x.toDouble * 1e6).toLong)
        }
      }.toDF("cell", "pos", "c_micro")
    }

    def readCodebook(s: SparkSession, root: String): Seq[Array[Float]] = {
      val dir = Snapshot.currentManifest(root).flatMap(_.get("codebook"))
        .map(Snapshot.versionPath(root, _))
        .getOrElse(throw new IllegalStateException(
          s"generation store at $root has no committed codebook"))
      val rows = s.read.parquet(dir)
        .select(col("cell"), col("pos"), col("c_micro"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      val k = rows.map(_._1).max + 1
      val d = rows.map(_._2).max + 1
      val cb = Array.fill(k)(new Array[Float](d))
      rows.foreach { case (c, p, m) => cb(c)(p) = (m / 1e6).toFloat }
      cb.toSeq
    }

    /** The committed postings: union of every cell key's directory
      * (the data files carry the `cell` column — partition-dir
      * recovery would break across mixed version basePaths). */
    def readPostings(s: SparkSession, root: String): DataFrame = {
      val dirs = Snapshot.currentManifest(root).getOrElse(Map.empty)
        .collect { case (k, v) if k.startsWith("cell") =>
          Snapshot.versionPath(root, v) }
        .toSeq.sorted
      if (dirs.isEmpty) throw new IllegalStateException(
        s"generation store at $root holds no postings")
      s.read.parquet(dirs: _*)
        .select(col("vec_id"), col("embedding"), col("cell"))
    }

    /** Bootstrap generation 0: assign the corpus (vec_id, embedding)
      * under `cb`, lay the postings out one directory per occupied
      * cell, commit codebook + cell keys in one manifest swap. */
    def bootstrap(s: SparkSession, corpus: DataFrame, root: String,
        cb: Seq[Array[Float]]): Unit = {
      val assigned = AnnIvf.assign(
        corpus.select(col("vec_id"), col("embedding")), cb)
      val vP = Snapshot.nextVersion(root)
      assigned
        .select(col("vec_id"), col("embedding"), col("cell"),
          col("cell").as("pcell"))
        .write.mode("overwrite").partitionBy("pcell")
        .parquet(Snapshot.versionPath(root, vP))
      val occupied = assigned.select(col("cell")).distinct()
        .collect().map(_.getInt(0)).toSeq.sorted
      val vC = Snapshot.nextVersion(root)
      codebookRows(s, cb).write.mode("overwrite")
        .parquet(Snapshot.versionPath(root, vC))
      Snapshot.commit(root,
        occupied.map(c => s"cell$c" -> s"$vP/pcell=$c").toMap +
          ("codebook" -> vC))
    }
  }

  /** Execute one refit against the generation store at `root`, taking
    * the M-step centroids from the maintained stats table at `state`.
    * Returns the per-cell refit report (deterministic — a pure function
    * of (postings, stats)):
    *   (cell, n_old, n_new, moved_in, moved_out, shift_sq_micro2).
    *
    * `abortBeforeCommit` is the spec's crash hook: every version
    * directory of the new generation is fully written, then the
    * process "dies" before the pointer swap — readers must still see
    * the complete old generation, and a re-run must converge
    * (IvfRefitSpec injects exactly that). */
  private[graft] def refit(s: SparkSession, state: String, root: String,
      abortBeforeCommit: Boolean = false): DataFrame = {
    val frozen = Gen.readCodebook(s, root)
    val newCb = mStep(MonoidTable.read(s, state), frozen)
    val prior = Snapshot.currentManifest(root).getOrElse(Map.empty)

    // E-step: one narrow broadcast-literal pass; no shuffle until the
    // k-bounded moved-cell aggregate.
    val assigned = AnnIvf.assign(
      Gen.readPostings(s, root).withColumnRenamed("cell", "cell_old"),
      newCb, outCol = "cell_new").persist()
    try {
      // Per-cell movement accounting — k-bounded rows, the routing
      // decision AND the report body.
      val outs = assigned.where(col("cell_new") =!= col("cell_old"))
        .groupBy(col("cell_old").as("cell"))
        .agg(count(lit(1)).as("moved_out"))
      val ins = assigned.where(col("cell_new") =!= col("cell_old"))
        .groupBy(col("cell_new").as("cell"))
        .agg(count(lit(1)).as("moved_in"))
      val olds = assigned.groupBy(col("cell_old").as("cell"))
        .agg(count(lit(1)).as("n_old"))
      val moved = olds
        .join(ins, Seq("cell"), "full_outer")
        .join(outs, Seq("cell"), "full_outer")
        .select(col("cell"),
          coalesce(col("n_old"), lit(0L)).as("n_old"),
          coalesce(col("moved_in"), lit(0L)).as("moved_in"),
          coalesce(col("moved_out"), lit(0L)).as("moved_out"))
        .withColumn("n_new",
          col("n_old") + col("moved_in") - col("moved_out"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .sortBy(_._1)

      val affected = moved.collect {
        case (c, _, in, out, _) if in > 0 || out > 0 => c
      }.toSet
      // The delta write: ONLY affected cells' new content. Unaffected
      // cells keep their committed directories by manifest pointer.
      val manifest: Snapshot.Manifest =
        if (affected.isEmpty) prior
        else {
          val vP = Snapshot.nextVersion(root)
          assigned.where(col("cell_new").isin(affected.toSeq: _*))
            .select(col("vec_id"), col("embedding"),
              col("cell_new").as("cell"), col("cell_new").as("pcell"))
            .write.mode("overwrite").partitionBy("pcell")
            .parquet(Snapshot.versionPath(root, vP))
          val emptied = moved.collect {
            case (c, _, _, _, nNew) if affected(c) && nNew == 0L => c
          }
          prior --
            emptied.map(c => s"cell$c") ++
            moved.collect { case (c, _, _, _, nNew)
              if affected(c) && nNew > 0L => s"cell$c" -> s"$vP/pcell=$c" }
        }
      val vC = Snapshot.nextVersion(root)
      Gen.codebookRows(s, newCb).write.mode("overwrite")
        .parquet(Snapshot.versionPath(root, vC))
      if (abortBeforeCommit) throw new IllegalStateException(
        "injected crash before the generation swap")
      Snapshot.commit(root, manifest + ("codebook" -> vC))

      // Report: movement accounting + the centroid shift, in exact
      // micro-units² (both codebooks micro-rounded — deterministic).
      val shifts = frozen.indices.map { c =>
        val d = frozen(c).zip(newCb(c)).map { case (a, b) =>
          val da = math.rint(a.toDouble * 1e6).toLong -
            math.rint(b.toDouble * 1e6).toLong
          da * da
        }.sum
        (c, d)
      }.toMap
      val byCell = moved.map(m => m._1 -> m).toMap
      import s.implicits._
      frozen.indices.map { c =>
        val (_, nOld, in, out, nNew) =
          byCell.getOrElse(c, (c, 0L, 0L, 0L, 0L))
        (c, nOld, nNew, in, out, shifts(c))
      }.toDF("cell", "n_old", "n_new", "moved_in", "moved_out",
        "shift_sq_micro2")
        .orderBy(col("cell"))
    } finally assigned.unpersist()
  }

  /** Run-once latch for the maintained stats the refit reads: the
    * replay is [[StreamVecIndex.maintain]] verbatim (same state root as
    * the q_stream_vec_index row — the monoid table's content is a pure
    * function of the corpus, so sharing is safe whichever row folds
    * it first). */
  private val maintained = new graft.Memo[(SparkSession, String), Unit]

  private[graft] def ensureMaintained(s: SparkSession, dir: String): String = {
    val state = StreamVecIndex.VecStage.stateDir(dir)
    maintained((s, dir))(StreamVecIndex.maintain(s, dir, state))
    state
  }

  /** q_vec_index_refit (T) — bootstrap generation 0 under the shipped
    * frozen codebook, refit from the maintained statistics, report the
    * per-cell movement + centroid shift. The generation root resets per
    * invocation so every rep refits the SAME generation (the report is
    * a pure function of the corpus; without the reset rep 2 would refit
    * the already-refit index). Runs a streaming replay inside (the
    * stats fold), so Bench treats it as conf-scoped/sequential-only. */
  val qVecIndexRefit: Q = Q(
    "q_vec_index_refit",
    (s, dir) => {
      val state = ensureMaintained(s, dir)
      val root = StreamVecIndex.VecStage.stateDir(dir, "gen")
      Snapshot.deleteRecursively(root)
      val cb = graft.operators.AnnIvf.Models(s, dir,
        StreamVecIndex.K, StreamVecIndex.Iters)
      Gen.bootstrap(s,
        Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
        root, cb)
      refit(s, state, root)
    })

  val all: Vector[Q] = Vector(qVecIndexRefit)
}
