package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q_pipeline_rag — the COMPOSED RETRIEVAL pipeline (r11 verdict ask
  * #4): chunk → chunk-level embedding join → IVF shortlist → exact
  * re-rank → MMR diversification, end to end, the way
  * q_pipeline_funnel composes the corpus gates. Composition rows have
  * repeatedly caught drift the standalone rows cannot, so every stage
  * here IS the standalone row's code path, not a re-implementation:
  *
  *  1. CHUNK — [[TextQueries.chunkStage]], the exact q_text_chunk
  *     stage (window 32 / stride 24).
  *  2. EMBED JOIN — chunks inherit their document's vector over the
  *     q_multimodal_join key (doc_id = vec_id, inner: only embedded
  *     docs retrieve). Doc-level vectors standing in for chunk-level
  *     ones is the standard bootstrap before a chunk encoder ships;
  *     the plumbing (keys, schema, pruning) is what this row pins.
  *  3. IVF SHORTLIST — [[AnnIvf.assign]] under the frozen codebook
  *     ([[AnnIvf.Models]], the same model every IVF row searches), cell
  *     routing via [[AnnIvf.probeCells]] (nprobe = 3) — candidates are
  *     PRUNED BY CELL before any pairwise math, the 100 TB shape.
  *  4. EXACT RE-RANK — codegen'd `vec_dot` micro-sims over the probed
  *     cells only; top-20 shortlist (the PQ re-rank / q_vec_mmr rule:
  *     only the bounded shortlist collects, 20×64 floats of model-sized
  *     state).
  *  5. MMR — [[VectorQueries.mmrSelect]], the exact q_vec_mmr greedy
  *     (λ = 0.7 in deci-units, exact Long), picking 5 diverse results.
  *     Because sibling chunks carry identical vectors (stage 2), MMR
  *     visibly earns its keep here: after one chunk of a document is
  *     selected, its siblings score sim ≈ 10⁶ and are maximally
  *     penalized — plain top-5 returns one document 5 times, MMR
  *     returns 5 documents (RagPipelineSpec pins exactly that).
  *
  * The query is vec_id 0's vector (the probe every vector row uses);
  * the query document's own chunks are excluded, as the kNN rows
  * exclude the probe row.
  *
  * Chunk identity through the greedy: cid = doc_id·10⁶ + chunk_id (an
  * opaque Long for [[VectorQueries.mmrSelect]]; safe for documents
  * under 24M tokens — fixture docs are ≤ ~200).
  *
  * T-row: IVF training + the greedy chain are un-SQL-able;
  * RagPipelineSpec pins each stage against its standalone row and an
  * end-to-end shortlist-recall floor vs the exact brute force. */
object RagPipeline {

  val Nprobe = 3
  val ShortlistK = 20
  val SelectK = 5

  /** Stages 1+2: the chunk-level retrieval corpus. */
  def chunkCorpus(s: SparkSession, dir: String): DataFrame =
    TextQueries.chunkStage(s, dir)
      .join(Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
        col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("chunk_id"), col("embedding"))

  /** Stages 3+4 as a PLAN (cell-pruned candidates, exactly re-ranked,
    * top-`ShortlistK`) — factored from the collect so PlanAuditSpec can
    * pin the cell-pruning filter and join shapes. */
  def shortlistFrame(s: SparkSession, dir: String): DataFrame = {
    val cb = AnnIvf.Models(s, dir, k = 8, iters = 3)
    val probeVec = Tables.embeddings(s, dir)
      .where(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val cells = AnnIvf.probeCells(cb, probeVec, Nprobe)
    AnnIvf.assign(chunkCorpus(s, dir), cb)
      .where(col("cell").isin(cells: _*) && col("doc_id") =!= 0L)
      .withColumn("_p", typedLit(probeVec.toSeq))
      .select((col("doc_id") * 1000000L + col("chunk_id")).as("cid"),
        expr("CAST(floor(vec_dot(embedding, _p) * 1000000) AS BIGINT)")
          .as("rel_micro"),
        col("embedding"))
      .orderBy(col("rel_micro").desc, col("cid"))
      .limit(ShortlistK)
  }

  /** The bounded top-`ShortlistK` collected as (cid, rel_micro,
    * vector) — 20×64 floats of model-sized state (the q_vec_mmr rule).
    */
  def shortlist(s: SparkSession, dir: String)
      : IndexedSeq[(Long, Long, Array[Float])] =
    shortlistFrame(s, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray))
      .toIndexedSeq

  val qPipelineRag: Q = Q(
    "q_pipeline_rag",
    (s, dir) => {
      import s.implicits._
      VectorQueries.mmrSelect(shortlist(s, dir), SelectK).zipWithIndex
        .map { case ((cid, rel, mmr), i) =>
          (i + 1L, cid / 1000000L, cid % 1000000L, rel, mmr)
        }
        .toDF("rank", "doc_id", "chunk_id", "rel_micro", "mmr_deci_micro")
    })

  val all: Vector[Q] = Vector(qPipelineRag)
}
