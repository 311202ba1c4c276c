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
  *  2. CHUNK ENCODE — chunks get CHUNK-LEVEL vectors (r12 verdict ask
  *     #5, replacing the doc-vector bootstrap): the document vector as
  *     the semantic anchor (joined over the q_multimodal_join key,
  *     inner: only embedded docs retrieve) plus a deterministic
  *     chunk-term refinement — the q_vec_feature_hash ±1 projection
  *     pooled over the chunk's tokens, scaled by [[ChunkEps]] and
  *     token-normalized, micro-rounded so the encoder is exact and
  *     partitioning-invariant. Chunks stay within ε of their document
  *     (cell routing against the doc-trained codebook remains
  *     meaningful) while siblings with different text get DISTINCT
  *     vectors — relevance separates them where the bootstrap tied.
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
  *     Sibling chunks sit within 2ε of each other (stage 2), so after
  *     one chunk of a document is selected its siblings still score
  *     near-self sim and are maximally penalized — plain top-5 leans
  *     on few documents, MMR spreads across 5 (RagPipelineSpec pins
  *     exactly that, plus the sibling-tie-breaking the encoder adds).
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

  /** Refinement scale: chunk vectors stay within this L∞ distance of
    * their document anchor, so the doc-trained IVF codebook still
    * routes them correctly while sibling relevance ties break. */
  val ChunkEps = 0.05

  /** Stages 1+2: the chunk-level retrieval corpus — q_text_chunk's
    * stage joined to the document anchor vector, refined per chunk by
    * the feature-hash ±1 projection pooled over the chunk's tokens:
    *
    *   v_chunk[d] = round₆( v_doc[d] + ε · (Σ_tok ±1[bucket(tok)=d]) / n_tok )
    *
    * with bucket/sign derived from md5 of the TOKEN (the
    * q_vec_feature_hash portability device — no engine-specific hash),
    * the pooled counts exact integers, and one final micro-round so
    * the encoder is a deterministic pure function of (doc vector,
    * chunk text) on any partitioning. Scale: one token explode + two
    * keyed partial aggs + a map-assembled zip_with — the feature-hash
    * row's shape; nothing collects, nothing broadcasts. */
  def chunkCorpus(s: SparkSession, dir: String): DataFrame = {
    val chunks = TextQueries.chunkStage(s, dir)
      .join(Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
        col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("chunk_id"), col("n_chunk_tokens"),
        col("chunk_text"), col("embedding"))
    val toks = chunks
      .select(col("doc_id"), col("chunk_id"),
        explode(split(col("chunk_text"), " ")).as("tok"))
      .withColumn("h", md5(concat(lit("ce-v1:"), col("tok"))))
      .select(col("doc_id"), col("chunk_id"),
        ((ascii(substring(col("h"), 1, 1)) % 8) * 8 +
          ascii(substring(col("h"), 2, 1)) % 8).cast("int").as("bucket"),
        when(ascii(substring(col("h"), 3, 1)) % 2 === 0, 1L)
          .otherwise(-1L).as("sq"))
    val ref = toks
      .groupBy(col("doc_id"), col("chunk_id"), col("bucket"))
      .agg(sum(col("sq")).as("r"))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(map_from_entries(
        collect_list(struct(col("bucket"), col("r")))).as("rm"))
    chunks.join(ref, Seq("doc_id", "chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        zip_with(
          col("embedding"),
          transform(sequence(lit(0), size(col("embedding")) - 1),
            d => coalesce(element_at(col("rm"), d.cast("int")), lit(0L))),
          (e, r) => round(
            e.cast("double") +
              lit(ChunkEps) * r.cast("double") / col("n_chunk_tokens"),
            6).cast("float"))
          .as("embedding"))
  }

  /** The encoded chunk-vector table, built once per (session, dir) and
    * persisted — at 100 TB this IS a written intermediate (encode once,
    * store columnar, every retrieval scans it); locally the
    * MEMORY_AND_DISK analog, the Shingled rule. Materializing it also
    * keeps the retrieval plan honest: the IVF cell filter sits as a
    * Filter over the cached corpus instead of being folded into the
    * encoder's join chain (PlanAuditSpec pins that shape). */
  object ChunkVectors {
    private val cache = new graft.Memo[(SparkSession, String), DataFrame]

    def apply(s: SparkSession, dir: String): DataFrame =
      cache((s, dir)) {
        chunkCorpus(s, dir)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
  }

  /** Stages 3+4 as a PLAN (cell-pruned candidates, exactly re-ranked,
    * top-`ShortlistK`) — factored from the collect so PlanAuditSpec can
    * pin the cell-pruning filter and join shapes. */
  def shortlistFrame(s: SparkSession, dir: String): DataFrame = {
    val cb = AnnIvf.Models(s, dir, k = 8, iters = 3)
    val probeVec = Tables.embeddings(s, dir)
      .where(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val cells = AnnIvf.probeCells(cb, probeVec, Nprobe)
    AnnIvf.assign(ChunkVectors(s, dir), cb)
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
