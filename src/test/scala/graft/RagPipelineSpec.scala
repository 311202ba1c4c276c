package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnnIvf, RagPipeline, TextQueries, VectorQueries}

/** The composed retrieval (RAG) contract: every stage equals its
  * standalone row's code path, the end-to-end shortlist keeps a recall
  * floor vs the exact brute force, and MMR visibly diversifies across
  * documents where plain top-k returns siblings of one document. */
class RagPipelineSpec extends AnyFunSuite with SparkFixture {

  private def cb = AnnIvf.Models(spark, sfDir, k = 8, iters = 3)

  private def probeVec: Array[Float] = Tables.embeddings(spark, sfDir)
    .where(col("vec_id") === 0L)
    .select(col("embedding")).head().getSeq[Float](0).toArray

  /** Exact micro-sim, the spec's independent reference. */
  private def simMicro(a: Array[Float], b: Array[Float]): Long = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    math.floor(s * 1e6).toLong
  }

  test("stage 1+2: the retrieval corpus is exactly q_text_chunk ⋈ " +
      "embeddings on the q_multimodal_join key") {
    val corpus = RagPipeline.chunkCorpus(spark, sfDir)
      .select(col("doc_id"), col("chunk_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Catalog.byName("q_text_chunk").build(spark, sfDir)
      .join(Tables.embeddings(spark, sfDir),
        col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("chunk_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(corpus == expected)
    assert(corpus.nonEmpty)
  }

  test("chunk encoder: every chunk stays within ChunkEps of its " +
      "document anchor, siblings separate, and the encoder is " +
      "deterministic") {
    val docVecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .toMap
    def corpus() = RagPipeline.chunkCorpus(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray))
    val chunks = corpus()
    assert(chunks.nonEmpty)
    // Anchor bound: |v_chunk − v_doc|∞ ≤ ε (+ the 1e-6 rounding grain)
    // — what keeps the doc-trained codebook's cell routing meaningful.
    chunks.foreach { case (doc, cid, v) =>
      val dv = docVecs(doc)
      val linf = v.zip(dv).map { case (a, b) =>
        math.abs(a.toDouble - b) }.max
      assert(linf <= RagPipeline.ChunkEps + 1e-6 + 1e-9,
        s"chunk ($doc, $cid) drifted $linf from its anchor")
    }
    // Sibling separation — the tie the doc-vector bootstrap could not
    // break. Overlapping windows make sibling texts differ, so their
    // pooled refinements should too; a rare hash coincidence is
    // tolerated by the majority bound.
    val multi = chunks.groupBy(_._1).filter(_._2.length >= 2)
    assert(multi.nonEmpty, "fixture premise: some doc must multi-chunk")
    val separated = multi.count { case (_, cs) =>
      cs.map(_._3.toSeq).distinct.size >= 2
    }
    assert(separated * 2 > multi.size,
      s"only $separated/${multi.size} multi-chunk docs have distinct " +
        "sibling vectors — the encoder is not separating")
    // Determinism: a second evaluation is bit-identical.
    assert(chunks.map(c => (c._1, c._2, c._3.toSeq)).toSeq ==
      corpus().map(c => (c._1, c._2, c._3.toSeq)).toSeq)
  }

  test("stage 3+4: every shortlist member lies in a probed cell and " +
      "its rel_micro is the exact dot product") {
    val cells = AnnIvf.probeCells(cb, probeVec, RagPipeline.Nprobe).toSet
    val short = RagPipeline.shortlist(spark, sfDir)
    assert(short.size == RagPipeline.ShortlistK)
    val p = probeVec
    short.foreach { case (cid, rel, v) =>
      assert(rel == simMicro(v, p), s"cid $cid rel_micro mismatch")
      assert(cid / 1000000L != 0L, "the query document must be excluded")
    }
    // Re-derive each member's cell assignment independently: nearest
    // centroid by L2 (the AnnIvf.assign cost, computed by hand here).
    short.foreach { case (cid, _, v) =>
      val cell = cb.zipWithIndex.minBy { case (c, j) =>
        (c.zip(v).map { case (a, b) =>
          (a.toDouble - b) * (a.toDouble - b) }.sum, j)
      }._2
      assert(cells.contains(cell),
        s"shortlist member $cid sits in unprobed cell $cell")
    }
    // The shortlist order is (rel desc, cid) — the re-rank contract.
    assert(short.sortBy { case (cid, rel, _) => (-rel, cid) } == short)
  }

  test("stage 5: the row's selection equals an independent MMR greedy " +
      "over the same shortlist") {
    val short = RagPipeline.shortlist(spark, sfDir)
    // Independent greedy (the MmrSpec reference, re-stated here).
    val vecs = short.map(t => t._1 -> t._3).toMap
    var selected = Vector.empty[(Long, Long, Long)]
    var remaining = short.toVector
    while (selected.size < RagPipeline.SelectK && remaining.nonEmpty) {
      val best = remaining.map { case (id, rel, v) =>
        val maxSim = if (selected.isEmpty) 0L
          else selected.map(s0 => simMicro(v, vecs(s0._1))).max
        (id, rel, 7L * rel - 3L * maxSim)
      }.minBy { case (id, _, mmr) => (-mmr, id) }
      selected :+= best
      remaining = remaining.filterNot(_._1 == best._1)
    }
    val got = Catalog.byName("q_pipeline_rag").build(spark, sfDir)
      .collect().map(r =>
        (r.getLong(1) * 1000000L + r.getLong(2), r.getLong(3), r.getLong(4)))
      .toVector
    assert(got == selected,
      "the catalog row must equal the independent greedy")
  }

  test("end-to-end: shortlist recall vs the exact brute force, and MMR " +
      "diversifies across documents") {
    val short = RagPipeline.shortlist(spark, sfDir)
    val shortIds = short.map(_._1).toSet
    // Exact brute force over the FULL chunk corpus (no cell pruning).
    val p = probeVec
    val exact = RagPipeline.chunkCorpus(spark, sfDir)
      .where(col("doc_id") =!= 0L)
      .withColumn("_p", typedLit(p.toSeq))
      .select((col("doc_id") * 1000000L + col("chunk_id")).as("cid"),
        expr("CAST(floor(vec_dot(embedding, _p) * 1000000) AS BIGINT)")
          .as("rel_micro"))
      .orderBy(col("rel_micro").desc, col("cid"))
      .limit(RagPipeline.SelectK)
      .collect().map(_.getLong(0)).toVector
    val hits = exact.count(shortIds)
    info(s"shortlist recall@${RagPipeline.SelectK}: $hits/${exact.size}")
    assert(hits >= 3,
      s"IVF shortlist must keep >= 3/5 of the exact top-5, got $hits")

    // Diversity: sibling chunks carry identical vectors, so plain top-5
    // of the shortlist repeats documents; MMR must spread across 5
    // distinct documents.
    val plainDocs = short.take(RagPipeline.SelectK)
      .map(_._1 / 1000000L).distinct.size
    val mmrDocs = Catalog.byName("q_pipeline_rag").build(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0)).distinct.length
    info(s"distinct docs: plain top-5 $plainDocs, MMR $mmrDocs")
    assert(mmrDocs == RagPipeline.SelectK,
      "MMR must select 5 distinct documents")
    assert(mmrDocs >= plainDocs,
      "MMR diversity must not be worse than plain top-k")
  }

  test("determinism: two runs of the catalog row are identical") {
    def run() = Catalog.byName("q_pipeline_rag").build(spark, sfDir)
      .collect().map(_.toSeq).toVector
    assert(run() == run())
  }
}
