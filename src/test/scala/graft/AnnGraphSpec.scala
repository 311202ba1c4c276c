package graft

import graft.operators.{AnnGraph, AnnIvf}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Graph-based ANN (AnnGraph): degree-bounded deterministic build,
  * beam-search recall against the exact answer, and the sub-linear
  * GROWTH of search cost — the claim that matters at scale (a 500-row
  * corpus saturates; the visited fraction must FALL as n grows). */
class AnnGraphSpec extends AnyFunSuite with SparkFixture {

  private def embAt(dir: String) = Tables.embeddings(spark, dir)
    .select(col("vec_id"), col("embedding"))
  private def emb = embAt(sfDir)

  private lazy val centroids = AnnIvf.Models(spark, sfDir, k = 8, iters = 3)
  private lazy val index = AnnGraph.Graphs(spark, sfDir)
  private lazy val n = emb.count()

  /** Exact micro-sim top-k by brute force — the recall ground truth,
    * computed with the same quantization the graph ranks by. */
  private def exactTopK(df: org.apache.spark.sql.DataFrame,
      probeId: Long, k: Int): Seq[Long] = {
    val p = df.where(col("vec_id") === probeId)
      .select(col("embedding")).head().getSeq[Float](0)
    df.where(col("vec_id") =!= probeId)
      .withColumn("_p", typedLit(p))
      .select(col("vec_id"),
        expr("CAST(round(vec_dot(embedding, _p) * 1e6) AS BIGINT)").as("ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, ms) => (-ms, id) }.take(k).map(_._1).toSeq
  }

  test("graph is degree-bounded with every node present") {
    val deg = index.adjacency.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .agg(min(col("d")), max(col("d")), count(lit(1))).head()
    assert(deg.getLong(1) <= 16, "out-degree must stay within the bound")
    assert(deg.getLong(2) == n, "every vector must have out-edges")
    assert(deg.getLong(0) >= 1)
  }

  test("build is bit-deterministic under different partitionings") {
    def edges(parts: Int) =
      AnnGraph.buildGraph(emb.repartition(parts), degree = 8,
          centroids, descentRounds = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(edges(7) == edges(3),
      "edge set drifted across partitionings — micro-sim ranking broken")
  }

  test("NN-Descent round only improves neighbor quality") {
    // Refinement re-ranks a SUPERSET of each node's candidates, so the
    // per-node best retained similarity can never get worse.
    def bestPerNode(rounds: Int): Map[Long, Long] =
      AnnGraph.buildGraph(emb, degree = 8, centroids, rounds)
        .groupBy(col("src")).agg(max(col("msim")).as("m"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = bestPerNode(0)
    val after = bestPerNode(1)
    assert(before.keySet == after.keySet)
    assert(before.forall { case (k, v) => after(k) >= v },
      "descent round degraded a node's best neighbor")
  }

  test("per-cell entries are one medoid per coarse cell") {
    val entries = index.entries
    assert(entries.nonEmpty && entries.size <= 8)
    assert(entries == entries.distinct && entries == entries.sorted)
  }

  test("beam search recalls most of the exact top-5 for the catalog probe") {
    val res = AnnGraph.search(emb, index, probeId = 0L,
      beam = 48, maxHops = 24, topK = 5)
    val exact = exactTopK(emb, 0L, 5)
    val got = res.topK.map(_._1)
    val recall = got.count(exact.contains) / 5.0
    // The fixture vectors are near-random (same-label mean cosine ≈ 0,
    // measured) — the hardest regime for graph navigation; with the
    // entries + self-adjacency seeding the measured recall is 1.0 here
    // and ≥ 0.95 averaged over 100 probes, so 0.8 leaves slack only
    // for fixture regeneration, not for regressions.
    assert(recall >= 0.8, s"recall@5 $recall: got $got, exact $exact")
    assert(res.hops <= 20)
  }

  test("mean recall@5 across 20 probes clears 0.85") {
    val probes = emb.select(col("vec_id")).orderBy(col("vec_id"))
      .limit(20).collect().map(_.getLong(0)).toSeq
    var hit = 0
    probes.foreach { p =>
      val res = AnnGraph.search(emb, index, p, beam = 48, maxHops = 24, topK = 5)
      hit += res.topK.map(_._1).count(exactTopK(emb, p, 5).contains)
    }
    val recall = hit.toDouble / (5 * probes.size)
    assert(recall >= 0.85, s"mean recall@5 $recall over ${probes.size} probes")
  }

  test("search cost grows sub-linearly: visited fraction falls from " +
    "n=500 to n=2000") {
    // THE scale claim. At n=500 the beam frontier is a large fraction
    // of the corpus (saturation); the traversal touches
    // O(hops·beam·degree) vectors — roughly constant in n — so 4× the
    // data must yield a clearly smaller visited FRACTION, not 4× the
    // visits. (ScaleSpec's growth-exponent discipline applied to
    // search cost.)
    val big = "/root/testdata/sf0.1"
    val embBig = embAt(big)
    val nBig = embBig.count()
    assert(nBig >= 4 * n, s"fixture premise: sf0.1 has $nBig vs $n")
    val idxBig = AnnGraph.Graphs(spark, big)
    def meanVisited(df: org.apache.spark.sql.DataFrame,
        idx: AnnGraph.GraphIndex, probes: Seq[Long]): Double =
      probes.map(p =>
        AnnGraph.search(df, idx, p, beam = 48, maxHops = 24, topK = 5)
          .visited).sum.toDouble / probes.size
    val probes = Seq(0L, 7L, 42L, 99L, 123L)
    val fracSmall = meanVisited(emb, index, probes) / n
    val fracBig = meanVisited(embBig, idxBig, probes) / nBig
    assert(fracBig < fracSmall * 0.75,
      s"visited fraction did not fall: $fracSmall @ n=$n vs $fracBig @ n=$nBig")
  }

  test("search is deterministic run-to-run") {
    val a = AnnGraph.search(emb, index, 0L, beam = 48, maxHops = 24, topK = 5)
    val b = AnnGraph.search(emb, index, 0L, beam = 48, maxHops = 24, topK = 5)
    assert(a == b)
  }

  test("catalog row mirrors the searcher's own answer") {
    val rows = Catalog.byName("q_vec_knn_graph").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows.length == 5)
    val res = AnnGraph.search(emb, index, 0L, beam = 48, maxHops = 24, topK = 5)
    assert(rows == res.topK.map { case (id, ms) => (id, ms / 1e6) })
  }
  test("batch search equals the single-probe path probe-by-probe") {
    val probes = emb.select(col("vec_id")).orderBy(col("vec_id"))
      .limit(8).collect().map(_.getLong(0)).toSeq
    val batch = AnnGraph.searchBatch(emb, index, probes,
      beam = 48, maxHops = 24, topK = 5)
    probes.foreach { p =>
      val single = AnnGraph.search(emb, index, p,
        beam = 48, maxHops = 24, topK = 5)
      assert(batch(p) == single,
        s"probe $p: batch ${batch(p)} != single $single")
    }
  }

  test("batch job count grows with hops, not hops x probes") {
    val probes = emb.select(col("vec_id")).orderBy(col("vec_id"))
      .limit(8).collect().map(_.getLong(0)).toSeq
    val sc = spark.sparkContext
    def jobsFor(group: String)(body: => Unit): Int = {
      sc.setJobGroup(group, group, interruptOnCancel = false)
      try body finally sc.clearJobGroup()
      sc.statusTracker.getJobIdsForGroup(group).length
    }
    // Warm the index + codegen caches outside the measured regions.
    AnnGraph.searchBatch(emb, index, probes.take(1), 48, 24, 5)
    AnnGraph.search(emb, index, probes.head, 48, 24, 5)
    val j1 = jobsFor("ann_batch_1")(
      AnnGraph.searchBatch(emb, index, probes.take(1), 48, 24, 5))
    var r8: Map[Long, AnnGraph.SearchResult] = Map.empty
    val j8 = jobsFor("ann_batch_8") {
      r8 = AnnGraph.searchBatch(emb, index, probes, 48, 24, 5)
    }
    val jSingles = jobsFor("ann_singles")(
      probes.foreach(p => AnnGraph.search(emb, index, p, 48, 24, 5)))
    // THE amortization claim: 8 probes through the batch path must cost
    // well under the per-probe loop's jobs (per-probe scaling would
    // read j8 ~ 8*j1 ~ jSingles), and ~the 1-probe batch's jobs up to
    // the extra rounds slower probes add. Exact per-job accounting is
    // AQE-/host-sensitive, so the gates are comparative with WIDE
    // margin vs the failure mode they exclude: measured here j1~13,
    // j8~28, jSingles~90; per-probe scaling would put j8 at ~100.
    assert(j8 <= jSingles * 3 / 5,
      s"batch jobs $j8 vs per-probe loop $jSingles — amortization broken")
    assert(j8 <= 4 * j1 + 8,
      s"batch jobs $j8 scale with probe count (1-probe batch: $j1)")
    assert(r8.size == 8)
  }

  test("batch traversal terminates well under the hop cap at sf0.1") {
    // The batch row's wall-clock is rounds x the driver-round floor, so
    // a regression that keeps beams churning to the 24-hop cap would
    // double its cost silently — pin termination with headroom and
    // record the measured depth.
    val big = "/root/testdata/sf0.1"
    val embBig = embAt(big)
    val idxBig = AnnGraph.Graphs(spark, big)
    val probes = embBig.select(col("vec_id")).orderBy(col("vec_id"))
      .limit(16).collect().map(_.getLong(0)).toSeq
    val res = AnnGraph.searchBatch(embBig, idxBig, probes, 48, 24, 5)
    val hops = res.values.map(_.hops)
    info(s"sf0.1 batch hops: min=${hops.min} max=${hops.max} " +
      s"mean=${hops.sum.toDouble / hops.size}")
    assert(hops.max < 20, s"max hops ${hops.max} too close to the cap")
  }

  test("batch catalog row mirrors searchBatch for the first 16 probes") {
    val rows = Catalog.byName("q_vec_knn_graph_batch").build(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val probes = emb.select(col("vec_id")).orderBy(col("vec_id"))
      .limit(16).collect().map(_.getLong(0)).toSeq
    val res = AnnGraph.searchBatch(emb, index, probes, 48, 24, 5)
    val expect = res.toSeq.sortBy(_._1).flatMap { case (p, r) =>
      r.topK.zipWithIndex.map { case ((id, ms), i) =>
        (p, (i + 1).toLong, id, ms / 1e6)
      }
    }
    assert(rows == expect)
    assert(rows.size == 16 * 5)
  }

  test("missing probe and single-vector corpus fail loudly") {
    val e = intercept[IllegalArgumentException](
      AnnGraph.search(emb, index, -999L, beam = 48, maxHops = 24, topK = 5))
    assert(e.getMessage.contains("-999"))
    // Single-vector corpus: entries and the probe's own row filter to
    // nothing and the min-id fallback reads a NULL — must name the
    // situation, not NPE.
    import spark.implicits._
    val lone = emb.where(col("vec_id") === 0L)
    val emptyIdx = AnnGraph.GraphIndex(
      Seq.empty[(Long, Long, Long)].toDF("src", "dst", "msim"), Seq())
    val e2 = intercept[IllegalArgumentException](
      AnnGraph.search(lone, emptyIdx, 0L, beam = 48, maxHops = 24, topK = 5))
    assert(e2.getMessage.contains("nothing to search"))
    val e3 = intercept[IllegalArgumentException](
      AnnGraph.searchBatch(lone, emptyIdx, Seq(0L),
        beam = 48, maxHops = 24, topK = 5))
    assert(e3.getMessage.contains("nothing to search"))
  }

  test("a foreign index fails loudly instead of scoring silently-wrong " +
      "neighbors") {
    // Scoring reads the index's own vector copy, so a mismatched
    // (corpus, index) pairing would no longer surface as an empty join
    // — the identity guard must catch it: probe 0 exists in BOTH
    // fixtures but with different vectors.
    val foreign = AnnGraph.Graphs(spark, "/root/testdata/sf0.1")
    val e = intercept[IllegalArgumentException](
      AnnGraph.search(emb, foreign, 0L, beam = 48, maxHops = 24, topK = 5))
    assert(e.getMessage.contains("does not belong"))
    val e2 = intercept[IllegalArgumentException](
      AnnGraph.searchBatch(emb, foreign, Seq(0L),
        beam = 48, maxHops = 24, topK = 5))
    assert(e2.getMessage.contains("does not belong"))
  }

  test("batch seed fallback matches the single-probe path on an empty " +
      "index") {
    // A probe with no entries and no adjacency seeds from the corpus
    // min id, identically in both paths — the per-probe parity
    // contract includes the degenerate index case.
    import spark.implicits._
    val two = emb.where(col("vec_id") <= 1L)
    val emptyIdx = AnnGraph.GraphIndex(
      Seq.empty[(Long, Long, Long)].toDF("src", "dst", "msim"), Seq())
    val single = AnnGraph.search(two, emptyIdx, 0L,
      beam = 48, maxHops = 24, topK = 5)
    val batch = AnnGraph.searchBatch(two, emptyIdx, Seq(0L),
      beam = 48, maxHops = 24, topK = 5)
    assert(batch(0L) == single)
  }
}
