package graft

import graft.operators.{AnnGraph, AnnIvf, DedupQueries, GraphQueries}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measured scale exponents for the GRAPH family and the ANN index
  * builds — the ScaleSpec discipline (synthetic deterministic corpora
  * at 4×-apart sizes, volume counts as the scale signal, exponent
  * gates, one negative control) extended past the dedup family, so the
  * pagerank/components/NN-Descent/IVF posture is measured, not
  * asserted (r10 verdict Missing #3). All counts exercise the SHIPPED
  * stages: `Components.largeStar`/`smallStar`,
  * `GraphQueries.pagerankConvergedEdges`, `AnnGraph.buildGraph` +
  * `descentCandidates`, `AnnIvf.train`/`assign`. */
class GraphScaleSpec extends AnyFunSuite with SparkFixture {

  private val sizes = Seq(2000L, 8000L, 32000L)
  private val maxExponent = 1.35

  private def exponent(n1: Long, c1: Long, n2: Long, c2: Long): Double =
    math.log(c2.toDouble / c1) / math.log(n2.toDouble / n1)

  /** Chain graph: paths of 8 nodes each (u → u+1 within each block of
    * 8) — n/8 components, deterministic, the shape star contraction
    * exists to flatten. */
  private def chainEdges(n: Long): DataFrame =
    spark.range(n).where(col("id") % 8 =!= 7)
      .select(col("id").as("u"), (col("id") + 1).as("v"))

  /** Bounded-degree random-ish digraph: 4 xxhash-derived out-edges per
    * node — |E| = 4n exactly, the linear-input premise for the
    * pagerank round-volume claim. */
  private def degree4Edges(n: Long): DataFrame =
    spark.range(n)
      .select(col("id").as("src"),
        explode(expr("sequence(0, 3)")).as("j"))
      .select(col("src"),
        pmod(xxhash64(col("src"), col("j")), lit(n)).as("dst"))
      .where(col("src") =!= col("dst"))

  /** ScaleSpec's deterministic synthetic embeddings (64-dim xxhash
    * values in [-1, 1]), sans plants — ANN volume claims here are
    * about candidate growth, not recall. */
  private def syntheticEmbeddings(n: Long): DataFrame =
    spark.range(n).select(col("id").as("vec_id"), expr(
      """transform(sequence(0, 63), d -> CAST(
        |  (pmod(xxhash64(id, d), 2001) - 1000) / 1000.0 AS FLOAT))"""
        .stripMargin).as("embedding"))

  /** Run the shipped star phases to the same fixpoint star() uses,
    * recording every interim edge-set size. */
  private def starVolumes(pairs: DataFrame): Seq[Long] = {
    var edges = pairs.select(col("u"), col("v"))
      .where(col("u") =!= col("v")).distinct().localCheckpoint(true)
    val vols = scala.collection.mutable.ArrayBuffer(edges.count())
    var stable = false
    var iter = 0
    while (!stable && iter < 50) {
      val ls = DedupQueries.Components.largeStar(edges).localCheckpoint(true)
      vols += ls.count()
      val next = DedupQueries.Components.smallStar(ls).localCheckpoint(true)
      vols += next.count()
      stable = vols.last == vols(vols.size - 3) &&
        next.join(edges, Seq("u", "v"), "left_anti").isEmpty
      edges = next
      iter += 1
    }
    assert(stable, s"star phases did not converge in $iter rounds")
    vols.toSeq
  }

  test("components: star-contraction interim edge volume grows ~linearly",
      ScaleStress) {
    // The O(log n)-round claim is only safe at 100 TB if no ROUND's
    // edge set blows up in between — the gate is on the MAX interim
    // volume, not just the fixpoint.
    val measured = sizes.map { n =>
      val vols = starVolumes(chainEdges(n))
      (n, vols.max, vols.size)
    }
    info("components: " + measured.map { case (n, v, r) =>
      s"n=$n maxEdges=$v rounds=$r" }.mkString(", "))
    measured.sliding(2).foreach { case Seq((n1, c1, _), (n2, c2, _)) =>
      val e = exponent(n1, c1, n2, c2)
      assert(e <= maxExponent,
        f"components interim volume exponent $e%.2f exceeds $maxExponent")
    }
  }

  test("pagerank: rounds-to-convergence stay ~constant in n, so total " +
      "round volume is ~linear", ScaleStress) {
    // Per round the shuffle carries |E| contribution rows; the scale
    // risk is ROUNDS growing with n. Damping contracts geometrically,
    // so rounds must be ~flat — measured, with total volume
    // (rounds·|E|) gated like every other family.
    val measured = sizes.take(2).map { n =>
      val e = degree4Edges(n).localCheckpoint(true)
      val edgeCount = e.count()
      val (_, rounds) = GraphQueries.pagerankConvergedEdges(
        spark, e, tolMicro = 20000L, maxRounds = 50)
      (n, edgeCount, rounds)
    }
    info("pagerank: " + measured.map { case (n, ec, r) =>
      s"n=$n |E|=$ec rounds=$r" }.mkString(", "))
    val Seq((n1, e1, r1), (n2, e2, r2)) = measured
    assert(r2 <= r1 + 3,
      s"rounds grew with n: $r1 @ $n1 vs $r2 @ $n2 — geometric " +
        "convergence broken")
    val e = exponent(n1, e1 * r1, n2, e2 * r2)
    assert(e <= maxExponent,
      f"pagerank total round volume exponent $e%.2f exceeds $maxExponent")
  }

  test("NN-Descent candidate volume grows ~linearly at fixed degree",
      ScaleStress) {
    // candidates ≤ n·degree² — linear in n at fixed degree. Build the
    // IVF-seeded degree-8 graph with the production √n cell rule and
    // count the shipped candidate stage.
    val measured = sizes.take(2).map { n =>
      val emb = syntheticEmbeddings(n).localCheckpoint(true)
      val k = math.max(8, math.sqrt(n.toDouble).toInt)
      val centroids = AnnIvf.train(emb, k, iters = 2)
      val g = AnnGraph.buildGraph(emb, degree = 8, centroids,
        descentRounds = 0).localCheckpoint(true)
      (n, AnnGraph.descentCandidates(g).count())
    }
    info("nn-descent: " + measured.map { case (n, c) =>
      s"n=$n candidates=$c" }.mkString(", "))
    val Seq((n1, c1), (n2, c2)) = measured
    val e = exponent(n1, c1, n2, c2)
    assert(e <= maxExponent,
      f"NN-Descent candidate exponent $e%.2f exceeds $maxExponent")
  }

  test("modularity: community-aggregation output is bounded by " +
      "|communities| — flat at fixed C, with the C = n linear control",
      ScaleStress) {
    // The r11 row's scale claim ("both aggs bounded by |brands|") as a
    // measured curve over the SHIPPED stage (GraphQueries.modularityPer):
    // community-tag a 4-regular synthetic graph, count the per-community
    // output rows. Fixed C = 25 (the brand-like domain) must stay ≤ C at
    // every n (exponent ~0); the C = n tagging is the control proving
    // the measurement responds (output ~n).
    val fixedC = sizes.map(n => (n, perVolumeWith(n, Some(25L))))
    info("modularity fixed-C: " + fixedC.map { case (n, v) =>
      s"n=$n perRows=$v" }.mkString(", "))
    fixedC.foreach { case (n, v) =>
      assert(v <= 25L, s"fixed-C output must stay <= |communities| at n=$n")
    }
    val linear = sizes.take(2).map(n => (n, perVolumeWith(n, None)))
    val le = exponent(linear(0)._1, linear(0)._2, linear(1)._1, linear(1)._2)
    info(f"modularity C=n control: perRows=${linear.map(_._2).mkString(", ")}" +
      f" exponent=$le%.2f")
    assert(le > 0.8,
      f"C = n control should read ~linear, measured $le%.2f — the " +
        "measurement is not responding to community cardinality")
  }

  /** modularityPer output volume with communities = node % C (Some(c))
    * or = node (None — the linear control). */
  private def perVolumeWith(n: Long, c: Option[Long]): Long = {
    def communityOf(node: org.apache.spark.sql.Column) =
      c.map(m => pmod(node, lit(m))).getOrElse(node)
    val e0 = degree4Edges(n)
      .select(col("src").as("u"), col("dst").as("v")).distinct()
      .localCheckpoint(true)
    val e = e0
      .withColumn("cu", communityOf(col("u")))
      .withColumn("cv", communityOf(col("v")))
    val degs = e0.select(col("u").as("node"))
      .union(e0.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .withColumn("community", communityOf(col("node")))
    operators.GraphQueries.modularityPer(e, degs).count()
  }

  test("searchBatch: total traversal volume grows ~linearly in K, and " +
      "batching is K-invariant per probe", ScaleStress) {
    // The r11 job-count gate is a CAP; this is the CURVE (r11 verdict
    // ask #7): a K-probe batch must cost ~K single-probe traversals'
    // volume (each probe adds only its own frontier) — measured as
    // Σ visited over probes at K=4 vs K=16 on one synthetic corpus.
    // The per-probe K-invariance control: the K=4 probes' SearchResults
    // must be bit-identical inside the K=16 batch (batch composition
    // cannot change any probe's traversal).
    val n = 2000L
    val emb = syntheticEmbeddings(n).localCheckpoint(true)
    val k = math.max(8, math.sqrt(n.toDouble).toInt)
    val centroids = AnnIvf.train(emb, k, iters = 2)
    val index = AnnGraph.GraphIndex(
      AnnGraph.buildGraph(emb, degree = 8, centroids, descentRounds = 1)
        .localCheckpoint(true),
      AnnGraph.cellEntries(emb, centroids), None)
    val probes16 = (0L until 16L).toSeq
    val r4 = AnnGraph.searchBatch(emb, index, probes16.take(4),
      beam = 24, maxHops = 12, topK = 5)
    val r16 = AnnGraph.searchBatch(emb, index, probes16,
      beam = 24, maxHops = 12, topK = 5)
    probes16.take(4).foreach { p =>
      assert(r16(p) == r4(p),
        s"probe $p's traversal changed with batch size — batching must " +
          "be K-invariant per probe")
    }
    val v4 = r4.values.map(_.visited.toLong).sum
    val v16 = r16.values.map(_.visited.toLong).sum
    val e = exponent(4L, v4, 16L, v16)
    info(f"searchBatch volume: K=4 visited=$v4, K=16 visited=$v16, " +
      f"exponent(K)=$e%.2f")
    assert(e <= 1.15,
      f"traversal volume exponent in K $e%.2f — batching is inflating " +
        "per-probe work")
    assert(e >= 0.5,
      f"exponent $e%.2f suspiciously low — probes are degenerate, the " +
        "measurement proves nothing")
  }

  test("IVF-seeded pair volume follows the documented n^1.5 under the " +
      "sqrt(n) cell rule; fixed k is the quadratic negative control",
      ScaleStress) {
    // Within-cell pair volume = Σ_cell size² (the exact output count of
    // the seeded self-join) — n^1.5 when k ≈ √n, n²/k at fixed k. Both
    // measured off the SHIPPED train/assign.
    def pairVolume(n: Long, k: Int): Long = {
      val emb = syntheticEmbeddings(n).localCheckpoint(true)
      val centroids = AnnIvf.train(emb, k, iters = 2)
      AnnIvf.assign(emb, centroids)
        .groupBy(col("cell")).agg(count(lit(1)).as("sz"))
        .agg(sum(col("sz") * (col("sz") - 1))).head().getLong(0)
    }
    val ruled = sizes.take(2).map(n =>
      (n, pairVolume(n, math.max(8, math.sqrt(n.toDouble).toInt))))
    val Seq((n1, c1), (n2, c2)) = ruled
    val e = exponent(n1, c1, n2, c2)
    info(f"ivf sqrt-rule: n=$n1 pairs=$c1, n=$n2 pairs=$c2, exponent=$e%.2f")
    assert(e <= 1.65, f"√n-rule seeded volume exponent $e%.2f not ~1.5")
    assert(e >= 1.2,
      f"exponent $e%.2f suspiciously low — cells degenerate, the " +
        "measurement proves nothing")
    // Negative control: freeze k at 8 and the volume must read ~n².
    val fixed = sizes.take(2).map(n => (n, pairVolume(n, 8)))
    val fe = exponent(fixed(0)._1, fixed(0)._2, fixed(1)._1, fixed(1)._2)
    info(f"ivf fixed-k control: pairs=${fixed.map(_._2).mkString(", ")} " +
      f"exponent=$fe%.2f")
    assert(fe > 1.7, f"expected the quadratic floor, measured $fe%.2f")
  }
}
