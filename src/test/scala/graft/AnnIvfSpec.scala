package graft

import graft.operators.AnnIvf
import org.scalatest.funsuite.AnyFunSuite

/** IVF ANN: deterministic index, partition completeness, pruning, and
  * recall vs the exact brute-force baseline on the fixture probe. */
class AnnIvfSpec extends AnyFunSuite with SparkFixture {

  private lazy val emb = Tables.embeddings(spark, sfDir)
    .select("vec_id", "embedding")
  private lazy val codebook = AnnIvf.train(emb, k = 8, iters = 3)

  test("assignment is a total, deterministic partition of the table") {
    val a = AnnIvf.assign(emb, codebook).select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a.size == emb.count())
    assert(a.values.forall(c => c >= 0 && c < 8))
    assert(a.values.toSet.size > 1, "k-means must produce multiple cells")
    val b = AnnIvf.assign(emb, AnnIvf.train(emb, 8, 3))
      .select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }

  test("nprobe search prunes the candidate set") {
    val assigned = AnnIvf.assign(emb, codebook)
    val total = assigned.count()
    val largestNprobe3 = assigned.groupBy("cell").count()
      .collect().map(_.getLong(1)).sorted.reverse.take(3).sum
    assert(largestNprobe3 < total,
      "probing 3 of 8 cells must scan less than the full table")
  }

  test("IVF search recalls most of the exact top-5 for the fixture probe") {
    val exact = Catalog.byName("q_vec_knn_bruteforce").build(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val approx = AnnIvf.search(emb, codebook, probeId = 0L, nprobe = 3, topK = 5)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.count(approx.contains)
    assert(recall >= 3, s"recall $recall/5; approx=$approx exact=$exact")
  }

  test("k=64: determinism and a total partition hold at production-shaped k") {
    // k=64 on ~500 fixture vectors forces small and (typically) empty
    // cells — the regime the k ≈ √n production rule lands in. One Lloyd
    // iteration keeps the test fast; determinism must hold regardless.
    val cb1 = AnnIvf.train(emb, k = 64, iters = 1)
    val cb2 = AnnIvf.train(emb, k = 64, iters = 1)
    assert(cb1.size == 64 && cb2.size == 64, "k never silently shrinks")
    assert(cb1.zip(cb2).forall { case (a, b) => a.sameElements(b) },
      "codebook must be reproducible run-to-run")
    val a = AnnIvf.assign(emb, cb1).select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a.size == emb.count(), "every vector lands in exactly one cell")
    assert(a.values.forall(c => c >= 0 && c < 64))
  }

  test("k=256: assignment works and plan width is O(1) in k") {
    // The r7 assign built one projection column per centroid — a shape
    // that dies at the documented production k ≈ 32 768. The r8 argmin
    // binds the codebook as one 2-D literal; this pins both that the
    // assignment still totally partitions the table at a k two orders
    // above the catalog query's, and that NO Project in the optimized
    // plan widens with k (the r7 form projected k extra columns).
    val cb = AnnIvf.train(emb, k = 256, iters = 1)
    assert(cb.size == 256)
    val assigned = AnnIvf.assign(emb, cb)
    import org.apache.spark.sql.catalyst.plans.logical.Project
    assigned.queryExecution.optimizedPlan.collect { case p: Project =>
      assert(p.projectList.size <= emb.columns.length + 1,
        s"projection must not widen with k: ${p.projectList.map(_.name)}")
    }
    val a = assigned.select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a.size == emb.count(), "every vector lands in exactly one cell")
    assert(a.values.forall(c => c >= 0 && c < 256))
  }

  test("empty cells keep their centroid instead of collapsing k") {
    // Two identical init vectors tie their cells' costs; argmin sends
    // every tied point to the first cell, guaranteeing the second goes
    // empty — the path that must keep (not drop or zero) its centroid.
    import spark.implicits._
    val dim = 4
    val rows = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(1f, 0f, 0f, 0f)), // duplicate of vec 0 → cell 1 empties
      (2L, Seq(0f, 1f, 0f, 0f)),
      (3L, Seq(0f, 0f, 1f, 0f)),
      (4L, Seq(0f, 0f, 0f, 1f))).toDF("vec_id", "embedding")
    val cb = AnnIvf.train(rows, k = 3, iters = 2)
    assert(cb.size == 3)
    assert(cb(1).sameElements(Array(1f, 0f, 0f, 0f)),
      "the emptied cell must retain its initial centroid")
    assert(cb.forall(_.length == dim))
    val cells = AnnIvf.assign(rows, cb).select("cell")
      .collect().map(_.getInt(0))
    assert(cells.forall(c => c >= 0 && c < 3))
  }

  test("IVF sims are a subset of brute-force sims (exact re-rank)") {
    val exactAll = Catalog.byName("q_vec_knn_bruteforce").build(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val approx = AnnIvf.search(emb, codebook, 0L, 3, 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    approx.foreach { case (id, sim) =>
      exactAll.get(id).foreach(e => assert(e == sim,
        s"vec $id: IVF sim $sim != brute-force $e"))
    }
  }
}
