package graft

import graft.operators.VectorQueries.AnnLsh
import org.apache.spark.sql.functions.explode
import org.scalatest.funsuite.AnyFunSuite

/** q_vec_knn_lsh (T): the LSH-bucketed ANN path is engine-specific, so
  * the contract is recall against the exact brute-force baseline (#53)
  * plus the pruning property that makes it the 100 TB scale path. All
  * assertions are deterministic (fixed hyperplane seed + fixed data). */
class AnnLshSpec extends AnyFunSuite with SparkFixture {

  test("multi-probe LSH recalls most of the exact top-5") {
    val exact = Catalog.byName("q_vec_knn_bruteforce").build(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val approx = Catalog.byName("q_vec_knn_lsh").build(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.count(approx.contains)
    assert(recall >= 3, s"recall $recall/5 too low; approx=$approx exact=$exact")
  }

  test("q_vec_ann_recall: probe 0 agrees with the single-probe rows, " +
    "bounds hold, panel mean clears the floor") {
    val rows = Catalog.byName("q_vec_ann_recall").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (0L until 16L), "one row per probe")
    rows.foreach { case (pid, nHit, ppm) =>
      assert(nHit >= 0 && nHit <= 5, s"probe $pid n_hit $nHit")
      assert(ppm == nHit * 200000L, s"probe $pid ppm recompute")
    }
    // Probe 0's n_hit must equal the recall the single-probe rows
    // (brute force vs LSH catalog rows) exhibit — same seeds, same data.
    val exact = Catalog.byName("q_vec_knn_bruteforce").build(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val approx = Catalog.byName("q_vec_knn_lsh").build(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(rows.find(_._1 == 0L).get._2 == exact.count(approx.contains))
    // Panel mean: deterministic 2.375/5 (47.5%) on the fixed fixture +
    // seeds — the honest panel reading at 4 bits / nprobe 5 on a SPREAD
    // corpus (probe 0's 3/5 does not generalize; that variance across
    // probes is exactly what the row exists to surface, and why
    // production tunes bits/nprobe against this table). Floor at 40%
    // so a bucketing regression still fails loudly.
    val mean = rows.map(_._2).sum.toDouble / rows.length
    assert(mean >= 2.0, s"panel mean recall $mean/5 below floor")
  }

  test("LSH search scans only a fraction of the table") {
    import spark.implicits._
    val all = AnnLsh.bucketed(Tables.embeddings(spark, sfDir))
    val total = all.count()
    val probeBuckets = all.where($"vec_id" === 0)
      .select(explode(AnnLsh.probeBuckets($"bucket"))).collect().map(_.getInt(0)).toSet
    val candidates = all.where($"bucket".isin(probeBuckets.toSeq: _*)).count()
    assert(candidates < total,
      s"LSH must prune: candidates=$candidates of $total")
    // 5 of 16 buckets probed → expect roughly a third of the table.
    assert(candidates.toDouble / total < 0.7)
  }

  test("bucketing is deterministic across invocations") {
    val a = AnnLsh.bucketed(Tables.embeddings(spark, sfDir))
      .select("vec_id", "bucket").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = AnnLsh.bucketed(Tables.embeddings(spark, sfDir))
      .select("vec_id", "bucket").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }
}
