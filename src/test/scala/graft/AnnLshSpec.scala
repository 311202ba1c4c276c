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
