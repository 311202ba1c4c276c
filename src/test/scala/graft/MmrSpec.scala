package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_vec_mmr: greedy maximal-marginal-relevance selection — pinned
  * against an independent reference, the top-1 anchor, the diversity
  * property vs plain top-5, and shortlist membership. */
class MmrSpec extends AnyFunSuite with SparkFixture {

  private def shortlist(): Seq[(Long, Long, Array[Float])] = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    val probe = broadcast(emb.where($"vec_id" === 0)
      .select($"embedding".as("p")))
    emb.where($"vec_id" =!= 0).crossJoin(probe)
      .select($"vec_id",
        expr("CAST(floor(vec_dot(embedding, p) * 1000000) AS BIGINT)")
          .as("rel"),
        $"embedding")
      .orderBy($"rel".desc, $"vec_id").limit(20)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray))
      .toSeq
  }

  private def simMicro(a: Array[Float], b: Array[Float]): Long = {
    var s = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) {
      s += a(i).toDouble * b(i).toDouble; i += 1
    }
    math.floor(s * 1000000).toLong
  }

  /** Independent greedy reference (recursive style, distinct code path
    * from the operator's mutable-buffer loop). */
  private def referenceMmr(
      cands: Seq[(Long, Long, Array[Float])], k: Int): Seq[Long] = {
    def step(sel: Vector[(Long, Array[Float])],
        rest: Seq[(Long, Long, Array[Float])]): Vector[Long] =
      if (sel.size == k || rest.isEmpty) sel.map(_._1)
      else {
        val best = rest.map { case (id, rel, v) =>
          val pen = if (sel.isEmpty) 0L
            else sel.map(s0 => simMicro(v, s0._2)).max
          (id, v, 7L * rel - 3L * pen)
        }.sortBy { case (id, _, mmr) => (-mmr, id) }.head
        step(sel :+ ((best._1, best._2)),
          rest.filterNot(_._1 == best._1))
      }
    step(Vector.empty, cands)
  }

  test("matches the independent reference selection exactly") {
    val out = Catalog.byName("q_vec_mmr").build(spark, sfDir)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(out == referenceMmr(shortlist(), 5))
  }

  test("the first pick is the plain top-1 (no penalty yet)") {
    val out = Catalog.byName("q_vec_mmr").build(spark, sfDir)
      .orderBy("rank").collect()
    val top1 = shortlist().head._1
    assert(out.head.getLong(1) == top1)
  }

  test("selection is diverse: max pairwise sim does not exceed top-5's") {
    val cands = shortlist()
    val byId = cands.map(c => c._1 -> c._3).toMap
    def maxPairSim(ids: Seq[Long]): Long =
      (for { a <- ids; b <- ids if a < b } yield
        simMicro(byId(a), byId(b))).max
    val mmrIds = Catalog.byName("q_vec_mmr").build(spark, sfDir)
      .collect().map(_.getLong(1)).toSeq
    val top5 = cands.take(5).map(_._1)
    assert(maxPairSim(mmrIds) <= maxPairSim(top5),
      s"MMR must not be MORE redundant than plain top-5")
  }

  test("five distinct picks, all from the top-20 shortlist") {
    val ids = Catalog.byName("q_vec_mmr").build(spark, sfDir)
      .collect().map(_.getLong(1)).toSeq
    assert(ids.size == 5 && ids.distinct.size == 5)
    val short20 = shortlist().map(_._1).toSet
    assert(ids.forall(short20))
  }
}
