package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for q_graph_triangles (GraphQueries.scala) beyond the
  * oracle hash-match: an INDEPENDENT brute-force recount, and the
  * structural bound that makes degree-ordered orientation the 100 TB
  * technique (max out-degree ≤ √(2m) — no hub can explode the wedge
  * stage, whatever the skew). */
class TriangleSpec extends AnyFunSuite with SparkFixture {

  /** Canonical (u < v) support-≥2 co-purchase edges at sf0.001,
    * recomputed here straight from the fixture (not via the operator). */
  private lazy val edges: Set[(Long, Long)] = {
    val s = spark
    import org.apache.spark.sql.functions._
    import s.implicits._
    val li = Tables.lineitem(s, sfDir)
      .select($"l_orderkey", $"l_partkey").distinct()
    li.as("a")
      .join(li.as("b"),
        $"a.l_orderkey" === $"b.l_orderkey" &&
          $"a.l_partkey" < $"b.l_partkey")
      .groupBy($"a.l_partkey".as("u"), $"b.l_partkey".as("v"))
      .agg(count(lit(1)).as("c")).where($"c" >= 2)
      .select($"u", $"v")
      .as[(Long, Long)].collect().toSet
  }

  private lazy val row =
    Catalog.byName("q_graph_triangles").build(spark, sfDir).head()

  test("triangle count matches a brute-force adjacency-set recount") {
    // Different algorithm entirely: hash-set closure over id-ordered
    // edge pairs, no orientation, no Spark joins — if the operator's
    // degree-oriented wedge join miscounts (double-counts a triangle,
    // drops one to a tie-break bug), the two disagree.
    val adj = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    val brute = edges.iterator.map { case (u, v) =>
      adj.getOrElse(u, Set.empty).count(w => v < w && edges((v, w)))
    }.sum
    assert(row.getLong(2) == brute.toLong,
      s"operator says ${row.getLong(2)} triangles, brute force $brute")
    assert(row.getLong(1) == edges.size.toLong)
    assert(row.getLong(2) > 0, "fixture must actually contain triangles")
  }

  test("degree orientation bounds every out-degree by sqrt(2m)") {
    // The Schank–Wagner invariant: orienting toward the higher
    // (degree, id) endpoint means a node with out-degree d has d
    // neighbors of degree ≥ d, so d² ≤ Σdeg = 2m. This is what caps
    // the wedge stage at O(m^1.5) independent of skew — the property
    // the operator's scale claim rests on.
    val deg = (edges.toSeq.map(_._1) ++ edges.toSeq.map(_._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size }
    def key(n: Long) = (deg(n), n)
    val outdeg = edges.toSeq
      .map { case (u, v) =>
        if (Ordering[(Int, Long)].lt(key(u), key(v))) u else v }
      .groupBy(identity).map(_._2.size)
    val bound = math.sqrt(2.0 * edges.size)
    assert(outdeg.max <= bound + 1,
      s"max oriented out-degree ${outdeg.max} exceeds √(2m) = $bound")
    // and the orientation must actually help on this graph: oriented
    // wedge volume strictly below the naive Σ C(deg, 2)
    val naive = deg.values.map(d => d.toLong * (d - 1) / 2).sum
    val oriented = outdeg.map(d => d.toLong * (d - 1) / 2).sum
    assert(oriented < naive,
      s"oriented wedges $oriented not below naive $naive")
  }
}
