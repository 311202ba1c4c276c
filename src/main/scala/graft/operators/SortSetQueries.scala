package graft.operators

import graft.{Q, Tables}
import graft.Dsl._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sorts / limits / top-k (§2.6 rows 29–31) and set ops (§2.7 rows 32–35).
  *
  * Scale notes (100 TB): #30's `orderBy.limit` compiles to
  * TakeOrderedAndProject (per-task heap, no global sort). #31 is the
  * row_number≤k pattern — one shuffle on the group key, sort within
  * partitions only. Set ops are hash-based (union+distinct / except-all
  * aggregate on value) — all partial-aggregated before the shuffle.
  * Explicit null placement everywhere a sort key can be null (rule 5).
  */
object SortSetQueries {

  /** #29 q_sort_multikey — mixed asc/desc with explicit null placement on
    * a nullable (outer-join-produced) key. */
  val qSortMultikey: Q = Q(
    "q_sort_multikey",
    (s, dir) => {
      import s.implicits._
      val pMax = Tables.orders(s, dir)
        .where($"o_orderstatus" === "P")
        .groupBy($"o_custkey")
        .agg(max($"o_totalprice").as("max_p_price"))
      Tables.customer(s, dir)
        .join(pMax, $"c_custkey" === $"o_custkey", "left")
        .select($"c_custkey", $"c_mktsegment", $"max_p_price")
        .orderBy($"max_p_price".desc_nulls_last, $"c_custkey")
    },
    oracle = Some(
      """SELECT c_custkey, c_mktsegment, max_p_price
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, MAX(o_totalprice) AS max_p_price FROM orders
        |  WHERE o_orderstatus = 'P' GROUP BY o_custkey) p
        |ON c_custkey = o_custkey
        |ORDER BY max_p_price DESC NULLS LAST, c_custkey""".stripMargin))

  /** #30 q_topk — global top-25 lineitems by exact-decimal revenue
    * (TakeOrderedAndProject: per-task heaps, no global sort). */
  val qTopk: Q = Q(
    "q_topk",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .select(
          $"l_orderkey", $"l_linenumber",
          (dec4($"l_extendedprice") *
            (lit(1).cast(DecimalType(18, 4)) - dec4($"l_discount")))
            .cast(DoubleType).as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey", $"l_linenumber")
        .limit(25)
    },
    oracle = Some(
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |ORDER BY revenue DESC, l_orderkey, l_linenumber
        |LIMIT 25""".stripMargin))

  /** #31 q_topk_per_group — top-3 orders per market segment via the
    * row_number ≤ k pattern. */
  val qTopkPerGroup: Q = Q(
    "q_topk_per_group",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment", $"o_orderkey", $"o_totalprice",
          row_number().over(w).cast(LongType).as("rn"))
        .where($"rn" <= 3)
        .orderBy($"c_mktsegment", $"rn")
    },
    oracle = Some(
      """SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |) WHERE rn <= 3
        |ORDER BY c_mktsegment, rn""".stripMargin))

  /** #32 q_union_all — concatenation of two disjoint filtered slices. */
  val qUnionAll: Q = Q(
    "q_union_all",
    (s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      o.where($"o_orderstatus" === "F")
        .select($"o_orderkey", $"o_totalprice", lit("finished").as("slice"))
        .unionAll(
          o.where($"o_orderstatus" === "P")
            .select($"o_orderkey", $"o_totalprice", lit("pending").as("slice")))
        .orderBy($"o_orderkey")
    },
    oracle = Some(
      """SELECT o_orderkey, o_totalprice, 'finished' AS slice FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey, o_totalprice, 'pending' AS slice FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_orderkey""".stripMargin))

  /** #33 q_union_distinct — deduplicating union of two key sets. */
  val qUnionDistinct: Q = Q(
    "q_union_distinct",
    (s, dir) => {
      import s.implicits._
      val c = Tables.customer(s, dir)
      c.where($"c_mktsegment" === "BUILDING").select($"c_nationkey")
        .union(c.where($"c_mktsegment" === "AUTOMOBILE").select($"c_nationkey"))
        .distinct()
        .orderBy($"c_nationkey")
    },
    oracle = Some(
      """SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |ORDER BY c_nationkey""".stripMargin))

  /** #34 q_intersect — customers appearing in both order-status key sets
    * (INTERSECT = distinct semantics in both engines). */
  val qIntersect: Q = Q(
    "q_intersect",
    (s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      o.where($"o_orderstatus" === "F").select($"o_custkey")
        .intersect(o.where($"o_orderstatus" === "O").select($"o_custkey"))
        .orderBy($"o_custkey")
    },
    oracle = Some(
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin))

  /** #35 q_except_all — bag difference of partkey multisets (duplicate
    * output rows are identical, so ORDER BY partkey is still total). */
  val qExceptAll: Q = Q(
    "q_except_all",
    (s, dir) => {
      import s.implicits._
      val l = Tables.lineitem(s, dir)
      l.where($"l_returnflag" === "A").select($"l_partkey")
        .exceptAll(l.where($"l_returnflag" === "R").select($"l_partkey"))
        .orderBy($"l_partkey")
    },
    oracle = Some(
      """SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
        |EXCEPT ALL
        |SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        |ORDER BY l_partkey""".stripMargin))

  val all: Vector[Q] = Vector(
    qSortMultikey, qTopk, qTopkPerGroup, qUnionAll, qUnionDistinct,
    qIntersect, qExceptAll)
}
