package graft.operators

import graft.{Q, Tables}
import graft.Dsl._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scans, projection and filtering — SURVEY.md §2.1–§2.2 rows 1–4.
  *
  * Scale notes (100 TB): #2 is written so both the predicate and the
  * projection reach FileSourceScanExec (`PushedFilters` + pruned
  * `ReadSchema`) — Spark then skips row groups via parquet min/max stats
  * and never materializes unused columns. #1's `orderBy.limit` compiles to
  * TakeOrderedAndProject: each task keeps a 100-row heap, only 100 rows per
  * partition reach the driver-side merge — no global sort.
  */
object ScanQueries {

  /** #1 q_scan_full — full scan, all columns, first 100 rows.
    * (l_orderkey, l_linenumber) is NOT unique in the fixtures (≈118k dup
    * pairs at sf0.1), so the total order must include every column — no
    * fully-identical rows exist, making this a true total order (rule 1). */
  val qScanFull: Q = Q(
    "q_scan_full",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
          $"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax",
          $"l_returnflag", $"l_linestatus", $"l_shipdate")
        .limit(100)
    },
    oracle = Some(
      """SELECT * FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  l_quantity, l_extendedprice, l_discount, l_tax,
        |  l_returnflag, l_linestatus, l_shipdate
        |LIMIT 100""".stripMargin))

  /** #2 q_scan_prune_pushdown — narrow projection + pushed predicate. */
  val qScanPrunePushdown: Q = Q(
    "q_scan_prune_pushdown",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .where($"l_shipdate" >= to_timestamp(lit("1998-01-01")))
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        // (okey, lineno) is non-unique; ordering by all emitted columns
        // makes remaining ties identical rows (rule 1).
        .orderBy($"l_orderkey", $"l_linenumber", $"l_extendedprice")
    },
    oracle = Some(
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice""".stripMargin))

  /** #3 q_filter_compound — AND/OR/NOT, IN, BETWEEN, LIKE over part. */
  val qFilterCompound: Q = Q(
    "q_filter_compound",
    (s, dir) => {
      import s.implicits._
      Tables.part(s, dir)
        .where(
          ($"p_type".like("PROMO%") || $"p_size".between(10, 20)) &&
            $"p_brand".isin("Brand#1", "Brand#2", "Brand#3", "Brand#11") &&
            !($"p_retailprice" < 910.0) &&
            $"p_name".isNotNull)
        .select($"p_partkey", $"p_name", $"p_brand", $"p_type", $"p_size")
        .orderBy($"p_partkey")
    },
    oracle = Some(
      """SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part
        |WHERE (p_type LIKE 'PROMO%' OR p_size BETWEEN 10 AND 20)
        |  AND p_brand IN ('Brand#1','Brand#2','Brand#3','Brand#11')
        |  AND NOT (p_retailprice < 910.0)
        |  AND p_name IS NOT NULL
        |ORDER BY p_partkey""".stripMargin))

  /** #4 q_project_case — derived arithmetic (exact decimal), CASE
    * bucketing, string concat. */
  val qProjectCase: Q = Q(
    "q_project_case",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .select(
          $"l_orderkey", $"l_linenumber",
          (dec4($"l_extendedprice") *
            (lit(1).cast(DecimalType(18, 4)) - dec4($"l_discount")))
            .cast(DoubleType).as("revenue"),
          when($"l_quantity" < 10, "low")
            .when($"l_quantity" < 30, "mid")
            .otherwise("high").as("qty_bucket"),
          concat($"l_returnflag", lit("-"), $"l_linestatus").as("flag_status"))
        // order over all emitted columns: (okey, lineno) alone is non-unique.
        .orderBy($"l_orderkey", $"l_linenumber", $"revenue", $"qty_bucket",
          $"flag_status")
    },
    oracle = Some(
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  CASE WHEN l_quantity < 10 THEN 'low'
        |       WHEN l_quantity < 30 THEN 'mid'
        |       ELSE 'high' END AS qty_bucket,
        |  l_returnflag || '-' || l_linestatus AS flag_status
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, revenue, qty_bucket, flag_status""".stripMargin))

  /** q_sql_report (added r7) — the `spark.sql(...)` ENTRY POINT itself:
    * the same engine surface through literal ANSI SQL over registered
    * temp views, proving a SQL-first user of the library gets the
    * identical Catalyst plan the DataFrame DSL rows get (same analyzer,
    * same optimizer — the DSL and SQL are two front-ends to one plan
    * space). The query is a TPC-H-Q3-flavor segment/priority revenue
    * report; the DuckDB twin is the same SQL modulo the decimal-cast
    * idiom. */
  val qSqlReport: Q = Q(
    "q_sql_report",
    (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      // sql() analyzes eagerly, so the returned frame is bound to these
      // views NOW — a later build for another dir re-registers them
      // without disturbing this result.
      s.sql(
        """SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          |FROM orders_v JOIN customer_v ON o_custkey = c_custkey
          |WHERE o_orderstatus = 'O'
          |GROUP BY c_mktsegment, o_orderpriority
          |ORDER BY c_mktsegment, o_orderpriority""".stripMargin)
    },
    oracle = Some(
      """SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'O'
        |GROUP BY c_mktsegment, o_orderpriority
        |ORDER BY c_mktsegment, o_orderpriority""".stripMargin))

  /** q_sql_lateral — ANSI LATERAL correlated subquery executed natively
    * by Spark's decorrelation (DomainJoin → ranked join under the
    * hood): per nation the top-2 orders by price through the exact SQL
    * a DuckDB user writes — the "top-k per group as a correlated
    * subquery" surface-parity row beside q_topk_per_group's DataFrame
    * window form. Both engines run literally the same query text modulo
    * view names; determinism comes from the total (price DESC,
    * o_orderkey) order inside the LIMIT — prices are 2-dp-exact doubles
    * read from the same parquet, so no boundary sits on a float.
    * Scale: Spark decorrelates to a join + per-group rank over the
    * orders side — the same physical shape as the window form; nothing
    * is per-nation re-executed. */
  val qSqlLateral: Q = Q(
    "q_sql_lateral",
    (s, dir) => {
      Tables.nation(s, dir).createOrReplaceTempView("nation_v")
      Tables.customer(s, dir).createOrReplaceTempView("customer_lv")
      Tables.orders(s, dir).createOrReplaceTempView("orders_lv")
      s.sql(
        """SELECT n.n_name, t.o_orderkey, t.price
          |FROM nation_v n,
          |LATERAL (
          |  SELECT o.o_orderkey, o.o_totalprice AS price
          |  FROM orders_lv o JOIN customer_lv c ON o.o_custkey = c.c_custkey
          |  WHERE c.c_nationkey = n.n_nationkey
          |  ORDER BY o.o_totalprice DESC, o.o_orderkey
          |  LIMIT 2
          |) t
          |ORDER BY n.n_name, t.price DESC, t.o_orderkey""".stripMargin)
    },
    oracle = Some(
      """SELECT n.n_name, t.o_orderkey, t.price
        |FROM nation n,
        |LATERAL (
        |  SELECT o.o_orderkey, o.o_totalprice AS price
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY o.o_totalprice DESC, o.o_orderkey
        |  LIMIT 2
        |) t
        |ORDER BY n.n_name, t.price DESC, t.o_orderkey""".stripMargin))

  val all: Vector[Q] =
    Vector(qScanFull, qScanPrunePushdown, qFilterCompound, qProjectCase,
      qSqlReport, qSqlLateral)
}
