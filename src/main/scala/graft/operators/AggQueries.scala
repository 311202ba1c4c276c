package graft.operators

import graft.{Q, Tables}
import graft.Dsl._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregation operators — SURVEY.md §2.4 rows 15–22.
  *
  * All use Spark's partial+final hash aggregation (map-side combine happens
  * for free), which is the 100 TB scale path: the shuffle carries one row
  * per (partition × group), not per input row.
  */
object AggQueries {

  /** #16 q_agg_groupby — TPC-H-Q1 flavor; the flagship / minimum slice. */
  val qAggGroupby: Q = Q(
    "q_agg_groupby",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          count(lit(1)).as("count_order"),
          sumMoney($"l_quantity").as("sum_qty"),
          sumMoney($"l_extendedprice").as("sum_base_price"),
          sum(dec4($"l_extendedprice") *
            (lit(1).cast(DecimalType(18, 4)) - dec4($"l_discount")))
            .cast(DoubleType).as("sum_disc_price"),
          round(sumMoney($"l_quantity") / count(lit(1)), 4).as("avg_qty"),
          round(sumRate($"l_discount") / count(lit(1)), 4).as("avg_disc"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    oracle = Some(
      """SELECT l_returnflag, l_linestatus,
        |  COUNT(*) AS count_order,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
        |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS avg_disc
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  val all: Vector[Q] = Vector(qAggGroupby)
}
