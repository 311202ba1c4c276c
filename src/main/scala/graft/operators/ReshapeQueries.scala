package graft.operators

import graft.{Q, Tables}
import graft.Dsl._
import org.apache.spark.sql.functions._

/** Relational reshaping — pivot (long→wide) and unpivot (wide→long),
  * added r5 to close the one missing classic-relational family.
  *
  * Scale notes (100 TB):
  *  - Pivot with an EXPLICIT value list compiles to one hash aggregation
  *    with `count(CASE WHEN ...)` columns — partial-aggregated, one
  *    shuffle on the row key, no second pass. (Pivot *without* a value
  *    list would first run a distinct job to discover columns — a full
  *    extra scan, and nondeterministic column order; never do that at
  *    scale.)
  *  - Unpivot is a per-row Expand (narrow, no shuffle); output rows =
  *    input × metrics, so unpivot AFTER aggregation, not before.
  */
object ReshapeQueries {

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** q_pivot_wide — daily event counts, one column per event type.
    * Spark pivot leaves empty cells null; coalesce to 0 to match the
    * twin's conditional-sum semantics. */
  val qPivotWide: Q = Q(
    "q_pivot_wide",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(to_date($"ts").as("day"))
        .pivot("event_type", eventTypes)
        .agg(count(lit(1)))
        .select($"day" +: eventTypes.map(t =>
          coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy($"day")
    },
    oracle = Some(
      s"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         |${eventTypes.map(t =>
             s"  CAST(COALESCE(SUM(CASE WHEN event_type = '$t' THEN 1 END), 0) AS BIGINT) AS $t")
           .mkString(",\n")}
         |FROM events
         |GROUP BY day
         |ORDER BY day""".stripMargin))

  /** q_unpivot_long — per-returnflag money sums melted to (flag, metric,
    * value) rows. Aggregate first (6 wide rows), then Expand — the
    * scale-correct order. */
  val qUnpivotLong: Q = Q(
    "q_unpivot_long",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          sumMoney($"l_quantity").as("sum_qty"),
          sumMoney($"l_extendedprice").as("sum_price"),
          sumRate($"l_discount").as("sum_disc"))
        .unpivot(
          Array($"l_returnflag"),
          Array($"sum_qty", $"sum_price", $"sum_disc"),
          "metric", "value")
        .orderBy($"l_returnflag", $"metric")
    },
    oracle = Some(
      """WITH agg AS (
        |  SELECT l_returnflag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, value FROM (
        |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM agg
        |  UNION ALL
        |  SELECT l_returnflag, 'sum_price', sum_price FROM agg
        |  UNION ALL
        |  SELECT l_returnflag, 'sum_disc', sum_disc FROM agg)
        |ORDER BY l_returnflag, metric""".stripMargin))

  val all: Vector[Q] = Vector(qPivotWide, qUnpivotLong)
}
