package graft.operators

import graft.{Q, Tables}
import graft.Dsl._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Feature-preparation operators — the last mile between analytics and
  * model training (LLM-data north star: a training-data pipeline ends
  * by materializing FEATURES, not reports). Two canonical ops every
  * tabular-ML ingest runs: missing-value imputation and min-max
  * scaling.
  *
  * The fixtures carry no NULLs (FIXTURES.md), so the imputation row
  * plants them deterministically with the md5 gate — the same
  * auditable pure-function-of-the-row device the sampling family uses,
  * so both engines null the SAME rows and the oracle checks the whole
  * repair path, not just the arithmetic.
  *
  * Scale (100 TB): each op is one tiny statistics aggregation
  * (group-means / column min-max — partial-agg shuffles collapsing to
  * the group or 1-row domain, broadcast back) + one narrow repair
  * scan. Nothing driver-side, nothing quadratic; this is the shape of
  * a production `Imputer`/`MinMaxScaler` fit+transform pair.
  */
object PrepQueries {

  /** q_prep_impute_mean — per-group MEAN IMPUTATION: plant ~10% NULLs
    * in l_quantity (md5 gate < '1a' ≈ 26/256 of rows, keyed by the
    * full physical row key so duplicate (orderkey, linenumber) pairs
    * gate independently), then fill each NULL with its l_returnflag
    * group's mean of the SURVIVING values. The mean divides the exact
    * decimal sum by the non-null count and rounds once at 4 dp (the
    * avgMoney discipline, count(q) not count(*)); filled values are
    * therefore bit-identical in both engines. was_imputed makes the
    * repair auditable row by row. */
  val qPrepImputeMean: Q = Q(
    "q_prep_impute_mean",
    (s, dir) => {
      import s.implicits._
      val key = concat_ws("-", $"l_orderkey", $"l_linenumber",
        $"l_partkey", $"l_suppkey")
      val base = Tables.lineitem(s, dir)
        .select($"l_orderkey", $"l_linenumber", $"l_partkey",
          $"l_returnflag",
          when(md5Gate(key, "1a"), lit(null)).otherwise($"l_quantity")
            .as("q"))
      val means = base.groupBy($"l_returnflag")
        .agg(round(sum(dec2($"q")).cast(DoubleType) / count($"q"), 4)
          .as("m"))
      base.join(broadcast(means), "l_returnflag")
        .select($"l_orderkey", $"l_linenumber", $"l_partkey",
          coalesce($"q", $"m").as("quantity_filled"),
          $"q".isNull.as("was_imputed"))
        .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey",
          $"quantity_filled", $"was_imputed")
    },
    oracle = Some(
      s"""WITH base AS (
         |  SELECT l_orderkey, l_linenumber, l_partkey, l_returnflag,
         |    CASE WHEN ${ImputeGate.sql} THEN NULL ELSE l_quantity END AS q
         |  FROM lineitem),
         |means AS (
         |  SELECT l_returnflag,
         |    ROUND(CAST(SUM(CAST(q AS DECIMAL(18,2))) AS DOUBLE)
         |      / COUNT(q), 4) AS m
         |  FROM base GROUP BY l_returnflag)
         |SELECT l_orderkey, l_linenumber, l_partkey,
         |  COALESCE(q, m) AS quantity_filled,
         |  (q IS NULL) AS was_imputed
         |FROM base JOIN means USING (l_returnflag)
         |ORDER BY 1, 2, 3, 4, 5""".stripMargin))

  /** Twin-side gate text, built from the shared helper so the Spark
    * and SQL gates can never drift apart. */
  private object ImputeGate {
    val sql: String = md5GateSql(
      "concat_ws('-', l_orderkey, l_linenumber, l_partkey, l_suppkey)",
      "1a")
  }

  /** q_prep_scale_minmax — MIN-MAX feature scaling of two numeric
    * columns to [0, 1]: scaled = (x − min) / (max − min). min/max are
    * exact decimal aggregates of 2-dp values; numerator and
    * denominator are exact decimal differences converted to double
    * once, divided, rounded at 6 dp — the one float op per value, same
    * expression text both engines. The 1-row (min, max) model
    * broadcasts into a narrow repair scan — the fit+transform shape of
    * a production MinMaxScaler. */
  val qPrepScaleMinmax: Q = Q(
    "q_prep_scale_minmax",
    (s, dir) => {
      import s.implicits._
      val stats = Tables.lineitem(s, dir).agg(
        min(dec2($"l_quantity")).as("qlo"),
        max(dec2($"l_quantity")).as("qhi"),
        min(dec2($"l_extendedprice")).as("plo"),
        max(dec2($"l_extendedprice")).as("phi"))
      Tables.lineitem(s, dir)
        .crossJoin(broadcast(stats))
        .select($"l_orderkey", $"l_linenumber", $"l_partkey",
          round((dec2($"l_quantity") - $"qlo").cast(DoubleType)
            / ($"qhi" - $"qlo").cast(DoubleType), 6).as("q_scaled"),
          round((dec2($"l_extendedprice") - $"plo").cast(DoubleType)
            / ($"phi" - $"plo").cast(DoubleType), 6).as("p_scaled"))
        .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey",
          $"q_scaled", $"p_scaled")
    },
    oracle = Some(
      """WITH stats AS (
        |  SELECT
        |    MIN(CAST(l_quantity AS DECIMAL(18,2))) AS qlo,
        |    MAX(CAST(l_quantity AS DECIMAL(18,2))) AS qhi,
        |    MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS plo,
        |    MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS phi
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber, l_partkey,
        |  ROUND(CAST(CAST(l_quantity AS DECIMAL(18,2)) - qlo AS DOUBLE)
        |    / CAST(qhi - qlo AS DOUBLE), 6) AS q_scaled,
        |  ROUND(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) - plo AS DOUBLE)
        |    / CAST(phi - plo AS DOUBLE), 6) AS p_scaled
        |FROM lineitem, stats
        |ORDER BY 1, 2, 3, 4, 5""".stripMargin))

  val all: Vector[Q] = Vector(qPrepImputeMean, qPrepScaleMinmax)
}
