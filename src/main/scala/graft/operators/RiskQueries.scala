package graft
package operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Dsl._

/** Portfolio-risk statistics over the per-type daily return series —
  * the capstone of the market family (SURVEY.md §2.10b): Sharpe ratio
  * (risk-adjusted drift) and CAPM beta/alpha against the pooled
  * market. Together with q_ts_log_returns (volatility),
  * q_ts_drawdown and the indicator chains these are the standard
  * "should I hold this asset" quartet of a crypto analytics pipeline.
  *
  * Reference basis: /root/reference contains no code (SURVEY.md §0);
  * derived from the survey's crypto-ETL domain.
  *
  * Determinism: daily values are exact cents; each return quantizes
  * ln(y_i/y_{i−1}) ONCE to integer micro-nats (the q_ts_log_returns
  * device), so every aggregate (n, Σr, Σm, Σr², Σm², Σrm) is an exact
  * Long and each output is one textually identical IEEE double
  * expression over those longs, rounded at 6 dp. Zero-variance /
  * zero-denominator cases are decided in exact integer space and
  * yield NULL in both engines.
  *
  * Scale (100 TB): the fact table collapses to the bounded
  * (type × day) domain in one partial agg with map-side combine; lags
  * and moment aggs run on that domain, partitioned by type (the
  * market series is the one unpartitioned lag, over the bounded DAY
  * domain — the documented boundedness pattern). Overflow headroom:
  * |r| ≤ ln(max daily ratio)·10⁶ ≈ 3.2e6 at the profiled ≤23× swing;
  * the largest Long product is ΣrΣm ≤ (d·3.2e6)² — safe to d ≈ 10³
  * days, then the DECIMAL(38,0) widening rule.
  */
object RiskQueries {

  /** Per-type daily micro-nat returns: (event_type, day, r). */
  private def typeRets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, dir)
      .groupBy($"event_type", to_date(date_trunc("day", $"ts")).as("day"))
      .agg((dec2(sum(dec2($"value"))) * 100).cast(LongType).as("y"))
    daily
      .withColumn("y_prev",
        lag($"y", 1).over(Window.partitionBy($"event_type").orderBy($"day")))
      .where($"y_prev".isNotNull)
      .select($"event_type", $"day",
        expr("CAST(floor(ln(CAST(y AS DOUBLE) / y_prev) * 1000000) AS BIGINT)")
          .as("r"))
  }

  /** Pooled-market daily micro-nat returns: (day, m). */
  private def marketRets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, dir)
      .groupBy(to_date(date_trunc("day", $"ts")).as("day"))
      .agg((dec2(sum(dec2($"value"))) * 100).cast(LongType).as("v"))
    daily
      .withColumn("v_prev", lag($"v", 1).over(Window.orderBy($"day")))
      .where($"v_prev".isNotNull)
      .select($"day",
        expr("CAST(floor(ln(CAST(v AS DOUBLE) / v_prev) * 1000000) AS BIGINT)")
          .as("m"))
  }

  /** Shared oracle CTE text for [[typeRets]] / [[marketRets]] — one
    * definition so the two rows' return bases cannot drift. */
  private val retsSql =
    """WITH tdaily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
      |      * 100 AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |rets AS (
      |  SELECT event_type, day,
      |    CAST(floor(ln(CAST(y AS DOUBLE) / y_prev) * 1000000) AS BIGINT) AS r
      |  FROM (SELECT event_type, day, y,
      |          lag(y, 1) OVER (PARTITION BY event_type ORDER BY day) AS y_prev
      |        FROM tdaily)
      |  WHERE y_prev IS NOT NULL),
      |mdaily AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
      |      * 100 AS BIGINT) AS v
      |  FROM events GROUP BY 1),
      |mrets AS (
      |  SELECT day,
      |    CAST(floor(ln(CAST(v AS DOUBLE) / v_prev) * 1000000) AS BIGINT) AS m
      |  FROM (SELECT day, v, lag(v, 1) OVER (ORDER BY day) AS v_prev
      |        FROM mdaily)
      |  WHERE v_prev IS NOT NULL)""".stripMargin

  /** q_ts_sharpe — SHARPE RATIO per event type: mean daily return over
    * its sample standard deviation, daily and annualized (·√365, the
    * crypto-market convention — no closed days). Mean, vol and the
    * ratio derive from exact (n, Σr, Σr²) through one identical double
    * expression per output, round 6; a zero-variance series is decided
    * in integer space (n·Σr² = (Σr)²) → NULL both engines. */
  val qTsSharpe: Q = Q(
    "q_ts_sharpe",
    (s, dir) => {
      import s.implicits._
      typeRets(s, dir).groupBy($"event_type")
        .agg(count(lit(1)).cast(LongType).as("n"),
          sum($"r").as("sr"), sum($"r" * $"r").as("srr"))
        .select($"event_type", $"n",
          expr("ROUND(CAST(sr AS DOUBLE) / n, 6)").as("mean_ret_micro"),
          expr("""CASE WHEN n * srr = sr * sr OR n < 2 THEN NULL
            ELSE ROUND(sqrt((CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / n) / (n - 1)), 6) END""")
            .as("vol_micro"),
          expr("""CASE WHEN n * srr = sr * sr OR n < 2 THEN NULL
            ELSE ROUND(CAST(sr AS DOUBLE) / n / sqrt((CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / n) / (n - 1)) * sqrt(365.0), 6) END""")
            .as("sharpe_ann"))
        .orderBy($"event_type")
    },
    oracle = Some(
      s"""$retsSql,
        |mm AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(r) AS BIGINT) AS sr,
        |    CAST(SUM(r * r) AS BIGINT) AS srr
        |  FROM rets GROUP BY 1)
        |SELECT event_type, n,
        |  ROUND(CAST(sr AS DOUBLE) / n, 6) AS mean_ret_micro,
        |  CASE WHEN n * srr = sr * sr OR n < 2 THEN NULL
        |    ELSE ROUND(sqrt((CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / n) / (n - 1)), 6) END AS vol_micro,
        |  CASE WHEN n * srr = sr * sr OR n < 2 THEN NULL
        |    ELSE ROUND(CAST(sr AS DOUBLE) / n / sqrt((CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / n) / (n - 1)) * sqrt(365.0), 6) END AS sharpe_ann
        |FROM mm
        |ORDER BY event_type""".stripMargin))

  /** q_ts_beta — CAPM BETA / ALPHA / CORRELATION of each type against
    * the pooled market: beta = (nΣrm − ΣrΣm)/(nΣm² − (Σm)²) is one
    * double division of exact longs; alpha (daily drift unexplained by
    * the market, micro-nats) = (Σr − beta·Σm)/n reuses the beta
    * expression textually — IEEE ops over identical inputs are
    * bit-identical in both engines even where the longs exceed 2⁵³
    * (both convert by the same nearest-even rule); corr is the shared
    * [[Dsl.pearsonR]]. A flat market (zero denominator, decided in
    * integer space) yields NULL for all three. The per-type series
    * joins the market series on the bounded day domain. */
  val qTsBeta: Q = Q(
    "q_ts_beta",
    (s, dir) => {
      import s.implicits._
      val j = typeRets(s, dir).join(marketRets(s, dir), "day")
      val m = j.groupBy($"event_type")
        .agg(count(lit(1)).cast(LongType).as("n"),
          sum($"r").as("sr"), sum($"m").as("sm"),
          sum($"r" * $"m").as("srm"),
          sum($"m" * $"m").as("smm"), sum($"r" * $"r").as("srr"))
      val betaD = "CAST(n * srm - sr * sm AS DOUBLE) / CAST(n * smm - sm * sm AS DOUBLE)"
      m.select($"event_type", $"n",
          expr(s"""CASE WHEN n * smm = sm * sm THEN NULL
            ELSE ROUND($betaD, 6) END""").as("beta"),
          expr(s"""CASE WHEN n * smm = sm * sm THEN NULL
            ELSE ROUND((CAST(sr AS DOUBLE) - ($betaD) * CAST(sm AS DOUBLE)) / n, 6) END""")
            .as("alpha_micro"),
          pearsonR($"n", $"sr", $"sm", $"srm", $"srr", $"smm").as("corr_market"))
        .orderBy($"event_type")
    },
    oracle = Some {
      val betaD = "CAST(n * srm - sr * sm AS DOUBLE) / CAST(n * smm - sm * sm AS DOUBLE)"
      s"""$retsSql,
        |j AS (SELECT r.event_type, r.r, m.m
        |      FROM rets r JOIN mrets m USING (day)),
        |mm AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(r) AS BIGINT) AS sr, CAST(SUM(m) AS BIGINT) AS sm,
        |    CAST(SUM(r * m) AS BIGINT) AS srm,
        |    CAST(SUM(m * m) AS BIGINT) AS smm,
        |    CAST(SUM(r * r) AS BIGINT) AS srr
        |  FROM j GROUP BY 1)
        |SELECT event_type, n,
        |  CASE WHEN n * smm = sm * sm THEN NULL
        |    ELSE ROUND($betaD, 6) END AS beta,
        |  CASE WHEN n * smm = sm * sm THEN NULL
        |    ELSE ROUND((CAST(sr AS DOUBLE) - ($betaD) * CAST(sm AS DOUBLE)) / n, 6) END AS alpha_micro,
        |  ${pearsonRSql("n", "sr", "sm", "srm", "srr", "smm")} AS corr_market
        |FROM mm
        |ORDER BY event_type""".stripMargin
    })

  val all: Vector[Q] = Vector(qTsSharpe, qTsBeta)
}
