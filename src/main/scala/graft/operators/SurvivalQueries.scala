package graft
package operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Survival analysis (SURVEY.md §2.10b behavioral analytics) — the
  * KAPLAN-MEIER product-limit estimator, the standard duration curve
  * under RIGHT CENSORING: subjects whose terminal event hasn't been
  * observed yet must not be dropped or death-dated, or the curve
  * biases short. The subject here is the SESSION (q_sessionize's
  * 30-minute-gap definition, replicated byte-for-byte — same (ts,
  * event_id) tiebreak, same 1800000000 µs threshold): how long do
  * sessions survive before ending, with sessions still open at the
  * corpus edge (last event within one gap of the global max ts — the
  * gap cannot be proven elapsed) treated as censored. Naive "average
  * session length" over only the closed sessions is exactly the bias
  * KM removes.
  *
  * Reference basis: /root/reference contains no code (SURVEY.md §0);
  * derived from the survey's behavioral-analytics north star.
  *
  * Determinism: durations are exact integer minutes (µs difference,
  * truncating div); the risk set, event and censor counts per
  * duration are exact Longs off a reverse cumulative sum; each KM
  * factor ln((n−d)/n) quantizes ONCE to integer micro-nats (the
  * perplexity/log-returns device) so the cumulative log-survival is
  * an exact Long sum and S(t) = exp(cum/10⁶) is one identical IEEE
  * expression, round 6. The curve-hits-zero case (d = n at some t) is
  * decided in integer space via a prefix flag — ln(0) differs across
  * engines (Spark NULL vs DuckDB -inf) so it is never evaluated.
  *
  * Scale (100 TB): sessionization is the user-keyed stacked-window
  * classic (two windows, one shuffle on user_id); the per-session
  * collapse is one keyed partial agg; everything after runs on the
  * DURATION ladder — bounded by gap-rule arithmetic, not data volume
  * (a session of m events spans < m·30 min, and minute resolution
  * collapses it to ≤ a few hundred distinct values; profiled: 30 at
  * sf0.1) — the documented bounded-domain exception for the
  * unpartitioned ladder windows. The 1-row corpus-end scalar
  * broadcasts.
  */
object SurvivalQueries {

  /** q_survival_km — the KM survival curve of session duration in
    * whole minutes; churn event = session closed (a 30-min gap or a
    * later session proves it ended), censored = still open at the
    * corpus edge. Emits per duration: at-risk, events, censored,
    * S(t). */
  val qSurvivalKm: Q = Q(
    "q_survival_km",
    (s, dir) => {
      import s.implicits._
      val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sess = Tables.events(s, dir)
        .withColumn("prev_us", unix_micros(lag($"ts", 1).over(wOrd)))
        .withColumn("new_session",
          when($"prev_us".isNull ||
            unix_micros($"ts") - $"prev_us" > 1800000000L, 1L).otherwise(0L))
        .withColumn("session_id", sum($"new_session").over(wRun))
        .groupBy($"user_id", $"session_id")
        .agg(min(unix_micros($"ts")).as("first_us"),
          max(unix_micros($"ts")).as("last_us"))
      val horizon = Tables.events(s, dir)
        .agg(max(unix_micros($"ts")).as("max_us"))
      val lives = sess.crossJoin(broadcast(horizon))
        .select(expr("(last_us - first_us) div 60000000").as("dur"),
          when($"last_us" > $"max_us" - 1800000000L, 1L).otherwise(0L)
            .as("censored"))
      val lad = lives.groupBy($"dur")
        .agg(sum(lit(1L) - $"censored").as("d"), sum($"censored").as("c"))
      val wRev = Window.orderBy($"dur".desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wFwd = Window.orderBy($"dur".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      lad
        .withColumn("n_risk", sum($"d" + $"c").over(wRev))
        .withColumn("f_micro",
          when($"d" === 0 || $"d" === $"n_risk", 0L).otherwise(
            expr("CAST(floor(ln(CAST(n_risk - d AS DOUBLE) / n_risk) * 1000000) AS BIGINT)")))
        .withColumn("cum", sum($"f_micro").over(wFwd))
        .withColumn("zeroed", max(when($"d" === $"n_risk", 1L).otherwise(0L))
          .over(wFwd))
        .select($"dur".as("duration_min"), $"n_risk",
          $"d".as("n_events"), $"c".as("n_censored"),
          when($"zeroed" === 1, lit(0.0))
            .otherwise(expr("ROUND(exp(CAST(cum AS DOUBLE) / 1000000), 6)"))
            .as("survival"))
        .orderBy($"duration_min")
    },
    oracle = Some(
      """WITH sess AS (
        |  SELECT user_id, session_id,
        |    MIN(epoch_us(ts)) AS first_us, MAX(epoch_us(ts)) AS last_us
        |  FROM (
        |    SELECT user_id, ts,
        |      CAST(SUM(new_session) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |        AS session_id
        |    FROM (
        |      SELECT user_id, ts, event_id,
        |        CASE WHEN lag(ts, 1) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id) IS NULL
        |             OR epoch_us(ts) - epoch_us(lag(ts, 1) OVER (
        |               PARTITION BY user_id ORDER BY ts, event_id))
        |               > 1800000000
        |           THEN 1 ELSE 0 END AS new_session
        |      FROM events))
        |  GROUP BY user_id, session_id),
        |horizon AS (SELECT MAX(epoch_us(ts)) AS max_us FROM events),
        |lives AS (
        |  SELECT (last_us - first_us) // 60000000 AS dur,
        |    CASE WHEN last_us > max_us - 1800000000 THEN 1 ELSE 0 END
        |      AS censored
        |  FROM sess, horizon),
        |lad AS (
        |  SELECT dur, CAST(SUM(1 - censored) AS BIGINT) AS d,
        |    CAST(SUM(censored) AS BIGINT) AS c
        |  FROM lives GROUP BY 1),
        |risk AS (
        |  SELECT dur, d, c,
        |    CAST(SUM(d + c) OVER (ORDER BY dur DESC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
        |  FROM lad),
        |fac AS (
        |  SELECT dur, d, c, n_risk,
        |    CASE WHEN d = 0 OR d = n_risk THEN 0
        |      ELSE CAST(floor(ln(CAST(n_risk - d AS DOUBLE) / n_risk)
        |        * 1000000) AS BIGINT) END AS f_micro,
        |    CASE WHEN d = n_risk THEN 1 ELSE 0 END AS z
        |  FROM risk),
        |acc AS (
        |  SELECT dur, d, c, n_risk,
        |    CAST(SUM(f_micro) OVER (ORDER BY dur ASC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    MAX(z) OVER (ORDER BY dur ASC ROWS UNBOUNDED PRECEDING) AS zeroed
        |  FROM fac)
        |SELECT dur AS duration_min, n_risk, d AS n_events, c AS n_censored,
        |  CASE WHEN zeroed = 1 THEN 0.0
        |    ELSE ROUND(exp(CAST(cum AS DOUBLE) / 1000000), 6) END AS survival
        |FROM acc
        |ORDER BY duration_min""".stripMargin))

  val all: Vector[Q] = Vector(qSurvivalKm)
}
