package graft.operators

import graft.{Q, Tables}
import graft.Dsl._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window functions — SURVEY.md §2.5 rows 23–28.
  *
  * Scale notes (100 TB): every window here partitions by a high-cardinality
  * key (customer / user) — one shuffle on the partition key, then a
  * per-partition sort; no global sort, no driver involvement. The only
  * exception is #26's global distribution window (unavoidable for
  * ntile/percent_rank over the whole table) — acceptable because `part` is
  * a dimension; a fact-table version would pre-bucket first.
  * Window ordering always carries a unique tiebreak column (rule 1).
  */
object WindowQueries {

  /** #23 q_win_rank — rank/dense_rank/row_number per customer, top 3. */
  val qWinRank: Q = Q(
    "q_win_rank",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      Tables.orders(s, dir)
        .select(
          $"o_custkey", $"o_orderkey", $"o_totalprice",
          rank().over(w).cast(LongType).as("rnk"),
          dense_rank().over(w).cast(LongType).as("drnk"),
          row_number().over(w).cast(LongType).as("rn"))
        .where($"rn" <= 3)
        .orderBy($"o_custkey", $"rn")
    },
    oracle = Some(
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk, drnk, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    rank()       OVER w AS rnk,
        |    dense_rank() OVER w AS drnk,
        |    row_number() OVER w AS rn
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin))

  /** #24 q_win_running — running exact-decimal sum + 7-row moving average
    * per user over the event stream. */
  val qWinRunning: Q = Q(
    "q_win_running",
    (s, dir) => {
      import s.implicits._
      val wRun = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wMov = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(-6, Window.currentRow)
      Tables.events(s, dir)
        .select(
          $"event_id", $"user_id",
          sum(dec2($"value")).over(wRun).cast(DoubleType).as("running_sum"),
          round(sum(dec2($"value")).over(wMov).cast(DoubleType) /
            count(lit(1)).over(wMov), 4).as("mov_avg7"))
        .orderBy($"event_id")
    },
    oracle = Some(
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER wr AS DOUBLE) AS running_sum,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER wm AS DOUBLE)
        |        / COUNT(*) OVER wm, 4) AS mov_avg7
        |FROM events
        |WINDOW
        |  wr AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wm AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin))

  /** #25 q_win_lead_lag — inter-event gap in exact microseconds per user
    * (window edges produce the only NULLs; they are not sort keys). */
  val qWinLeadLag: Q = Q(
    "q_win_lead_lag",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(s, dir)
        .select(
          $"event_id", $"user_id",
          $"ts".cast("timestamp_ntz").as("ts"),
          (unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w)))
            .as("gap_prev_us"),
          (unix_micros(lead($"ts", 1).over(w)) - unix_micros($"ts"))
            .as("gap_next_us"))
        .orderBy($"event_id")
    },
    oracle = Some(
      """SELECT event_id, user_id, ts,
        |  epoch_us(ts) - epoch_us(lag(ts, 1)  OVER w) AS gap_prev_us,
        |  epoch_us(lead(ts, 1) OVER w) - epoch_us(ts) AS gap_next_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin))

  /** #26 q_win_distribution — ntile/percent_rank/cume_dist over part
    * retail price.
    *
    * A naive `Window.orderBy(price)` is a single-partition global sort —
    * a scale-killer, since `part` grows with SF. This is the bucketed
    * two-pass instead: (1) count rows per coarse price bucket — the
    * bucket table is domain-sized (distinct floor(price) values), not
    * row-count-sized, so its cumulative sum is a tiny single-partition
    * window; (2) row_number *within* each bucket (shuffle partitioned by
    * bucket) + broadcast bucket offsets ⇒ the exact global rank. With the
    * unique (price, partkey) tiebreak, rank == row_number and the three
    * distribution stats are closed-form in (rn, n):
    * percent_rank = (rn−1)/(n−1); cume_dist = rn/n; ntile(4) = the
    * first n%4 buckets get ⌈n/4⌉ rows (Spark's ntile semantics).
    *
    * round(6), not 4: cume = k/|part| has exactly 5 decimals at sf0.1
    * (|part|=20000), so round(4) lands on the .5 boundary where Spark
    * (decimal-string) and DuckDB (binary) disagree; at 6 digits both
    * ratios are boundary-free for every fixture cardinality. */
  val qWinDistribution: Q = Q(
    "q_win_distribution",
    (s, dir) => {
      import s.implicits._
      val parts = Tables.part(s, dir)
        .select($"p_partkey", $"p_retailprice")
        .withColumn("bkt", floor($"p_retailprice").cast(LongType))
      val buckets = parts.groupBy($"bkt").agg(count(lit(1)).as("c"))
      val wCum = Window.orderBy($"bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val offsets = buckets
        .withColumn("off", sum($"c").over(wCum) - $"c")
        .select($"bkt", $"off")
      val total = buckets.agg(sum($"c").cast(LongType).as("n"))
      val wIn = Window.partitionBy($"bkt")
        .orderBy($"p_retailprice", $"p_partkey")
      parts
        .join(broadcast(offsets), "bkt")
        .crossJoin(broadcast(total))
        .withColumn("rn", row_number().over(wIn).cast(LongType) + $"off")
        .withColumn("base", expr("n div 4"))
        .withColumn("extra", $"n" % 4)
        .withColumn("quartile",
          when($"rn" <= ($"base" + 1) * $"extra",
            expr("(rn - 1) div (base + 1)") + 1)
            .otherwise($"extra" + expr("(rn - 1 - (base + 1) * extra) div base") + 1)
            .cast(LongType))
        .select(
          $"p_partkey", $"p_retailprice", $"quartile",
          round(($"rn" - 1).cast(DoubleType) / ($"n" - 1).cast(DoubleType), 6)
            .as("pct_rank"),
          round($"rn".cast(DoubleType) / $"n".cast(DoubleType), 6).as("cume"))
        .orderBy($"p_partkey")
    },
    oracle = Some(
      """SELECT p_partkey, p_retailprice,
        |  ntile(4) OVER w AS quartile,
        |  ROUND(percent_rank() OVER w, 6) AS pct_rank,
        |  ROUND(cume_dist() OVER w, 6) AS cume
        |FROM part
        |WINDOW w AS (ORDER BY p_retailprice, p_partkey)
        |ORDER BY p_partkey""".stripMargin))

  /** #27 q_win_range_frame — trailing 1-hour RANGE frame keyed on epoch
    * seconds (ties share a frame ⇒ deterministic). */
  val qWinRangeFrame: Q = Q(
    "q_win_range_frame",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy(unix_timestamp($"ts"))
        .rangeBetween(-3600, Window.currentRow)
      Tables.events(s, dir)
        .select(
          $"event_id", $"user_id",
          sum(dec2($"value")).over(w).cast(DoubleType).as("hour_sum"))
        .orderBy($"event_id")
    },
    oracle = Some(
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hour_sum
        |FROM events
        |ORDER BY event_id""".stripMargin))

  /** #28 q_sessionize — gap-based sessions (>30 min ⇒ new session): the
    * classic lag → flag → cumulative-sum stack, then per-session stats. */
  val qSessionize: Q = Q(
    "q_sessionize",
    (s, dir) => {
      import s.implicits._
      val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("prev_us", unix_micros(lag($"ts", 1).over(wOrd)))
        .withColumn("new_session",
          when($"prev_us".isNull ||
            unix_micros($"ts") - $"prev_us" > 1800000000L, 1L).otherwise(0L))
        .withColumn("session_id", sum($"new_session").over(wRun))
        .groupBy($"user_id", $"session_id")
        .agg(
          count(lit(1)).as("n_events"),
          (max(unix_micros($"ts")) - min(unix_micros($"ts"))).as("dur_us"))
        .orderBy($"user_id", $"session_id")
    },
    oracle = Some(
      """SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS dur_us
        |FROM (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM (
        |    SELECT user_id, ts, event_id,
        |      CASE WHEN lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |             OR epoch_us(ts) - epoch_us(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
        |           THEN 1 ELSE 0 END AS new_session
        |    FROM events))
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin))

  /** q_report_momentum (added r6) — the everyday composed REPORT shape a
    * user of the engine actually ships, as one oracle row: fact⋈dim →
    * monthly revenue per market segment → month-over-month delta (lag)
    * → top-3 months per segment (row_number filter). Exercises join +
    * partial-agg + two window functions + rank-filter in one plan.
    *
    * Scale: one shuffle on the join key, one on the (segment, month)
    * agg key (5×80 groups), then windows over ≤ 80 rows per segment —
    * the window input is the AGGREGATE, never the fact table. Deltas
    * are exact: revenues are DECIMAL(18,2) sums surfaced as doubles
    * (< 2⁵³, integer-exact), so subtraction is drift-free (rule 2). */
  val qReportMomentum: Q = Q(
    "q_report_momentum",
    (s, dir) => {
      import s.implicits._
      val monthly = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment",
          date_trunc("month", $"o_orderdate").cast("timestamp_ntz").as("month"))
        .agg(sumMoney($"o_totalprice").as("revenue"))
      val bySeg = Window.partitionBy($"c_mktsegment")
      monthly
        .withColumn("mom_delta",
          round($"revenue" - lag($"revenue", 1).over(bySeg.orderBy($"month")), 2))
        .withColumn("rnk",
          row_number().over(bySeg.orderBy($"revenue".desc, $"month"))
            .cast(LongType))
        .where($"rnk" <= 3)
        .select($"c_mktsegment", $"month", $"revenue", $"mom_delta", $"rnk")
        .orderBy($"c_mktsegment", $"rnk")
    },
    oracle = Some(
      """WITH monthly AS (
        |  SELECT c_mktsegment,
        |    CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_mktsegment, month),
        |win AS (
        |  SELECT c_mktsegment, month, revenue,
        |    ROUND(revenue - lag(revenue, 1)
        |      OVER (PARTITION BY c_mktsegment ORDER BY month), 2) AS mom_delta,
        |    row_number()
        |      OVER (PARTITION BY c_mktsegment ORDER BY revenue DESC, month) AS rnk
        |  FROM monthly)
        |SELECT c_mktsegment, month, revenue, mom_delta, rnk
        |FROM win WHERE rnk <= 3
        |ORDER BY c_mktsegment, rnk""".stripMargin))

  /** q_win_value_funcs (added r7) — the VALUE window functions
    * (first_value / last_value / nth_value), completing §2.5 alongside
    * rank/offset/frame/distribution rows: per customer in order-date
    * order, the first, last and second order keys. first/nth run over
    * the default growing frame (unbounded preceding → current row, so
    * nth is NULL until the nth row arrives — both engines agree);
    * last_value REQUIRES the explicit unbounded-following frame — over
    * the default frame it degenerates to "current row", the classic
    * window-function bug this row pins against. Unique tiebreak
    * (orderdate, orderkey) per rule 1. */
  val qWinValueFuncs: Q = Q(
    "q_win_value_funcs",
    (s, dir) => {
      import s.implicits._
      val wRun = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
      val wAll = wRun.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir)
        .select(
          $"o_orderkey", $"o_custkey",
          first($"o_orderkey").over(wRun).as("first_key"),
          last($"o_orderkey").over(wAll).as("last_key"),
          nth_value($"o_orderkey", 2).over(wRun).as("second_key"))
        .orderBy($"o_orderkey")
    },
    oracle = Some(
      """SELECT o_orderkey, o_custkey,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  last_value(o_orderkey) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS last_key,
        |  nth_value(o_orderkey, 2) OVER w AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin))

  /** q_win_running_distinct — the running COUNT(DISTINCT) no SQL window
    * frame can express directly (DISTINCT aggregates are not legal over
    * frames in either engine): per user, how many distinct event types
    * they have touched as of each event — the classic "breadth of
    * engagement so far" feature, and the textbook rewrite: mark each
    * row that is the FIRST occurrence of its (user, type), then a
    * running SUM of the marks.
    *
    * The first-occurrence mark deliberately avoids a second partition
    * key: with rows ordered by (event_type, ts, event_id) WITHIN the
    * user partition, a row starts a new type-run iff its lag differs —
    * so BOTH windows share the user_id partitioning and the plan is
    * ONE keyed exchange with two in-partition sorts, instead of the
    * naive (user, type)-partitioned first pass that would shuffle the
    * stream twice. IS DISTINCT FROM handles the partition-first row
    * (lag NULL) identically in both engines.
    *
    * Scale: both sorts are per-user in-partition (no global sort); the
    * running sum is the same single-pass frame as q_win_running. Skewed
    * users are the q_join_skew_salted story — a hot user's partition
    * sorts alone, everything else streams. */
  val qWinRunningDistinct: Q = Q(
    "q_win_running_distinct",
    (s, dir) => {
      import s.implicits._
      val byType = Window.partitionBy($"user_id")
        .orderBy($"event_type", $"ts", $"event_id")
      val byTime = Window.partitionBy($"user_id")
        .orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("is_new",
          when(not(lag($"event_type", 1).over(byType) <=> $"event_type"), 1L)
            .otherwise(0L))
        .select(
          $"event_id", $"user_id", $"ts".cast("timestamp_ntz").as("ts"),
          $"event_type",
          sum($"is_new").over(byTime).as("n_types_seen"))
        .orderBy($"event_id")
    },
    oracle = Some(
      """WITH flagged AS (
        |  SELECT event_id, user_id, ts, event_type,
        |    CASE WHEN lag(event_type) OVER (
        |        PARTITION BY user_id ORDER BY event_type, ts, event_id)
        |      IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS is_new
        |  FROM events)
        |SELECT event_id, user_id, ts, event_type,
        |  CAST(SUM(is_new) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_types_seen
        |FROM flagged
        |ORDER BY event_id""".stripMargin))

  /** q_win_rolling_median — exact 5-row rolling MEDIAN of event value
    * per user (added r8): the robust smoother that ignores a single
    * spike entirely, where the mean family (q_win_running's frame avg,
    * q_ts_ewma) drags it in — medians are what metering dashboards
    * deploy against fat-tailed value distributions.
    *
    * Determinism is the interesting part: windowed median interpolates
    * between the two middle values on even frames, and Spark computes
    * `lo + (hi−lo)·frac` while DuckDB's quantile_cont may associate
    * differently — an ulp-divergence route on arbitrary doubles. Closed
    * by medianing exact CENTS (integers): lo, hi and their midpoint
    * x.5 are all exactly representable, so every formula shape yields
    * the bit-identical double, and the final /100 is one shared IEEE
    * division. The same move as the ts family's fixed-point, applied to
    * an order statistic.
    *
    * Scale: one keyed exchange on user_id; the 5-row frame is O(1)
    * state per row inside the sorted partition. An exact percentile
    * over an UNBOUNDED frame would instead hold the full history per
    * key — that shape belongs to q_agg_percentile (grouped, not
    * windowed) or the t-digest sketch row. */
  val qWinRollingMedian: Q = Q(
    "q_win_rolling_median",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(-4, Window.currentRow)
      Tables.events(s, dir)
        .select($"event_id", $"user_id",
          $"ts".cast("timestamp_ntz").as("ts"),
          (percentile(expr("cast(round(value * 100) as bigint)"),
            lit(0.5)).over(w) / 100d).as("med5"))
        .orderBy($"event_id")
    },
    oracle = Some(
      """SELECT event_id, user_id, ts,
        |  CAST(median(CAST(round(value * 100) AS BIGINT)) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
        |    AS med5
        |FROM events
        |ORDER BY event_id""".stripMargin))

  /** q_win_rolling_corr — ROLLING 7-day Pearson correlation between
    * daily event count and daily exact-cents value per event type: the
    * moving volume↔revenue coupling monitor, and the window-frame
    * composition of the q_ts_cross_corr discipline — every Pearson
    * ingredient (Σn, Σv, Σnv, Σn², Σv²) is an exact-integer window SUM
    * over the trailing 7-row frame, so the only float is the final r
    * expression, textually identical in both engines. Rows without a
    * full 7-day history are suppressed (the warm-up rows would
    * correlate over a shrinking frame — a different statistic).
    *
    * Scale: the fact scan collapses to the (type × day) domain in one
    * partial agg; the frames run over that bounded table partitioned
    * by type. Σv² headroom (the binding constraint is pearsonR's
    * n·Σv² product, not Σv² itself): daily cents v ~1e7 at sf0.1 →
    * v² ~1e14, ×7-row frame ~7e14, ×k=7 in n·syy ~5e15 — ~1.8e3× of
    * Long headroom left, but v enters SQUARED, so the DAILY-VOLUME
    * multiple is only √(9.2e18/49/1e14) ≈ 43×. Past ~40× daily volume
    * the products must widen to DECIMAL(38,0)/HUGEINT like
    * q_prep_standardize's guard — Spark's default ANSI mode raises
    * ARITHMETIC_OVERFLOW (PcaSpec verifies empirically) and DuckDB
    * aborts, so past the bound the job DIES rather than corrupts; the
    * widening must land before the data does. */
  val qWinRollingCorr: Q = Q(
    "q_win_rolling_corr",
    (s, dir) => {
      import s.implicits._
      val daily = Tables.events(s, dir)
        .groupBy($"event_type",
          to_date(date_trunc("day", $"ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          (dec2(sum(dec2($"value"))) * 100).cast(LongType).as("v"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
        .rowsBetween(-6, Window.currentRow)
      val wRk = Window.partitionBy($"event_type").orderBy($"day")
      val framed = daily.select($"event_type", $"day",
        count(lit(1)).over(w).as("k"),
        sum($"n").over(w).as("sx"), sum($"v").over(w).as("sy"),
        sum($"n" * $"v").over(w).as("sxy"),
        sum($"n" * $"n").over(w).as("sxx"),
        sum($"v" * $"v").over(w).as("syy"),
        row_number().over(wRk).as("rk"))
      framed.where($"rk" >= 7)
        .select($"event_type", $"day",
          pearsonR($"k", $"sx", $"sy", $"sxy", $"sxx", $"syy").as("r7"))
        .orderBy($"event_type", $"day")
    },
    oracle = Some(
      s"""WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    COUNT(*) AS n,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
        |      * 100 AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |framed AS (
        |  SELECT event_type, day,
        |    COUNT(*) OVER w AS k,
        |    CAST(SUM(n) OVER w AS BIGINT) AS sx,
        |    CAST(SUM(v) OVER w AS BIGINT) AS sy,
        |    CAST(SUM(n * v) OVER w AS BIGINT) AS sxy,
        |    CAST(SUM(n * n) OVER w AS BIGINT) AS sxx,
        |    CAST(SUM(v * v) OVER w AS BIGINT) AS syy,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rk
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT event_type, day,
        |  ${graft.Dsl.pearsonRSql("k", "sx", "sy", "sxy", "sxx", "syy")} AS r7
        |FROM framed
        |WHERE rk >= 7
        |ORDER BY event_type, day""".stripMargin))

  /** q_win_cume — the two RELATIVE-POSITION window functions that
    * complete the rank family: CUME_DIST (share of partition at or
    * before this row) and PERCENT_RANK ((rank−1)/(n−1)), per user over
    * events ordered by (value, event_id). Both are RATIONALS OF SMALL
    * INTEGERS — one double division of exact counts, identical IEEE
    * result in both engines, rounded once at 6 dp (the qEventsMarkov
    * p=cnt/total rule); the unique (value, event_id) order key leaves
    * no peer groups, so neither engine's peer-handling can diverge. A
    * single-row partition yields PERCENT_RANK 0 by the SQL standard's
    * 0/0 convention in both engines. Scale: user-partitioned windows —
    * per-key state, no global sort (the qSessionize shape). */
  val qWinCume: Q = Q(
    "q_win_cume",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"value", $"event_id")
      Tables.events(s, dir)
        .select($"event_id", $"user_id",
          round(cume_dist().over(w), 6).as("cume"),
          round(percent_rank().over(w), 6).as("pct_rank"))
        .orderBy($"event_id")
    },
    oracle = Some(
      """SELECT event_id, user_id,
        |  ROUND(cume_dist() OVER w, 6) AS cume,
        |  ROUND(percent_rank() OVER w, 6) AS pct_rank
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
        |ORDER BY event_id""".stripMargin))

  /** q_win_islands — GAPS-AND-ISLANDS: maximal runs of CONSECUTIVE
    * active days per user, via the classic anchor device — for days
    * ranked within a user, day − rank is CONSTANT exactly along a
    * consecutive run, so grouping by (user, day − rank) recovers each
    * island with no self-join and no iteration. The streak shape
    * behind "current consecutive-day streak" features and outage/
    * coverage reports; q_ts_streaks applies the same device to value
    * SIGNS on the bounded day domain — this row runs it on row-scale
    * (user, day) data where the window is user-partitioned. Output is
    * the island-length histogram with per-length user reach — exact
    * integer counts only.
    * Scale (100 TB): one distinct-collapse of the fact table to
    * (user, day) [keyed partial agg], one user-partitioned
    * row_number, two keyed aggs; island keys never leave their user
    * partition, and the histogram domain is bounded by the
    * observation window. */
  val qWinIslands: Q = Q(
    "q_win_islands",
    (s, dir) => {
      import s.implicits._
      val days = Tables.events(s, dir)
        .select($"user_id", to_date(date_trunc("day", $"ts")).as("day"))
        .distinct()
      val ranked = days.withColumn("anchor",
        date_sub($"day", row_number()
          .over(Window.partitionBy($"user_id").orderBy($"day"))))
      val islands = ranked.groupBy($"user_id", $"anchor")
        .agg(count(lit(1)).as("island_len"))
      islands.groupBy($"island_len")
        .agg(count(lit(1)).as("n_islands"),
          countDistinct($"user_id").as("n_users"))
        .orderBy($"island_len")
    },
    oracle = Some(
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events),
        |ranked AS (
        |  SELECT user_id, day,
        |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS INT) AS anchor
        |  FROM days),
        |islands AS (
        |  SELECT user_id, anchor, COUNT(*) AS island_len
        |  FROM ranked GROUP BY 1, 2)
        |SELECT CAST(island_len AS BIGINT) AS island_len,
        |  COUNT(*) AS n_islands,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM islands
        |GROUP BY 1
        |ORDER BY island_len""".stripMargin))

  val all: Vector[Q] = Vector(
    qWinRank, qWinRunning, qWinLeadLag, qWinDistribution,
    qWinRangeFrame, qSessionize, qReportMomentum, qWinValueFuncs,
    qWinRunningDistinct, qWinRollingMedian, qWinRollingCorr, qWinCume,
    qWinIslands)
}
