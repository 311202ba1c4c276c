package graft.operators

import graft.{Q, Tables}
import graft.Dsl._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregation operators — SURVEY.md §2.4 rows 15–22.
  *
  * All use Spark's partial+final hash aggregation (map-side combine happens
  * for free), which is the 100 TB scale path: the shuffle carries one row
  * per (partition × group), not per input row. Multi-distinct (#17) uses
  * Catalyst's Expand-based rewrite — still fully distributed.
  */
object AggQueries {

  /** #15 q_agg_global — table-wide count / distinct / min / max / sum. */
  val qAggGlobal: Q = Q(
    "q_agg_global",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct($"l_orderkey").as("n_orders"),
          min($"l_shipdate").as("min_ship"),
          max($"l_shipdate").as("max_ship"),
          sumMoney($"l_extendedprice").as("sum_price"))
    },
    oracle = Some(
      """SELECT COUNT(*) AS n_rows,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem""".stripMargin))

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
          sumRevenue($"l_extendedprice", $"l_discount").as("sum_disc_price"),
          avgMoney($"l_quantity").as("avg_qty"),
          avgRate($"l_discount").as("avg_disc"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    oracle = Some(
      """SELECT l_returnflag, l_linestatus,
        |  COUNT(*) AS count_order,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
        |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS avg_disc
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** #17 q_agg_distinct — multi-distinct alongside plain aggregates
    * (Catalyst Expand rewrite keeps it distributed). */
  val qAggDistinct: Q = Q(
    "q_agg_distinct",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_partkey").as("distinct_parts"),
          countDistinct($"l_suppkey").as("distinct_supps"),
          count(lit(1)).as("cnt"))
        .orderBy($"l_returnflag")
    },
    oracle = Some(
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS distinct_parts,
        |  COUNT(DISTINCT l_suppkey) AS distinct_supps,
        |  COUNT(*) AS cnt
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin))

  /** #18 q_agg_having — groups filtered post-aggregation. */
  val qAggHaving: Q = Q(
    "q_agg_having",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy($"o_custkey")
        .agg(
          count(lit(1)).as("order_cnt"),
          sumMoney($"o_totalprice").as("sum_price"))
        .where($"order_cnt" >= 14)
        .orderBy($"o_custkey")
    },
    oracle = Some(
      """SELECT o_custkey, COUNT(*) AS order_cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY o_custkey
        |HAVING COUNT(*) >= 14
        |ORDER BY o_custkey""".stripMargin))

  /** #19 q_agg_groupingsets — CUBE over (status, priority) with
    * grouping_id; null grouping keys ordered explicitly (rule 5). */
  val qAggGroupingSets: Q = Q(
    "q_agg_groupingsets",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .cube($"o_orderstatus", $"o_orderpriority")
        // grouping_id() resolves only inside the cube's aggregate list.
        .agg(
          grouping_id().cast(LongType).as("gid"),
          count(lit(1)).as("n"),
          sumMoney($"o_totalprice").as("sum_price"))
        .select($"gid", $"o_orderstatus", $"o_orderpriority", $"n", $"sum_price")
        .orderBy($"gid",
          $"o_orderstatus".asc_nulls_first,
          $"o_orderpriority".asc_nulls_first)
    },
    oracle = Some(
      """SELECT CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin))

  /** #20 q_agg_stats — sample stddev/variance/corr/covar, rounded (rule 2:
    * moment aggregates are double sums → round masks summation-order ulp). */
  val qAggStats: Q = Q(
    "q_agg_stats",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          round(stddev_samp($"l_quantity"), 4).as("sd_qty"),
          round(var_samp($"l_quantity"), 4).as("var_qty"),
          round(corr($"l_extendedprice", $"l_quantity"), 4).as("corr_price_qty"),
          round(covar_samp($"l_extendedprice", $"l_quantity"), 4).as("covar_price_qty"))
        .orderBy($"l_returnflag")
    },
    oracle = Some(
      """SELECT l_returnflag,
        |  ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
        |  ROUND(var_samp(l_quantity), 4) AS var_qty,
        |  ROUND(corr(l_extendedprice, l_quantity), 4) AS corr_price_qty,
        |  ROUND(covar_samp(l_extendedprice, l_quantity), 4) AS covar_price_qty
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin))

  /** q_agg_percentile (added r5) — exact interpolated percentiles per
    * group: Spark's `percentile` and DuckDB's `quantile_cont` share the
    * linear-interpolation definition (verified bit-identical at all
    * three SFs). Exact percentile sorts within each group — fine for
    * bounded groups; at 100 TB-scale cardinalities switch to
    * `percentile_approx` (t-digest sketch, partial-aggregated), which
    * is engine-specific and therefore deliberately not the oracle row. */
  val qAggPercentile: Q = Q(
    "q_agg_percentile",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          round(percentile($"l_quantity", lit(0.5)), 6).as("p50_qty"),
          round(percentile($"l_quantity", lit(0.9)), 6).as("p90_qty"),
          round(percentile($"l_extendedprice", lit(0.5)), 6).as("p50_price"))
        .orderBy($"l_returnflag")
    },
    oracle = Some(
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
        |  ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
        |  ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin))

  /** q_agg_stringagg (added r5) — ordered DISTINCT string aggregation
    * (the listagg/string_agg reporting shape): languages seen per
    * source, comma-joined in sorted order. Built as
    * `array_join(sort_array(collect_set(...)))`: collect_SET state is
    * bounded by the distinct-value count (here ≤ 5 langs), where a
    * collect_list-then-distinct would buffer every input row per group
    * — the difference between O(|domain|) and O(n) agg state at 100 TB.
    * sort_array makes the set's arrival order irrelevant, so the row is
    * deterministic and hash-matches DuckDB's ORDER BY string_agg. */
  val qAggStringagg: Q = Q(
    "q_agg_stringagg",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .groupBy($"source")
        .agg(
          array_join(sort_array(collect_set($"lang")), ",").as("langs"),
          count(lit(1)).as("n_docs"))
        .orderBy($"source")
    },
    oracle = Some(
      """SELECT source,
        |  string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs,
        |  COUNT(*) AS n_docs
        |FROM documents
        |GROUP BY source
        |ORDER BY source""".stripMargin))

  /** #21 q_agg_approx_hll (T) — HLL++ sketch distinct; engine-specific
    * sketch ⇒ no DuckDB oracle. `HllSpec` asserts within rsd of exact. */
  val qAggApproxHll: Q = Q(
    "q_agg_approx_hll",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy($"event_type")
        .agg(approx_count_distinct($"user_id", 0.02).as("approx_users"))
        .orderBy($"event_type")
    })

  /** q_agg_approx_percentile (T, added r7) — t-digest quantile sketch
    * (`percentile_approx`, accuracy 1000): THE percentile form at 100 TB
    * cardinalities — it partial-aggregates a bounded sketch per
    * partition where exact `percentile` must materialize every value per
    * group. Engine-specific sketch ⇒ no DuckDB oracle;
    * `ApproxPercentileSpec` brackets each group's output between the
    * exact 0.49/0.51 quantiles (rank error ≤ 1/accuracy ≪ 0.01) and
    * pins determinism across partitionings. The exact twin
    * (q_agg_percentile) stays the oracle row. */
  val qAggApproxPercentile: Q = Q(
    "q_agg_approx_percentile",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(percentile_approx($"l_extendedprice", lit(0.5), lit(1000))
          .as("p50_approx"))
        .orderBy($"l_returnflag")
    })

  /** #22 q_agg_custom_typed — weighted average via a typed Aggregator
    * UDAF; `TypedAggSpec` pins it to sum(x·w)/sum(w). Oracle-checked:
    * WeightedAvgCents' integer-hundredths buffer is order- and
    * partition-independent, so the DuckDB twin reproduces it exactly by
    * summing the same scaled integers (ROUND(v*100) = rint for exact-2dp
    * doubles, which are never near a .5 boundary) and replaying finish's
    * division shape (sumXW/1e4)/(sumW/1e2) in double. */
  val qAggCustomTyped: Q = Q(
    "q_agg_custom_typed",
    (s, dir) => {
      import s.implicits._
      val wavg = udaf(graft.functions.TypedAggs.WeightedAvgCents)
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(round(wavg($"l_extendedprice", $"l_quantity"), 4)
          .as("wavg_price"))
        .orderBy($"l_returnflag")
    },
    oracle = Some(
      """SELECT l_returnflag,
        |  ROUND(
        |    (CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
        |            * CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 1e4)
        |    / (CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 1e2),
        |  4) AS wavg_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin))

  /** q_agg_heavy_hitters (added r7) — corpus-wide top terms via the
    * Space-Saving summary UDAF (TypedAggs.SpaceSaving): O(k) state per
    * partition no matter the term universe, one k-entry buffer per
    * partition over the shuffle. Shipped at k = 64 ≥ the 31-token
    * vocabulary — the exact, merge-order-independent regime, so the row
    * is oracle-checked against plain GROUP BY counts (err provably 0);
    * the k < vocabulary approximation guarantees are pinned by
    * `HeavyHittersSpec` on a planted skewed corpus. */
  val qAggHeavyHitters: Q = Q(
    "q_agg_heavy_hitters",
    (s, dir) => {
      import s.implicits._
      val ss = udaf(graft.functions.TypedAggs.SpaceSaving64)
      Tables.documents(s, dir)
        .select(explode(split(lower($"text"), " ")).as("term"))
        .agg(ss($"term").as("ss"))
        .select(explode($"ss.counts").as(Seq("term", "n")), $"ss.errs")
        .select($"term", $"n", element_at($"errs", $"term").as("err"))
        .orderBy($"n".desc, $"term")
    },
    oracle = Some(
      """SELECT term, COUNT(*) AS n, CAST(0 AS BIGINT) AS err
        |FROM (SELECT unnest(string_split(lower(text), ' ')) AS term
        |      FROM documents)
        |GROUP BY term
        |ORDER BY n DESC, term""".stripMargin))

  /** q_agg_sketch_union (T, added r7) — MERGEABLE distinct sketches:
    * per-day Datasketches-HLL sketches of active users
    * (`hll_sketch_agg`), then the month total via `hll_union_agg` over
    * the stored DAY sketches — never re-touching the events. This is
    * the pre-aggregated-sketch-table pattern that makes "distinct over
    * any date range" O(days) instead of O(rows) at 100 TB: sketches,
    * unlike distinct counts, compose under union. The NULL-day row is
    * the month union; per-day rows carry exact distincts alongside for
    * the error contract. Engine-specific sketch bytes ⇒ no DuckDB
    * oracle; `HllSpec` pins union-vs-direct consistency and the
    * relative-error envelope against exact.
    */
  val qAggSketchUnion: Q = Q(
    "q_agg_sketch_union",
    (s, dir) => {
      import s.implicits._
      val daily = Tables.events(s, dir)
        .groupBy(date_trunc("day", $"ts").as("day"))
        .agg(
          hll_sketch_agg($"user_id", lit(12)).as("sk"),
          count_distinct($"user_id").as("exact_users"))
      val dayRows = daily.select(
        $"day".cast("timestamp_ntz").as("day"),
        hll_sketch_estimate($"sk").as("approx_users"),
        $"exact_users")
      val monthRow = daily
        .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("approx_users"))
        .crossJoin(
          Tables.events(s, dir).agg(count_distinct($"user_id").as("exact_users")))
        .select(lit(null).cast("timestamp_ntz").as("day"),
          $"approx_users", $"exact_users")
      dayRows.unionAll(monthRow).orderBy($"day".asc_nulls_last)
    })

  /** q_agg_minmax_by (added r7) — argmin/argmax aggregation: each
    * customer's highest- and lowest-value order key via max_by/min_by,
    * the "which row won" aggregate every leaderboard needs without a
    * window+filter detour. Ties are the classic nondeterminism trap:
    * the ordering key here is exact-cents × 10⁷ + orderkey — integer,
    * collision-free (orderkey ≪ 10⁷ at every SF), identical in both
    * engines — so the argmin/argmax is total. One partial-agg shuffle;
    * max_by's state is one (value, key) pair per group per partition. */
  val qAggMinmaxBy: Q = Q(
    "q_agg_minmax_by",
    (s, dir) => {
      import s.implicits._
      val key = round($"o_totalprice" * 100).cast(LongType) * 10000000L +
        $"o_orderkey"
      Tables.orders(s, dir)
        .groupBy($"o_custkey")
        .agg(
          max_by($"o_orderkey", key).as("best_order"),
          min_by($"o_orderkey", key).as("worst_order"),
          max(dec2($"o_totalprice")).cast(DoubleType).as("max_price"))
        .orderBy($"o_custkey")
    },
    oracle = Some(
      """SELECT o_custkey,
        |  max_by(o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey)
        |    AS best_order,
        |  min_by(o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey)
        |    AS worst_order,
        |  CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
        |FROM orders
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin))

  /** q_agg_mode (added r8) — DETERMINISTIC per-group mode: the peak
    * activity hour per event type (most frequent hour-of-day, ties
    * broken toward the smaller hour). Mode is the imputation/profiling
    * aggregate every EDA pass wants, but both engines' built-in
    * `mode()` leaves ties ENGINE-CHOICE (DuckDB documents arbitrary
    * tie-break) — so the operator derives it as count + row_number
    * with a total order (n DESC, h ASC), which is the only way a mode
    * can be oracle-checked at all. The derivation IS the point: a
    * nondeterministic aggregate becomes deterministic by making its
    * tie-break explicit.
    *
    * Scale (100 TB): counts collapse to the (event_type × 24) grid
    * before the window — the raw stream partial-aggregates map-side,
    * one bounded shuffle, and the row_number runs over a domain-sized
    * table. */
  val qAggMode: Q = Q(
    "q_agg_mode",
    (s, dir) => {
      import s.implicits._
      val counts = Tables.events(s, dir)
        .groupBy($"event_type", hour($"ts").cast(LongType).as("h"))
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"event_type").orderBy($"n".desc, $"h".asc)
      counts.withColumn("rn", row_number().over(w))
        .where($"rn" === 1)
        .select($"event_type", $"h".as("mode_hour"), $"n")
        .orderBy($"event_type")
    },
    oracle = Some(
      """WITH c AS (
        |  SELECT event_type, CAST(date_part('hour', ts) AS BIGINT) AS h,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, h, n,
        |    row_number() OVER (
        |      PARTITION BY event_type ORDER BY n DESC, h ASC) AS rn
        |  FROM c)
        |SELECT event_type, h AS mode_hour, n FROM r WHERE rn = 1
        |ORDER BY event_type""".stripMargin))

  /** q_agg_bool — the BOOLEAN-aggregate battery (bool_and / bool_or /
    * filtered count), the predicate-summary shapes a data-quality or
    * assertion layer aggregates with: per order priority, does EVERY
    * line ship with positive quantity (bool_and), does ANY line carry
    * the max 10% discount (bool_or), and how many lines are
    * tax-exempt (FILTER-style conditional count). All tri-state
    * boolean/count logic with identical semantics both engines; one
    * partial-agg shuffle to the 5-row priority domain. */
  val qAggBool: Q = Q(
    "q_agg_bool",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          bool_and($"l_quantity" > 0).as("all_qty_positive"),
          bool_or($"l_discount" >= 0.1).as("any_max_discount"),
          count(when($"l_tax" === 0.0, 1)).as("n_tax_exempt"))
        .orderBy($"o_orderpriority")
    },
    oracle = Some(
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  bool_and(l_quantity > 0) AS all_qty_positive,
        |  bool_or(l_discount >= 0.1) AS any_max_discount,
        |  COUNT(*) FILTER (WHERE l_tax = 0.0) AS n_tax_exempt
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin))

  /** q_agg_weighted_median (added r13) — EXACT WEIGHTED MEDIAN of the
    * extended price weighted by quantity, per return flag: the
    * curation statistic behind "half the sampled TOKENS come from
    * documents scoring below v" (weight = tokens, value = score) —
    * a plain median answers for documents, the weighted one for what
    * the model actually trains on.
    *
    * The SCALE DECISION is the two-phase bucketed algorithm, not the
    * textbook sort: an exact weighted median needs an ordered weight
    * scan, and a per-group window over raw values serializes each
    * group onto one task — at 100 TB a 3-group window is a 3-task job.
    * Instead: (1) weights partial-agg to (group, $100-bucket) — fully
    * parallel, domain-bounded; (2) one window over the BUCKET table
    * (≤ 6 k rows/group here, bounded by domain/width at any data
    * size) finds each group's median bucket + the cumulative weight
    * below it; (3) the exact in-bucket scan touches ~1/6000th of the
    * data (the bucket routing broadcasts — groups-bounded rows).
    * Everything integer until the final cents→dollars division:
    * values quantize once to cents, weights are exact Longs, and the
    * median pick is the smallest v with 2·(below + cum_v) ≥ total —
    * identical arithmetic in both engines. Headroom: Σw ≤ 50·rows —
    * Long-safe to ~10¹⁷ rows per group. */
  /** The two-phase exact weighted-median engine, factored so
    * WeightedStatsSpec can pin bucket-width invariance and brute-force
    * equality on planted sets. Input columns (g, v, w) — group, integer
    * value, integer weight; output (g, tw, med_v) with med_v the
    * smallest v whose cumulative weight crosses half of tw. */
  private[graft] def weightedMedianFrame(base: org.apache.spark.sql.DataFrame,
      bucketWidth: Long): org.apache.spark.sql.DataFrame = {
    require(bucketWidth >= 1, s"bucket width must be >= 1, got $bucketWidth")
    val bkt = base
      .withColumn("bucket", expr(s"v div $bucketWidth"))
      .groupBy(col("g"), col("bucket"))
      .agg(sum(col("w")).as("bw"))
    val winB = Window.partitionBy(col("g")).orderBy(col("bucket"))
    val cum = bkt
      .withColumn("cumb", sum(col("bw")).over(winB))
      .withColumn("tw", sum(col("bw")).over(Window.partitionBy(col("g"))))
    // The median bucket per group: first bucket where the running
    // weight crosses half. struct-min keeps (below, tw) of exactly
    // that bucket — bucket ids are unique per group, so the min is
    // total-ordered and deterministic.
    val medb = cum.where(col("cumb") * 2 >= col("tw"))
      .groupBy(col("g"))
      .agg(min(struct(col("bucket"), (col("cumb") - col("bw")).as("below"),
        col("tw"))).as("m"))
      .select(col("g"), col("m.bucket").as("bucket"),
        col("m.below").as("below"), col("m.tw").as("tw"))
    val inBucket = base
      .join(broadcast(medb), Seq("g"))
      .where(expr(s"v div $bucketWidth") === col("bucket"))
      .groupBy(col("g"), col("below"), col("tw"), col("v"))
      .agg(sum(col("w")).as("vw"))
    val winV = Window.partitionBy(col("g")).orderBy(col("v"))
    inBucket
      .withColumn("cumv", sum(col("vw")).over(winV))
      .where((col("below") + col("cumv")) * 2 >= col("tw"))
      .groupBy(col("g"))
      .agg(max(col("tw")).as("tw"), min(col("v")).as("med_v"))
  }

  val qAggWeightedMedian: Q = Q(
    "q_agg_weighted_median",
    (s, dir) => {
      import s.implicits._
      val base = Tables.lineitem(s, dir)
        .select($"l_returnflag".as("g"),
          (dec2($"l_extendedprice") * 100).cast(LongType).as("v"),
          $"l_quantity".cast(LongType).as("w"))
      weightedMedianFrame(base, bucketWidth = 10000L) // $100 in cents
        .select($"g".as("l_returnflag"), $"tw".as("total_weight"),
          round($"med_v".cast(DoubleType) / 100.0, 2).as("weighted_median"))
        .orderBy($"l_returnflag")
    },
    oracle = Some(
      """WITH vw AS (
        |  SELECT l_returnflag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS v,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (
        |  SELECT l_returnflag, v,
        |    SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum,
        |    SUM(w) OVER (PARTITION BY l_returnflag) AS tw
        |  FROM vw)
        |SELECT l_returnflag, CAST(MAX(tw) AS BIGINT) AS total_weight,
        |  ROUND(CAST(MIN(v) AS DOUBLE) / 100.0, 2) AS weighted_median
        |FROM c WHERE cum * 2 >= tw
        |GROUP BY 1
        |ORDER BY 1""".stripMargin))

  val all: Vector[Q] = Vector(
    qAggGlobal, qAggGroupby, qAggDistinct, qAggHaving,
    qAggGroupingSets, qAggStats, qAggPercentile, qAggStringagg,
    qAggApproxHll, qAggApproxPercentile, qAggCustomTyped, qAggHeavyHitters,
    qAggSketchUnion, qAggMinmaxBy, qAggMode, qAggBool, qAggWeightedMedian)
}
