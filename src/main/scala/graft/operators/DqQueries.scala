package graft.operators

import graft.{Q, Tables}
import graft.Dsl._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality gates — the checks a production ingest runs BEFORE any
  * downstream operator sees the data (SURVEY.md §2.10b governance).
  * Reference repo (/root/reference) is an empty stub (README.md:1-2),
  * so the surface follows the north star: a 100 TB pipeline promotes a
  * batch only if its expectation suite and referential audit pass.
  *
  * Both rows follow the q_profile_table report discipline: ONE
  * aggregation pass computes every statistic, and the per-rule report
  * rows come from unpivoting the 1-row aggregate over the bounded rule
  * domain — never from N separate scans. Rates are integer ppm
  * (n·10⁶ div total), the micro-unit device that keeps the whole
  * report in exact long arithmetic.
  */
object DqQueries {

  /** q_dq_expectations — EXPECTATION SUITE over the order/lineitem
    * facts: five domain rules (non-positive quantity, discount outside
    * [0, 0.1], tax above 0.08, ship-before-order, ship-after-horizon)
    * evaluated in ONE pass over the joined facts. The fixtures
    * deliberately violate ship-before-order on ~47% of rows
    * (FIXTURES.md pins that TPC-H's date invariant does NOT hold
    * here), so the suite is non-degenerate: three rules pass, one
    * fires massively, one guards the horizon — exactly the mixed
    * verdict a real gate renders. Scale: one keyed fact-fact join
    * (orders side is ¼ the rows; AQE picks the join strategy) + one
    * partial agg collapsing to a single row; the stack unpivot runs on
    * that 1 row. Comparisons on 2-dp-exact doubles against 2-dp
    * literals are bit-identical in both engines. */
  val qDqExpectations: Q = Q(
    "q_dq_expectations",
    (s, dir) => {
      import s.implicits._
      val j = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      val agg = j.agg(
        count(lit(1)).as("n_rows"),
        sum(when($"l_quantity" <= 0, 1L).otherwise(0L)).as("c1"),
        sum(when($"l_discount" < 0 || $"l_discount" > 0.1, 1L).otherwise(0L))
          .as("c2"),
        sum(when($"l_tax" > 0.08, 1L).otherwise(0L)).as("c3"),
        sum(when($"l_shipdate" < $"o_orderdate", 1L).otherwise(0L)).as("c4"),
        sum(when($"l_shipdate" > lit("2001-12-31").cast("timestamp_ntz"), 1L)
          .otherwise(0L)).as("c5"))
      agg.select(
          expr("stack(5, 'discount_range', c2, 'quantity_nonpositive', c1, " +
            "'ship_after_horizon', c5, 'ship_before_order', c4, " +
            "'tax_range', c3) AS (rule, n_bad)"),
          $"n_rows")
        .withColumn("bad_ppm", expr("n_bad * 1000000 div n_rows"))
        .orderBy($"rule")
    },
    oracle = Some(
      """WITH j AS (
        |  SELECT l_quantity, l_discount, l_tax, l_shipdate, o_orderdate
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |a AS (
        |  SELECT COUNT(*) AS n_rows,
        |    CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        |    CAST(SUM(CASE WHEN l_tax > 0.08 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
        |    CAST(SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c4,
        |    CAST(SUM(CASE WHEN l_shipdate > TIMESTAMP '2001-12-31 00:00:00'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c5
        |  FROM j),
        |r AS (
        |  SELECT 'quantity_nonpositive' AS rule, c1 AS n_bad, n_rows FROM a
        |  UNION ALL SELECT 'discount_range', c2, n_rows FROM a
        |  UNION ALL SELECT 'tax_range', c3, n_rows FROM a
        |  UNION ALL SELECT 'ship_before_order', c4, n_rows FROM a
        |  UNION ALL SELECT 'ship_after_horizon', c5, n_rows FROM a)
        |SELECT rule, n_bad, n_rows, n_bad * 1000000 // n_rows AS bad_ppm
        |FROM r
        |ORDER BY rule""".stripMargin))

  /** q_dq_orphans — REFERENTIAL-INTEGRITY audit across the three fact
    * FKs (lineitem→part, lineitem→supplier, orders→customer). The
    * fixtures hold integrity (0 orphans — profiled, all SFs), which
    * would make the audit vacuous, so the row models the scenario the
    * audit exists for: a dimension purge (the q_gdpr_erasure device —
    * md5 gate retires ~10% of each dimension's keys, a deterministic
    * pure function of the key, identical in both engines) strands the
    * facts that referenced the purged rows, and the audit must count
    * exactly them. Scale: each dimension is broadcast-sized by
    * definition; three broadcast anti-join counts + three narrow fact
    * scans, unioned into a domain-sized (3-row) report — the fact
    * table never shuffles. */
  val qDqOrphans: Q = Q(
    "q_dq_orphans",
    (s, dir) => {
      import s.implicits._
      def audit(fk: String, fact: org.apache.spark.sql.DataFrame,
          key: String, dim: org.apache.spark.sql.DataFrame,
          dimKey: String) = {
        val kept = dim.where(not(md5Gate(col(dimKey), "1a")))
          .select(col(dimKey).as(key))
        val total = fact.agg(count(lit(1)).as("n_rows"))
        fact.select(col(key))
          .join(broadcast(kept), Seq(key), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
          .crossJoin(broadcast(total))
          .select(lit(fk).as("fk"), $"n_orphans", $"n_rows",
            expr("n_orphans * 1000000 div n_rows").as("orphan_ppm"))
      }
      audit("lineitem.l_partkey->part",
          Tables.lineitem(s, dir), "l_partkey",
          Tables.part(s, dir), "p_partkey")
        .unionAll(audit("lineitem.l_suppkey->supplier",
          Tables.lineitem(s, dir), "l_suppkey",
          Tables.supplier(s, dir), "s_suppkey"))
        .unionAll(audit("orders.o_custkey->customer",
          Tables.orders(s, dir), "o_custkey",
          Tables.customer(s, dir), "c_custkey"))
        .orderBy($"fk")
    },
    oracle = Some {
      // NOT EXISTS, not NOT IN: Spark's left_anti counts a NULL-keyed
      // fact as an orphan, while NOT IN's three-valued logic silently
      // drops it (and one NULL dim key would zero EVERY audit) — the
      // exact null-semantics failure an integrity audit must not have.
      def one(fk: String, fact: String, key: String, dim: String,
          dimKey: String) =
        s"""SELECT '$fk' AS fk,
           |  (SELECT COUNT(*) FROM $fact f WHERE NOT EXISTS
           |    (SELECT 1 FROM $dim d
           |     WHERE d.$dimKey = f.$key
           |       AND NOT ${md5GateSql("d." + dimKey, "1a")})) AS n_orphans,
           |  (SELECT COUNT(*) FROM $fact) AS n_rows""".stripMargin
      s"""WITH r AS (
         |${one("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey")}
         |UNION ALL
         |${one("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey")}
         |UNION ALL
         |${one("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey")})
         |SELECT fk, n_orphans, n_rows,
         |  n_orphans * 1000000 // n_rows AS orphan_ppm
         |FROM r
         |ORDER BY fk""".stripMargin
    })

  /** q_dq_benford — BENFORD'S-LAW FIRST-DIGIT AUDIT of the payment
    * amounts: fabricated or unit-mangled numeric columns drift from
    * the log-uniform leading-digit law, making this the classic
    * forensic data-quality screen (amounts spanning orders of
    * magnitude should show P(d) = log10(1+1/d)). Determinism: the
    * first SIGNIFICANT digit is scale-invariant, so it reads off the
    * exact integer CENTS as the first character of its decimal string
    * (substring(CAST(c AS VARCHAR),1,1) — byte-identical in both
    * engines; no float log in the digit extraction). Observed shares
    * quantize to exact integer ppm (n_d·10⁶ div N); the Benford
    * expectation quantizes ln(1+1/d)/ln(10) ONCE per digit over the
    * 9-row digit domain; only the final χ² contribution
    * (obs−exp)²/exp is floating, one identical expression, round 6.
    * Scale (100 TB): one narrow fact scan → 9-group partial agg;
    * everything else runs on the 9-row digit table. */
  val qDqBenford: Q = Q(
    "q_dq_benford",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types.LongType
      val digits = Tables.events(s, dir)
        .select((dec2($"value") * 100).cast(LongType).as("c"))
        .where($"c" > 0)
        .select(substring($"c".cast("string"), 1, 1).cast(LongType)
          .as("digit"))
        .groupBy($"digit").agg(count(lit(1)).as("n"))
      digits
        .crossJoin(broadcast(digits.agg(sum($"n").as("total"))))
        .select($"digit", $"n",
          expr("n * 1000000 div total").as("obs_ppm"),
          expr("CAST(floor(ln(1.0 + 1.0 / digit) / ln(10.0) * 1000000) AS BIGINT)")
            .as("exp_ppm"))
        .withColumn("chi_part",
          expr("ROUND(CAST((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm) AS DOUBLE) / exp_ppm, 6)"))
        .orderBy($"digit")
    },
    oracle = Some(
      """WITH digits AS (
        |  SELECT CAST(substring(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
        |    COUNT(*) AS n
        |  FROM (
        |    SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |    FROM events)
        |  WHERE c > 0 GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM digits)
        |SELECT digit, CAST(n AS BIGINT) AS n,
        |  n * 1000000 // total AS obs_ppm,
        |  CAST(floor(ln(1.0 + 1.0 / digit) / ln(10.0) * 1000000) AS BIGINT)
        |    AS exp_ppm,
        |  ROUND(CAST((n * 1000000 // total
        |      - CAST(floor(ln(1.0 + 1.0 / digit) / ln(10.0) * 1000000) AS BIGINT))
        |    * (n * 1000000 // total
        |      - CAST(floor(ln(1.0 + 1.0 / digit) / ln(10.0) * 1000000) AS BIGINT))
        |    AS DOUBLE)
        |    / CAST(floor(ln(1.0 + 1.0 / digit) / ln(10.0) * 1000000) AS BIGINT),
        |    6) AS chi_part
        |FROM digits, tot
        |ORDER BY digit""".stripMargin))

  /** q_dq_psi — POPULATION STABILITY INDEX of the value distribution
    * between the first and second half of the event stream: the
    * model-monitoring-standard drift score (PSI < 0.1 stable, > 0.25
    * act) that answers "has the FEATURE DISTRIBUTION my model was fit
    * on moved since" — the drift alarm [[qDqExpectations]]'s hard
    * rules can't express. PSI = Σ_bins (p_b − q_b)·ln(p_b/q_b) over a
    * fixed 10-bin cents grid (33.00-wide, top bin open). Determinism:
    * bin counts are exact Longs off ONE fact scan (conditional sums —
    * no per-half scan); shares are exact integer ppm (·10⁶ div n); the
    * log-ratio is formed on the CROSS-MULTIPLIED exact counts
    * ln((cp·nq)/(cq·np)) and quantized ONCE to integer micro-nats (the
    * WOE device), so each bin's contribution is the exact Long product
    * (p_ppm − q_ppm)·lr_micro and the total PSI is an exact Long sum —
    * no float sum whose order could differ between engines. Only the
    * two final /1e12 conversions round (6 dp). A bin empty on either
    * side is decided in integer space → NULL contribution both engines
    * (ln(0) never evaluated), excluded from the total by SQL NULL-sum
    * semantics, and flagged by zero_cell. The reference/current split
    * is DATA-RELATIVE (the q_events_decay RFM rule, not a pinned
    * fixture date): the midpoint day of [min(day), max(day)], decided
    * in exact integer datediffs — a regenerated fixture with any date
    * range still splits evenly (a single-day stream degenerates to
    * all-current → every bin zero_cell → PSI NULL, the honest "no
    * reference period" answer). Shape: ONE narrow fact scan partial-
    * aggs to the bounded (day × bin) domain; the split, totals, and
    * the PSI sum all run over that bounded table only. */
  val qDqPsi: Q = Q(
    "q_dq_psi",
    (s, dir) => {
      import s.implicits._
      val perDayBin = Tables.events(s, dir).select(
        to_date(date_trunc("day", $"ts")).as("day"),
        (dec2($"value") * 100).cast(LongType).as("c"))
        .select($"day",
          least(expr("c div 3300"), lit(9L)).cast(LongType).as("bin"))
        .groupBy($"day", $"bin").agg(count(lit(1)).as("n"))
      val bounds = broadcast(
        perDayBin.agg(min($"day").as("d0"), max($"day").as("d1")))
      val perBin = perDayBin.crossJoin(bounds)
        .withColumn("isp",
          when(expr("datediff(day, d0) < (datediff(d1, d0) + 1) div 2"),
            1L).otherwise(0L))
        .groupBy($"bin")
        .agg(sum($"isp" * $"n").as("cp"),
          sum((lit(1L) - $"isp") * $"n").as("cq"))
      val w = Window.partitionBy()
      val shares = perBin
        .withColumn("np", sum($"cp").over(w))
        .withColumn("nq", sum($"cq").over(w))
        // np/nq = 0 (every row on one side — the single-day degenerate
        // the data-relative split can produce) must be decided BEFORE
        // the division: Spark's non-ANSI div would yield NULL but
        // DuckDB's // RAISES, so the guard text is shared (r11 review).
        .withColumn("p_ppm",
          expr("CASE WHEN np = 0 THEN NULL ELSE cp * 1000000 div np END"))
        .withColumn("q_ppm",
          expr("CASE WHEN nq = 0 THEN NULL ELSE cq * 1000000 div nq END"))
        .withColumn("lr_micro",
          when($"cp" === 0 || $"cq" === 0, lit(null)).otherwise(expr(
            "CAST(floor(ln(CAST(cp AS DOUBLE) * nq / (CAST(cq AS DOUBLE) * np)) * 1000000) AS BIGINT)")))
        .withColumn("contrib_q", ($"p_ppm" - $"q_ppm") * $"lr_micro")
      shares
        .withColumn("psi", round(sum($"contrib_q").over(w)
          .cast(DoubleType) / 1e12, 6))
        .select($"bin", ($"bin" * 3300).as("lo_cents"), $"cp", $"cq",
          $"p_ppm", $"q_ppm",
          when($"cp" === 0 || $"cq" === 0, 1L).otherwise(0L).as("zero_cell"),
          round($"contrib_q".cast(DoubleType) / 1e12, 6).as("contrib"),
          $"psi")
        .orderBy($"bin")
    },
    oracle = Some(
      """WITH binned AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    LEAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      // 3300, 9) AS bin
        |  FROM events),
        |pdb AS (SELECT day, bin, COUNT(*) AS n FROM binned GROUP BY 1, 2),
        |bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM pdb),
        |per AS (
        |  SELECT bin,
        |    CAST(SUM(CASE WHEN datediff('day', d0, day)
        |        < (datediff('day', d0, d1) + 1) // 2 THEN n ELSE 0 END)
        |      AS BIGINT) AS cp,
        |    CAST(SUM(CASE WHEN datediff('day', d0, day)
        |        < (datediff('day', d0, d1) + 1) // 2 THEN 0 ELSE n END)
        |      AS BIGINT) AS cq
        |  FROM pdb, bounds GROUP BY 1),
        |sh AS (
        |  SELECT bin, cp, cq,
        |    CAST(SUM(cp) OVER () AS BIGINT) AS np,
        |    CAST(SUM(cq) OVER () AS BIGINT) AS nq
        |  FROM per),
        |lr AS (
        |  SELECT *,
        |    CASE WHEN np = 0 THEN NULL ELSE cp * 1000000 // np END AS p_ppm,
        |    CASE WHEN nq = 0 THEN NULL ELSE cq * 1000000 // nq END AS q_ppm,
        |    CASE WHEN cp = 0 OR cq = 0 THEN NULL
        |      ELSE CAST(floor(ln(CAST(cp AS DOUBLE) * nq
        |        / (CAST(cq AS DOUBLE) * np)) * 1000000) AS BIGINT) END
        |      AS lr_micro
        |  FROM sh),
        |cc AS (
        |  SELECT *, (p_ppm - q_ppm) * lr_micro AS contrib_q FROM lr)
        |SELECT bin, bin * 3300 AS lo_cents, cp, cq, p_ppm, q_ppm,
        |  CAST(CASE WHEN cp = 0 OR cq = 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS zero_cell,
        |  ROUND(CAST(contrib_q AS DOUBLE) / 1e12, 6) AS contrib,
        |  ROUND(CAST(SUM(contrib_q) OVER () AS DOUBLE) / 1e12, 6) AS psi
        |FROM cc
        |ORDER BY bin""".stripMargin))

  val all: Vector[Q] = Vector(qDqExpectations, qDqOrphans, qDqBenford, qDqPsi)
}
