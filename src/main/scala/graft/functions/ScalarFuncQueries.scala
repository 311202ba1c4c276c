package graft.functions

import graft.{Q, Tables}
import graft.Dsl._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-function surface — SURVEY.md §2.8 rows 36–40.
  *
  * Dialect notes (rule 5): Spark `dayofweek` is 1=Sunday vs DuckDB's
  * 0=Sunday (twin adds 1); Spark ceil/floor/length/year return narrower
  * or wider ints than DuckDB (both sides cast to BIGINT); rounding
  * boundaries avoid exact .5 by dividing by 7 before rounding; regex stays
  * in the RE2∩Java subset. All expressions are codegen'd built-ins — no
  * UDFs — so pushdown and whole-stage codegen survive (100 TB rule).
  */
object ScalarFuncQueries {

  /** #36 q_str_funcs — string function battery over part. */
  val qStrFuncs: Q = Q(
    "q_str_funcs",
    (s, dir) => {
      import s.implicits._
      Tables.part(s, dir)
        .select(
          $"p_partkey",
          upper($"p_name").as("uname"),
          lower($"p_brand").as("lbrand"),
          substring($"p_name", 1, 5).as("sub5"),
          length($"p_name").cast(LongType).as("name_len"),
          regexp_replace($"p_name", " ", "_").as("snake"),
          lpad($"p_size".cast(StringType), 4, "0").as("size_pad"),
          concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
          element_at(split($"p_name", " "), 1).as("first_tok"),
          regexp_extract($"p_type", "^([A-Z]+)", 1).as("type_head"),
          trim(concat(lit("  "), $"p_brand", lit("  "))).as("trimmed"))
        .orderBy($"p_partkey")
    },
    oracle = Some(
      """SELECT p_partkey,
        |  upper(p_name) AS uname,
        |  lower(p_brand) AS lbrand,
        |  substring(p_name, 1, 5) AS sub5,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  replace(p_name, ' ', '_') AS snake,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  string_split(p_name, ' ')[1] AS first_tok,
        |  regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
        |  trim('  ' || p_brand || '  ') AS trimmed
        |FROM part
        |ORDER BY p_partkey""".stripMargin))

  /** #37 q_date_funcs — datetime battery over orders (dow offset per
    * rule 5: DuckDB dow is 0=Sunday, Spark is 1=Sunday). */
  val qDateFuncs: Q = Q(
    "q_date_funcs",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .select(
          $"o_orderkey",
          year($"o_orderdate").cast(LongType).as("yr"),
          month($"o_orderdate").cast(LongType).as("mo"),
          dayofmonth($"o_orderdate").cast(LongType).as("dom"),
          // date_trunc always returns LTZ TimestampType; cast back to NTZ
          // so the written parquet matches DuckDB's naive TIMESTAMP.
          date_trunc("month", $"o_orderdate").cast("timestamp_ntz")
            .as("month_start"),
          date_add($"o_orderdate", 30).as("plus30"),
          last_day($"o_orderdate").as("month_end"),
          dayofweek($"o_orderdate").cast(LongType).as("dow1sun"),
          datediff($"o_orderdate", to_date(lit("1995-01-01")))
            .cast(LongType).as("days_since_95"))
        .orderBy($"o_orderkey")
    },
    oracle = Some(
      """SELECT o_orderkey,
        |  year(o_orderdate) AS yr,
        |  month(o_orderdate) AS mo,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
        |  last_day(o_orderdate) AS month_end,
        |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow1sun,
        |  datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin))

  /** #38 q_math_funcs — math battery over customer balances; every
    * transcendental output rounded (rule 2), and the explicit-round test
    * divides by 7 first so no exact-.5 boundary exists (rule 5). */
  val qMathFuncs: Q = Q(
    "q_math_funcs",
    (s, dir) => {
      import s.implicits._
      Tables.customer(s, dir)
        .select(
          $"c_custkey",
          abs($"c_acctbal").as("ab"),
          ceil($"c_acctbal").as("ce"),
          floor($"c_acctbal").as("fl"),
          round($"c_acctbal" / 7.0, 2).as("r7"),
          round(pow($"c_acctbal", 2), 4).as("sq"),
          round(sqrt(abs($"c_acctbal")), 4).as("sq_root"),
          round(log(abs($"c_acctbal") + 1.0), 4).as("ln1p"),
          round(exp($"c_acctbal" / 10000.0), 4).as("ex"),
          ($"c_custkey" % 7).as("m7"),
          signum($"c_acctbal").cast(LongType).as("sgn"),
          greatest($"c_acctbal", lit(0.0)).as("gr"),
          least($"c_acctbal", lit(0.0)).as("le"))
        .orderBy($"c_custkey")
    },
    oracle = Some(
      """SELECT c_custkey,
        |  abs(c_acctbal) AS ab,
        |  CAST(ceil(c_acctbal) AS BIGINT) AS ce,
        |  CAST(floor(c_acctbal) AS BIGINT) AS fl,
        |  ROUND(c_acctbal / 7.0, 2) AS r7,
        |  ROUND(pow(c_acctbal, 2), 4) AS sq,
        |  ROUND(sqrt(abs(c_acctbal)), 4) AS sq_root,
        |  ROUND(ln(abs(c_acctbal) + 1.0), 4) AS ln1p,
        |  ROUND(exp(c_acctbal / 10000.0), 4) AS ex,
        |  c_custkey % 7 AS m7,
        |  CAST(sign(c_acctbal) AS BIGINT) AS sgn,
        |  greatest(c_acctbal, CAST(0 AS DOUBLE)) AS gr,
        |  least(c_acctbal, CAST(0 AS DOUBLE)) AS le
        |FROM customer
        |ORDER BY c_custkey""".stripMargin))

  /** #39 q_array_funcs — higher-order functions over the embedding
    * vectors; per-row left folds, double math on both sides (rule 2). */
  val qArrayFuncs: Q = Q(
    "q_array_funcs",
    (s, dir) => {
      import s.implicits._
      Tables.embeddings(s, dir)
        .select(
          $"vec_id",
          size($"embedding").cast(LongType).as("arr_len"),
          round(element_at($"embedding", 1).cast(DoubleType), 4).as("first_elem"),
          round(aggregate(slice($"embedding", 1, 3), lit(0.0),
            (acc, x) => acc + x.cast(DoubleType)), 4).as("first3_sum"),
          size(filter($"embedding", x => x > 0f)).cast(LongType).as("n_pos"),
          round(aggregate($"embedding", lit(0.0),
            (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)), 4)
            .as("sum_sq"))
        .orderBy($"vec_id")
    },
    oracle = Some(
      """SELECT vec_id,
        |  len(embedding) AS arr_len,
        |  ROUND(CAST(embedding[1] AS DOUBLE), 4) AS first_elem,
        |  ROUND(list_sum(list_transform(embedding[1:3], x -> CAST(x AS DOUBLE))), 4) AS first3_sum,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
        |  ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sum_sq
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin))

  /** #40 q_json_extract — both JSON access paths (get_json_object and
    * from_json→struct field) over events.props, aggregated by k-bucket. */
  val qJsonExtract: Q = Q(
    "q_json_extract",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .withColumn("k",
          get_json_object($"props", "$.k").cast(IntegerType))
        .withColumn("k2",
          from_json($"props", "k INT", Map.empty[String, String]).getField("k"))
        .groupBy(floor($"k" / 10).as("bucket"))
        .agg(
          count(lit(1)).as("n"),
          min($"k2").as("min_k"),
          max($"k2").as("max_k"),
          countDistinct($"user_id").as("n_users"))
        .orderBy($"bucket")
    },
    oracle = Some(
      """SELECT CAST(k // 10 AS BIGINT) AS bucket, COUNT(*) AS n,
        |  MIN(k) AS min_k, MAX(k) AS max_k,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM (SELECT CAST(props->>'k' AS INT) AS k, user_id FROM events)
        |GROUP BY bucket
        |ORDER BY bucket""".stripMargin))

  /** q_null_semantics (added r7) — the NULL contract in one oracle row,
    * because engines disagree here more than anywhere else: (1) NULL
    * group keys aggregate into ONE group; (2) count(*) counts rows but
    * count(col) skips NULLs; (3) SUM skips NULLs; (4) null-safe
    * equality (Spark `<=>` ≡ DuckDB IS NOT DISTINCT FROM) joins the
    * NULL group to itself where plain `=` would drop it; (5) ascending
    * NULLS FIRST ordering — stated explicitly since Spark defaults
    * NULLS FIRST but DuckDB defaults NULLS LAST. Derived NULLs (every
    * 7th user's key, every 'error' value) keep the row deterministic
    * from fixture data alone.
    *
    * Shape: two partial-agg shuffles on the same 7-value key domain
    * (NULL + residues 1–6) +
    * a domain-sized null-safe join — at 100 TB the join inputs are
    * key-domain-sized, so this is broadcast territory; the semantics,
    * not the volume, are the point.
    */
  val qNullSemantics: Q = Q(
    "q_null_semantics",
    (s, dir) => {
      import s.implicits._
      val keyed = Tables.events(s, dir)
        .withColumn("k",
          when(pmod($"user_id", lit(7)) === 0, lit(null).cast("long"))
            .otherwise(pmod($"user_id", lit(7))))
        .withColumn("v",
          when($"event_type" === "error", lit(null).cast("double"))
            .otherwise($"value"))
      val a1 = keyed.groupBy($"k").agg(
        count(lit(1)).as("n_rows"),
        count($"v").as("n_vals"),
        sum(dec2($"v")).cast(DoubleType).as("sum_v"))
      val a2 = keyed.groupBy($"k".as("k2")).agg(
        countDistinct($"user_id").as("n_users"))
      a1.join(a2, $"k" <=> $"k2")
        .select($"k", $"n_rows", $"n_vals", $"sum_v", $"n_users")
        .orderBy($"k".asc_nulls_first)
    },
    oracle = Some(
      """WITH keyed AS (
        |  SELECT CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id % 7 END AS k,
        |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v,
        |    user_id
        |  FROM events),
        |a1 AS (
        |  SELECT k, count(*) AS n_rows, count(v) AS n_vals,
        |    CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |  FROM keyed GROUP BY k),
        |a2 AS (SELECT k AS k2, count(DISTINCT user_id) AS n_users
        |       FROM keyed GROUP BY k)
        |SELECT k, n_rows, n_vals, sum_v, n_users
        |FROM a1 JOIN a2 ON k IS NOT DISTINCT FROM k2
        |ORDER BY k NULLS FIRST""".stripMargin))

  /** q_map_funcs (added r7) — the MAP column surface completing §2.8
    * (arrays and JSON have their own rows): per-row map construction,
    * scalar key lookup, cardinality, and ordered key/value listings.
    * Dialect notes: DuckDB's element_at/map_extract return a LIST (the
    * twin unwraps with [1]); both engines preserve construction order
    * in map_keys/map_values, which is what makes the joined listings
    * deterministic. Narrow codegen'd projection, no shuffle. */
  val qMapFuncs: Q = Q(
    "q_map_funcs",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .withColumn("m", map(
          lit("type"), $"event_type",
          lit("user"), $"user_id".cast(StringType)))
        .select(
          $"event_id",
          element_at($"m", "type").as("mtype"),
          size($"m").cast(LongType).as("m_size"),
          array_join(map_keys($"m"), ",").as("mkeys"),
          array_join(map_values($"m"), ",").as("mvals"))
        .orderBy($"event_id")
    },
    oracle = Some(
      """SELECT event_id,
        |  map_extract(m, 'type')[1] AS mtype,
        |  CAST(cardinality(m) AS BIGINT) AS m_size,
        |  array_to_string(map_keys(m), ',') AS mkeys,
        |  array_to_string(map_values(m), ',') AS mvals
        |FROM (SELECT event_id,
        |        map(['type', 'user'],
        |            [event_type, CAST(user_id AS VARCHAR)]) AS m
        |      FROM events)
        |ORDER BY event_id""".stripMargin))

  /** q_bitwise_funcs — the BITWISE battery (AND/OR/XOR, shifts,
    * popcount), the scalar substrate the SimHash/fingerprint family is
    * built from, exercised as its own oracle row: per event_id k, a
    * 4-bit band extract ((k >> 2) & 15), a shift-mix
    * (k ^ ((k & 2⁶⁰−1) << 3)) — the mask runs BEFORE the shift because
    * overflow behavior differs where it matters: DuckDB 1.0 raises
    * "Overflow in left shift" while Spark wraps silently, so an
    * unmasked k ≥ 2⁶⁰ would abort the twin; pre-masked, the shift
    * stays in-range in both — and bit_count(k). All pure integer ops
    * with identical two's-complement semantics in both engines; narrow
    * codegen'd scan, no shuffle. */
  val qBitwiseFuncs: Q = Q(
    "q_bitwise_funcs",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select($"event_id",
          (shiftright($"event_id", 2).bitwiseAND(lit(15L))).as("band"),
          ($"event_id".bitwiseXOR(
            shiftleft($"event_id".bitwiseAND(lit(0x0fffffffffffffffL)), 3)))
            .as("mix"),
          bit_count($"event_id").cast(IntegerType).as("popcnt"))
        .orderBy($"event_id")
    },
    oracle = Some(
      """SELECT event_id,
        |  (event_id >> 2) & 15 AS band,
        |  xor(event_id, (event_id & 1152921504606846975) << 3) AS mix,
        |  CAST(bit_count(event_id) AS INTEGER) AS popcnt
        |FROM events
        |ORDER BY event_id""".stripMargin))

  val all: Vector[Q] =
    Vector(qStrFuncs, qDateFuncs, qMathFuncs, qArrayFuncs, qJsonExtract,
      qNullSemantics, qMapFuncs, qBitwiseFuncs)
}
