package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed equi joins (100 TB toolkit; SURVEY §2.3 scale
  * notes). AQE's runtime skew-join split handles most cases, but when one
  * hot key dominates a fact⋈fact join, salting pre-spreads it: the skewed
  * side gets a random-but-deterministic salt in [0, n), the other side
  * explodes each row to all n salts, and the join key becomes (key, salt)
  * — the hot key's rows land on n shuffle partitions instead of one.
  *
  * The salt is `pmod(hash(unique tiebreak cols), n)` — deterministic, so
  * results are reproducible run-to-run (no rand(): nondeterministic
  * expressions would also break retry semantics at scale).
  */
object SkewJoin {

  /** Inner equi join of `skewed` and `other` on `key`, with the skewed
    * side salted `n` ways using `tiebreak` columns for the deterministic
    * salt. Result columns = skewed.* ++ other.* (minus the duplicate
    * key), same as a plain inner join on the key. */
  def saltedInnerJoin(
      skewed: DataFrame,
      other: DataFrame,
      key: String,
      n: Int,
      tiebreak: Seq[String]): DataFrame = {
    require(n > 0)
    val salted = skewed.withColumn("_salt",
      pmod(hash(tiebreak.map(col): _*), lit(n)))
    val exploded = other.withColumn("_salt",
      explode(array((0 until n).map(lit): _*)))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }

  /** q_join_skew_salted — the salting library demonstrated END TO END on
    * a deliberately skewed corpus, oracle-checked: nine of ten events
    * collapse onto hot key 0 (the Zipf-head shape that melts a naive
    * shuffle join), the dim side carries a label per key, and the salted
    * join (16 salts keyed by the unique event_id) must produce exactly
    * the plain join's aggregate. The dim side is hinted shuffle_hash —
    * a broadcast would bypass the fact-side shuffle and demonstrate
    * nothing (real skew pain is fact⋈fact, where broadcast is not an
    * option). `SkewJoinSpec` measures the partition histogram: the
    * naive plan concentrates the hot key on ONE shuffle partition, the
    * salted plan spreads it ~n ways; `PlanAuditSpec` pins (key, _salt)
    * join keys in the physical plan. */
  val qJoinSkewSalted: Q = Q(
    "q_join_skew_salted",
    (s, dir) => {
      import s.implicits._
      val fact = Tables.events(s, dir).select(
        when(pmod($"user_id", lit(10)) < 9, 0L).otherwise($"user_id").as("k"),
        $"event_id")
      val dim = fact.select($"k").distinct()
        .withColumn("label", concat(lit("u"), $"k"))
      saltedInnerJoin(fact, dim.hint("shuffle_hash"), "k", 16, Seq("event_id"))
        .groupBy($"label")
        .agg(count(lit(1)).as("n_events"))
        .orderBy($"label")
    },
    oracle = Some(
      """WITH f AS (
        |  SELECT CASE WHEN user_id % 10 < 9 THEN 0 ELSE user_id END AS k,
        |    event_id
        |  FROM events),
        |d AS (SELECT DISTINCT k, 'u' || CAST(k AS VARCHAR) AS label FROM f)
        |SELECT label, COUNT(*) AS n_events
        |FROM f JOIN d USING (k)
        |GROUP BY label
        |ORDER BY label""".stripMargin))

  val all: Vector[Q] = Vector(qJoinSkewSalted)
}
