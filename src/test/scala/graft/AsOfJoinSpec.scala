package graft

import graft.plans.AsOf
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native as-of join: must agree with the window formulation (the
  * oracle-checked q_join_self_asof semantics) on real fixture data, plan
  * through the injected strategy, and handle the no-prior-match edge. */
class AsOfJoinSpec extends AnyFunSuite with SparkFixture {

  private def purchases = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
  }

  private def signups = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .where($"event_type" === "signup")
      .select($"user_id".as("s_user"), $"ts".as("s_ts"),
        $"event_id".as("s_event"))
  }

  test("custom operator matches the window formulation on fixture events") {
    import spark.implicits._
    val got = AsOf.join(purchases, signups, "user_id", "ts", "s_user", "s_ts")
      .select($"event_id", $"s_ts")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString)).toMap

    // Window twin (same stack as q_join_self_asof).
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = Tables.events(spark, sfDir)
      .where($"event_type".isin("purchase", "signup"))
      .withColumn("signup_ts", when($"event_type" === "signup", $"ts"))
      .withColumn("last_signup_ts",
        last($"signup_ts", ignoreNulls = true).over(w))
      .where($"event_type" === "purchase")
      .select($"event_id", $"last_signup_ts")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString)).toMap

    assert(got.size == want.size)
    assert(got == want)
  }

  test("plans through AsOfJoinExec with key exchanges and (key,time) sorts") {
    val df = AsOf.join(purchases, signups, "user_id", "ts", "s_user", "s_ts")
    val plan = df.queryExecution.executedPlan.toString
    // TreeNode.nodeName strips the "Exec" suffix in plan strings.
    assert(plan.contains("AsOfJoin "))
    assert(plan.contains("hashpartitioning(user_id"))
    assert(plan.contains("hashpartitioning(s_user"))
    assert(plan.linesIterator.count(_.trim.startsWith("+- Sort")) >= 2 ||
      plan.contains("Sort [user_id"))
  }

  test("downstream aggregation on the key reuses the as-of partitioning") {
    import spark.implicits._
    // outputPartitioning passes the left child's hash partitioning
    // through, so the groupBy(user_id) must NOT add a third exchange on
    // top of the two feeding the as-of.
    val agg = AsOf.join(purchases, signups, "user_id", "ts", "s_user", "s_ts")
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 2,
      s"expected only the two child exchanges, saw $exchanges:\n$plan")
  }

  test("left rows with no prior right match get nulls (kept, not dropped)") {
    import spark.implicits._
    val l = Seq((1L, 100L, 10L), (2L, 100L, 50L)).toDF("id", "k", "t")
    val r = Seq((100L, 30L, "a")).toDF("rk", "rt", "tag")
    val rows = AsOf.join(l, r, "k", "t", "rk", "rt")
      .orderBy($"id").collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(4), "t=10 predates the only right row (rt=30)")
    assert(rows(1).getString(5) == "a")
  }

  test("picks the greatest right time <= left time, not just any match") {
    import spark.implicits._
    val l = Seq((1L, 7L, 100L)).toDF("id", "k", "t")
    val r = Seq((7L, 10L, "old"), (7L, 90L, "newest"), (7L, 110L, "future"))
      .toDF("rk", "rt", "tag")
    val row = AsOf.join(l, r, "k", "t", "rk", "rt").head()
    assert(row.getString(5) == "newest")
  }

  test("tied right timestamps: matched time is the tie, payload unspecified") {
    import spark.implicits._
    // Two right rows with the *same* (key, time) and NO tiebreak. The
    // operator pins the matched TIME (it is the tied value) but not
    // which tied row's payload wins — Spark's sort is unstable across
    // equal keys. Callers that project tied-row payloads should pass a
    // tiebreak (next test).
    val l = Seq((1L, 7L, 100L)).toDF("id", "k", "t")
    val r = Seq((7L, 90L, "tieA"), (7L, 90L, "tieB"), (7L, 10L, "old"))
      .toDF("rk", "rt", "tag")
    val row = AsOf.join(l, r, "k", "t", "rk", "rt").head()
    assert(row.getLong(4) == 90L, "the tied time itself is deterministic")
    assert(Set("tieA", "tieB").contains(row.getString(5)),
      "payload must come from one of the tied rows")
  }

  test("tied right timestamps with a tiebreak: max tiebreak row wins") {
    import spark.implicits._
    // With rightTieBreak the ties are DETERMINISTIC: the right side
    // sorts (key, time, tiebreak) and last-consumed-wins lands on the
    // greatest tiebreak. Mirrors the window twin's ORDER BY (ts,
    // event_id) last_value semantics — the r5 fixture no-tie
    // precondition is gone.
    val l = Seq((1L, 7L, 100L)).toDF("id", "k", "t")
    val r = Seq((7L, 90L, 2L, "mid"), (7L, 90L, 3L, "winner"),
        (7L, 90L, 1L, "low"), (7L, 10L, 9L, "old"))
      .toDF("rk", "rt", "seq", "tag")
    val row = AsOf.join(l, r, "k", "t", "rk", "rt",
      rightTieBreakCol = Some("seq")).head()
    assert(row.getLong(4) == 90L)
    assert(row.getString(6) == "winner",
      "the max-tiebreak tied row must be attached")
  }

  test("left time equal to right time matches (<=, not <)") {
    import spark.implicits._
    val l = Seq((1L, 7L, 90L)).toDF("id", "k", "t")
    val r = Seq((7L, 90L, "same_instant")).toDF("rk", "rt", "tag")
    assert(AsOf.join(l, r, "k", "t", "rk", "rt").head().getString(5)
      == "same_instant")
  }

  test("integer key/time columns read back primitively") {
    import spark.implicits._
    val l = Seq((1, 7, 100), (2, 7, 5)).toDF("id", "k", "t")
    val r = Seq((7, 90, "hit")).toDF("rk", "rt", "tag")
    val rows = AsOf.join(l, r, "k", "t", "rk", "rt")
      .orderBy($"id").collect()
    assert(rows(0).getString(5) == "hit")
    assert(rows(1).isNullAt(4))
  }

  test("tolerance: stale matches beyond the bound yield nulls, fresh ones join") {
    import spark.implicits._
    val l = Seq((1L, 7L, 100L), (2L, 7L, 200L)).toDF("id", "k", "t")
    val r = Seq((7L, 90L, "m")).toDF("rk", "rt", "tag")
    // Unbounded: both left rows match the t=90 right row.
    val unbounded = AsOf.join(l, r, "k", "t", "rk", "rt")
      .orderBy($"id").collect()
    assert(unbounded.forall(_.getString(5) == "m"))
    // Tolerance 50: t=100 (staleness 10) keeps the match, t=200
    // (staleness 110) is too stale and gets nulls — not dropped.
    val bounded = AsOf.join(l, r, "k", "t", "rk", "rt", Some(50L))
      .orderBy($"id").collect()
    assert(bounded.length == 2)
    assert(bounded(0).getString(5) == "m")
    assert(bounded(1).isNullAt(4) && bounded(1).isNullAt(5))
    // Boundary: staleness exactly == tolerance still matches (<=).
    val edge = AsOf.join(l, r, "k", "t", "rk", "rt", Some(10L))
      .orderBy($"id").collect()
    assert(edge(0).getString(5) == "m")
  }

  test("tolerance: Long.MinValue sentinel time cannot overflow into a match") {
    import spark.implicits._
    // t - Long.MinValue wraps negative in naive subtraction, which would
    // read as "fresh"; the saturated-threshold compare must reject it.
    val l = Seq((1L, 7L, 10L)).toDF("id", "k", "t")
    val r = Seq((7L, Long.MinValue, "ancient")).toDF("rk", "rt", "tag")
    val row = AsOf.join(l, r, "k", "t", "rk", "rt", Some(5L)).head()
    assert(row.isNullAt(4) && row.isNullAt(5),
      "astronomically stale sentinel must not match a finite tolerance")
    // And with no tolerance the sentinel is a legitimate match.
    val row2 = AsOf.join(l, r, "k", "t", "rk", "rt").head()
    assert(row2.getString(5) == "ancient")
  }

  test("catalog as-of rows agree with their window twins under planted ties") {
    // End-to-end guard replacing the r5 fixture no-tie precondition: add
    // a same-microsecond signup DUPLICATE for every signup (new unique
    // event_ids above the fixture range) and check the native operator
    // with the event_id tiebreak still matches the window formulation
    // ordered by (ts, event_id) — i.e. oracle equality no longer depends
    // on the fixture never growing ties.
    import spark.implicits._
    val events = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"ts", $"event_type")
    val maxId = events.agg(max($"event_id")).head().getLong(0)
    val tied = events.where($"event_type" === "signup")
      .select(($"event_id" + maxId + 1L).as("event_id"),
        $"user_id", $"ts", $"event_type")
    val withTies = events.unionByName(tied)

    val purchases = withTies.where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val signups = withTies.where($"event_type" === "signup")
      .select($"user_id".as("s_user"), $"ts".as("s_ts"),
        $"event_id".as("s_event"))
    val got = AsOf.join(purchases, signups, "user_id", "ts", "s_user", "s_ts",
        rightTieBreakCol = Some("s_event"))
      .select($"event_id", $"s_ts", $"s_event")
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.toString), Option(r.get(2)))).toMap

    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = withTies
      .withColumn("signup_ts", when($"event_type" === "signup", $"ts"))
      .withColumn("signup_id", when($"event_type" === "signup", $"event_id"))
      .withColumn("last_signup_ts", last($"signup_ts", ignoreNulls = true).over(w))
      .withColumn("last_signup_id", last($"signup_id", ignoreNulls = true).over(w))
      .where($"event_type" === "purchase")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[Any]("last_signup_ts")).map(_.toString),
          Option(r.getAs[Any]("last_signup_id")))).toMap

    assert(got.size == want.size)
    assert(got == want, "tiebreak semantics must match (ts, event_id) window order")
  }
}
