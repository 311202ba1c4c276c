package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming joins (StreamJoinQueries): the replayed stream-static and
  * stream-stream rows must equal their oracle-checked batch twins, and
  * the stream-stream join must emit incrementally across micro-batches
  * with bounded state (watermark + range condition). */
class StreamJoinSpec extends AnyFunSuite with SparkFixture {

  test("replayed stream-static enrich equals the batch twin") {
    val streamed = Catalog.byName("q_stream_static_enrich")
      .build(spark, sfDir)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
      .toSet
    // The batch twin casts win_start to ntz for its oracle; in the
    // session's UTC zone the instant is identical.
    val batch = Catalog.byName("q_enrich_batch").build(spark, sfDir)
      .withColumn("win_start", col("win_start").cast("timestamp"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
      .toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("replayed stream-stream join equals the batch twin row-for-row") {
    val streamed = Catalog.byName("q_stream_stream_join")
      .build(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val batch = Catalog.byName("q_join_event_pairs")
      .build(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(streamed.sameElements(batch))
    assert(streamed.nonEmpty)
  }

  test("replayed outer stream-stream join lands pairs + watermark-expired views") {
    import spark.implicits._
    val landed = Catalog.byName("q_stream_stream_outer")
      .build(spark, sfDir).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet

    // Expectation, derived batch-side: every matched pair, plus every
    // UNMATCHED view whose 1-hour horizon closed before the final
    // watermark (max event time − 10 min delay). Views newer than that
    // hold state the query drops unemitted at shutdown.
    val ev = Tables.events(spark, sfDir)
    val matched = Catalog.byName("q_join_event_pairs")
      .build(spark, sfDir).collect()
      .map(r => (r.getLong(0), Some(r.getLong(1)): Option[Long]))
    val wmMicros = ev.agg(org.apache.spark.sql.functions.max(
        unix_micros(col("ts")))).head.getLong(0) - 600000000L
    val expiredUnmatched = ev.where(col("event_type") === "view")
      .where(unix_micros(col("ts")) + 3600000000L < wmMicros)
      .select(col("event_id"), col("user_id"), col("ts"))
      .collect()
      .filter(v => !matched.exists(_._1 == v.getLong(0)))
      .map(v => (v.getLong(0), None: Option[Long]))
    val expected = matched.toSet ++ expiredUnmatched
    assert(landed == expected,
      s"missing=${(expected -- landed).take(5)} extra=${(landed -- expected).take(5)}")
    assert(expiredUnmatched.nonEmpty,
      "fixture must exercise the null-padded expiry path")
  }

  test("stream-stream inner join emits matches incrementally across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

    val views = MemoryStream[(Long, Timestamp, Long, String)]
    val purchases = MemoryStream[(Long, Timestamp, Long, String)]
    def df(m: MemoryStream[(Long, Timestamp, Long, String)]) =
      m.toDF.toDF("event_id", "ts", "user_id", "event_type")

    val v = df(views).where($"event_type" === "view")
      .select($"event_id".as("view_event_id"), $"user_id",
        $"ts".as("v_ts"))
      .withWatermark("v_ts", "10 minutes")
    val p = df(purchases).where($"event_type" === "purchase")
      .select($"event_id".as("purchase_event_id"),
        $"user_id".as("p_user"), $"ts".as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val joined = v.join(p,
      $"user_id" === $"p_user" && $"p_ts" >= $"v_ts" &&
        $"p_ts" <= $"v_ts" + expr("INTERVAL 1 HOUR"))
      .select($"view_event_id", $"purchase_event_id")

    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ssj_test").start()
    try {
      // Batch 1: a view with no purchase yet — nothing emits, the view
      // row waits in join state.
      views.addData((1L, ts(0), 7L, "view"))
      q.processAllAvailable()
      assert(spark.table("ssj_test").count() == 0)

      // Batch 2: a purchase 30 min later for the same user — the pair
      // emits (inner-join match needs no watermark to fire).
      purchases.addData((2L, ts(30), 7L, "purchase"))
      q.processAllAvailable()
      assert(spark.table("ssj_test").as[(Long, Long)].collect().toSet ==
        Set((1L, 2L)))

      // Batch 3: a purchase 2 h after the view — outside the range
      // condition, no new pair.
      purchases.addData((3L, ts(120), 7L, "purchase"))
      q.processAllAvailable()
      assert(spark.table("ssj_test").count() == 1)
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join emits null-padded rows on watermark advance") {
    // The outer side can only emit its unmatched rows once the watermark
    // proves no future match can arrive (v_ts + 1 h + 10 min delay has
    // passed on BOTH inputs — the global watermark is their minimum).
    // This is the semantics that makes outer stream joins safe at scale:
    // state is held exactly until the time bound expires, then released
    // as a null-padded emission.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

    val views = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    val v = views.toDF.toDF("view_event_id", "v_ts", "user_id")
      .withWatermark("v_ts", "10 minutes")
    val p = purchases.toDF.toDF("purchase_event_id", "p_ts", "p_user")
      .withWatermark("p_ts", "10 minutes")
    val joined = v.join(p,
      $"user_id" === $"p_user" && $"p_ts" >= $"v_ts" &&
        $"p_ts" <= $"v_ts" + expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select($"view_event_id", $"purchase_event_id")

    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ssj_outer_test").start()
    try {
      // An unmatched view: nothing may emit while a match is possible.
      views.addData((1L, ts(0), 7L))
      q.processAllAvailable()
      assert(spark.table("ssj_outer_test").count() == 0)

      // Advance BOTH watermarks far past ts0 + 1 h (+ the 10-min delay);
      // the sentinel rows are for different users, so no pair forms.
      views.addData((90L, ts(300), 8L))
      purchases.addData((91L, ts(300), 9L))
      q.processAllAvailable()
      // State-eviction emissions land in a follow-up batch after the
      // watermark update; poke one more cycle.
      views.addData((92L, ts(310), 8L))
      purchases.addData((93L, ts(310), 9L))
      q.processAllAvailable()

      val rows = spark.table("ssj_outer_test")
        .as[(Long, Option[Long])].collect().toSet
      assert(rows.contains((1L, None)),
        s"expected the expired view emitted null-padded, got $rows")

      // The eviction must also RELEASE the state (what bounds the join
      // at scale): the final progress's state row count sits below the
      // peak — expired rows left the store, they weren't just emitted.
      // (Later sentinel rows re-grow the count, so the signal is any
      // batch-over-batch DROP, not the final value.)
      val totals = q.recentProgress.toSeq
        .filter(_.stateOperators.nonEmpty)
        .map(_.stateOperators.map(_.numRowsTotal).sum)
      assert(totals.sliding(2).exists(w => w.size == 2 && w(1) < w(0)),
        s"join state should shrink after watermark eviction: $totals")
    } finally q.stop()
  }
}
