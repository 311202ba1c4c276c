package graft

import java.sql.Timestamp

import graft.streaming.{StatefulCounts, StatefulCountsTws, StreamingQueries}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantics (SURVEY.md §2.9 rows 41s–45, §5 item 4): each
  * streaming transform runs over a MemoryStream and is cross-checked
  * against its batch twin where one exists. All event times are explicit
  * so watermark advancement is deterministic. */
class StreamingSpec extends AnyFunSuite with SparkFixture {

  private def ts(minutes: Long): Timestamp =
    new Timestamp(1699999200000L + minutes * 60000L) // hour-aligned base

  // (event_id, ts, user_id, event_type, value)
  private type Ev = (Long, Timestamp, Long, String, Double)

  private def runAppend(
      name: String,
      transform: DataFrame => DataFrame,
      batches: Seq[Seq[Ev]]): Array[org.apache.spark.sql.Row] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val df = transform(input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value"))
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).collect()
  }

  test("#41s tumbling windows close under the watermark and match batch twin") {
    import spark.implicits._
    // Hour-0 events, then an event 2h later to push the watermark
    // (2h - 10min) past the hour-0 window end.
    val hour0: Seq[Ev] = Seq(
      (0L, ts(5), 1L, "click", 10.0),
      (1L, ts(20), 2L, "click", 5.5),
      (2L, ts(40), 1L, "view", 2.25))
    val later: Seq[Ev] = Seq((3L, ts(125), 1L, "click", 1.0))
    val rows = runAppend("s41", StreamingQueries.tumbling,
      Seq(hour0, later))
    // Only the hour-0 windows have closed.
    val got = rows.map(r =>
      (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = StreamingQueries.tumbling(
        hour0.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect().map(r =>
        (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == batch)
    assert(got.map(_._2) == Set("click", "view"))
    assert(got.find(_._2 == "click").get._3 == 2L)
  }

  test("#41s late rows beyond the watermark are dropped") {
    val batches: Seq[Seq[Ev]] = Seq(
      Seq((0L, ts(5), 1L, "click", 1.0)),
      Seq((1L, ts(125), 1L, "click", 1.0)), // advances watermark to 1:55
      Seq((2L, ts(6), 1L, "click", 99.0))) // late into closed hour-0
    val rows = runAppend("s41late", StreamingQueries.tumbling, batches)
    val hour0 = rows.filter(_.getTimestamp(0).equals(ts(0)))
    assert(hour0.length == 1)
    assert(hour0.head.getLong(2) == 1L, "late row must not re-count")
  }

  test("#42 sliding windows: each event lands in 4 one-hour/15-min windows") {
    val batches: Seq[Seq[Ev]] = Seq(
      Seq((0L, ts(50), 1L, "click", 1.0)),
      Seq((1L, ts(240), 1L, "click", 1.0))) // advance watermark far past
    val rows = runAppend("s42", StreamingQueries.sliding, batches)
    val windows = rows.filter(r => r.getString(1) == "click" &&
      r.getTimestamp(0).getTime <= ts(50).getTime)
    assert(windows.length == 4, s"got ${windows.toSeq}")
    assert(windows.forall(_.getLong(2) == 1L))
  }

  test("#43 session windows merge within a 30-min gap and split beyond it") {
    val batches: Seq[Seq[Ev]] = Seq(
      Seq((0L, ts(0), 7L, "click", 1.0),
        (1L, ts(10), 7L, "click", 1.0), // same session (gap 10m)
        (2L, ts(70), 7L, "click", 1.0)), // new session (gap 60m)
      Seq((3L, ts(300), 7L, "click", 1.0))) // advance watermark
    val rows = runAppend("s43", StreamingQueries.session, batches)
    val sessions = rows.filter(_.getLong(2) == 7L)
      .map(r => (r.getTimestamp(0), r.getLong(3))).sortBy(_._1.getTime)
    assert(sessions.length == 2)
    assert(sessions(0)._2 == 2L) // first session: 2 events
    assert(sessions(1)._2 == 1L)
  }

  test("#43 streaming sessions agree with the batch q_sessionize twin") {
    import spark.implicits._
    val evs: Seq[Ev] = Seq(
      (0L, ts(0), 1L, "a", 0.0), (1L, ts(5), 1L, "a", 0.0),
      (2L, ts(50), 1L, "a", 0.0), (3L, ts(55), 2L, "a", 0.0),
      (4L, ts(90), 2L, "a", 0.0))
    val batches = Seq(evs, Seq((9L, ts(500), 9L, "a", 0.0): Ev))
    val rows = runAppend("s43twin", StreamingQueries.session, batches)
    val streamed = rows.filter(_.getLong(2) < 9L)
      .map(r => (r.getLong(2), r.getLong(3))).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toList).toMap
    // Batch twin: q_sessionize's lag/flag/cumsum stack on the same rows.
    val batchSessions = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      evs.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("prev", lag($"ts", 1).over(w))
        .withColumn("new_s",
          when($"prev".isNull ||
            unix_millis($"ts") - unix_millis($"prev") > 1800000L, 1L)
            .otherwise(0L))
        .withColumn("sid", sum($"new_s").over(wr))
        .groupBy($"user_id", $"sid").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toList).toMap
    }
    assert(streamed == batchSessions)
  }

  test("#44 duplicate event_ids within the watermark are dropped exactly once") {
    val batches: Seq[Seq[Ev]] = Seq(
      Seq((0L, ts(0), 1L, "click", 1.0),
        (0L, ts(1), 1L, "click", 1.0), // dup id, same batch
        (1L, ts(2), 1L, "view", 2.0)),
      Seq((0L, ts(3), 1L, "click", 1.0)), // dup id, later batch
      Seq((5L, ts(60), 1L, "click", 1.0)))
    val rows = runAppend("s44", StreamingQueries.dedup, batches)
    val ids = rows.map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(0L, 1L, 5L))
  }

  test("q_stream_contamination: windowed status counts match the batch " +
    "twin and the catalog row reconciles with the batch verdicts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // (doc_id, ts, status): two hour-0 windows' worth of pre-joined
    // verdicts — the gate itself is stateless, so the spec pins the
    // windowed accounting and stream == batch on the same frame.
    val hour0: Seq[(Long, Timestamp, String)] = Seq(
      (0L, ts(5), "clean"), (1L, ts(15), "contaminated"),
      (2L, ts(25), "clean"), (3L, ts(35), "benchmark"))
    val input = MemoryStream[(Long, Timestamp, String)]
    val df = StreamingQueries.contaminationCounts(
      input.toDF().toDF("doc_id", "ts", "status"))
    val q = df.writeStream.format("memory").queryName("scont")
      .outputMode("append").start()
    try {
      input.addData(hour0)
      q.processAllAvailable()
      input.addData((9L, ts(125), "clean")) // close hour 0
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("scont").collect()
      .map(r => (r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("clean", 2L), ("contaminated", 1L),
      ("benchmark", 1L)), s"hour-0 closed windows wrong: $got")
    val batch = StreamingQueries.contaminationCounts(
        hour0.toDF("doc_id", "ts", "status"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(got == batch)
    // Catalog row end-to-end: total docs counted == total events, and
    // the per-status split reconciles with the batch verdict table
    // weighted by each doc's event multiplicity.
    val rows = Catalog.byName("q_stream_contamination")
      .build(spark, sfDir).collect()
    val nEvents = Tables.events(spark, sfDir).count()
    assert(rows.map(_.getLong(2)).sum == nEvents)
    val statuses = rows.map(_.getString(1)).toSet
    assert(statuses.contains("benchmark") && statuses.contains("clean"),
      s"degenerate status split: $statuses")
    val nDocs = Tables.documents(spark, sfDir).count()
    val flags = Catalog.byName("q_text_contamination").build(spark, sfDir)
      .select($"doc_id", $"flagged").as[(Long, Long)].collect().toMap
    val mult = Tables.events(spark, sfDir)
      .select(pmod($"event_id", lit(nDocs)).as("doc_id"))
      .groupBy($"doc_id").count()
      .as[(Long, Long)].collect().toMap
    val expected = mult.toSeq.groupBy { case (docId, _) =>
      flags.get(docId) match {
        case None => "benchmark"
        case Some(1L) => "contaminated"
        case Some(_) => "clean"
      }
    }.view.mapValues(_.map(_._2).sum).toMap
    val gotByStatus = rows.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(gotByStatus == expected)
  }

  test("q_stream_quality_filter: windowed survival stats match the batch scorer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // (doc_id, ts, lang, text): one clear keeper (25 distinct words, no
    // stopwords → quality 0.9, n_tok in band), one under the token band,
    // one stopword-flooded (quality ≈ 0.128).
    val keepText = (1 to 25).map(i => s"word$i").mkString(" ")
    val shortText = "just a few little words here"
    val stopText = Seq.fill(30)("the").mkString(" ")
    val hour0: Seq[(Long, Timestamp, String, String)] = Seq(
      (0L, ts(5), "en", keepText),
      (1L, ts(15), "en", shortText),
      (2L, ts(25), "de", stopText))
    val input = MemoryStream[(Long, Timestamp, String, String)]
    val df = StreamingQueries.qualityFilter(
      input.toDF().toDF("doc_id", "ts", "lang", "text"))
    val q = df.writeStream.format("memory").queryName("sqf")
      .outputMode("append").start()
    try {
      input.addData(hour0)
      q.processAllAvailable()
      input.addData((9L, ts(125), "en", keepText)) // close hour 0
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sqf").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(("en", 2L, 1L), ("de", 1L, 0L)),
      s"hour-0 closed windows wrong: $got")
    // Batch twin on the same rows: identical scorer, identical counts.
    val batch = StreamingQueries.qualityFilter(
        hour0.toDF("doc_id", "ts", "lang", "text"))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == batch)
  }

  test("#45 transformWithState twin: counts accumulate, idle users evict on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store; scope the
    // provider override to this query and restore the session default.
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[StatefulCounts.Ev]
      val q = StatefulCountsTws(
          input.toDS().withWatermark("ts", "10 minutes"))
        .writeStream.format("memory").queryName("s45tws")
        .outputMode("update").start()
      try {
        // b1: u1 twice, u2 once; timers armed at last-ts + 30min.
        input.addData(
          StatefulCounts.Ev(0L, ts(0), 1L, "a", 0.0),
          StatefulCounts.Ev(1L, ts(1), 1L, "a", 0.0),
          StatefulCounts.Ev(2L, ts(2), 2L, "a", 0.0))
        q.processAllAvailable()
        // b2: u3 at t=120 — processed under b1's watermark (still early).
        input.addData(StatefulCounts.Ev(3L, ts(120), 3L, "a", 0.0))
        q.processAllAvailable()
        // b3: watermark is now 110min — u1 (due 31) and u2 (due 32)
        // expire: state cleared, tombstone (user, 0) emitted.
        input.addData(StatefulCounts.Ev(4L, ts(240), 3L, "a", 0.0))
        q.processAllAvailable()
        // b4: u1 returns — the count must RESTART at 1 (state evicted),
        // not resume at 3.
        input.addData(StatefulCounts.Ev(5L, ts(245), 1L, "a", 0.0))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("s45tws").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows.contains((1L, 2L)), s"pre-eviction count missing: $rows")
      assert(rows.contains((1L, 0L)) && rows.contains((2L, 0L)),
        s"watermark-driven eviction tombstones missing: $rows")
      assert(rows.contains((1L, 1L)),
        s"count must restart after eviction, got $rows")
      assert(!rows.contains((1L, 3L)),
        s"evicted state must not resume: $rows")
      // Accumulation phase agrees with the mapGroupsWithState twin.
      val twin = Seq((1L, 2L), (2L, 1L))
      twin.foreach(t => assert(rows.contains(t)))
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  test("#45 tws: an in-watermark late event never lowers an armed deadline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[StatefulCounts.Ev]
      val q = StatefulCountsTws(
          input.toDS().withWatermark("ts", "10 minutes"))
        .writeStream.format("memory").queryName("s45late")
        .outputMode("update").start()
      def tombstones(): Int = spark.table("s45late").collect()
        .count(r => r.getLong(0) == 1L && r.getLong(1) == 0L)
      try {
        // u1 last-seen t=100 → deadline 130.
        input.addData(StatefulCounts.Ev(0L, ts(100), 1L, "a", 0.0))
        q.processAllAvailable()
        // Late-but-in-watermark u1 event at t=95: idleness is measured
        // from last-SEEN (100), so the deadline must STAY 130 — the
        // r6-draft bug re-armed it at 95+30=125.
        input.addData(StatefulCounts.Ev(1L, ts(95), 1L, "a", 0.0))
        q.processAllAvailable()
        // Advance the watermark to 126: between the buggy deadline
        // (125) and the correct one (130). u1 must NOT be evicted.
        input.addData(StatefulCounts.Ev(2L, ts(136), 3L, "a", 0.0))
        q.processAllAvailable()
        input.addData(StatefulCounts.Ev(3L, ts(137), 3L, "a", 0.0))
        q.processAllAvailable()
        assert(tombstones() == 0,
          "late event lowered the deadline — premature eviction")
        // Push the watermark far past 130: NOW u1 evicts.
        input.addData(StatefulCounts.Ev(4L, ts(300), 3L, "a", 0.0))
        q.processAllAvailable()
        input.addData(StatefulCounts.Ev(5L, ts(301), 3L, "a", 0.0))
        q.processAllAvailable()
        assert(tombstones() == 1, "idle user must still evict eventually")
      } finally q.stop()
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  test("#45 stateful per-user counter accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StatefulCounts.Ev]
    val q = StatefulCounts(input.toDS())
      .writeStream.format("memory").queryName("s45")
      .outputMode("update").start()
    try {
      input.addData(
        StatefulCounts.Ev(0L, ts(0), 1L, "a", 0.0),
        StatefulCounts.Ev(1L, ts(1), 1L, "a", 0.0),
        StatefulCounts.Ev(2L, ts(2), 2L, "a", 0.0))
      q.processAllAvailable()
      input.addData(StatefulCounts.Ev(3L, ts(3), 1L, "a", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("s45").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(last == Map(1L -> 3L, 2L -> 1L))
  }
}
