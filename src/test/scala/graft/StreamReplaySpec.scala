package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end streaming replay (SURVEY.md §2.9 sinks/triggers row):
  * replay the events fixture through a file-stream source with
  * Trigger.AvailableNow, aggregate with the same tumbling-window code the
  * batch bridge uses, land results via foreachBatch into parquet, and
  * require equality with the batch computation. */
class StreamReplaySpec extends AnyFunSuite with SparkFixture {

  test("AvailableNow replay of events.parquet matches the batch window agg") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("graft_stream_in")
    Files.copy(
      Paths.get(s"$sfDir/events.parquet"),
      inDir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val outDir = Files.createTempDirectory("graft_stream_out").toString

    // Raw schema: ts normalized exactly as Tables.events does (handles
    // both the nanos-LONG and timestamp[us]/NTZ fixture encodings).
    val rawSchema = spark.read.parquet(inDir.toString).schema
    def aggregateEvents(df: org.apache.spark.sql.DataFrame) =
      graft.Tables.normalizeTs(df)
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select($"w.start".as("win_start"), $"event_type", $"n")

    val q = aggregateEvents(
        spark.readStream.schema(rawSchema).parquet(inDir.toString))
      .writeStream
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(outDir)
      }
      .start()
    assert(q.awaitTermination(120000), "replay must finish before reading")

    val streamed = spark.read.parquet(outDir)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = aggregateEvents(spark.read.parquet(inDir.toString))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("multi-batch replay: complete-mode snapshots overwrite, append-mode deltas accumulate") {
    // Split the fixture into TWO source files and force one file per
    // micro-batch: the complete-mode agg emits its FULL result twice, so
    // the sink must hold exactly the final snapshot (the r6-draft
    // append-after-batch-0 bug would duplicate every window); the
    // append-mode dedup emits per-batch deltas that must accumulate to
    // the full unique-id set.
    import spark.implicits._
    val events = Tables.events(spark, sfDir)
    val inDir = Files.createTempDirectory("graft_mb_in").toString
    val half = events.count() / 2
    events.where($"event_id" < half).coalesce(1).write
      .mode("overwrite").parquet(inDir + "/f0")
    events.where($"event_id" >= half).coalesce(1).write
      .mode("overwrite").parquet(inDir + "/f1")
    val srcDir = Files.createTempDirectory("graft_mb_src").toString
    Seq("f0", "f1").foreach { f =>
      val part = new java.io.File(inDir + s"/$f").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(srcDir, s"$f.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val schema = spark.read.parquet(srcDir).schema

    def replay(mode: String, transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
               out: String): org.apache.spark.sql.DataFrame = {
      var batches = 0
      val q = transform(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(srcDir))
        .writeStream.outputMode(mode)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          batches += 1
          val writeMode = if (mode == "complete" || id == 0L) "overwrite" else "append"
          b.write.mode(writeMode).parquet(out)
        }
        .start()
      assert(q.awaitTermination(120000))
      assert(batches >= 2, s"expected a multi-batch replay, ran $batches")
      spark.read.parquet(out)
    }

    // Complete-mode tumbling counts == batch computation (no dup windows).
    val aggOut = Files.createTempDirectory("graft_mb_agg").toString
    val streamed = replay("complete",
      df => df.groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select($"w.start".as("win_start"), $"event_type", $"n"),
      aggOut).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = events
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("win_start"), $"event_type", $"n").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)

    // Append-mode dedup accumulates to the full unique-id set exactly once.
    val dedupOut = Files.createTempDirectory("graft_mb_dedup").toString
    val ids = replay("append",
      df => df.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("event_id"),
      dedupOut).select($"event_id").collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length, "dedup must not re-emit ids")
    assert(ids.length.toLong == events.select($"event_id").distinct().count())
  }

  test("multi-batch update-mode replay reconciles newest-wins per key") {
    // Two source files, one per micro-batch: any user with events in both
    // halves is emitted TWICE by the update-mode stateful counter (its
    // count after batch 0, then after batch 1) — the landed changelog
    // holds several generations per key, and the product reconciliation
    // (Replay.reconcileNewest, what Replay.run applies for update mode)
    // must recover exactly the final per-user counts.
    import spark.implicits._
    import graft.streaming.{StatefulCounts, StreamingQueries}
    val events = Tables.events(spark, sfDir)
    val half = events.count() / 2
    val srcDir = Files.createTempDirectory("graft_upd_src").toString
    Seq(("f0", $"event_id" < half), ("f1", $"event_id" >= half))
      .foreach { case (f, cond) =>
        val tmp = Files.createTempDirectory(s"graft_upd_$f").toString
        spark.read.parquet(s"$sfDir/events.parquet").where(cond)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        Files.copy(part.toPath, Paths.get(srcDir, s"$f.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
      }
    val schema = spark.read.parquet(srcDir).schema
    val out = Files.createTempDirectory("graft_upd_out").toString
    val q = StatefulCounts(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(srcDir)
          .transform(graft.Tables.normalizeTs)
          .as[StatefulCounts.Ev])
      .toDF()
      .writeStream.outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        val writeMode = if (id == 0L) "overwrite" else "append"
        b.withColumn("_batch", lit(id)).write.mode(writeMode).parquet(out)
      }
      .start()
    assert(q.awaitTermination(120000))
    val landed = spark.read.parquet(out)
    assert(landed.select($"_batch").distinct().count() >= 2,
      "expected a multi-batch replay")
    val reconciled = StreamingQueries.Replay
      .reconcileNewest(landed, Seq("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(landed.count() > reconciled.size,
      "reconciliation must be non-vacuous (stale generations existed)")
    val expect = events.groupBy($"user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reconciled == expect)
  }

  test("catalog q_stream_stateful_tws evicts exactly the watermark-idle users") {
    // transformWithState's event-time timers FIRE in an AvailableNow
    // replay (the engine runs a timer batch once the watermark advances
    // past the data), so the reconciled output is: eviction tombstone
    // (count 0) for every user idle >= 30 min before the final
    // watermark (= max ts - 10 min), the plain running count for the
    // rest. Derive that expectation batch-side and require equality —
    // and require the eviction path to be non-vacuous on the fixture.
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val wmMs = ev.agg(max($"ts")).head().getTimestamp(0).getTime - 10 * 60 * 1000L
    val expect = ev.groupBy($"user_id")
      .agg(count(lit(1)).as("n"), max($"ts").as("last_ts"))
      .collect().map { r =>
        val evicted = r.getTimestamp(2).getTime + 30 * 60 * 1000L < wmMs
        (r.getLong(0), if (evicted) 0L else r.getLong(1))
      }.toSet
    val tws = Catalog.byName("q_stream_stateful_tws").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tws == expect)
    assert(tws.exists(_._2 == 0L), "expected at least one evicted user")
  }

  test("catalog q_stream_tumbling replay row equals the oracle-checked batch twin") {
    // The Bench-timed replay wrapper (complete mode, one-shot
    // AvailableNow) must compute exactly the windows the oracle-checked
    // q_window_tumbling_batch computes on the same fixture.
    // The replay emits LTZ timestamps, the batch twin casts to NTZ for
    // its oracle; normalize both to naive-UTC strings (session TZ=UTC).
    def naive(v: Any): String = v match {
      case t: java.sql.Timestamp      => t.toLocalDateTime.toString
      case l: java.time.LocalDateTime => l.toString
      case other                      => other.toString
    }
    val streamed = Catalog.byName("q_stream_tumbling").build(spark, sfDir)
      .collect()
      .map(r => (naive(r.get(0)), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val batch = Catalog.byName("q_window_tumbling_batch").build(spark, sfDir)
      .collect()
      .map(r => (naive(r.get(0)), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("catalog q_stream_ohlc replay row equals the oracle-checked batch bars") {
    // Every OHLC aggregate is a commutative monoid, so the
    // incrementally-folded bars must equal the batch row EXACTLY —
    // open/close included, because the min_by/max_by ordering key
    // (event_id) is unique by fixture contract. Same LTZ/NTZ
    // normalization as the tumbling twin above.
    def naive(v: Any): String = v match {
      case t: java.sql.Timestamp      => t.toLocalDateTime.toString
      case l: java.time.LocalDateTime => l.toString
      case other                      => other.toString
    }
    def key(r: org.apache.spark.sql.Row) =
      (naive(r.get(0)), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6), r.getDouble(7))
    val streamed = Catalog.byName("q_stream_ohlc").build(spark, sfDir)
      .collect().map(key).toSet
    val batch = Catalog.byName("q_ts_ohlc").build(spark, sfDir)
      .collect().map(key).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("q_stream_upsert: 4-chunk staging, state equals batch argmax, rerun idempotent") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    def run() = Catalog.byName("q_stream_upsert").build(s, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.getLong(2),
        r.getString(3), r.getDouble(4))).toSet
    val first = run()
    // The staging contract the multi-batch claim rests on: 4 data files,
    // so maxFilesPerTrigger=1 ⇒ 4 micro-batches and the batch>0 merge
    // path genuinely executes (a single-file stage would silently test
    // only the overwrite branch).
    val inDir = streaming.StreamingQueries.UpsertStage.inDir(s, sfDir)
    val parts = new java.io.File(inDir).listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(parts == 4, s"expected 4 staged chunk files, got $parts")
    // Incremental fold == batch argmax (the oracle's claim, pinned
    // engine-side too so a DuckDB dialect change can't mask a drift).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val batch = Tables.events(s, sfDir)
      .withColumn("rn", row_number().over(w)).where($"rn" === 1)
      .select($"user_id", $"ts".cast("timestamp_ntz"), $"event_id",
        $"event_type", $"value")
      .collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.getLong(2),
        r.getString(3), r.getDouble(4))).toSet
    assert(first == batch)
    assert(first.nonEmpty)
    // Re-running the whole replay must republish the identical snapshot
    // (batch 0 resets; newest-wins is idempotent).
    assert(run() == first)
  }

  test("q_stream_kalman: the stream-maintained filter equals the batch chain exactly") {
    // The oracle already proves stream == DuckDB replay; this pins the
    // stronger engine-side claim the row's doc makes: the maintained
    // monoid table feeds the IDENTICAL kalmanChain the batch row runs,
    // so the two catalog rows are bit-equal, column for column.
    val stream = Catalog.byName("q_stream_kalman").build(spark, sfDir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3))).toSeq
    val batch = Catalog.byName("q_ts_kalman").build(spark, sfDir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3))).toSeq
    assert(stream.nonEmpty && stream == batch)
  }

  test("q_stream_decay: the stream-maintained table yields the batch report exactly") {
    // Stream and batch share decayReport VERBATIM, so this equality is
    // equality of the maintained (type, day) monoid table with the
    // batch aggregation — the strongest form of the stream == batch
    // claim (the kalman argument, one row later).
    def snap(name: String) = Catalog.byName(name).build(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val stream = snap("q_stream_decay")
    val batch = snap("q_events_decay")
    assert(stream.nonEmpty && stream == batch)
  }
}
