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

    // Raw schema: ts arrives as nanos LONG (legacy nanosAsLong read),
    // converted exactly as Tables.events does.
    val rawSchema = spark.read.parquet(inDir.toString).schema
    def aggregateEvents(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(outDir)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = aggregateEvents(spark.read.parquet(inDir.toString))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
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
}
