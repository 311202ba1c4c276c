package graft.streaming

import graft.{Q, Tables}
import graft.Dsl._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming surface — SURVEY.md §2.9 rows 41–45.
  *
  * The only oracle-checked row here is the batch twin of the tumbling
  * window (#41-batch): `window()` in batch mode, proving the same agg
  * semantics the streaming form uses. The five streaming transforms are
  * plain DataFrame→DataFrame functions so the MemoryStream specs apply
  * them to an unbounded source and the batch twins cross-check semantics
  * (SURVEY §5 item 4) — the identical code path Structured Streaming
  * compiles into an IncrementalExecution.
  *
  * Scale notes (100 TB): streaming aggs shuffle on (window, key) with
  * partial aggregation per micro-batch; watermarks bound state (late rows
  * dropped, expired windows evicted), so state size tracks the number of
  * *open* windows × keys, not history. Dedup state is similarly bounded
  * by the watermark horizon.
  */
object StreamingQueries {

  /** #41-batch q_window_tumbling_batch — 1-hour tumbling counts/sums per
    * event_type, batch mode (the oracle-checked bridge for #41s). */
  val qWindowTumblingBatch: Q = Q(
    "q_window_tumbling_batch",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(
          count(lit(1)).as("n"),
          sumMoney($"value").as("sum_value"))
        .select(
          $"w.start".cast("timestamp_ntz").as("win_start"),
          $"event_type", $"n", $"sum_value")
        .orderBy($"win_start", $"event_type")
    },
    oracle = Some(
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin))

  // ---- Streaming transforms (#41s–#44): applied to a streaming DF with
  // columns (event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,
  // value DOUBLE) by StreamingSpec via MemoryStream. -------------------

  /** #41s q_stream_tumbling — 1-hour tumbling counts/sums per event_type
    * under a 10-minute watermark (late rows dropped). */
  def tumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sumMoney(col("value")).as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** #42 q_stream_sliding — 1-hour window sliding every 15 minutes. */
  def sliding(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"))

  /** #43 q_stream_session — 30-minute-gap session windows per user
    * (streaming twin of the batch q_sessionize). */
  def session(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("sess_start"), col("w.end").as("sess_end"),
        col("user_id"), col("n_events"))

  /** #44 q_stream_dedup — exactly-once event_id dedup within the
    * watermark horizon (state evicted as the watermark advances). */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** q_stream_quality_filter (added r5) — the q_text_filter_pipeline
    * keep decision applied to an unbounded document stream (doc_id, ts,
    * lang, text): per (1-hour window, lang) survival counts under a
    * 10-minute watermark. Scoring is stateless per-row (identical
    * formula and thresholds to the oracle-checked batch composite,
    * TextQueries.qTextFilterPipeline); only the windowed agg carries
    * state, bounded by open windows × languages. This is the shape a
    * streaming ingest filter runs at 100 TB/day: score-as-you-read,
    * aggregate small. */
  def qualityFilter(docs: DataFrame): DataFrame = {
    import graft.operators.TextQueries.QualityScore
    QualityScore(docs)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("lang"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(QualityScore.keep, 1L).otherwise(0L)).as("n_kept"))
      .select(col("win.start").as("win_start"), col("lang"),
        col("n_total"), col("n_kept"))
  }

  val all: Vector[Q] = Vector(qWindowTumblingBatch)
}
