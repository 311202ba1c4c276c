package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The two foreachBatch state-table merge disciplines the streaming
  * O-rows maintain, extracted so (a) all monoid rows share ONE
  * retry-idempotent implementation and (b) the failure-injection spec
  * can re-deliver a committed batchId against the real merge code.
  *
  * WHY IDEMPOTENCE MUST BE EXPLICIT HERE: Structured Streaming's
  * foreachBatch contract is at-least-once — if the driver dies after
  * the sink write but before the epoch commits, the SAME batchId is
  * re-delivered on restart. A newest-wins merge absorbs that for free
  * (max is idempotent), but count/sum monoids are NOT: merging the same
  * partials twice double-counts. So [[MonoidTable.merge]] persists the
  * last merged batch id WITH the state (an embedded `_bid` column —
  * same parquet commit, never a sidecar that could diverge from the
  * data it fences) and no-ops on `id <= last`. Re-delivery of batch 0
  * is safe by construction (it resets the table to the same content).
  *
  * The parquet overwrite itself (materialize via localCheckpoint, then
  * delete+write) is the local stand-in for the write-new-snapshot-then-
  * swap-pointer commit a lakehouse MERGE performs; a torn write mid-
  * overwrite is outside this sandbox's failure model and is exactly
  * what a table format's atomic pointer swap buys at production scale.
  */
private[graft] object MonoidTable {

  /** Merge one micro-batch's pre-aggregated partials into the keyed
    * state table. All non-key columns must be sum-mergeable (the monoid
    * requirement); they are re-summed under their own names. Skips the
    * merge entirely when `id` was already folded in (crash-retry
    * re-delivery), so the maintained table equals the batch recompute
    * no matter how often the engine re-runs a batch. */
  def merge(state: String, partials: DataFrame, id: Long,
      keys: Seq[String]): Unit = {
    val bs = partials.sparkSession
    val valCols = partials.columns.filterNot(keys.contains).toSeq
    val toWrite =
      if (id == 0L) Some(partials)
      else {
        val st = bs.read.parquet(state)
        if (id <= lastBid(st)) None
        else {
          val sums = valCols.map(c => sum(col(c)).as(c))
          Some(st.drop("_bid").unionByName(partials)
            .groupBy(keys.map(col): _*)
            .agg(sums.head, sums.tail: _*))
        }
      }
    toWrite.foreach { m =>
      m.withColumn("_bid", lit(id))
        .localCheckpoint(eager = true)
        .write.mode("overwrite").parquet(state)
    }
  }

  /** The fence: one scalar aggregate over the (domain-bounded) state
    * table — a driver-side routing decision, not data movement. An
    * empty state table (a batch-0 write of zero partials) reads as -1,
    * so the next id merges against it normally. */
  def lastBid(state: DataFrame): Long =
    state.agg(coalesce(max(col("_bid")), lit(-1L))).head().getLong(0)

  /** The maintained table, minus the fencing column. */
  def read(s: SparkSession, state: String): DataFrame =
    s.read.parquet(state).drop("_bid")
}

/** Newest-wins per-user snapshot maintenance, bucketed so merge cost is
  * proportional to CHURN, not state: the snapshot is partitioned by
  * `_bkt = pmod(hash(user_id), buckets)`, each micro-batch reads ONLY
  * the bucket partitions its keys hash into (literal partition-pruned
  * scan) and rewrites ONLY those partitions (dynamic partition
  * overwrite). Untouched buckets' files are never opened or replaced —
  * at 100 TB user cardinality a batch touching 0.1% of keys rewrites
  * ~0.1% of buckets instead of the world. Buckets here = 8 (sized to
  * the sandbox's state; production sizes buckets so one partition is a
  * few hundred MB). Newest-wins on the total key (ts, event_id) is
  * idempotent, so crash-retry re-delivery needs no batch-id fence:
  * re-merging the same batch rewrites the same buckets with identical
  * bytes. */
private[graft] object UpsertState {

  val buckets = 8

  def withBucket(df: DataFrame): DataFrame =
    df.withColumn("_bkt", pmod(hash(col("user_id")), lit(buckets)))

  /** Newest-wins collapse on (ts, event_id) per user. */
  def latest(df: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
  }

  /** Merge one micro-batch into the bucketed snapshot. Batch 0 resets
    * the whole table (static overwrite); later batches collapse the
    * batch, route it to its buckets, union against ONLY those buckets'
    * stored rows, and republish just those partitions. The touched-
    * bucket list is a driver-side collect bounded by `buckets` (8) —
    * partition routing, not data. */
  def merge(state: String, batch: DataFrame, id: Long): Unit = {
    val bs = batch.sparkSession
    val bl = withBucket(latest(batch))
    if (id == 0L) {
      bl.localCheckpoint(eager = true)
        .write.mode("overwrite").partitionBy("_bkt").parquet(state)
    } else {
      val touched = bl.select("_bkt").distinct()
        .collect().map(_.getInt(0)).toSeq
      if (touched.nonEmpty) {
        // An EMPTY batch 0 leaves the state dir schema-less (a
        // partitioned write of zero rows emits only _SUCCESS, unlike
        // the unpartitioned form this replaced), so the first
        // non-empty batch must detect that and seed the table instead
        // of failing schema inference (r11 review finding).
        readState(bs, state) match {
          case Some(st) =>
            val merged = latest(
              st.where(col("_bkt").isin(touched: _*)).unionByName(bl))
            merged.localCheckpoint(eager = true)
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("_bkt").parquet(state)
          case None =>
            bl.localCheckpoint(eager = true)
              .write.mode("overwrite").partitionBy("_bkt").parquet(state)
        }
      }
    }
  }

  /** The stored snapshot, or None when no data file exists yet (the
    * empty-batch-0 case above). Only schema-inference failures map to
    * None — anything else propagates. */
  private def readState(
      bs: SparkSession, state: String): Option[DataFrame] =
    try Some(bs.read.parquet(state))
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.contains("infer schema") ||
            e.getMessage.contains("PATH_NOT_FOUND") ||
            e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") =>
        None
    }

  /** The maintained snapshot, minus the bucket routing column. A state
    * dir that never materialized data (a replay whose every batch was
    * empty) fails with a NAMED error instead of the raw
    * schema-inference one. */
  def read(s: SparkSession, state: String): DataFrame =
    readState(s, state).getOrElse(throw new IllegalStateException(
      s"upsert state at $state holds no data — the replay saw no rows"))
      .drop("_bkt")
}
