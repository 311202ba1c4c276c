package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint recovery — the fault-tolerance contract that makes a
  * 100 TB streaming pipeline restartable: a NEW query instance pointed
  * at the same checkpoint must resume from the committed offsets (no
  * reprocessing of already-read files) AND recover its aggregation
  * state from the state store (the combined result covers both runs'
  * input). */
class StreamRecoverySpec extends AnyFunSuite with SparkFixture {

  test("a restarted query resumes offsets and state from the checkpoint") {
    import spark.implicits._
    val events = Tables.events(spark, sfDir)
    val half = events.count() / 2

    // Two source files staged one at a time: f0 before the first run,
    // f1 before the second — the "new data arrived while we were down"
    // shape.
    val stage = Files.createTempDirectory("graft_rec_stage").toString
    Seq(("f0", $"event_id" < half), ("f1", $"event_id" >= half)).foreach {
      case (name, cond) =>
        events.where(cond).coalesce(1).write
          .mode("overwrite").parquet(stage + s"/$name")
    }
    val srcDir = Files.createTempDirectory("graft_rec_src").toString
    def publish(name: String): Unit = {
      val part = new java.io.File(stage + s"/$name").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(srcDir, s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val checkpoint = Files.createTempDirectory("graft_rec_ckpt").toString
    val out = Files.createTempDirectory("graft_rec_out").toString

    def agg(df: DataFrame): DataFrame =
      df.groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select($"w.start".as("win_start"), $"event_type", $"n")

    val schema = events.schema
    def runOnce(): Long = {
      val q = agg(spark.readStream.schema(schema).parquet(srcDir))
        .writeStream
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("overwrite").parquet(out)
        }
        .start()
      assert(q.awaitTermination(120000), "replay must finish")
      val read = q.recentProgress.map(_.numInputRows).sum
      q.stop()
      read
    }

    publish("f0")
    val firstRead = runOnce()
    assert(firstRead == half, s"first run should read f0 ($firstRead)")

    publish("f1")
    val secondRead = runOnce()
    // Offsets recovered: the restarted query reads ONLY the new file.
    assert(secondRead == events.count() - half,
      s"restart must not reprocess f0 (read $secondRead rows)")

    // State recovered: the complete-mode snapshot after the restart
    // covers BOTH runs' input, equal to the batch agg over everything.
    val streamed = spark.read.parquet(out)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    val batch = agg(events).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
