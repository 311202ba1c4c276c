package graft

import org.apache.spark.sql.SparkSession

/** Shared local SparkSession for all specs (SURVEY.md §5 item 2).
  * One session per test JVM (Test/fork := true) — specs must not stop it.
  * Config mirrors Verify.scala so specs exercise the same read paths
  * (UTC, µs parquet timestamps, events-nanos legacy read). */
trait SparkFixture {
  lazy val spark: SparkSession = SparkFixture.session
  val sfDir = "/root/testdata/sf0.001"
}

object SparkFixture {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
