package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Sinks row (T, SURVEY.md §2.1): CSV and JSON writer round-trips.
  * Parquet is exercised by the Verify harness itself. */
class WriterRoundTripSpec extends AnyFunSuite with SparkFixture {

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("csv write/read round-trip preserves the flagship result") {
    val df = Catalog.byName("q_agg_groupby").build(spark, sfDir)
    val dir = tmp("graft_csv")
    df.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .option("header", "true")
      .schema(df.schema) // fixed schema, never inferred (SURVEY §1.2)
      .csv(dir)
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("json write/read round-trip preserves the flagship result") {
    val df = Catalog.byName("q_agg_groupby").build(spark, sfDir)
    val dir = tmp("graft_json")
    df.write.mode("overwrite").json(dir)
    val back = spark.read.schema(df.schema).json(dir)
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("csv round-trip of a timestamp-bearing result") {
    val df = Catalog.byName("q_window_tumbling_batch").build(spark, sfDir)
    val dir = tmp("graft_csv_ts")
    df.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .option("header", "true").schema(df.schema).csv(dir)
    assert(back.collect().toSet == df.collect().toSet)
  }
}
