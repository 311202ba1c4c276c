package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixture-table readers (schemas documented in FIXTURES.md).
  *
  * Schemas come from the parquet footers (fixed, driver-generated) — at
  * 100 TB the same call works unchanged because Spark reads the footer of
  * one file per table, not the data. Scale note (SURVEY.md §7): production
  * tables would be date-partitioned directories; `spark.read.parquet(dir)`
  * plus partition pruning handles that with the same code path.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** `events.ts` is stored as parquet TIMESTAMP(NANOS) which Spark 4
    * refuses outright; with `spark.sql.legacy.parquet.nanosAsLong=true`
    * (set in every session builder) it reads as a raw nanos long. All
    * fixture values are µs-exact (FIXTURES.md), so the integer division
    * to micros is lossless. Kept as session-TZ TimestampType (UTC) —
    * queries that emit `ts` cast to timestamp_ntz in their final
    * projection so the written parquet matches DuckDB's naive TIMESTAMP. */
  def events(s: SparkSession, d: String): DataFrame =
    apply(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
