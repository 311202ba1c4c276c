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
  /** Normalize an events-shaped `ts` column to session-TZ TimestampType
    * (UTC) regardless of the fixture generation's physical encoding.
    * Two encodings have shipped: parquet TIMESTAMP(NANOS), which Spark 4
    * only reads via `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    * every session builder) as a raw nanos long — all fixture values are
    * µs-exact (FIXTURES.md) so `div 1000` to micros is lossless — and
    * parquet timestamp[us] with isAdjustedToUTC=false, which Spark reads
    * as TIMESTAMP_NTZ; casting NTZ→TIMESTAMP reinterprets the wall clock
    * in the session TZ (UTC here), i.e. identity on the stored instants.
    * Dispatch is on the (pre-read) schema, so the streaming sources can
    * use the same normalization on their staged copies. Queries that
    * emit `ts` cast to timestamp_ntz in their final projection so the
    * written parquet matches DuckDB's naive TIMESTAMP. */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType =>
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case org.apache.spark.sql.types.TimestampNTZType =>
      df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    case org.apache.spark.sql.types.TimestampType => df
    case other =>
      throw new IllegalStateException(s"unexpected events.ts type: $other")
  }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(apply(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
