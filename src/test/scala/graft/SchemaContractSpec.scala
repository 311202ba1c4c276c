package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the POST-LOAD logical schema of every fixture table against
  * FIXTURES.md, so a driver-side regeneration of /root/testdata with a
  * different physical encoding fails HERE with one readable diff instead
  * of as dozens of scattered analysis errors downstream.
  *
  * Motivation (r8): the fixtures were regenerated with `events.ts`
  * switched from parquet TIMESTAMP(NANOS) — which Spark 4 reads as a raw
  * Long under `spark.sql.legacy.parquet.nanosAsLong=true` — to
  * timestamp[us]/NTZ. Every events-reading operator and spec (104 tests)
  * failed on `ts div 1000` before [[Tables.normalizeTs]] made the loader
  * dispatch on the observed schema. This spec is the tripwire: it pins
  * what the ENGINE promises downstream (the normalized logical types),
  * not the physical parquet encoding, which is allowed to drift as long
  * as the loaders absorb it.
  */
class SchemaContractSpec extends AnyFunSuite with SparkFixture {

  private def fields(name: String): Seq[(String, DataType)] = {
    val df = name match {
      case "events" => Tables.events(spark, sfDir)
      case n        => Tables(spark, sfDir, n)
    }
    df.schema.fields.toSeq.map(f => f.name -> f.dataType)
  }

  test("events: loader normalizes ts to session-TZ TimestampType") {
    assert(fields("events") === Seq(
      "event_id" -> LongType,
      "ts" -> TimestampType, // whatever the physical encoding, post-load
      "user_id" -> LongType,
      "event_type" -> StringType,
      "value" -> DoubleType,
      "props" -> StringType))
  }

  test("normalizeTs is idempotent and rejects non-timestamp ts") {
    val ev = Tables.events(spark, sfDir)
    assert(Tables.normalizeTs(ev).schema("ts").dataType === TimestampType)
    val bogus = ev.withColumn("ts", org.apache.spark.sql.functions.lit("x"))
    intercept[IllegalStateException](Tables.normalizeTs(bogus))
  }

  test("normalized ts values land in the documented 2024 fixture window " +
    "(unit tripwire)") {
    // The type pin above can't catch a UNIT error: normalizeTs's
    // LongType branch assumes a long-encoded ts is NANOS and divides by
    // 1000 — if a future regeneration stores plain INT64 MICROS, every
    // value comes out 1000× too small (lands in 1970) with the type pin
    // still green and the damage surfacing as far-downstream value
    // mismatches (the r8 ADVICE scenario). FIXTURES.md documents
    // events.ts ∈ [2024-01-01, 2024-01-30]; a 1000× scale in either
    // direction leaves that window by centuries, so min/max inside the
    // window IS the unit proof.
    import org.apache.spark.sql.functions._
    val r = Tables.events(spark, sfDir)
      .agg(min("ts").cast("string").as("lo"),
        max("ts").cast("string").as("hi")).head()
    val (lo, hi) = (r.getString(0), r.getString(1))
    assert(lo >= "2024-01-01" && hi < "2024-01-31",
      s"events.ts outside the documented window: [$lo, $hi] — " +
        "normalizeTs is likely scaling a re-encoded fixture wrong")
  }

  test("normalized ts of a known event matches its absolute value " +
    "(value-level pin)") {
    // Strongest form of the unit tripwire: the window test above bounds
    // min/max, but a sub-1000× drift (e.g. a future millis encoding read
    // through the micros branch, off by 1000 the OTHER way on small
    // offsets) or a TZ shift could in principle stay inside a 30-day
    // window. Pinning one event's full microsecond value cannot. The
    // expected literal was derived with an INDEPENDENT reader (DuckDB:
    // `select ts from events.parquet where event_id=0`) against the
    // current sf0.001 fixture; if the driver regenerates fixtures with a
    // new seed this fails loudly and the literal must be re-derived the
    // same way — that forced re-derivation is the insurance.
    val got = Tables.events(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("event_id") === 0L)
      .selectExpr("cast(ts as string)").head().getString(0)
    assert(got === "2024-01-01 00:09:58.778549",
      s"event_id=0 ts drifted to $got — normalizeTs unit/zone handling " +
        "no longer matches the fixture's physical encoding")
  }

  test("dimension and fact tables carry the FIXTURES.md logical schema") {
    assert(fields("region") === Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
    assert(fields("nation") === Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    assert(fields("customer") === Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    assert(fields("supplier") === Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    assert(fields("part") === Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
    // Date-like columns: physical encoding drifted ms→µs across fixture
    // generations; both read as TIMESTAMP_NTZ, which is what every query
    // and oracle depends on (DuckDB's naive TIMESTAMP).
    assert(fields("orders") === Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType))
    assert(fields("lineitem") === Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType))
  }

  test("LLM-pipeline tables carry the FIXTURES.md logical schema") {
    assert(fields("documents") === Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    assert(fields("embeddings") === Seq(
      "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))
  }
}
