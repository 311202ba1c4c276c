package graft.sources

import graft.{Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Ingest-format sources as oracle-checked catalog rows — SURVEY.md §2.1
  * lists csv/json beside parquet as the ETL-idiom formats (an ETL user
  * hits these before anything else).
  *
  * Shape: each query exports the customer fixture to the text format
  * ONCE per (jvm, sfDir) — a distributed, non-coalesced `df.write`, the
  * same pattern a 100 TB pipeline uses (per-partition files, no driver
  * funnel) — then reads it back with an EXPLICIT schema (schema-on-read;
  * never inference, which samples the data and can drift) and returns
  * the full table. The DuckDB twin reads the original parquet fixture,
  * so the oracle pins the entire write→parse round trip against ground
  * truth: quoting, header handling, integer widths (int32 c_nationkey
  * vs int64 c_custkey) and shortest-repr double round-tripping.
  *
  * Malformed-record POLICIES (PERMISSIVE / DROPMALFORMED / FAILFAST,
  * corrupt-record column) are pinned by `SourceReadSpec`; these rows pin
  * the well-formed path end to end. */
object SourceQueries {

  /** Explicit customer schema (parquet footer types, FIXTURES.md). */
  private val customerSchema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  /** One export per (format, sfDir) per JVM; overwrite on first use so a
    * stale /tmp tree from an earlier run can never leak in. */
  private val exported = new graft.Memo[(String, String), String]

  private def export(s: SparkSession, dir: String, fmt: String): String =
    // graft.Memo also closes the previous unlocked getOrElseUpdate's
    // race: two first calls could both run the overwrite-write.
    exported((fmt, dir)) {
      locally {
      val out = "/tmp/graft_sources/" +
        dir.replaceAll("[^A-Za-z0-9.]+", "_") + s"/customer_$fmt"
      val w = Tables.customer(s, dir).write.mode("overwrite")
      fmt match {
        case "csv"  => w.option("header", "true").csv(out)
        case "json" => w.json(out)
        case "orc"  => w.orc(out)
      }
      out
      }
    }

  /** q_source_csv — CSV write→read round trip over customer. */
  val qSourceCsv: Q = Q(
    "q_source_csv",
    (s, dir) => {
      import s.implicits._
      s.read.schema(customerSchema).option("header", "true")
        .csv(export(s, dir, "csv"))
        .orderBy($"c_custkey")
    },
    oracle = Some("SELECT * FROM customer ORDER BY c_custkey"))

  /** q_source_json — JSON-lines write→read round trip over customer. */
  val qSourceJson: Q = Q(
    "q_source_json",
    (s, dir) => {
      import s.implicits._
      s.read.schema(customerSchema)
        .json(export(s, dir, "json"))
        .orderBy($"c_custkey")
    },
    oracle = Some("SELECT * FROM customer ORDER BY c_custkey"))

  /** q_source_orc — ORC write→read round trip over customer. ORC is the
    * columnar alternative a warehouse migration actually meets (Hive
    * lineage); Spark bundles the reader/writer, with predicate pushdown
    * and column pruning on the same DataSource V1 path as parquet. The
    * explicit schema matters here too: ORC carries its own types, and
    * the int32/int64 width split must survive the trip. */
  val qSourceOrc: Q = Q(
    "q_source_orc",
    (s, dir) => {
      import s.implicits._
      s.read.schema(customerSchema)
        .orc(export(s, dir, "orc"))
        .orderBy($"c_custkey")
    },
    oracle = Some("SELECT * FROM customer ORDER BY c_custkey"))

  val all: Vector[Q] = Vector(qSourceCsv, qSourceJson, qSourceOrc)
}
