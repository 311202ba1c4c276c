package graft.sources

import graft.{Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
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
        case "xml"  => w.option("rootTag", "customers")
          .option("rowTag", "customer").format("xml").save(out)
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

  /** One file per document under `<out>/doc_<id>.txt` — the shape
    * multimodal corpora actually arrive in (an object-store prefix of
    * image/audio/text blobs, one object per item). Built ONCE per
    * (jvm, sfDir): executor-side nio writes, driver only clears the
    * stale tree. local[*] shares one FS so this doubles as the read
    * fixture; on a cluster the target would be shared storage — and in
    * production the files pre-exist, this builder IS the upstream. */
  private val docFiles = new graft.Memo[(SparkSession, String), String]

  private[graft] def exportDocFiles(s: SparkSession, dir: String): String =
    docFiles((s, dir)) {
      val out = "/tmp/graft_sources/" +
        dir.replaceAll("[^A-Za-z0-9.]+", "_") + "/docs_bin"
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.toSeq.foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(out))
      new java.io.File(out).mkdirs()
      Tables.documents(s, dir).select("doc_id", "text")
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          it.foreach { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(out, s"doc_${r.getLong(0)}.txt"),
              r.getString(1)
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
        }
      out
    }

  /** q_source_binaryfile — whole-file binary ingestion, the first step of
    * every multimodal pipeline (SURVEY §2.10: images/audio/video are
    * opaque binary columns + typed metadata). `binaryFile` lists the
    * prefix distributedly, one task per file batch, and yields
    * (path, modificationTime, length, content) with NO decode — bytes
    * move lazily and never shuffle here (the projection collapses each
    * file to id + length + digest before anything wide).
    *
    * The oracle closes the loop over CONTENT, not just listing: doc_id
    * parsed from the path, byte length and md5 of the bytes must equal
    * DuckDB's view of the source column the files were spawned from
    * (corpus profiled pure ASCII at every sf — FIXTURES.md — so DuckDB
    * `length(text)` = byte length; md5 hashes UTF-8 bytes identically in
    * both engines). */
  val qSourceBinaryfile: Q = Q(
    "q_source_binaryfile",
    (s, dir) => {
      import s.implicits._
      s.read.format("binaryFile").option("pathGlobFilter", "*.txt")
        .load(exportDocFiles(s, dir))
        .select(
          regexp_extract($"path", "doc_(\\d+)\\.txt$", 1)
            .cast(LongType).as("doc_id"),
          length($"content").cast(LongType).as("nbytes"),
          md5($"content").as("h"))
        .orderBy($"doc_id")
    },
    oracle = Some(
      """SELECT doc_id, length(text) AS nbytes, md5(text) AS h
        |FROM documents ORDER BY doc_id""".stripMargin))

  /** Evolving-schema export: v1 files predate the `o_orderpriority`
    * column (even orderkeys), v2 files carry it (odd). Deterministic
    * key split — both engines can name each row's file generation. */
  private val evolved = new graft.Memo[(SparkSession, String), String]

  private def exportEvolved(s: SparkSession, dir: String): String =
    evolved((s, dir)) {
      val out = "/tmp/graft_sources/" +
        dir.replaceAll("[^A-Za-z0-9.]+", "_") + "/orders_evolving"
      val o = Tables.orders(s, dir)
      o.where(expr("o_orderkey % 2 = 0")).drop("o_orderpriority")
        .write.mode("overwrite").parquet(s"$out/v1")
      o.where(expr("o_orderkey % 2 = 1"))
        .write.mode("overwrite").parquet(s"$out/v2")
      out
    }

  /** q_source_schema_evolution — `mergeSchema` read across parquet file
    * generations, the unavoidable long-lived-table situation (a column
    * added in year 3 of a 100 TB table exists in no earlier file).
    * Spark merges the per-file footer schemas at PLANNING time (one
    * footer read per file, no data pass) and fills the missing column
    * with NULL for pre-evolution files; the oracle reconstructs the
    * same view from the base table with a CASE on the generation key.
    * Pins the two failure modes that matter: NULL-fill (not error, not
    * default-value) for old files, and type/width stability of the
    * shared columns across generations. */
  val qSourceSchemaEvolution: Q = Q(
    "q_source_schema_evolution",
    (s, dir) => {
      import s.implicits._
      val root = exportEvolved(s, dir)
      s.read.option("mergeSchema", "true")
        .parquet(s"$root/v1", s"$root/v2")
        .select(
          $"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice",
          $"o_orderdate".cast("timestamp_ntz").as("o_orderdate"),
          $"o_orderpriority")
        .orderBy($"o_orderkey")
    },
    oracle = Some(
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate,
        |  CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END
        |    AS o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** q_source_text — raw line-oriented text round trip, completing the
    * source family (csv/json/orc/binaryFile/text): the documents corpus
    * as newline-delimited TSV lines through `spark.read.text`, the
    * format raw crawl dumps and log shipping actually arrive in (one
    * record per line, schema applied AFTER ingest). The writer emits
    * `doc_id\tlang\ttext` (the fixture text is space-separated words —
    * no tabs or newlines, FIXTURES.md — so the framing is unambiguous);
    * the reader splits the untyped `value` line back into typed
    * columns entirely in the engine. Oracle = the parquet-side
    * documents table: the hash-match proves the round trip losslessly
    * through the untyped format. Scale: text is splittable by line, so
    * the read parallelizes like any other source; the parse is a
    * per-row projection. */
  private val textExported = new graft.Memo[String, String]

  val qSourceText: Q = Q(
    "q_source_text",
    (s, dir) => {
      import s.implicits._
      val out = textExported(dir) {
        val o = "/tmp/graft_sources/" +
          dir.replaceAll("[^A-Za-z0-9.]+", "_") + "/documents_text"
        Tables.documents(s, dir)
          .select(concat_ws("\t", $"doc_id", $"lang", $"text").as("value"))
          .write.mode("overwrite").text(o)
        o
      }
      s.read.text(out)
        .select(split($"value", "\t").as("f"))
        .select(
          element_at($"f", 1).cast(LongType).as("doc_id"),
          element_at($"f", 2).as("lang"),
          element_at($"f", 3).as("text"))
        .orderBy($"doc_id")
    },
    oracle = Some("SELECT doc_id, lang, text FROM documents ORDER BY doc_id"))

  /** q_source_xml — XML write→read round trip over customer, through
    * Spark 4's BUILT-IN xml data source (mainlined from spark-xml in
    * 4.0 — no extra dependency): one <customer> element per row under
    * a <customers> root. The explicit schema matters most here of all
    * the formats — XML carries no types at all, so every column would
    * otherwise infer from text. DuckDB cannot read XML; the oracle
    * closes the loop the same way as CSV/JSON: the round-tripped rows
    * must equal the parquet ground truth exactly. */
  val qSourceXml: Q = Q(
    "q_source_xml",
    (s, dir) => {
      import s.implicits._
      s.read.schema(customerSchema).option("rowTag", "customer")
        .format("xml").load(export(s, dir, "xml"))
        .orderBy($"c_custkey")
    },
    oracle = Some("SELECT * FROM customer ORDER BY c_custkey"))

  val all: Vector[Q] = Vector(
    qSourceCsv, qSourceJson, qSourceOrc, qSourceBinaryfile,
    qSourceSchemaEvolution, qSourceText, qSourceXml)
}
