package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** CSV/JSON source reading (SURVEY.md §2.1 formats row): fixed schemas
  * (never inferred), and the three malformed-record policies an ETL
  * ingest path needs — PERMISSIVE with corrupt-record capture,
  * DROPMALFORMED, FAILFAST. */
class SourceReadSpec extends AnyFunSuite with SparkFixture {

  private def writeLines(name: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_src")
    Files.write(dir.resolve(name), lines.mkString("\n").getBytes)
    dir.toString
  }

  private val csvSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("amount", DoubleType),
    StructField("_corrupt", StringType)))

  test("csv PERMISSIVE captures malformed rows in the corrupt column") {
    val dir = writeLines("a.csv", Seq("1,10.5", "oops,not_a_number", "3,7.25"))
    val df = spark.read
      .schema(csvSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(dir)
    val rows = df.collect()
    assert(rows.length == 3)
    val corrupt = rows.filter(!_.isNullAt(2))
    assert(corrupt.length == 1)
    assert(corrupt.head.getString(2) == "oops,not_a_number")
    assert(rows.filter(_.isNullAt(2)).map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("csv DROPMALFORMED silently drops structurally bad rows") {
    // Note: Spark 4's CSV DROPMALFORMED drops rows whose *structure* is
    // wrong (token count); a failed type conversion alone nulls the
    // field instead. Use a short row to exercise the drop.
    val dir = writeLines("a.csv", Seq("1,10.5", "loner", "3,7.25"))
    val df = spark.read
      .schema(StructType(csvSchema.fields.take(2)))
      .option("mode", "DROPMALFORMED")
      .csv(dir)
    // collect, not count(): a bare CSV count() short-circuits parsing
    // (counts raw lines), so malformed rows would still be counted.
    assert(df.collect().length == 2)
  }

  test("csv FAILFAST raises on the first bad row") {
    val dir = writeLines("a.csv", Seq("1,10.5", "loner"))
    val df = spark.read
      .schema(StructType(csvSchema.fields.take(2)))
      .option("mode", "FAILFAST")
      .csv(dir)
    intercept[org.apache.spark.SparkException] { df.collect() }
  }

  test("json source with fixed schema reads typed rows") {
    val dir = writeLines("a.json", Seq(
      """{"id": 1, "amount": 10.5}""",
      """{"id": 2, "amount": 7.25}"""))
    val df = spark.read
      .schema(StructType(csvSchema.fields.take(2)))
      .json(dir)
    assert(df.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq ==
      Seq((1L, 10.5), (2L, 7.25)))
  }
}
