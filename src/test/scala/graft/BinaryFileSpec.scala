package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for q_source_binaryfile (SourceQueries.scala): the whole-file
  * binary ingestion path must reproduce the source corpus byte-exactly —
  * listing (one row per file), identity (doc_id parsed from path), and
  * content (digest + raw bytes), independently of the DuckDB oracle. */
class BinaryFileSpec extends AnyFunSuite with SparkFixture {

  private lazy val got =
    Catalog.byName("q_source_binaryfile").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

  test("one row per document; ids, byte lengths and digests all match") {
    val s = spark
    import org.apache.spark.sql.functions._
    import s.implicits._
    val exp = Tables.documents(s, sfDir)
      .select($"doc_id", length($"text").cast("long"), md5($"text"))
      .as[(Long, Long, String)].collect()
    assert(got.length == exp.length, "row-per-file contract broken")
    assert(got.toSet == exp.toSet,
      "binaryFile round trip must reproduce (id, nbytes, md5) exactly")
  }

  test("raw file bytes equal the source text (not just the digest)") {
    val s = spark
    import s.implicits._
    val texts = Tables.documents(s, sfDir)
      .select($"doc_id", $"text").as[(Long, String)]
      .collect().toMap
    // Re-read a handful of files through the source WITH content and
    // decode: digests agreeing but bytes differing would mean the md5
    // column lied about what `content` holds. The path comes from the
    // export helper itself (which also triggers the export when this
    // test runs alone) — a hardcoded copy would keep reading a stale
    // tree if the export location ever drifted.
    val files = s.read.format("binaryFile")
      .option("pathGlobFilter", "*.txt")
      .load(sources.SourceQueries.exportDocFiles(s, sfDir))
      .limit(20).collect()
    assert(files.nonEmpty)
    files.foreach { r =>
      val path = r.getAs[String]("path")
      val id = "doc_(\\d+)\\.txt$".r.findFirstMatchIn(path).get.group(1).toLong
      val bytes = r.getAs[Array[Byte]]("content")
      assert(new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        == texts(id), s"content mismatch for doc $id")
    }
  }

  test("corpus is pure ASCII — the oracle's byte-length = char-length premise") {
    // q_source_binaryfile's DuckDB twin compares Spark's BYTE length of
    // the file content against DuckDB's CHARACTER length(text); those
    // agree iff the corpus is single-byte. FIXTURES.md profiles it so,
    // but a fixture regeneration could silently break the premise and
    // surface as an unexplained oracle hash mismatch — this pins the
    // contract where the failure would name it.
    val s = spark
    import s.implicits._
    val offenders = Tables.documents(s, sfDir)
      .select($"doc_id", $"text").as[(Long, String)]
      .collect()
      .filter { case (_, t) =>
        t.getBytes(java.nio.charset.StandardCharsets.UTF_8).length != t.length }
    assert(offenders.isEmpty,
      s"non-ASCII documents break the binaryfile oracle: " +
        s"${offenders.take(3).map(_._1).toList}")
  }
}
