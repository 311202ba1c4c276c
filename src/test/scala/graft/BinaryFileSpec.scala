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
    // column lied about what `content` holds.
    val files = s.read.format("binaryFile")
      .option("pathGlobFilter", "*.txt")
      .load("/tmp/graft_sources/" +
        sfDir.replaceAll("[^A-Za-z0-9.]+", "_") + "/docs_bin")
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
}
