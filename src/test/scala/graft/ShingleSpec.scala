package graft

import graft.operators.DedupQueries.Shingles
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r15 typed per-doc shingler ([[Shingles.shingleArray]], the
  * streaming folds' per-batch path) bit-equal to the declarative
  * `lower → split(' ') → Shingles.of` column the persisted batch stage
  * computes — the equality that keeps StreamCorpusDedup/StreamIngest's
  * "stream == batch" arguments sound after the banding hot path moved
  * off the quadratic-inlining HOF form. */
class ShingleSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def declarative(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")
      .withColumn("w", split(lower(col("text")), " "))
      .select(col("doc_id"), Shingles.of("w").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

  private def typed(rows: Seq[(Long, String)]) =
    Shingles.typed(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

  test("typed shingles equal the declarative column on edge cases") {
    val rows = Seq(
      1L -> "the quick brown fox jumps",
      2L -> "",                       // empty text -> one empty shingle
      3L -> "one",                    // fewer words than the window
      4L -> "two words",
      5L -> "exactly three words",
      6L -> "double  space   runs keep empty tokens",
      7L -> " leading and trailing ",
      8L -> "MiXeD CaSe LoWeRs ThE sAmE wAy",
      9L -> "non-ascii é中ß tokens lower consistently é É",
      10L -> "tabs\tand\nnewlines are not split tokens")
    assert(typed(rows) == declarative(rows))
  }

  test("null text shingles like the declarative column (r15 advice)") {
    // fromString(null) NPE'd the whole fold before the guard. The
    // declarative column maps a null text to [""] (concat_ws skips the
    // null slice) — exactly the empty-text shape; pin both paths.
    val rows = Seq(1L -> "a real document here", 2L -> null, 3L -> "")
    val t = typed(rows)
    assert(t == declarative(rows))
    assert(t(2L) == Seq(""))
  }

  test("typed shingles equal the declarative column on the fixture corpus") {
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val t = typed(docs)
    val d = declarative(docs)
    assert(t.size == d.size && t == d)
  }
}
