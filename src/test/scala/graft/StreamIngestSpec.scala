package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupQueries, TextQueries}
import graft.streaming.{AppendLog, MonoidTable, StreamCorpusDedup, StreamIngest}

/** The composed streaming-ingest contract: the maintained funnel equals
  * the batch composition (quality gate → dedup among survivors),
  * each stage equals its standalone row's code path, the report is
  * invariant to chunking and arrival order, and re-delivery no-ops on
  * every state table. */
class StreamIngestSpec extends AnyFunSuite with SparkFixture {

  import TextQueries.QualityScore

  private def docs: DataFrame = Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("text"))

  /** The batch composition, computed independently of the fold. */
  private lazy val batchTruth: (Long, Long, Long, Long, Long, Long) = {
    val sc = QualityScore(docs)
    val arrived = sc.agg(count(lit(1)), sum(col("n_tok"))).head()
    val pass = sc.where(QualityScore.keep)
      .select(col("doc_id"), col("text"), col("n_tok"))
    val passAgg = pass.agg(count(lit(1)), sum(col("n_tok"))).head()
    val bands = DedupQueries.MinHashLsh.bandKeys(pass)
    val flagged = bands.as("a")
      .join(bands.as("b"), Seq("band", "band_key"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("b.doc_id").as("doc_id")).distinct()
    val acc = pass.join(flagged, Seq("doc_id"), "left_anti")
      .agg(count(lit(1)), sum(col("n_tok"))).head()
    (arrived.getLong(0), arrived.getLong(1),
      passAgg.getLong(0), passAgg.getLong(1),
      acc.getLong(0), acc.getLong(1))
  }

  private def asRows(df: DataFrame): Seq[(Long, String, Long, Long)] =
    df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq

  test("the catalog row equals the independently-computed batch " +
      "composition, and the dedup stage genuinely bites") {
    val (aD, aT, pD, pT, accD, accT) = batchTruth
    assert(pD < aD, "the quality gate must reject some docs")
    assert(accD < pD,
      "some quality survivor must have a near-duplicate survivor — " +
        "otherwise the dedup stage is vacuous at this fixture")
    val got = asRows(Catalog.byName("q_stream_ingest").build(spark, sfDir))
    assert(got == Seq(
      (0L, "arrived", aD, aT),
      (1L, "quality_pass", pD, pT),
      (2L, "dedup_accepted", accD, accT)))
  }

  test("stage reuse is real: the funnel's quality_pass count equals the " +
      "standalone q_text_filter_pipeline row's kept total") {
    val kept = Catalog.byName("q_text_filter_pipeline").build(spark, sfDir)
      .agg(sum(col("n_kept"))).head().getLong(0)
    assert(batchTruth._3 == kept,
      "the one QualityScore.keep definition must make these equal")
  }

  /** Drive foldBatch directly with an explicit batching. */
  private def runBatches(batches: Seq[DataFrame]): (String, Seq[(Long, String, Long, Long)]) = {
    val root = Files.createTempDirectory("graft_ingest").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamIngest.foldBatch(s"$root/index", s"$root/flags",
        s"$root/funnel", b, i.toLong)
    }
    (root, asRows(StreamIngest.report(spark, s"$root/flags", s"$root/funnel")))
  }

  test("chunking and arrival order do not change the drained funnel") {
    val want = asRows(Catalog.byName("q_stream_ingest").build(spark, sfDir))
    val byMod = (0 until 3).map(i =>
      docs.where(pmod(col("doc_id"), lit(3)) === i))
    assert(runBatches(byMod)._2 == want)
    assert(runBatches(byMod.reverse)._2 == want)
  }

  test("re-delivery of a committed batchId no-ops on ALL THREE state " +
      "tables (index segments, flag monoids, funnel monoids)") {
    val byMod = (0 until 3).map(i =>
      docs.where(pmod(col("doc_id"), lit(3)) === i))
    val (root, before) = runBatches(byMod)
    val segRows = AppendLog.read(spark, s"$root/index").get.count()
    val flagRows = MonoidTable.read(spark, s"$root/flags").count()
    val seenMax = MonoidTable.read(spark, s"$root/flags")
      .agg(max(col("seen"))).head().getLong(0)
    StreamIngest.foldBatch(s"$root/index", s"$root/flags",
      s"$root/funnel", byMod(1), 1L)
    assert(AppendLog.read(spark, s"$root/index").get.count() == segRows,
      "re-delivery must not append a duplicate band segment")
    assert(MonoidTable.read(spark, s"$root/flags").count() == flagRows)
    assert(MonoidTable.read(spark, s"$root/flags")
      .agg(max(col("seen"))).head().getLong(0) == seenMax,
      "a double-merged batch would read seen = 2 for its docs")
    assert(asRows(StreamIngest.report(spark, s"$root/flags",
      s"$root/funnel")) == before)
    assert(seenMax == 1L)
  }

  test("the accepted set is exactly the quality survivors minus docs " +
      "with a smaller-id surviving collider — rejected docs can never " +
      "shadow a survivor") {
    // A doc that FAILS the gate must not enter the index: if it did, a
    // smaller-id failing near-duplicate would wrongly flag a surviving
    // doc. Feed one batch where a failing doc precedes its (synthetic)
    // passing twin and assert the twin is accepted.
    val sc = QualityScore(docs)
    val failing = sc.where(!QualityScore.keep)
      .select(col("doc_id")).limit(1).collect()
    assume(failing.nonEmpty, "fixture has gate-failing docs")
    val (root, rows) = runBatches(Seq(docs))
    val flags = MonoidTable.read(spark, s"$root/flags")
    val passIds = sc.where(QualityScore.keep)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val seenIds = flags.where(col("seen") > 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(seenIds == passIds,
      "exactly the quality survivors may enter the dedup state")
    assert(rows.map(_._2) == Seq("arrived", "quality_pass", "dedup_accepted"))
  }
}
