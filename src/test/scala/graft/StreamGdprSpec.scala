package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{AppendLog, MonoidTable, Snapshot, StreamCorpusDedup,
  StreamGdpr, StreamIngest}

/** The streaming-GDPR contract: erasing doc_ids through the maintained
  * band index / flag monoid / funnel leaves EXACTLY the state a
  * from-scratch rebuild without those documents builds — plus the
  * fences that make the erasure idempotent under re-delivery and
  * recoverable mid-crash, and the physical disappearance of the erased
  * rows from every live version directory. */
class StreamGdprSpec extends AnyFunSuite with SparkFixture {

  private def docs: DataFrame = Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("text"))

  private def eraseIds: Set[Long] = docs
    .where(pmod(col("doc_id"), lit(7)) === 3)
    .collect().map(_.getLong(0)).toSet

  /** Fold `corpus` through the exact parent-row code path in `nb`
    * modulo-batches; returns (indexRoot, flagsRoot). */
  private def buildDedupState(corpus: DataFrame, nb: Int = 3)
      : (String, String) = {
    val root = Files.createTempDirectory("graft_gdpr").toString
    (0 until nb).foreach { i =>
      StreamCorpusDedup.foldBatch(s"$root/index", s"$root/flags",
        corpus.where(pmod(col("doc_id"), lit(nb)) === i), i.toLong)
    }
    (s"$root/index", s"$root/flags")
  }

  private def flagMap(flags: String): Map[Long, (Long, Long)] =
    MonoidTable.read(spark, flags)
      .select(col("doc_id"), col("seen"), col("n_coll"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  private def bandSet(index: String): Map[(Long, Int, Long), Long] =
    AppendLog.read(spark, index).get
      .select(col("doc_id"), col("band"), col("band_key"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap

  test("catalog row: post-erasure state equals the from-scratch " +
      "rebuild without the erased docs — verdicts, flag counts, and " +
      "band rows all") {
    val got = Catalog.byName("q_stream_gdpr").build(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = eraseIds
    assert(e.nonEmpty, "the cohort must be non-empty")
    val (rIndex, rFlags) = buildDedupState(
      docs.where(!col("doc_id").isin(e.toSeq: _*)))
    val want = StreamCorpusDedup.verdicts(spark, rFlags)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want,
      "post-erasure verdicts must equal the rebuild without the cohort")

    val index = StreamCorpusDedup.DocStage.stateDir(sfDir, "gdpr_index")
    val flags = StreamCorpusDedup.DocStage.stateDir(sfDir, "gdpr_flags")
    assert(flagMap(flags) == flagMap(rFlags),
      "flag table (incl. exact n_coll refunds) must equal the rebuild")
    assert(bandSet(index) == bandSet(rIndex),
      "band index must equal the rebuild's band rows exactly")
    // Fence tombstones: every pre-erasure seg key survives, so a
    // re-delivered pre-erasure batch still no-ops.
    val keys = Snapshot.currentManifest(index).get.keySet
    assert(Seq(0, 1, 2, 3).forall(i => keys(s"seg$i")),
      "seg fence tombstones must survive the erasure rewrite")
    assert(keys("gdpr0"), "the erasure fence must be committed")
  }

  test("physical disappearance: no live version directory retains an " +
      "erased doc's rows after the erasure commit") {
    Catalog.byName("q_stream_gdpr").build(spark, sfDir).count()
    val e = eraseIds
    val index = StreamCorpusDedup.DocStage.stateDir(sfDir, "gdpr_index")
    val flags = StreamCorpusDedup.DocStage.stateDir(sfDir, "gdpr_flags")
    Seq(index, flags).foreach { root =>
      val liveDirs = Snapshot.currentManifest(root).get.values
        .map(_.split('/').head).toSet
      liveDirs.foreach { v =>
        val present = spark.read.parquet(s"$root/$v")
          .select(col("doc_id")).collect().map(_.getLong(0)).toSet
        assert(present.intersect(e).isEmpty,
          s"$root/$v still holds erased docs — the rewrite must be " +
            "physical, not logical")
      }
    }
  }

  test("re-delivered erasure no-ops on every table; a NEW erasure id " +
      "still applies") {
    val (index, flags) = buildDedupState(docs)
    val e1 = docs.where(pmod(col("doc_id"), lit(11)) === 5)
    StreamGdpr.erase(spark, index, flags, e1, eid = 1L)
    val fAfter = flagMap(flags)
    val bAfter = bandSet(index)
    StreamGdpr.erase(spark, index, flags, e1, eid = 1L) // re-delivery
    assert(flagMap(flags) == fAfter && bandSet(index) == bAfter,
      "a re-delivered erasure must change nothing")
    val e2 = docs.where(pmod(col("doc_id"), lit(11)) === 6)
    StreamGdpr.erase(spark, index, flags, e2, eid = 2L)
    val both = (e1.select(col("doc_id")).collect() ++
      e2.select(col("doc_id")).collect()).map(_.getLong(0)).toSet
    val (rIndex, rFlags) = buildDedupState(
      docs.where(!col("doc_id").isin(both.toSeq: _*)))
    assert(flagMap(flags) == flagMap(rFlags) &&
      bandSet(index) == bandSet(rIndex),
      "sequential erasures must compose to the rebuild without both " +
        "cohorts")
  }

  test("crash between the flags commit and the index rewrite: the " +
      "retry re-enters at the unfenced step and converges") {
    val (index, flags) = buildDedupState(docs)
    val e = docs.where(pmod(col("doc_id"), lit(13)) === 4)
    val ex = intercept[IllegalStateException] {
      StreamGdpr.erase(spark, index, flags, e, eid = 7L,
        abortAfterStep = 1)
    }
    assert(ex.getMessage.contains("injected crash"))
    assert(MonoidTable.fenced(flags, "gdpr7"),
      "the flags step must have committed before the crash")
    assert(!AppendLog.fenced(index, "gdpr7"),
      "the index step must NOT have committed")
    // Retry: flags no-op behind its fence (no double refund), index
    // completes — the pair converges to the rebuild.
    StreamGdpr.erase(spark, index, flags, e, eid = 7L)
    val eSet = e.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val (rIndex, rFlags) = buildDedupState(
      docs.where(!col("doc_id").isin(eSet.toSeq: _*)))
    assert(flagMap(flags) == flagMap(rFlags) &&
      bandSet(index) == bandSet(rIndex),
      "the crashed-and-retried erasure must equal the rebuild")
  }

  test("erasing ids the corpus never saw is a state no-op (but fences)") {
    import spark.implicits._
    val (index, flags) = buildDedupState(docs)
    val f0 = flagMap(flags)
    val b0 = bandSet(index)
    StreamGdpr.erase(spark, index, flags,
      Seq(1000000001L, 1000000002L).toDF("doc_id"), eid = 3L)
    assert(flagMap(flags) == f0 && bandSet(index) == b0)
    assert(MonoidTable.fenced(flags, "gdpr3") &&
      AppendLog.fenced(index, "gdpr3"),
      "even a no-op erasure commits its fence — re-delivery must " +
        "short-circuit")
  }

  // ---- ingest pipeline: three state tables incl. the funnel ----

  private def buildIngestState(corpus: DataFrame, nb: Int = 3)
      : (String, String, String) = {
    val root = Files.createTempDirectory("graft_gdpr_ing").toString
    (0 until nb).foreach { i =>
      StreamIngest.foldBatch(s"$root/index", s"$root/flags",
        s"$root/funnel",
        corpus.where(pmod(col("doc_id"), lit(nb)) === i), i.toLong)
    }
    (s"$root/index", s"$root/flags", s"$root/funnel")
  }

  private def reportRows(flags: String, funnel: String)
      : Seq[(Long, String, Long, Long)] =
    StreamIngest.report(spark, flags, funnel)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("ingest erasure of RETAINED docs: index, flags AND funnel all " +
      "equal the rebuild without them (the survivors-only exactness " +
      "contract)") {
    val (index, flags, funnel) = buildIngestState(docs)
    // A cohort of quality-SURVIVORS — the docs whose per-doc state the
    // pipeline actually retains.
    val survivors = MonoidTable.read(spark, flags)
      .where(col("seen") > 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val e = survivors.take(5).toSet
    assert(e.size == 5, "need five retained docs to erase")
    import spark.implicits._
    StreamGdpr.erase(spark, index, flags, e.toSeq.toDF("doc_id"),
      eid = 4L, funnel = Some(funnel))
    val (rIndex, rFlags, rFunnel) = buildIngestState(
      docs.where(!col("doc_id").isin(e.toSeq: _*)))
    assert(reportRows(flags, funnel) == reportRows(rFlags, rFunnel),
      "the funnel report (arrived / quality_pass / derived accepted) " +
        "must equal the rebuild without the erased survivors")
    assert(flagMap(flags) == flagMap(rFlags),
      "ingest flag table must equal the rebuild")
    assert(bandSet(index) == bandSet(rIndex),
      "ingest band index must equal the rebuild")
  }

  test("negative control: a quality-REJECTED doc left no per-doc " +
      "state, so its erasure is a state no-op and the anonymous " +
      "funnel tallies intentionally retain it (the documented " +
      "aggregates-exempt divergence)") {
    val (index, flags, funnel) = buildIngestState(docs)
    val seen = MonoidTable.read(spark, flags)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val rejected = docs.select(col("doc_id")).collect()
      .map(_.getLong(0)).filterNot(seen).take(1)
    assert(rejected.nonEmpty,
      "fixture premise: the quality gate must reject at least one doc")
    val before = reportRows(flags, funnel)
    val f0 = flagMap(flags)
    import spark.implicits._
    StreamGdpr.erase(spark, index, flags, rejected.toSeq.toDF("doc_id"),
      eid = 5L, funnel = Some(funnel))
    assert(reportRows(flags, funnel) == before,
      "funnel counters keep the rejected doc's anonymous tally")
    assert(flagMap(flags) == f0, "no per-doc state existed to erase")
  }
}
