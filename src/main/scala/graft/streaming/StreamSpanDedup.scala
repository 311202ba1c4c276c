package graft.streaming

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING SPAN-LEVEL DEDUP (r14 verdict ask #1) — the maintained
  * FINGERPRINT index that lets new documents be span-deduped against
  * the historical corpus incrementally: the batch span rows
  * (`q_dedup_spans`, [[graft.operators.DedupQueries]]) re-derive the
  * whole report from a session-memo'd stage, which a production ingest
  * cannot do — today's crawl must probe yesterday's index without ever
  * re-fingerprinting history. This is [[StreamCorpusDedup]]'s
  * AppendLog-segment discipline applied one level down, from doc-level
  * MinHash bands to the winnowing fingerprints that seed exact span
  * recovery. Three state tables cooperate per micro-batch:
  *
  *  1. the FINGERPRINT INDEX ([[AppendLog]]): each batch's
  *     (doc_id, pos, fp) rows — the exact
  *     [[graft.operators.TextQueries.Fingerprint]] winnowing the batch
  *     rows seed from — land as one immutable segment; per-batch cost
  *     ∝ batch, history is never re-fingerprinted;
  *  2. the CORPUS STORE ([[AppendLog]]): the batch's (doc_id, text)
  *     rows — span extension is char-verified, so the partner
  *     document's text must be retrievable (at 100 TB this is the
  *     corpus table itself; the log is the local stand-in);
  *  3. the SPAN REPORT ([[AppendLog]]): the spans THIS batch's arrivals
  *     create — within-batch pairs plus batch × maintained-index pairs,
  *     extended through the exact batch code path
  *     ([[graft.operators.DedupQueries.extendSeeds]], the `span_extend`
  *     codegen expression) and normalized to doc_a < doc_b.
  *
  * WHY THE REPORT IS A PURE FUNCTION OF THE CORPUS (chunking- and
  * order-invariant, == batch `q_dedup_spans`): every unordered document
  * pair is seed-probed EXACTLY once — in the batch where the
  * later-ARRIVING member lands (same batch → the within self-join,
  * earlier batch → the cross probe against segments strictly below this
  * batch id) — and the probe sees every fingerprint either side owns,
  * so the seed set for that pair equals the batch self-join's. Seed →
  * maximal-span extension is per-pair-deterministic and the within-
  * batch `distinct` collapses that batch's redundant seeds, so the
  * union of segments is exactly the batch report, whatever the
  * chunking or arrival order (StreamSpanDedupSpec drives 2-way, 4-way
  * and a perverse reordering to pin it, plus a planted cross-batch
  * span).
  *
  * Crash-retry: all three commits are fenced by the AppendLog manifest
  * key; a crash between them re-delivers the batch — committed tables
  * no-op, the span fold recomputes from the committed fingerprint
  * segment (append-first, the foldBands rule) and the strictly-below
  * prior index, so a retried batch never probes its own contribution
  * (StreamSpanDedupSpec injects the partial crash and the full
  * re-delivery).
  *
  * Scale (100 TB/day ingest): fingerprinting is the ~2/(window+1)
  * density narrow transform of the BATCH only; the probe is an equi
  * join on the 44-bit fingerprint — candidates ∝ hash collisions,
  * never doc pairs (the batch row's argument, inherited); texts attach
  * through doc_id equi joins against the corpus store; extension is
  * per-seed O(run length) for ASCII text (SpanExtend's byte walk).
  * History is never re-fingerprinted, never rewritten — per-batch cost
  * ∝ batch + matched candidates. At petabyte index size the probe's
  * shuffle is bounded by writing the index BUCKETED on fp (Spark
  * bucketing / the log's own layout), which co-locates the equi join
  * so only the batch side moves; and the segment log's read cost is
  * held flat by the periodic [[AppendLog.compact]] fold — the same
  * quiesced-cadence maintenance event the band index documents,
  * spec-pinned here to preserve the probe and report exactly
  * (StreamSpanDedupSpec's compaction chapter).
  *
  * GDPR composes ([[eraseSpanState]], r14 verdict ask #4): an erased
  * cohort's fingerprints, stored texts AND reported spans (either
  * side) leave all three logs under one fence each — after which a
  * re-run or any later batch CANNOT resurrect a span against the
  * cohort, because the probe index physically no longer holds its
  * fingerprints (spec-pinned: post-erasure == from-scratch build
  * without the cohort; a planted post-erasure arrival sharing a span
  * with an erased doc reports nothing against it).
  *
  * Bench-cost honesty: each rep replays the 4 staged chunks — 4 ×
  * (batch fingerprint + probe + extension + three fenced commits) of
  * fixed machinery; new documents can read no precomputed stage, so
  * the stream pays per rep what the batch row amortizes over the
  * shared persisted fingerprint stage. T-row (the winnowing
  * fingerprint index and the maintained-state replay are un-SQL-able;
  * the SPAN SEMANTICS are already oracle-checked via q_dedup_spans,
  * and the spec pins stream == that row's exact output). */
object StreamSpanDedup {

  import graft.operators.{DedupQueries, TextQueries}

  /** Delta-aligned seeds for one batch: the within-batch fingerprint
    * self-join (the batch row's own [[DedupQueries.seedsFromFps]])
    * plus the cross probe of the batch's fingerprints against the
    * maintained index, normalized to doc_a < doc_b (extension is
    * symmetric, so the swap is a pure column shuffle). */
  private[graft] def batchSeeds(segFps: DataFrame,
      prior: Option[DataFrame]): DataFrame = {
    val within = DedupQueries.seedsFromFps(segFps)
    prior match {
      case None => within
      case Some(idx) =>
        val n = segFps.select(col("doc_id").as("doc_n"),
          col("pos").cast("int").as("pn"), col("fp"))
        val o = idx.select(col("doc_id").as("doc_o"),
          col("pos").cast("int").as("po"), col("fp"))
        val flip = col("doc_o") < col("doc_n")
        val cross = n.join(o, Seq("fp"))
          .where(col("doc_n") =!= col("doc_o"))
          .select(
            when(flip, col("doc_o")).otherwise(col("doc_n")).as("doc_a"),
            when(flip, col("doc_n")).otherwise(col("doc_o")).as("doc_b"),
            when(flip, col("po")).otherwise(col("pn")).as("pa"),
            when(flip, col("pn")).otherwise(col("po")).as("pb"))
        within.unionByName(cross)
    }
  }

  /** Fold one micro-batch of (doc_id, text) into the three state
    * tables. Exposed so the spec can re-deliver, re-order and
    * crash-inject around the identical code path the catalog row runs;
    * `abortAfterAppends` "dies" after the fingerprint/text segments
    * committed but before the span fold — the injected crash between
    * the fenced commits. */
  private[graft] def foldBatch(fpidx: String, docs: String, spans: String,
      batch: DataFrame, id: Long,
      abortAfterAppends: Boolean = false): Unit = {
    val s = batch.sparkSession
    // Staged single-file chunks arrive as ONE input partition — the
    // repartition parallelizes the per-doc winnowing scan (the DocStage
    // rule); production batches arrive as many files and never need it.
    val b = batch.select(col("doc_id"), col("text")).repartition(8)
    // APPEND FIRST (the foldBands rule): fingerprinting is the
    // expensive stage and the segment write doubles as its
    // materialization — the span fold reads the fingerprints BACK from
    // the committed segment instead of recomputing them inside the
    // probe lineage, and a retried batch probes only segments strictly
    // below its own id.
    AppendLog.append(fpidx, TextQueries.Fingerprint.fingerprints(b), id)
    AppendLog.append(docs, b, id)
    if (abortAfterAppends) throw new IllegalStateException(
      "injected crash after the fingerprint/text segment commits")
    // Committed fingerprint segments are a few small files each, so a
    // plain scan packs them into 1–3 input splits (maxPartitionBytes ≫
    // segment size) — and because every join downstream is a broadcast,
    // the WHOLE seed-probe + span-extension stage fuses onto those
    // splits: the fold's dominant work (candidates ∝ fingerprint
    // collisions — tens of millions of span_extend walks per batch at
    // sf0.1) ran near-single-threaded (measured: the per-batch span job
    // was 2.4–2.7 s wall at ~90 ns/seed, i.e. ~1-way). Round-robin
    // repartition of the two PROBE sides spreads the extension across
    // the executor cores — a few-MB shuffle of narrow (doc_id, pos, fp)
    // rows buys full parallelism for the extension stage (guide §2.4:
    // the exchange is added deliberately, its cost ≪ the stage it
    // parallelizes). Hot fingerprints spread evenly because ROUND-ROBIN
    // assigns probe rows, not key hashes (a fp-hash layout would pile
    // every hot-key probe row onto one task — the §2.5 skew trap).
    val par = s.sparkContext.defaultParallelism
    val segFps = AppendLog.segment(s, fpidx, id).getOrElse(
      throw new IllegalStateException(s"segment seg$id missing post-append"))
      .repartition(par)
    val priorFps = AppendLog.readBefore(s, fpidx, id).map(_.repartition(par))
    val batchDocs = AppendLog.segment(s, docs, id).getOrElse(
      throw new IllegalStateException(s"doc seg$id missing post-append"))
    val corpus = AppendLog.readBefore(s, docs, id)
      .fold(batchDocs)(batchDocs.unionByName(_))
    AppendLog.append(spans,
      DedupQueries.extendSeeds(batchSeeds(segFps, priorFps), corpus), id)
  }

  /** The maintained span report: the union of committed span segments
    * (each unordered doc pair was probed in exactly one batch, so the
    * union needs no dedup). */
  def report(s: SparkSession, spans: String): DataFrame =
    AppendLog.read(s, spans).getOrElse(
      throw new IllegalStateException(
        s"span report at $spans has no committed segments"))
      .orderBy(col("doc_a"), col("doc_b"), col("start_a"), col("start_b"))

  /** GDPR erasure through the maintained span state (r14 verdict ask
    * #4): three fenced physical rewrites — the span report drops every
    * row naming the cohort on EITHER side, the fingerprint index and
    * the corpus store drop the cohort's rows — each fence riding the
    * same atomic manifest swap as the data it fences, so re-delivery
    * no-ops per table and a crash between steps re-enters at the first
    * unfenced one (`abortAfterStep` is the spec's hook). Because span
    * rows are pairwise-pure facts and fingerprints/texts are per-doc
    * transforms, post-erasure state equals a from-scratch build over
    * the retained corpus EXACTLY — and later batches probe the
    * rewritten index, so nothing can resurrect a span against the
    * cohort (spec-pinned, not assumed). */
  private[graft] def eraseSpanState(s: SparkSession, fpidx: String,
      docs: String, spans: String, erased: DataFrame, eid: Long,
      abortAfterStep: Int = Int.MaxValue): Unit = {
    val fence = s"gdpr$eid"
    val e = erased.select(col("doc_id")).distinct().localCheckpoint(true)
    var step = 0
    def gate(): Unit = {
      step += 1
      if (step >= abortAfterStep) throw new IllegalStateException(
        s"injected crash after span-erasure step $abortAfterStep")
    }
    if (!AppendLog.fenced(spans, fence))
      AppendLog.rewrite(s, spans, all => all
        .join(e.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_anti")
        .join(e.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_anti")
        // a using-column join moves its key to the front — re-project
        // the stored order, or the folded segment's schema diverges
        // from later appends'
        .select(all.columns.map(col): _*),
        Set(fence))
    gate()
    if (!AppendLog.fenced(fpidx, fence))
      AppendLog.rewrite(s, fpidx,
        _.join(e, Seq("doc_id"), "left_anti"), Set(fence))
    gate()
    if (!AppendLog.fenced(docs, fence))
      AppendLog.rewrite(s, docs,
        _.join(e, Seq("doc_id"), "left_anti"), Set(fence))
  }

  /** q_stream_span_dedup (T) — the maintained span report after the
    * staged replay drains: equal to the batch q_dedup_spans output by
    * the probe-once argument above (spec-pinned, not assumed). Shares
    * the corpus-dedup row's 4-chunk document staging; its own state
    * roots. */
  val qStreamSpanDedup: Q = Q(
    "q_stream_span_dedup",
    (s, dir) => {
      val st = StreamCorpusDedup.DocStage
      val inDir = st.inDir(s, dir)
      val fpidx = st.stateDir(dir, "span_fpidx")
      val docsT = st.stateDir(dir, "span_docs")
      val spans = st.stateDir(dir, "span_out")
      val src = s.readStream.schema(st.schema(s, inDir))
        .option("maxFilesPerTrigger", 1).parquet(inDir)
      // 8 shuffle partitions (the corpus-dedup rationale): each batch
      // runs a corpus-scale fingerprint scan + probe join, not just
      // state-sized shuffles.
      FoldReplay.run(src, "q_stream_span_dedup", shufflePartitions = "8") {
        (batch, id) => foldBatch(fpidx, docsT, spans, batch, id)
      }
      report(s, spans)
    })

  val all: Vector[Q] = Vector(qStreamSpanDedup)
}
