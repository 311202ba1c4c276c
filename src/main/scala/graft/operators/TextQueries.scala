package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators over the documents corpus — SURVEY.md §2.10
  * rows 46–48 (LLM-data-pipeline north star).
  *
  * Scale notes (100 TB): tokenization is a per-row Generator (explode) —
  * embarrassingly parallel, no shuffle. The two-level wordcount (#47)
  * partial-aggregates (doc_id, term) before the shuffle, and the corpus
  * side collapses to the vocabulary (31 terms, FIXTURES.md) — broadcast.
  * #48 is a plain partial+final hash agg on (lang, source) (≤100 groups).
  */
object TextQueries {

  /** The SHARED tokenize stage (added r8, mirroring
    * [[DedupQueries.Shingled]]): ONE canonical pass over the corpus that
    * every token-consuming text query reads, instead of each query
    * re-splitting `text` from scratch — at 100 TB, N queries re-reading
    * and re-tokenizing the corpus is N redundant full scans; here the
    * corpus is tokenized exactly once and the (narrow) token arrays are
    * what downstream plans consume. At warehouse scale this stage is a
    * written table; locally it is a persist-marked intermediate, and
    * `PlanAuditSpec` pins that each consumer's plan reads the InMemory
    * scan rather than re-splitting.
    *
    * Columns: doc_id, lang, source, n_chars (carried for the feature
    * queries); w (raw whitespace tokens); lw (lowercased tokens —
    * identical to `split(lower(text))` because lowercasing never
    * produces a space); vowel_groups / n_nonspace_chars (the two
    * regexp-derived counts, computed here so the raw `text` column
    * never needs to be cached). */
  object Tokenized {
    private val cache = new graft.Memo[(SparkSession, String), org.apache.spark.sql.DataFrame]

    def apply(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
      cache((s, dir)) {
        Tables.documents(s, dir)
          .select(
            col("doc_id"), col("lang"), col("source"), col("n_chars"),
            split(col("text"), " ").as("w"),
            transform(split(col("text"), " "), t => lower(t)).as("lw"),
            size(regexp_extract_all(col("text"), lit("[aeiou]+"), lit(0)))
              .cast(LongType).as("vowel_groups"),
            length(regexp_replace(col("text"), " ", "")).cast(LongType)
              .as("n_nonspace_chars"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
  }

  /** #46 q_text_tokenize_explode — whitespace tokenizer, one row per
    * (doc, token) occurrence. Duplicate rows are identical, so ORDER BY
    * (doc_id, tok) is still a total order of row *values* (rule 1). */
  val qTextTokenizeExplode: Q = Q(
    "q_text_tokenize_explode",
    (s, dir) => {
      import s.implicits._
      Tokenized(s, dir)
        .select($"doc_id", explode($"w").as("tok"))
        .orderBy($"doc_id", $"tok")
    },
    oracle = Some(
      """SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |FROM documents
        |ORDER BY doc_id, tok""".stripMargin))

  /** #47 q_text_wordcount_tf — per-doc top term by tf (term tiebreak)
    * joined with that term's corpus-wide count. */
  val qTextWordcountTf: Q = Q(
    "q_text_wordcount_tf",
    (s, dir) => {
      import s.implicits._
      val toks = Tokenized(s, dir)
        .select($"doc_id", explode($"w").as("term"))
      val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val corpus = toks.groupBy($"term").agg(count(lit(1)).as("corpus_cnt"))
      val w = Window.partitionBy($"doc_id").orderBy($"tf".desc, $"term")
      tf.withColumn("rn", row_number().over(w))
        .where($"rn" === 1)
        // corpus side = vocabulary-sized (31 terms at any SF) — broadcast.
        .join(broadcast(corpus), "term")
        .select($"doc_id", $"term", $"tf", $"corpus_cnt")
        .orderBy($"doc_id")
    },
    oracle = Some(
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
        |corpus AS (SELECT term, COUNT(*) AS corpus_cnt FROM toks GROUP BY term),
        |top AS (SELECT doc_id, term, tf,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) AS rn FROM tf)
        |SELECT doc_id, term, tf, corpus_cnt
        |FROM top JOIN corpus USING (term) WHERE rn = 1
        |ORDER BY doc_id""".stripMargin))

  /** #48 q_text_stats — per (lang, source): doc count, rounded average
    * length (exact int sum / count, rule 3), and length-bucket counts. */
  val qTextStats: Q = Q(
    "q_text_stats",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .groupBy($"lang", $"source")
        .agg(
          count(lit(1)).as("n_docs"),
          round(sum($"n_chars").cast(DoubleType) / count(lit(1)), 4)
            .as("avg_chars"),
          sum(when($"n_chars" < 200, 1L).otherwise(0L)).as("n_short"),
          sum(when($"n_chars" >= 200 && $"n_chars" < 300, 1L).otherwise(0L))
            .as("n_mid"),
          sum(when($"n_chars" >= 300, 1L).otherwise(0L)).as("n_long"))
        .orderBy($"lang", $"source")
    },
    oracle = Some(
      """SELECT lang, source, COUNT(*) AS n_docs,
        |  ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS avg_chars,
        |  COUNT(*) FILTER (WHERE n_chars < 200) AS n_short,
        |  COUNT(*) FILTER (WHERE n_chars >= 200 AND n_chars < 300) AS n_mid,
        |  COUNT(*) FILTER (WHERE n_chars >= 300) AS n_long
        |FROM documents
        |GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin))

  /** q_text_quality — per-doc training-data quality features: token
    * count, distinct-token ratio, stopword ratio, average word length,
    * and a weighted composite score. All ratios are int/int double
    * divisions (bit-identical across engines); round(6) avoids the
    * .5-boundary cases that terminating ratios (k/2^a) hit at 4 digits. */
  /** The ONE quality scorer, shared by q_text_quality,
    * q_text_filter_pipeline and the streaming
    * [[graft.streaming.StreamingQueries.qualityFilter]] so the formula
    * cannot drift between the oracle-checked batch queries and the
    * stream: adds w / n_tok / n_distinct / n_stop / quality columns to
    * any frame with a `text` column. */
  object QualityScore {
    /** For frames that already carry the integer count columns (n_tok,
      * n_distinct, n_stop) — the quality score is a pure function of
      * that triple, factored here so the streamed model-refit histogram
      * (keyed on the triple) derives quality/label through the ONE
      * definition the row paths use. */
    def fromCounts(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.withColumn("quality", round(
        (col("n_distinct").cast(DoubleType) / col("n_tok")) * 0.5 +
          (lit(1.0) - col("n_stop").cast(DoubleType) / col("n_tok")) * 0.3 +
          least(col("n_tok").cast(DoubleType) / 50.0, lit(1.0)) * 0.2, 6))

    /** For frames that already carry tokenized `w` (the shared
      * [[Tokenized]] stage): score without re-splitting. */
    def fromTokens(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      fromCounts(
        df.withColumn("n_tok", size(col("w")).cast(LongType))
          .withColumn("n_distinct", size(array_distinct(col("w"))).cast(LongType))
          .withColumn("n_stop",
            size(filter(col("w"), t => t === "the" || t === "a")).cast(LongType)))

    /** For frames with a raw `text` column (the streaming path, which
      * scores per micro-batch and has no shared stage to read). */
    def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      fromTokens(df.withColumn("w", split(col("text"), " ")))

    /** The keep gate of the filter pipelines (batch + streaming). */
    def keep: org.apache.spark.sql.Column =
      col("quality") >= 0.65 && col("n_tok").between(20, 200)
  }

  val qTextQuality: Q = Q(
    "q_text_quality",
    (s, dir) => {
      import s.implicits._
      QualityScore.fromTokens(Tokenized(s, dir))
        .select(
          $"doc_id", $"n_tok",
          round($"n_distinct".cast(DoubleType) / $"n_tok", 6)
            .as("distinct_ratio"),
          round($"n_stop".cast(DoubleType) / $"n_tok", 6).as("stop_ratio"),
          // text is single-space joined: chars = sum(word lens) + (n-1)
          round(($"n_chars" - ($"n_tok" - 1)).cast(DoubleType) / $"n_tok", 6)
            .as("avg_word_len"),
          $"quality")
        .orderBy($"doc_id")
    },
    oracle = Some(
      """SELECT doc_id, n_tok,
        |  ROUND(CAST(n_distinct AS DOUBLE) / n_tok, 6) AS distinct_ratio,
        |  ROUND(CAST(n_stop AS DOUBLE) / n_tok, 6) AS stop_ratio,
        |  ROUND(CAST(n_chars - (n_tok - 1) AS DOUBLE) / n_tok, 6) AS avg_word_len,
        |  ROUND((CAST(n_distinct AS DOUBLE) / n_tok) * 0.5
        |      + (1.0 - CAST(n_stop AS DOUBLE) / n_tok) * 0.3
        |      + least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) * 0.2, 6) AS quality
        |FROM (
        |  SELECT doc_id, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> t IN ('the', 'a'))) AS BIGINT) AS n_stop
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin))

  /** q_text_token_count — token counting two ways: whitespace tokens and
    * a BPE-ish regex segmentation (vowel-run groups), plus non-space char
    * count. Regex stays in the RE2∩Java common subset (rule 5). */
  val qTextTokenCount: Q = Q(
    "q_text_token_count",
    (s, dir) => {
      import s.implicits._
      Tokenized(s, dir)
        .select(
          $"doc_id",
          size($"w").cast(LongType).as("ws_tokens"),
          $"vowel_groups", $"n_nonspace_chars")
        .orderBy($"doc_id")
    },
    oracle = Some(
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT) AS vowel_groups,
        |  CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_nonspace_chars
        |FROM documents
        |ORDER BY doc_id""".stripMargin))

  /** True sliding-window winnowing fingerprints (Schleimer/Wilkerson/
    * Aiken's MOSS scheme), shared by the query and `FingerprintSpec`:
    * xxhash64 over char 8-grams, minimum of every SLIDING 16-gram
    * window (LEFTMOST-min tiebreak — the packed (h44, pos) min picks the
    * smallest position among equal hashes; classic winnowing picks
    * rightmost, but either fixed side preserves the match guarantee and
    * the density bound, and leftmost is what a packed-long min gives for
    * free), the selected (pos, hash) pairs deduplicated. Guarantee the r5 disjoint-
    * bucket variant lacked: any substring match of length ≥ window +
    * gram − 1 (= 23 chars) contains a full window on both sides, so the
    * two documents MUST share a fingerprint no matter how the match is
    * offset — `FingerprintSpec` pins exactly that boundary-straddling
    * case.
    *
    * Scale: the sliding min is a windowed aggregate PARTITIONED BY
    * doc_id — per-doc state only, no global sort, embarrassingly
    * parallel across documents; output stays ~|text|/window rows per
    * doc after the distinct (winnowing's density bound 2/(window+1)). */
  object Fingerprint {
    val gram = 8
    val window = 16

    /** Shipped implementation: typed per-doc winnowing over a monotonic
      * deque — O(1) amortized per gram, no explode, no WindowExec.
      *
      * This is the one place the engine drops to `mapPartitions`, and
      * deliberately: winnowing is per-document SEQUENTIAL (each window
      * min depends on a sliding neighborhood), and the declarative
      * WindowExec form below — kept as the cross-checked reference —
      * was measured at ~2 s for 1.45M gram rows at sf0.1 with the time
      * going to WindowExec's per-row buffer management, not the
      * comparisons. The typed form is embarrassingly parallel across
      * documents, touches no shuffle at all (mapPartitions over the
      * scan), and hashes each gram with Spark's own XXH64 (seed 42,
      * UTF8String bytes) so its output is BIT-IDENTICAL to the
      * declarative form — `FingerprintSpec` pins the equality on the
      * fixture corpus. (Code-unit vs code-point substrings differ only
      * beyond the BMP; the equality holds for any BMP text.) */
    def fingerprints(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      df.select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.flatMap { case (docId, text) =>
          winnow(text).map { case (pos, fp) => (docId, pos, fp) }
        })
        .toDF("doc_id", "pos", "fp")
    }

    /** Per-doc winnowing core: packed (h44 << 20 | pos) mins of every
      * sliding `window`-gram window, adjacent-deduplicated (a value can
      * only win a contiguous run of windows). Returns (pos, fp) pairs. */
    private[graft] def winnow(text: String): Iterator[(Long, Long)] = {
      val n = math.max(text.length - gram + 1, 1)
      // Enforce the 20-bit position field: beyond it the packed min's
      // pos bits would bleed into the hash bits and corrupt selection
      // silently. Book-sized inputs must pre-chunk.
      require(n < (1 << 20),
        s"winnowing supports < 2^20 grams per document, got $n — pre-chunk")
      val ph = new Array[Long](n)
      // ASCII fast path (r15, guide §1.2 "per-task work"): the loop
      // below allocated TWO objects per gram (a substring String plus
      // its UTF8String re-encode) only to hash 8 bytes — for ASCII text
      // the UTF-8 bytes of every gram are a SLICE of the whole
      // document's byte encoding, so encode once and hash windows in
      // place, zero per-gram allocation. Bit-identical by construction:
      // XXH64 sees the exact same bytes. Non-ASCII keeps the per-gram
      // encode — a gram boundary can split a surrogate pair, whose
      // per-substring encoding differs from the whole-string slice, so
      // the slice shortcut would change hashes there.
      val len = text.length
      var ascii = true
      val bytes = new Array[Byte](len)
      var j = 0
      while (ascii && j < len) {
        val c = text.charAt(j)
        if (c < 0x80) { bytes(j) = c.toByte; j += 1 } else ascii = false
      }
      var i = 0
      if (ascii) {
        val base = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
        while (i < n) {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(bytes, base + i,
              math.min(i + gram, len) - i, 42L)
          // Same packing as the declarative form: top 44 hash bits,
          // 1-based pos in the low 20 (values unique ⇒ strict compares).
          ph(i) = ((h >>> 20) << 20) | (i + 1).toLong
          i += 1
        }
      } else while (i < n) {
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(
          text.substring(i, math.min(i + gram, text.length)))
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
        ph(i) = ((h >>> 20) << 20) | (i + 1).toLong
        i += 1
      }
      val wEff = math.min(window, n)
      val deque = new Array[Int](wEff + 1) // ring buffer of indices
      var head = 0
      var tail = 0 // exclusive
      @inline def dq(j: Int): Int = deque(j % (wEff + 1))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var last = Long.MinValue
      var e = 0
      while (e < n) {
        while (tail > head && ph(dq(tail - 1)) > ph(e)) tail -= 1
        deque(tail % (wEff + 1)) = e
        tail += 1
        if (dq(head) <= e - wEff) head += 1
        if (e >= wEff - 1) {
          val m = ph(dq(head))
          if (m != last) {
            out += ((m & ((1L << 20) - 1), m >>> 20))
            last = m
          }
        }
        e += 1
      }
      out.iterator
    }

    /** Declarative reference implementation (explode + WindowExec
      * sliding min + lag dedup) — the cross-check for the typed form. */
    def fingerprintsDeclarative(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      // total grams is a SCALAR of the text (no second window pass):
      // greatest(len - g + 1, 1), carried through the explode.
      //
      // The sliding min runs over a SINGLE PACKED LONG, not a struct:
      // (top 44 hash bits << 20) | pos. Sliding frames re-aggregate the
      // whole frame per row (min has no inverse), so the per-row cost is
      // w comparisons — primitive long compares instead of interpreted
      // InternalRow struct compares (~2× measured at sf0.1). Ordering
      // semantics are preserved: min-by-(h44, pos), the same
      // deterministic leftmost-min-hash tiebreak. The 20-bit pos field
      // caps docs at ~1M grams (books would pre-chunk); truncating the
      // fingerprint to 44 bits adds a ~2⁻⁴⁵ per-window-pair collision
      // chance — irrelevant for dedup recall, and the hash family is
      // engine-specific (T-row) anyway.
      val hashes = df.select(col("doc_id"), col("text"),
          expr(s"greatest(length(text) - ${gram - 1}, 1)").as("total"),
          explode(expr(s"sequence(1, greatest(length(text) - ${gram - 1}, 1))"))
            .as("pos"))
        .select(col("doc_id"), col("pos"), col("total"),
          // Same 20-bit pos-field guard as the typed winnow(): an
          // oversized doc fails loudly instead of bleeding pos bits
          // into the hash. assert_true folds into ph so pruning keeps it.
          (shiftleft(shiftrightunsigned(
            xxhash64(expr(s"substring(text, pos, $gram)")), 20), 20)
            .bitwiseOR(col("pos")) + coalesce(
              expr(s"assert_true(total < ${1 << 20}, " +
                "'winnowing supports < 2^20 grams per document — pre-chunk')")
                .cast("long"),
              lit(0L))).as("ph"))
      val byPos = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      val sliding = byPos.rowsBetween(-(window - 1), 0)
      hashes
        .select(col("doc_id"), col("pos"), col("total"),
          min(col("ph")).over(sliding).as("m"))
        // Full windows only — except short docs (< window grams), whose
        // last row's frame covers the entire doc and stands in for the
        // single whole-document window.
        .where(col("pos") >= window || col("pos") === col("total"))
        // Dedup selected pairs WITHOUT a distinct: a given (h, pos) can
        // only be the min for a CONTIGUOUS run of windows (the frame
        // slides forward past it exactly once), so duplicates are always
        // pos-adjacent and a lag filter removes them all — in the same
        // (doc_id, pos) WindowExec pass, no extra exchange or sort,
        // replacing the r6-draft distinct's 1.4M-row shuffle + hash agg
        // (measured ~2 s of the query's 2.5 s at sf0.1).
        .withColumn("prev", lag(col("m"), 1).over(byPos))
        .where(col("prev").isNull || col("m") =!= col("prev"))
        .select(col("doc_id"),
          col("m").bitwiseAND(lit((1L << 20) - 1)).as("pos"),
          shiftrightunsigned(col("m"), 20).as("fp"))
    }
  }

  /** q_doc_fingerprint (T) — winnowing-selected (position, hash) pairs
    * per document; `FingerprintSpec` pins identity/near-dup/disjoint
    * behavior plus the sliding-window boundary guarantee. */
  val qDocFingerprint: Q = Q(
    "q_doc_fingerprint",
    (s, dir) => {
      import s.implicits._
      Fingerprint.fingerprints(Tables.documents(s, dir))
        .orderBy($"doc_id", $"pos", $"fp")
    })

  /** q_text_filter_pipeline — the quality-gate keep decision a
    * training-data pipeline ships, composed from #q_text_quality's
    * oracle-matched features: a document survives iff its composite
    * quality ≥ 0.65 AND its token count is in [20, 200]; reported as
    * per-language survival stats. Thresholds are demo parameters tuned
    * non-degenerate for the fixture distribution (378/500 kept at
    * sf0.01) — a production pipeline tunes them per corpus. The
    * threshold comparisons operate on the round(6) score that already
    * hash-matches DuckDB, so the kept sets are engine-identical.
    *
    * Scale: per-row scoring (no shuffle) + one partial-aggregated
    * hash agg on lang (≤ 5 groups). */
  val qTextFilterPipeline: Q = Q(
    "q_text_filter_pipeline",
    (s, dir) => {
      import s.implicits._
      QualityScore.fromTokens(Tokenized(s, dir))
        .groupBy($"lang")
        .agg(
          count(lit(1)).as("n_total"),
          sum(when(QualityScore.keep, 1L).otherwise(0L)).as("n_kept"))
        .withColumn("keep_rate",
          round($"n_kept".cast(DoubleType) / $"n_total", 6))
        .orderBy($"lang")
    },
    oracle = Some(
      """SELECT lang, COUNT(*) AS n_total,
        |  CAST(SUM(CASE WHEN quality >= 0.65 AND n_tok BETWEEN 20 AND 200
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  ROUND(CAST(SUM(CASE WHEN quality >= 0.65 AND n_tok BETWEEN 20 AND 200
        |      THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS keep_rate
        |FROM (
        |  SELECT doc_id, lang, n_tok,
        |    ROUND((CAST(n_distinct AS DOUBLE) / n_tok) * 0.5
        |        + (1.0 - CAST(n_stop AS DOUBLE) / n_tok) * 0.3
        |        + least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) * 0.2, 6) AS quality
        |  FROM (
        |    SELECT doc_id, lang,
        |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |      CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        |      CAST(len(list_filter(string_split(text, ' '),
        |        t -> t IN ('the', 'a'))) AS BIGINT) AS n_stop
        |    FROM documents))
        |GROUP BY lang
        |ORDER BY lang""".stripMargin))

  /** q_sample_deterministic (added r5) — reproducible corpus sampling,
    * the way a training-data pipeline actually subsamples: keep a doc
    * iff the first byte of md5(doc_id) falls under the rate threshold.
    * Unlike TABLESAMPLE/df.sample (engine-specific RNG streams), the
    * hash gate is a pure function of the row — identical across
    * engines, runs, partitionings and retries, and any row's membership
    * is auditable after the fact. ~25/256 ≈ 9.8% expected rate.
    * Per-row narrow filter — no shuffle, pushes nothing but reads only
    * the needed columns. */
  val qSampleDeterministic: Q = Q(
    "q_sample_deterministic",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .where(graft.Dsl.md5Gate($"doc_id", "19"))
        .select($"doc_id", $"lang", $"n_chars")
        .orderBy($"doc_id")
    },
    oracle = Some(
      s"""SELECT doc_id, lang, n_chars
         |FROM documents
         |WHERE ${graft.Dsl.md5GateSql("doc_id", "19")}
         |ORDER BY doc_id""".stripMargin))

  /** q_text_normalize (added r5) — canonicalize-before-dedup: lowercase,
    * strip non-alphanumerics, collapse whitespace, trim; emit the
    * canonical hash + length. This is the step that makes exact dedup
    * robust to formatting noise (case, punctuation, spacing) — run it
    * before q_dedup_exact's md5 group at ingest. Regexes stay in the
    * RE2∩Java common subset (SURVEY §2 rule 5); Spark regexp_replace is
    * global by default, DuckDB needs the 'g' flag. Narrow per-row
    * projection, no shuffle. */
  val qTextNormalize: Q = Q(
    "q_text_normalize",
    (s, dir) => {
      import s.implicits._
      val canon = trim(regexp_replace(
        regexp_replace(lower($"text"), "[^a-z0-9 ]", ""), " +", " "))
      Tables.documents(s, dir)
        .select(
          $"doc_id",
          md5(canon).as("canon_h"),
          length(canon).cast(LongType).as("canon_len"))
        .orderBy($"doc_id")
    },
    oracle = Some(
      """SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS canon_h,
        |  length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS canon_len
        |FROM documents
        |ORDER BY doc_id""".stripMargin))

  /** q_text_tfidf (added r7) — per-(doc, term) TF-IDF over the unigram
    * vocabulary: tf = occurrences in the doc, df = docs containing the
    * term, tfidf = tf · ln(N/df), corpus-universal terms (idf = 0)
    * dropped. The score every retrieval/quality pipeline starts from.
    *
    * Scale (100 TB): tf is one partial-aggregated shuffle on
    * (doc_id, term); df collapses to the VOCABULARY (bounded —
    * word-like token universes are ≤ millions at any corpus size), so
    * both the df side and the one-row N are broadcast — the big side is
    * touched exactly twice, narrowly, and never re-shuffled. round(6)
    * masks ln() libm ulp drift across engines (SURVEY §2 rule 2). */
  val qTextTfidf: Q = Q(
    "q_text_tfidf",
    (s, dir) => {
      import s.implicits._
      val toks = Tokenized(s, dir)
        .select($"doc_id", explode($"lw").as("term"))
      val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val df = toks.select($"doc_id", $"term").distinct()
        .groupBy($"term").agg(count(lit(1)).as("df"))
      val n = Tokenized(s, dir).agg(count(lit(1)).as("n_docs"))
      tf.join(broadcast(df), "term")
        .crossJoin(broadcast(n))
        .select($"doc_id", $"term", $"tf", $"df",
          round($"tf" * log($"n_docs".cast("double") / $"df"), 6).as("tfidf"))
        .where($"tfidf" > 0.0)
        .orderBy($"doc_id", $"term")
    },
    oracle = Some(
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents)
        |SELECT doc_id, term, tf, df,
        |  ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
        |FROM tf JOIN df USING (term), n
        |WHERE ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) > 0.0
        |ORDER BY doc_id, term""".stripMargin))

  /** q_sample_stratified (added r7) — per-STRATUM deterministic
    * downsampling: the language-rebalancing step an LLM data pipeline
    * runs when one language dominates the crawl. Same auditable md5
    * hash gate as q_sample_deterministic (pure function of the row —
    * identical across engines, runs, partitionings, retries), but the
    * threshold varies by stratum: 'en' (the overrepresented class,
    * 44% of the corpus) keeps ~7.8% (0x14/256), every other language
    * ~33% (0x55/256). Narrow per-row filter — no shuffle, nothing to
    * skew; rebalancing 100 TB costs one scan. */
  val qSampleStratified: Q = Q(
    "q_sample_stratified",
    (s, dir) => {
      import s.implicits._
      val thresh = when($"lang" === "en", "14").otherwise("55")
      Tables.documents(s, dir)
        .where(graft.Dsl.md5Gate($"doc_id", thresh))
        .select($"doc_id", $"lang", $"source")
        .orderBy($"doc_id")
    },
    oracle = Some(
      """SELECT doc_id, lang, source
        |FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
        |  CASE WHEN lang = 'en' THEN '14' ELSE '55' END
        |ORDER BY doc_id""".stripMargin))

  /** q_text_redact_pii (added r7) — PII scrubbing, the redaction pass a
    * training-data pipeline runs before anything else ships: match
    * emails / phone numbers, count them, and replace with placeholder
    * tokens. The fixture corpus carries no organic PII (31-word vocab),
    * so the query PLANTS it deterministically from doc_id on both
    * engines (emails on ids ≢ 0 mod 3, phones on even ids — counts are
    * non-degenerate 0/1 mixes) and then redacts; the md5 of the redacted
    * text pins the replacement byte-for-byte. Patterns stay in the
    * RE2∩Java common subset (SURVEY §2 rule 5; no backrefs/lookahead).
    * Narrow per-row projection — scrubbing 100 TB costs one scan, no
    * shuffle, and the regexes are codegen'd per row. */
  val qTextRedactPii: Q = Q(
    "q_text_redact_pii",
    (s, dir) => {
      import s.implicits._
      val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
      val phoneRe = "\\+[0-9]{7,15}"
      val raw = concat(
        $"text",
        when(pmod($"doc_id", lit(3)) =!= 0,
          concat(lit(" contact user"), $"doc_id", lit("@example.com")))
          .otherwise(lit("")),
        when(pmod($"doc_id", lit(2)) === 0,
          concat(lit(" tel +1555010"), pmod($"doc_id", lit(10000))))
          .otherwise(lit("")))
      Tables.documents(s, dir)
        .select($"doc_id", raw.as("raw"))
        .select(
          $"doc_id",
          size(regexp_extract_all($"raw", lit(emailRe), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all($"raw", lit(phoneRe), lit(0)))
            .cast("long").as("n_phones"),
          md5(regexp_replace(
            regexp_replace($"raw", emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>")).as("redacted_h"))
        .orderBy($"doc_id")
    },
    oracle = Some(
      """WITH withpii AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 <> 0
        |         THEN ' contact user' || doc_id || '@example.com'
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 2 = 0
        |         THEN ' tel +1555010' || (doc_id % 10000)
        |         ELSE '' END AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(raw, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(raw, '\+[0-9]{7,15}')) AS n_phones,
        |  md5(regexp_replace(
        |    regexp_replace(raw, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |    '\+[0-9]{7,15}', '<PHONE>', 'g')) AS redacted_h
        |FROM withpii
        |ORDER BY doc_id""".stripMargin))

  /** q_text_repetition (added r7, de-shuffled r8) — within-document
    * repetition score (the Gopher-style quality signal): fraction of
    * 2-gram occurrences claimed by the single most frequent 2-gram, plus
    * the distinct/total 2-gram ratio. High repetition marks boilerplate/
    * spam; the SCORE is the operator — thresholding is the downstream
    * pipeline's policy (a fixed flag on this fixture would be
    * degenerate).
    *
    * Scale: the statistic is PER-DOCUMENT, so it never needed a keyed
    * shuffle — all of a doc's 2-grams live in one array. r7 shipped the
    * obvious explode → (doc, gram) agg → doc agg (two shuffles, ~260k
    * grouped rows at sf0.1, the slowest batch row at 4.9 s); r8 computes
    * the same three numbers inside a single codegen'd projection:
    * `array_sort` the gram array, then one `aggregate` HOF pass counts
    * the longest equal-run (= max 2-gram frequency). Zero exchanges,
    * embarrassingly parallel, per-row state O(|doc|) — the correct
    * 100 TB shape for any per-document statistic. */
  val qTextRepetition: Q = Q(
    "q_text_repetition",
    (s, dir) => {
      import s.implicits._
      Tokenized(s, dir)
        .withColumn("g", expr(
          """transform(
            |  sequence(1, greatest(size(lw) - 1, 1)),
            |  i -> concat_ws(' ', slice(lw, i, 2)))""".stripMargin))
        .select($"doc_id",
          size($"g").cast(LongType).as("tot_2grams"),
          size(array_distinct($"g")).cast(LongType).as("distinct_2grams"),
          // Longest equal-run of the sorted gram array == the count of
          // the most frequent 2-gram. Initial state ('', 0, 0) is safe
          // even against an empty-string gram: run starts at 0, so the
          // first element always yields run = 1.
          expr(
            """aggregate(
              |  array_sort(g),
              |  named_struct('prev', '', 'run', 0L, 'best', 0L),
              |  (a, x) -> named_struct(
              |    'prev', x,
              |    'run',  IF(x = a.prev, a.run + 1, 1L),
              |    'best', greatest(a.best, IF(x = a.prev, a.run + 1, 1L))),
              |  a -> a.best)""".stripMargin).as("max_2gram_n"))
        .withColumn("rep_ratio",
          round($"max_2gram_n".cast(DoubleType) / $"tot_2grams", 6))
        .orderBy($"doc_id")
    },
    oracle = Some(
      """WITH w AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, greatest(len(w) - 1, 1) + 1),
        |      i -> concat_ws(' ', w[i], w[i+1]))) AS g
        |  FROM w),
        |c AS (SELECT doc_id, g, COUNT(*) AS n FROM g GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(n) AS BIGINT) AS tot_2grams,
        |  COUNT(*) AS distinct_2grams, MAX(n) AS max_2gram_n,
        |  ROUND(CAST(MAX(n) AS DOUBLE) / SUM(n), 6) AS rep_ratio
        |FROM c GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin))

  /** The shared per-document cross-entropy stage (factored r11): ONE
    * definition of the exact-integer unigram-LM score — train the LM on
    * the corpus itself (count/total), quantize each token's log-prob
    * ONCE to integer micro-nats (floor(ln(c/N)·1e6); the ln() libm ulp
    * is masked by the floor, the q_text_tfidf argument), then the
    * per-doc aggregation is EXACT long arithmetic (sum, floor-divide by
    * token count — both operands positive after negation, so Spark
    * `div` ≡ DuckDB `//`). A per-doc SUM of double log-probs would be
    * summation-order-dependent; this never sums doubles.
    *
    * Consumed by q_text_perplexity (the score), q_sample_perplexity_
    * bucket (the tertile verdict) and q_pipeline_funnel (the composed
    * tail-drop) — the QualityScore one-definition rule applied to the
    * LM score, so the three rows cannot drift; persisted because the
    * bucket and funnel rows would otherwise re-train the LM and
    * re-scan the token stream per evaluation.
    *
    * Scale (100 TB): the LM collapses to the VOCABULARY (bounded) and
    * broadcasts with the 1-row total; the corpus reads once off the
    * shared token stage, one doc-keyed partial-agg shuffle; output is
    * doc-domain sized (doc_id, lang, n_tokens, xent_micro). */
  object Xent {
    private val cache =
      new graft.Memo[(SparkSession, String), org.apache.spark.sql.DataFrame]

    def apply(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
      cache((s, dir)) {
        val toks = Tokenized(s, dir)
          .select(col("doc_id"), col("lang"), explode(col("lw")).as("term"))
        val lm = toks.groupBy(col("term")).agg(count(lit(1)).as("c"))
        val n = toks.agg(count(lit(1)).as("n_tok"))
        toks.join(broadcast(lm), "term")
          .crossJoin(broadcast(n))
          .select(col("doc_id"), col("lang"),
            expr("CAST(floor(ln(CAST(c AS DOUBLE) / n_tok) * 1000000) AS BIGINT)")
              .as("lpf"))
          .groupBy(col("doc_id"), col("lang"))
          .agg(count(lit(1)).as("n_tokens"), sum(col("lpf")).as("slpf"))
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            expr("(-slpf) div n_tokens").as("xent_micro"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
  }

  /** q_text_perplexity (added r8) — per-document unigram-LM
    * cross-entropy, the CCNet-style perplexity quality filter: high
    * score = improbable token mix = boilerplate/noise candidate; the
    * SCORE is the operator, thresholding is policy. The formula (and
    * its determinism/scale argument) lives in the shared [[Xent]]
    * stage. */
  val qTextPerplexity: Q = Q(
    "q_text_perplexity",
    (s, dir) => {
      import s.implicits._
      Xent(s, dir)
        .select($"doc_id", $"n_tokens", $"xent_micro")
        .orderBy($"doc_id")
    },
    oracle = Some(
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents),
        |lm AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY term),
        |n AS (SELECT COUNT(*) AS n_tok FROM toks),
        |lp AS (
        |  SELECT doc_id,
        |    CAST(floor(ln(CAST(c AS DOUBLE) / n_tok) * 1000000) AS BIGINT) AS lpf
        |  FROM toks JOIN lm USING (term), n)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  CAST((-SUM(lpf)) // COUNT(*) AS BIGINT) AS xent_micro
        |FROM lp GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin))

  /** q_text_collocations (added r8) — bigram association lift, the
    * phrase-mining primitive (the PMI family): observed bigram count
    * over its expected count under independence of the bigram margins,
    * lift = c(w1,w2)·B / (c(w1,·)·c(·,w2)). Lift > 1 ⟺ PMI > 0 — the
    * log is monotone, so ranking by lift IS ranking by PMI, and
    * skipping it keeps the whole computation in EXACT integer
    * arithmetic: lift_ppm = (cab·B·10⁶) div (c1·c2), floor division on
    * positive longs (identical in both engines), zero float ops, zero
    * rounding-route risk.
    *
    * Scale (100 TB): bigram extraction is a per-row array transform
    * over the shared token stage (no shuffle); counts collapse to the
    * VOCAB² grid — bounded, the margins derive from the count table
    * itself (two tiny aggs) and broadcast. The corpus is touched once.
    * Long overflow bound: cab·B·10⁶ needs cab·B < 9.2e12 — holds to
    * ~10⁹ total bigrams even for a maximally-skewed bigram; beyond
    * that, promote the numerator to DECIMAL(38,0) (one-line change,
    * noted here because 100 TB of text exceeds 10⁹ bigrams). */
  val qTextCollocations: Q = Q(
    "q_text_collocations",
    (s, dir) => {
      import s.implicits._
      val bi = Tokenized(s, dir)
        .select(explode(expr(
          "transform(slice(lw, 1, greatest(size(lw) - 1, 0)), " +
            "(x, i) -> named_struct('w1', x, 'w2', lw[i + 1]))")).as("b"))
        .select($"b.w1".as("w1"), $"b.w2".as("w2"))
      val cab = bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("cab"))
      val c1 = cab.groupBy($"w1").agg(sum($"cab").as("c1"))
      val c2 = cab.groupBy($"w2").agg(sum($"cab").as("c2"))
      val nbi = bi.agg(count(lit(1)).as("n_bi"))
      cab.join(broadcast(c1), "w1").join(broadcast(c2), "w2")
        .crossJoin(broadcast(nbi))
        .where($"cab" >= 5)
        .select($"w1", $"w2", $"cab",
          expr("((cab * n_bi) * 1000000) div (c1 * c2)").as("lift_ppm"))
        .orderBy($"w1", $"w2")
    },
    oracle = Some(
      """WITH toks AS (
        |  SELECT string_split(lower(text), ' ') AS lw FROM documents),
        |bi AS (
        |  SELECT lw[i] AS w1, lw[i + 1] AS w2
        |  FROM (SELECT lw, unnest(range(1, len(lw))) AS i FROM toks)),
        |cab AS (SELECT w1, w2, COUNT(*) AS cab FROM bi GROUP BY w1, w2),
        |c1 AS (SELECT w1, CAST(SUM(cab) AS BIGINT) AS c1 FROM cab GROUP BY w1),
        |c2 AS (SELECT w2, CAST(SUM(cab) AS BIGINT) AS c2 FROM cab GROUP BY w2),
        |nbi AS (SELECT COUNT(*) AS n_bi FROM bi)
        |SELECT w1, w2, cab,
        |  CAST(((cab * n_bi) * 1000000) // (c1 * c2) AS BIGINT) AS lift_ppm
        |FROM cab JOIN c1 USING (w1) JOIN c2 USING (w2), nbi
        |WHERE cab >= 5
        |ORDER BY w1, w2""".stripMargin))

  /** The per-term KL contribution chain, written ONCE and spliced
    * verbatim into both engines (the q_ts_interpolate technique): with
    * add-1 smoothing over the union vocabulary, p = (c_en+1)/(n_en+v),
    * q = (c_rest+1)/(n_rest+v), contribution = p·ln(p/q) quantized to
    * nano-nats. Divisions and multiplies are exactly-rounded IEEE ops —
    * bit-identical given identical inputs — and the single ln()'s libm
    * ulp is masked by floor at 1e-9 (values are O(1e-3)). */
  private val klChain =
    "CAST(floor(((CAST(c_en + 1 AS DOUBLE) / (n_en + v)) * " +
      "ln((CAST(c_en + 1 AS DOUBLE) / (n_en + v)) / " +
      "(CAST(c_rest + 1 AS DOUBLE) / (n_rest + v)))) * 1000000000) " +
      "AS BIGINT)"

  /** q_text_kl_drift (added r8) — per-term KL-divergence contributions
    * between the 'en' stratum's unigram distribution and the rest of
    * the corpus: KL(P_en ‖ P_rest) = Σ_t p_t·ln(p_t/q_t), reported
    * per-term (WHICH tokens drive the divergence — the actionable
    * form) rather than pre-summed. This is the domain-mix/drift
    * measurement an LLM-data pipeline runs when deciding stratum
    * weights or detecting a crawl-distribution shift; add-1 smoothing
    * over the union vocabulary keeps every term finite even when one
    * stratum misses it entirely.
    *
    * Determinism: per-term contributions are scalar chains (no float
    * SUM anywhere — the per-term report avoids aggregation of doubles
    * entirely); the chain is one literal string evaluated by both
    * engines ([[klChain]]).
    *
    * Scale (100 TB): both strata collapse to the VOCABULARY before
    * anything joins — two bounded aggs off the shared token stage, a
    * vocab-sized full-outer join, a broadcast 1-row totals side, then
    * per-row scalar math. The corpus is read once and never
    * re-shuffled; stratum count generalizes to N strata as one
    * groupBy(lang, term) pivot. */
  val qTextKlDrift: Q = Q(
    "q_text_kl_drift",
    (s, dir) => {
      import s.implicits._
      val toks = Tokenized(s, dir).select($"lang", explode($"lw").as("term"))
      val en = toks.where($"lang" === "en")
        .groupBy($"term").agg(count(lit(1)).as("c_en"))
      val rest = toks.where($"lang" =!= "en")
        .groupBy($"term").agg(count(lit(1)).as("c_rest"))
      val vocab = en.join(rest, Seq("term"), "full_outer")
        .select($"term",
          coalesce($"c_en", lit(0L)).as("c_en"),
          coalesce($"c_rest", lit(0L)).as("c_rest"))
      val tot = vocab.agg(
        sum($"c_en").as("n_en"), sum($"c_rest").as("n_rest"),
        count(lit(1)).as("v"))
      vocab.crossJoin(broadcast(tot))
        .select($"term", $"c_en", $"c_rest", expr(klChain).as("kl_nano"))
        .orderBy($"term")
    },
    oracle = Some(
      s"""WITH toks AS (
         |  SELECT lang, unnest(string_split(lower(text), ' ')) AS term
         |  FROM documents),
         |en AS (SELECT term, COUNT(*) AS c_en FROM toks
         |       WHERE lang = 'en' GROUP BY term),
         |rest AS (SELECT term, COUNT(*) AS c_rest FROM toks
         |         WHERE lang <> 'en' GROUP BY term),
         |vocab AS (
         |  SELECT term, COALESCE(c_en, 0) AS c_en,
         |    COALESCE(c_rest, 0) AS c_rest
         |  FROM en FULL JOIN rest USING (term)),
         |tot AS (SELECT CAST(SUM(c_en) AS BIGINT) AS n_en,
         |               CAST(SUM(c_rest) AS BIGINT) AS n_rest,
         |               COUNT(*) AS v FROM vocab)
         |SELECT term, c_en, c_rest, $klChain AS kl_nano
         |FROM vocab, tot
         |ORDER BY term""".stripMargin))

  /** q_sample_fixed_k (added r8) — EXACTLY k documents per stratum,
    * completing the sampling triple: q_sample_deterministic draws a
    * RATE globally, q_sample_stratified draws a rate PER stratum, and
    * this row draws a fixed COUNT per stratum — the shape of a held-out
    * eval set ("25 docs per language, stable across reruns"). Ranking
    * inside each stratum is by md5(doc_id) — an auditable pure function
    * of the row, so membership is reproducible across engines, runs,
    * partitionings and retries — with doc_id as the collision tiebreak
    * (md5 is injective on these inputs, but the ORDER must be total by
    * construction, not by luck).
    *
    * Scale (100 TB): one stratum-keyed exchange. The row_number window
    * sorts each stratum, which is fine to ~10⁸ rows per stratum; past
    * that, swap the window for the bounded-heap top-k aggregator the
    * vector family ships (TopKAgg keeps k rows of state per stratum,
    * no sort) — the SEMANTICS (smallest k md5s per stratum) are
    * deliberately identical so the swap is mechanical. */
  val qSampleFixedK: Q = Q(
    "q_sample_fixed_k",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"lang")
        .orderBy(md5($"doc_id".cast(StringType)), $"doc_id")
      Tables.documents(s, dir)
        .select($"doc_id", $"lang", $"source")
        .withColumn("rn", row_number().over(w).cast(LongType))
        .where($"rn" <= 25)
        .orderBy($"lang", $"rn")
    },
    oracle = Some(
      """SELECT doc_id, lang, source, rn FROM (
        |  SELECT doc_id, lang, source,
        |    row_number() OVER (
        |      PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 25
        |ORDER BY lang, rn""".stripMargin))

  /** q_sample_weighted (added r8) — WEIGHTED sampling without
    * replacement, completing the sampling family (uniform gate /
    * stratified rates / fixed-k): keep the k = 100 documents most
    * favored by a weight ∝ length draw — the "sample long documents
    * preferentially" knob a curriculum/quality-mix pipeline turns.
    *
    * The technique is the A-ES (Efraimidis–Spirtas) weighted reservoir
    * made ENGINE-PORTABLE: A-ES ranks items by u^(1/w) (u uniform),
    * and for INTEGER w that distribution is exactly the MAX of w
    * independent uniforms — P(max ≤ x) = x^w. So each doc's rank key is
    * max over j ∈ [1, w] of md5(doc_id ⊕ j): hash-only, no ln/pow, no
    * float at all — both engines compute the identical 32-hex key and
    * the identical top-k, which is what lets a WEIGHTED sample be
    * hash-matched at all (a float-key formulation would die on ulp
    * boundaries; the q_ts_ewma lesson applied to sampling). Weight =
    * n_chars div 16 + 1 (≈ 9–28), so the hash fan-out is bounded and
    * the selection provably biases long docs (spec-pinned).
    *
    * Scale: per-row transform of w hashes (narrow, codegen'd) + one
    * TakeOrderedAndProject top-k — per-partition partial top-k, k rows
    * per partition cross the wire, no global sort. Sampling stays a
    * pure function of the row: reproducible, auditable, retry-safe. */
  val qSampleWeighted: Q = Q(
    "q_sample_weighted",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", $"lang",
          (expr("n_chars div 16") + 1).cast(LongType).as("w"))
        .withColumn("k", array_max(expr(
          "transform(sequence(1, w), " +
            "j -> md5(concat(CAST(doc_id AS STRING), '_', CAST(j AS STRING))))")))
        .orderBy($"k".desc, $"doc_id")
        .limit(100)
    },
    oracle = Some(
      """SELECT doc_id, lang, w,
        |  list_max(list_transform(range(1, CAST(w + 1 AS INT)),
        |    j -> md5(concat(CAST(doc_id AS VARCHAR), '_',
        |                    CAST(j AS VARCHAR))))) AS k
        |FROM (SELECT doc_id, lang, n_chars // 16 + 1 AS w FROM documents)
        |ORDER BY k DESC, doc_id
        |LIMIT 100""".stripMargin))

  /** q_text_bm25 (added r8) — BM25 relevance of every document to a
    * fixed query ('data', 'query', 'spark'), the ranking function
    * behind query-targeted training-data selection (retrieve-then-keep
    * pipelines score candidate documents against a task description
    * exactly like this). k1 = 1.2, b = 0.75 — the standard constants —
    * and BOTH are rational, which makes the whole per-term score a
    * ratio of exact integers once avgdl = T/N is substituted in:
    *
    *   score_t = idf·tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl))
    *           = idf_micro · 22·T·tf  div  (10·T·tf + 3·T + 9·dl·N)
    *
    * (multiply through by 10·T; T = total tokens, N = docs, dl = doc
    * length). The ONLY float op is the idf — the Robertson–Sparck-Jones
    * form 1 + (N−df+0.5)/(df+0.5) simplifies to (2N+2)/(2df+1), an
    * exact rational — quantized ONCE per term to integer micro-nats via
    * floor(ln(·)·1e6), the identical masked-ulp argument as
    * q_text_perplexity; everything after is exact long arithmetic with
    * positive operands (truncating div ≡ DuckDB //). Per-doc score =
    * exact SUM of per-term integers.
    *
    * Scale (100 TB): tf filters the token stream to the QUERY terms at
    * the scan (a 3-element isin — predicate on the shared token stage),
    * so the only doc-keyed shuffle is over matching (doc, term) pairs;
    * idf is a query-sized broadcast, N/T are 1-row broadcasts, and dl
    * is a narrow per-row projection of the token stage. Long-overflow
    * bound: idf_micro·22·T·tf needs T·tf < 4e10 at idf ≈ 10 nats —
    * beyond ~10⁹ tokens promote the numerator to DECIMAL(38,0), same
    * note as q_text_collocations. */
  val qTextBm25: Q = Q(
    "q_text_bm25",
    (s, dir) => {
      import s.implicits._
      val qterms = Seq("data", "query", "spark")
      val toks = Tokenized(s, dir)
        .select($"doc_id", explode($"lw").as("term"))
      val dl = Tokenized(s, dir)
        .select($"doc_id", size($"lw").cast(LongType).as("dl"))
      val nd = Tokenized(s, dir).agg(count(lit(1)).as("n_docs"))
      // T from the cached per-doc lengths — counting the exploded token
      // stream would pay a corpus-sized explode for one scalar
      val tt = Tokenized(s, dir)
        .agg(sum(size($"lw")).cast(LongType).as("n_toks"))
      val tf = toks.where($"term".isin(qterms: _*))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val idf = tf.groupBy($"term").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nd))
        .select($"term",
          expr("CAST(floor(ln(CAST(2*n_docs + 2 AS DOUBLE) / (2*df + 1))" +
            " * 1000000) AS BIGINT)").as("idf_micro"))
      tf.join(broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(nd)).crossJoin(broadcast(tt))
        .select($"doc_id",
          expr("(idf_micro * 22 * n_toks * tf) div " +
            "(10*n_toks*tf + 3*n_toks + 9*dl*n_docs)").as("s_micro"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_terms_hit"), sum($"s_micro").as("bm25_micro"))
        .select($"doc_id", $"n_terms_hit", $"bm25_micro",
          ($"bm25_micro".cast(DoubleType) / 1000000d).as("bm25"))
        .orderBy($"doc_id")
    },
    oracle = Some(
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, len(string_split(lower(text), ' ')) AS dl
        |       FROM documents),
        |nd AS (SELECT COUNT(*) AS n_docs FROM documents),
        |tt AS (SELECT COUNT(*) AS n_toks FROM toks),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
        |       WHERE term IN ('data', 'query', 'spark') GROUP BY 1, 2),
        |idf AS (
        |  SELECT term,
        |    CAST(floor(ln(CAST(2*n_docs + 2 AS DOUBLE) / (2*df + 1))
        |      * 1000000) AS BIGINT) AS idf_micro
        |  FROM (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), nd),
        |sc AS (
        |  SELECT tf.doc_id,
        |    (idf_micro * 22 * n_toks * tf) //
        |      (10*n_toks*tf + 3*n_toks + 9*dl.dl*n_docs) AS s_micro
        |  FROM tf JOIN idf USING (term)
        |    JOIN dl ON dl.doc_id = tf.doc_id, nd, tt)
        |SELECT doc_id, COUNT(*) AS n_terms_hit,
        |  CAST(SUM(s_micro) AS BIGINT) AS bm25_micro,
        |  CAST(CAST(SUM(s_micro) AS BIGINT) AS DOUBLE) / 1000000 AS bm25
        |FROM sc GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin))

  /** q_text_entropy — per-document unigram Shannon entropy, the
    * lexical-diversity quality signal (a near-zero-entropy document is
    * a repeated-token artifact; the Gopher/RefinedWeb filter family
    * thresholds on exactly this). H = Σ_w (c/n)·ln(n/c) over the
    * document's own token distribution.
    *
    * Determinism (the q_text_perplexity technique, inverted): each
    * distinct word contributes c · floor(ln(n/c)·1e6) micro-nats —
    * quantized ONCE per (c, n) pair where the libm ulp is masked by
    * the floor — and the per-doc total divides by n in integer space
    * (all operands ≥ 0, so Spark `div` == DuckDB `//`). Exact long
    * arithmetic end to end after the one quantization.
    *
    * Scale: per-doc term counts partial-aggregate on (doc_id, term)
    * before the one keyed shuffle; n comes from the token array length
    * (no second scan); nothing touches the driver. */
  val qTextEntropy: Q = Q(
    "q_text_entropy",
    (s, dir) => {
      import s.implicits._
      Tokenized(s, dir)
        .select($"doc_id", size($"lw").cast(LongType).as("n"),
          explode($"lw").as("term"))
        .groupBy($"doc_id", $"n", $"term")
        .agg(count(lit(1)).as("c"))
        .select($"doc_id", $"n",
          expr("c * CAST(floor(ln(CAST(n AS DOUBLE) / c) * 1000000) AS BIGINT)")
            .as("h"))
        .groupBy($"doc_id", $"n")
        .agg(count(lit(1)).as("distinct_terms"), sum($"h").as("sh"))
        .select($"doc_id", $"n".as("n_tokens"), $"distinct_terms",
          expr("sh div n").as("entropy_micro"))
        .orderBy($"doc_id")
    },
    oracle = Some(
      """WITH toks AS (
        |  SELECT doc_id, len(string_split(lower(text), ' ')) AS n,
        |    unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n, term, COUNT(*) AS c
        |  FROM toks GROUP BY doc_id, n, term),
        |h AS (
        |  SELECT doc_id, n,
        |    c * CAST(floor(ln(CAST(n AS DOUBLE) / c) * 1000000) AS BIGINT) AS h
        |  FROM c)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |  COUNT(*) AS distinct_terms,
        |  CAST(SUM(h) // n AS BIGINT) AS entropy_micro
        |FROM h GROUP BY doc_id, n
        |ORDER BY doc_id""".stripMargin))

  /** q_text_ttr — per-document LEXICAL RICHNESS: type-token ratio and
    * hapax share, the vocabulary-diversity quality signals next to
    * [[qTextEntropy]]'s distributional one (TTR is what degrades first
    * on template-generated spam: many tokens, few types). All counts,
    * so the whole report stays in exact integer ppm (types·10⁶ div
    * tokens; hapax·10⁶ div types) — no float anywhere. Reads the
    * SHARED token stage; one (doc, term) partial agg collapses
    * occurrences before the doc-keyed shuffle, then one doc agg —
    * the same two-level shape as TF-IDF's tf stage. */
  val qTextTtr: Q = Q(
    "q_text_ttr",
    (s, dir) => {
      import s.implicits._
      Tokenized(s, dir)
        .select($"doc_id", explode($"lw").as("term"))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id").agg(
          sum($"c").as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when($"c" === 1, 1L).otherwise(0L)).as("n_hapax"))
        .select($"doc_id", $"n_tokens", $"n_types", $"n_hapax",
          expr("n_types * 1000000 div n_tokens").as("ttr_ppm"),
          expr("n_hapax * 1000000 div n_types").as("hapax_ppm"))
        .orderBy($"doc_id")
    },
    oracle = Some(
      """WITH tf AS (
        |  SELECT doc_id, term, COUNT(*) AS c FROM (
        |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |    FROM documents)
        |  GROUP BY doc_id, term),
        |a AS (
        |  SELECT doc_id,
        |    CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    COUNT(*) AS n_types,
        |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
        |  FROM tf GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_types, n_hapax,
        |  n_types * 1000000 // n_tokens AS ttr_ppm,
        |  n_hapax * 1000000 // n_types AS hapax_ppm
        |FROM a
        |ORDER BY doc_id""".stripMargin))

  /** q_text_keywords — KEYWORD EXTRACTION: the top-3 TF-IDF terms per
    * document, i.e. [[qTextTfidf]]'s score put to its canonical use
    * (tags/topics per doc). Ranking happens on the ROUNDED score —
    * both engines compute the identical round-6 double, so the order
    * (score DESC, term ASC tiebreak) is engine-invariant even where
    * raw ln ulps could differ. The window partitions by doc_id — the
    * per-doc series is the unit of parallelism, no global window. */
  val qTextKeywords: Q = Q(
    "q_text_keywords",
    (s, dir) => {
      import s.implicits._
      val toks = Tokenized(s, dir)
        .select($"doc_id", explode($"lw").as("term"))
      val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val df = toks.select($"doc_id", $"term").distinct()
        .groupBy($"term").agg(count(lit(1)).as("df"))
      val n = Tokenized(s, dir).agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(broadcast(df), "term")
        .crossJoin(broadcast(n))
        .select($"doc_id", $"term",
          round($"tf" * log($"n_docs".cast("double") / $"df"), 6).as("tfidf"))
      val w = Window.partitionBy($"doc_id")
        .orderBy($"tfidf".desc, $"term")
      scored.withColumn("rank", row_number().over(w).cast(LongType))
        .where($"rank" <= 3)
        .select($"doc_id", $"rank", $"term", $"tfidf")
        .orderBy($"doc_id", $"rank")
    },
    oracle = Some(
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term,
        |    ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
        |  FROM tf JOIN df USING (term), n),
        |ranked AS (
        |  SELECT doc_id, term, tfidf,
        |    row_number() OVER
        |      (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
        |  FROM scored)
        |SELECT doc_id, rank, term, tfidf
        |FROM ranked
        |WHERE rank <= 3
        |ORDER BY doc_id, rank""".stripMargin))

  /** q_text_bigram_lm — BIGRAM language-model cross-entropy per doc,
    * the order-2 companion of [[qTextPerplexity]]'s unigram row: each
    * bigram contributes floor(ln(c(w1,w2)/c(w1·))·10⁶) micro-nats —
    * p(w2|w1) is the conditional MLE — and the per-doc total
    * integer-divides by the bigram count. Unigram-vs-bigram xent is
    * the first LM ablation a corpus-quality pipeline reports (how much
    * does local context compress the text). Same determinism contract:
    * ln is quantized ONCE per (cab, c1) pair in a textually identical
    * expression, everything after is exact long arithmetic.
    *
    * Scale: bigram extraction is the per-row array transform of
    * [[qTextCollocations]] over the shared token stage; the LM is the
    * VOCAB²-bounded count grid with its margins (broadcast), so the
    * corpus re-joins the model without shuffling on the bigram. */
  val qTextBigramLm: Q = Q(
    "q_text_bigram_lm",
    (s, dir) => {
      import s.implicits._
      val bi = Tokenized(s, dir)
        .select($"doc_id", explode(expr(
          "transform(slice(lw, 1, greatest(size(lw) - 1, 0)), " +
            "(x, i) -> named_struct('w1', x, 'w2', lw[i + 1]))")).as("b"))
        .select($"doc_id", $"b.w1".as("w1"), $"b.w2".as("w2"))
      val cab = bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("cab"))
      val c1 = cab.groupBy($"w1").agg(sum($"cab").as("c1"))
      val lm = cab.join(c1, "w1")
      bi.join(broadcast(lm), Seq("w1", "w2"))
        .select($"doc_id",
          expr("CAST(floor(ln(CAST(cab AS DOUBLE) / c1) * 1000000) AS BIGINT)")
            .as("lpf"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum($"lpf").as("slpf"))
        .select($"doc_id", $"n_bigrams",
          expr("(-slpf) div n_bigrams").as("xent_micro"))
        .orderBy($"doc_id")
    },
    oracle = Some(
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS lw FROM documents),
        |bi AS (
        |  SELECT doc_id, lw[i] AS w1, lw[i + 1] AS w2
        |  FROM (SELECT doc_id, lw, unnest(range(1, len(lw))) AS i FROM toks)),
        |cab AS (SELECT w1, w2, COUNT(*) AS cab FROM bi GROUP BY w1, w2),
        |c1 AS (SELECT w1, CAST(SUM(cab) AS BIGINT) AS c1 FROM cab GROUP BY w1),
        |lp AS (
        |  SELECT doc_id,
        |    CAST(floor(ln(CAST(cab AS DOUBLE) / c1) * 1000000) AS BIGINT) AS lpf
        |  FROM bi JOIN cab USING (w1, w2) JOIN c1 USING (w1))
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  CAST((-SUM(lpf)) // COUNT(*) AS BIGINT) AS xent_micro
        |FROM lp GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin))

  /** q_sample_balanced — CLASS-BALANCED downsampling: every language
    * keeps exactly m docs, where m = the minority class's count — the
    * rebalancing a classifier-training set gets when stratified RATES
    * (q_sample_stratified) aren't enough and exact per-class parity is
    * required. Selection within each class is by md5 ORDER (not a
    * threshold gate): rank docs by md5(doc_id) and keep the first m —
    * deterministic, auditable, and exactly-m by construction (a rate
    * gate only hits m in expectation). doc_id tiebreak makes the order
    * total; both engines rank the identical md5 hex strings.
    *
    * Scale: class counts are a domain-sized agg (broadcast 1-row min);
    * the rank is a class-partitioned window — per-class series is the
    * unit of parallelism. A 100 TB corpus with a huge majority class
    * ranks within each class in parallel; no global sort. */
  val qSampleBalanced: Q = Q(
    "q_sample_balanced",
    (s, dir) => {
      import s.implicits._
      val m = Tables.documents(s, dir)
        .groupBy($"lang").agg(count(lit(1)).as("n"))
        .agg(min($"n").as("m"))
      val w = Window.partitionBy($"lang")
        .orderBy(md5($"doc_id".cast("string")), $"doc_id")
      Tables.documents(s, dir)
        .withColumn("rk", row_number().over(w).cast(LongType))
        .crossJoin(broadcast(m))
        .where($"rk" <= $"m")
        .select($"doc_id", $"lang", $"rk")
        .orderBy($"doc_id")
    },
    oracle = Some(
      """WITH m AS (
        |  SELECT MIN(n) AS m FROM (
        |    SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang)),
        |ranked AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT doc_id, lang, rk
        |FROM ranked, m
        |WHERE rk <= m
        |ORDER BY doc_id""".stripMargin))

  /** q_text_char_trigrams — per-language CHARACTER-TRIGRAM profile
    * (top-10 by frequency): the feature table the [[LangId]] n-gram
    * heuristic is built on, surfaced as an oracle row — LangId itself
    * is a T-row (its scoring isn't SQL-expressible), but the profile
    * underneath it is pure counting, so THIS row pins the extraction
    * against DuckDB. Trigram extraction is a per-row position
    * transform + explode (narrow, codegen'd, word boundaries
    * included); counts collapse onto the bounded (lang, trigram)
    * domain in one partial-agg shuffle; the top-10 window partitions
    * by lang. All integer; count-desc ties break on the trigram. */
  val qTextCharTrigrams: Q = Q(
    "q_text_char_trigrams",
    (s, dir) => {
      import s.implicits._
      // Two measured fixes on the fan-out stage: (1) lower() hoisted
      // OUT of the per-position lambda — inside the transform it
      // re-lowercases the whole document once per trigram position,
      // O(len²) chars/doc (3.5 s, the slowest batch row); (2) the doc
      // table arrives as ONE parquet file locally → one input split,
      // so the CPU-bound explode ran single-core — repartition the
      // (tiny) pre-explode rows first so the ~80× row fan-out runs
      // wide. The count must be PINNED (repartition(n, col)): a bare
      // repartition(col) shuffle is AQE-coalesced back to one
      // partition because the pre-explode bytes are tiny — AQE sizes
      // partitions on input bytes and cannot see the fan-out behind
      // them. At 100 TB the corpus is many splits and (2) is free,
      // but the plan must not depend on that accident.
      // Positions derive from length(text) — the twin's len(text)
      // basis — NOT from the lowered string, whose length can differ
      // under length-changing case mappings (the spanGrams rule).
      val tri = Tables.documents(s, dir)
        .where(length($"text") >= 3)
        .select($"doc_id", $"lang", length($"text").as("n"),
          lower($"text").as("lt"))
        .repartition(s.sparkContext.defaultParallelism, $"doc_id")
        .select($"lang", explode(expr(
          "transform(sequence(1, n - 2), i -> substring(lt, i, 3))")).as("g"))
      val cnt = tri.groupBy($"lang", $"g").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy($"lang").orderBy($"c".desc, $"g")
      cnt.withColumn("rk", row_number().over(w).cast(LongType))
        .where($"rk" <= 10)
        .select($"lang", $"rk", $"g", $"c")
        .orderBy($"lang", $"rk")
    },
    oracle = Some(
      """WITH tri AS (
        |  SELECT lang, substring(lower(text), i, 3) AS g
        |  FROM (SELECT lang, text,
        |          unnest(range(1, len(text) - 1)) AS i
        |        FROM documents WHERE len(text) >= 3)),
        |cnt AS (SELECT lang, g, COUNT(*) AS c FROM tri GROUP BY lang, g),
        |ranked AS (
        |  SELECT lang, g, c,
        |    row_number() OVER (PARTITION BY lang ORDER BY c DESC, g) AS rk
        |  FROM cnt)
        |SELECT lang, rk, g, c
        |FROM ranked
        |WHERE rk <= 10
        |ORDER BY lang, rk""".stripMargin))

  /** q_sample_token_budget (added r11) — PER-STRATUM TOKEN-BUDGET
    * sampling: within each language, take documents in deterministic
    * doc_id order while the running whitespace-token total stays within
    * a 2 000-token budget — the "fill each stratum to its token quota"
    * step that turns q_sample_temperature's target WEIGHTS into an
    * actual document selection (training mixes are specified in
    * tokens, not document counts). The cut is a clean prefix per
    * stratum: the cumulative sum is monotone (every doc has ≥ 1
    * token), so `cum ≤ B` admits exactly the maximal budget-respecting
    * prefix — no per-doc keep/drop ambiguity for either engine.
    * Token counts reuse q_text_token_count's exact whitespace
    * definition (textually identical in the twin).
    *
    * Scale: one window (cumulative sum) per stratum over doc_id order
    * — strata are bounded (|langs|) and independent, so a 100 TB run
    * range-partitions within each stratum; no global sort, no shuffle
    * beyond the per-stratum ordering. */
  val qSampleTokenBudget: Q = Q(
    "q_sample_token_budget",
    (s, dir) => {
      import s.implicits._
      val win = Window.partitionBy($"lang").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tokenized(s, dir)
        .select($"doc_id", $"lang", size($"w").cast(LongType).as("n_tokens"))
        .withColumn("cum_tokens", sum($"n_tokens").over(win))
        .where($"cum_tokens" <= 2000L)
        .orderBy($"lang", $"doc_id")
    },
    oracle = Some(
      """SELECT doc_id, lang, n_tokens, cum_tokens FROM (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER
        |      (PARTITION BY lang ORDER BY doc_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_tokens
        |  FROM documents)
        |WHERE cum_tokens <= 2000
        |ORDER BY lang, doc_id""".stripMargin))

  /** q_sample_perplexity_bucket (added r11) — CCNet-style HEAD/MIDDLE/
    * TAIL selection: score every document by the same exact-integer
    * unigram cross-entropy as q_text_perplexity, then cut each language
    * into perplexity TERTILES (ntile(3) over (xent_micro, doc_id) — a
    * total order, so the tile boundaries are identical in both engines)
    * and keep head+middle. This is the decision CCNet actually ships:
    * the perplexity row produces the SCORE, this row produces the
    * KEEP/DROP verdict per document under the standard
    * discard-the-worst-third policy.
    *
    * Determinism: xent_micro is exact integer micro-nats (the shared
    * [[Xent]] stage — the SAME rows q_text_perplexity scores, one
    * definition); ntile over a TOTAL order (xent ties broken by
    * doc_id) assigns every row a unique rank, so tile membership
    * cannot flip cross-engine. `kept` is materialized as BIGINT 1/0
    * (not BOOLEAN) to keep the hash column portable.
    *
    * Scale (100 TB): the persisted Xent stage + ONE per-language
    * window — strata are bounded (|langs|) and independent, so each
    * range-partitions internally; no global sort. */
  val qSamplePerplexityBucket: Q = Q(
    "q_sample_perplexity_bucket",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"lang").orderBy($"xent_micro", $"doc_id")
      Xent(s, dir)
        .select($"doc_id", $"lang", $"xent_micro")
        .withColumn("tile", ntile(3).over(w))
        .select($"doc_id", $"lang", $"xent_micro",
          when($"tile" === 1, "head").when($"tile" === 2, "middle")
            .otherwise("tail").as("bucket"),
          when($"tile" <= 2, 1L).otherwise(0L).as("kept"))
        .orderBy($"doc_id")
    },
    oracle = Some(
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents),
        |lm AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY term),
        |n AS (SELECT COUNT(*) AS n_tok FROM toks),
        |xent AS (
        |  SELECT doc_id, lang,
        |    CAST((-SUM(CAST(floor(ln(CAST(c AS DOUBLE) / n_tok) * 1000000)
        |      AS BIGINT))) // COUNT(*) AS BIGINT) AS xent_micro
        |  FROM toks JOIN lm USING (term), n
        |  GROUP BY doc_id, lang),
        |tiled AS (
        |  SELECT doc_id, lang, xent_micro,
        |    ntile(3) OVER (PARTITION BY lang
        |                   ORDER BY xent_micro, doc_id) AS tile
        |  FROM xent)
        |SELECT doc_id, lang, xent_micro,
        |  CASE WHEN tile = 1 THEN 'head' WHEN tile = 2 THEN 'middle'
        |       ELSE 'tail' END AS bucket,
        |  CAST(CASE WHEN tile <= 2 THEN 1 ELSE 0 END AS BIGINT) AS kept
        |FROM tiled
        |ORDER BY doc_id""".stripMargin))

  /** q_sample_domain_mix (added r11) — MIXTURE REBALANCING to a uniform
    * per-source token target: given the corpus's natural token share per
    * source, compute the acceptance rate that moves each source toward
    * an equal share of the total budget — the "domain weights" table a
    * training-mix config is built from (the q_sample_temperature recipe
    * rebalances LANGUAGES by √n; this row rebalances SOURCES toward a
    * stated target, the other half of a mixing policy). Over-represented
    * sources get accept_ppm < 10⁶ (downsample); under-represented ones
    * cap at 10⁶ (never upsample — duplication is a separate, deliberate
    * decision). expected_tokens shows the post-rebalance mix.
    *
    * Exactness: everything is positive-long arithmetic — natural_ppm =
    * tok·10⁶ div total, target = total div n_sources, accept_ppm =
    * least(10⁶, target·10⁶ div tok), expected = tok·accept div 10⁶.
    * Long headroom: tok·10⁶ < 2⁶³ needs tok < 9.2e12 tokens per source
    * — beyond that (a 100 TB corpus may exceed it) promote the two
    * products to DECIMAL(38,0), the q_text_collocations note verbatim.
    *
    * Scale: ONE partial-aggregated shuffle to the (source) grid —
    * bounded — then broadcast scalars; the corpus is touched once. */
  val qSampleDomainMix: Q = Q(
    "q_sample_domain_mix",
    (s, dir) => {
      import s.implicits._
      val bySrc = Tokenized(s, dir)
        .select($"source", size($"w").cast(LongType).as("t"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"t").as("n_tokens"))
      val tot = bySrc.agg(sum($"n_tokens").as("total_tokens"),
        count(lit(1)).as("n_sources"))
      bySrc.crossJoin(broadcast(tot))
        .select($"source", $"n_docs", $"n_tokens",
          expr("n_tokens * 1000000 div total_tokens").as("natural_ppm"),
          expr("least(1000000, (total_tokens div n_sources) * 1000000 " +
            "div n_tokens)").as("accept_ppm"))
        .withColumn("expected_tokens",
          expr("n_tokens * accept_ppm div 1000000"))
        .orderBy($"source")
    },
    oracle = Some(
      """WITH by_src AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |               COUNT(*) AS n_sources FROM by_src)
        |SELECT source, n_docs, n_tokens,
        |  CAST(n_tokens * 1000000 // total_tokens AS BIGINT) AS natural_ppm,
        |  CAST(least(1000000, (total_tokens // n_sources) * 1000000
        |    // n_tokens) AS BIGINT) AS accept_ppm,
        |  CAST(n_tokens * (least(1000000, (total_tokens // n_sources)
        |    * 1000000 // n_tokens)) // 1000000 AS BIGINT) AS expected_tokens
        |FROM by_src, tot
        |ORDER BY source""".stripMargin))

  /** q_text_chunk (added r11) — FIXED-WINDOW TOKEN CHUNKING with
    * overlap (window 32 tokens, stride 24): the step that turns cleaned
    * documents into training/RAG-sized pieces. Chunk i covers tokens
    * [i·24+1, i·24+32]; the last chunk is the first one whose window
    * reaches the document end (n_chunks = ⌈(n−32)/24⌉+1 for n > 32,
    * else 1), so every token lands in ≥ 1 chunk and consecutive chunks
    * share a 8-token overlap — the standard context-continuity device.
    *
    * Determinism: chunk boundaries are pure integer arithmetic on the
    * token count; the chunk text re-joins the SAME whitespace tokens
    * the shared stage split (split/join round-trips exactly because the
    * tokenizer splits on the single space the fixture uses).
    *
    * Scale: a per-row generator (explode over the per-doc chunk range)
    * — embarrassingly parallel, NO shuffle anywhere; output is keyed by
    * (doc_id, chunk_id) and row count grows linearly with tokens. */
  /** The chunking STAGE of q_text_chunk, factored (unordered) so
    * q_pipeline_rag composes the identical code path (the
    * q_pipeline_funnel shared-stage rule). */
  def chunkStage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tokenized(s, dir)
      .select($"doc_id", $"w", size($"w").cast(LongType).as("n"))
      .withColumn("n_chunks",
        expr("CASE WHEN n <= 32 THEN 1L ELSE (n - 32 + 23) div 24 + 1 END"))
      .select($"doc_id", $"w", $"n",
        explode(expr("sequence(0L, n_chunks - 1)")).as("chunk_id"))
      .select($"doc_id", $"chunk_id",
        expr("least(32L, n - chunk_id * 24)").as("n_chunk_tokens"),
        expr("concat_ws(' ', slice(w, CAST(chunk_id * 24 + 1 AS INT), 32))")
          .as("chunk_text"))
  }

  val qTextChunk: Q = Q(
    "q_text_chunk",
    (s, dir) => {
      import s.implicits._
      chunkStage(s, dir).orderBy($"doc_id", $"chunk_id")
    },
    oracle = Some(
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, w, n,
        |    unnest(range(0, CASE WHEN n <= 32 THEN 1
        |      ELSE (n - 32 + 23) // 24 + 1 END)) AS chunk_id
        |  FROM d)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(least(32, n - chunk_id * 24) AS BIGINT) AS n_chunk_tokens,
        |  array_to_string(list_slice(w, chunk_id * 24 + 1,
        |    chunk_id * 24 + 32), ' ') AS chunk_text
        |FROM c
        |ORDER BY doc_id, chunk_id""".stripMargin))

  /** q_pipeline_funnel (added r11) — the END-TO-END CORPUS FUNNEL: one
    * audit row per pipeline stage (raw → quality gate → exact dedup →
    * perplexity tail-drop → token budget), each applied to the previous
    * stage's survivors, with doc/token counts and ppm-of-raw — the
    * table a pipeline owner actually reads to see where the corpus
    * went. Every stage reuses the SHARED STAGE of its standalone row —
    * QualityScore.keep, [[DedupQueries.Shingled]]'s md5 column for the
    * keep-min, the [[Xent]] per-doc LM scores, the 2000-token per-lang
    * prefix budget — actual shared code, so the funnel cannot drift
    * from the operators it composes — but note
    * the tertile and budget cuts are computed over the SURVIVORS, not
    * the raw corpus (the composed semantics), so their boundaries
    * legitimately differ from the standalone rows'. The exact-dedup
    * stage is non-vacuous at sf0.1 (6 post-quality md5 collisions
    * collapse; the smaller fixtures plant only near-dups) — the twin
    * certifies the collapse there.
    *
    * Exactness: every stage decision is already cross-engine exact in
    * its standalone row (integer micro-nats, total-order ntile,
    * monotone cumsum, md5); the funnel adds only exact long counts and
    * floor-div ppm.
    *
    * Scale (100 TB): stages are successive narrow filters + three
    * bounded-stratum windows + one md5-keyed window off the shared
    * token stage; a production run materializes each survivor set
    * (they feed training anyway) so each window scans once. The five
    * audit aggregates are metadata-sized. */
  val qPipelineFunnel: Q = Q(
    "q_pipeline_funnel",
    (s, dir) => {
      import s.implicits._
      val scored = QualityScore.fromTokens(Tokenized(s, dir))
        .select($"doc_id", $"lang", $"n_tok", $"quality")
      val s1 = scored.where(QualityScore.keep)
      // Exact-dedup key = the shared shingle stage's h (md5 of the raw
      // text, q_dedup_exact's own column), not a re-derived digest.
      val wMd5 = Window.partitionBy($"h").orderBy($"doc_id")
      val s2 = s1
        .join(DedupQueries.Shingled(s, dir).select($"doc_id", $"h"),
          "doc_id")
        .withColumn("rn", row_number().over(wMd5))
        .where($"rn" === 1)
        .select($"doc_id", $"lang", $"n_tok")
      // Survivors scored under the shared RAW-corpus LM stage ([[Xent]])
      // — the same per-doc values q_text_perplexity reports.
      val wTile = Window.partitionBy($"lang").orderBy($"xent_micro", $"doc_id")
      val s3 = s2.join(Xent(s, dir).select($"doc_id", $"xent_micro"),
          "doc_id")
        .withColumn("tile", ntile(3).over(wTile))
        .where($"tile" <= 2)
        .select($"doc_id", $"lang", $"n_tok")
      val wCum = Window.partitionBy($"lang").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val s4 = s3.withColumn("cum", sum($"n_tok").over(wCum))
        .where($"cum" <= 2000L)
      def stageAgg(df: org.apache.spark.sql.DataFrame, ord: Long,
          name: String) =
        df.agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("n_tokens"))
          .select(lit(ord).as("stage_ord"), lit(name).as("stage"),
            col("n_docs"), col("n_tokens"))
      val raw = broadcast(scored
        .agg(count(lit(1)).as("raw_docs"), sum($"n_tok").as("raw_tokens")))
      // Stage 0 derives from the SAME aggregate DEFINITION that feeds
      // the ppm denominator — the two cannot drift. (Spark still
      // recomputes the 1-row lineage for the non-broadcast stage-0 leg;
      // that second scalar agg over the persisted token stage is cheap
      // and consistency rests on the shared definition, not on a shared
      // computation — r11 advice.)
      raw.select(lit(0L).as("stage_ord"), lit("raw").as("stage"),
          $"raw_docs".as("n_docs"), $"raw_tokens".as("n_tokens"))
        .unionByName(stageAgg(s1, 1L, "quality"))
        .unionByName(stageAgg(s2, 2L, "exact_dedup"))
        .unionByName(stageAgg(s3, 3L, "perplexity_tail"))
        .unionByName(stageAgg(s4, 4L, "token_budget"))
        .crossJoin(raw)
        .select($"stage_ord", $"stage", $"n_docs", $"n_tokens",
          expr("n_docs * 1000000 div raw_docs").as("docs_ppm"),
          expr("n_tokens * 1000000 div raw_tokens").as("tokens_ppm"))
        .orderBy($"stage_ord")
    },
    oracle = Some(
      """WITH sc AS (
        |  SELECT doc_id, lang, text,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |      AS n_distinct,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> t IN ('the', 'a'))) AS BIGINT) AS n_stop
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, lang, text, n_tok,
        |    ROUND((CAST(n_distinct AS DOUBLE) / n_tok) * 0.5
        |      + (1.0 - CAST(n_stop AS DOUBLE) / n_tok) * 0.3
        |      + least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) * 0.2, 6) AS quality
        |  FROM sc),
        |s1 AS (SELECT doc_id, lang, text, n_tok FROM q
        |       WHERE quality >= 0.65 AND n_tok BETWEEN 20 AND 200),
        |s2 AS (SELECT doc_id, lang, text, n_tok FROM (
        |  SELECT s1.*, row_number() OVER (PARTITION BY md5(text)
        |    ORDER BY doc_id) AS rn FROM s1) WHERE rn = 1),
        |tk AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |       FROM documents),
        |lm AS (SELECT term, COUNT(*) AS c FROM tk GROUP BY term),
        |nn AS (SELECT COUNT(*) AS n_corpus FROM tk),
        |x AS (
        |  SELECT t.doc_id,
        |    CAST((-SUM(CAST(floor(ln(CAST(c AS DOUBLE) / n_corpus) * 1000000)
        |      AS BIGINT))) // COUNT(*) AS BIGINT) AS xent_micro
        |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |        FROM s2) t JOIN lm USING (term), nn
        |  GROUP BY t.doc_id),
        |s3 AS (SELECT doc_id, lang, n_tok FROM (
        |  SELECT s2.doc_id, s2.lang, s2.n_tok,
        |    ntile(3) OVER (PARTITION BY s2.lang
        |                   ORDER BY x.xent_micro, s2.doc_id) AS tile
        |  FROM s2 JOIN x ON s2.doc_id = x.doc_id) WHERE tile <= 2),
        |s4 AS (SELECT doc_id, lang, n_tok FROM (
        |  SELECT s3.*, SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM s3) WHERE cum <= 2000),
        |f AS (
        |  SELECT 0 AS stage_ord, 'raw' AS stage, COUNT(*) AS n_docs,
        |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens FROM sc
        |  UNION ALL SELECT 1, 'quality', COUNT(*),
        |    CAST(SUM(n_tok) AS BIGINT) FROM s1
        |  UNION ALL SELECT 2, 'exact_dedup', COUNT(*),
        |    CAST(SUM(n_tok) AS BIGINT) FROM s2
        |  UNION ALL SELECT 3, 'perplexity_tail', COUNT(*),
        |    CAST(SUM(n_tok) AS BIGINT) FROM s3
        |  UNION ALL SELECT 4, 'token_budget', COUNT(*),
        |    CAST(SUM(n_tok) AS BIGINT) FROM s4),
        |raw AS (SELECT n_docs AS raw_docs, n_tokens AS raw_tokens FROM f
        |        WHERE stage_ord = 0)
        |SELECT CAST(stage_ord AS BIGINT) AS stage_ord, stage, n_docs,
        |  n_tokens,
        |  CAST(n_docs * 1000000 // raw_docs AS BIGINT) AS docs_ppm,
        |  CAST(n_tokens * 1000000 // raw_tokens AS BIGINT) AS tokens_ppm
        |FROM f, raw
        |ORDER BY stage_ord""".stripMargin))

  /** q_sample_temperature — TEMPERATURE-BASED language rebalancing
    * (added r10): the multilingual-corpus mixing recipe (sampling
    * probability ∝ n_lang^α with α = ½, the mT5/XLM-R device) — high-
    * resource languages are down-weighted relative to proportional
    * sampling so the mix flattens without going uniform. The budget
    * B = 200 splits as k_lang = B·t_lang div Σt with t = ⌊√n·10⁶⌋: the
    * ONE float (sqrt of an integer, correctly rounded IEEE in both
    * engines) is quantized immediately, so the targets are exact
    * integer arithmetic and cannot ulp-flip (the q_sample_weighted
    * lesson). Selection is the md5-rank exactly-k device per language.
    * Scale: lang counts are a 5-row aggregate (broadcast); ranking is
    * one per-lang window over the corpus — same shape as
    * q_sample_fixed_k. Fixture skew makes it non-degenerate: en (193
    * docs at sf0.001) gets k=55 vs proportional 77; the tail languages
    * gain (spec-pinned flattening). */
  val qSampleTemperature: Q = Q(
    "q_sample_temperature",
    (s, dir) => {
      import s.implicits._
      val langs = Tables.documents(s, dir)
        .groupBy($"lang").agg(count(lit(1)).as("n"))
        .withColumn("t", floor(sqrt($"n") * 1e6).cast(LongType))
      val tot = langs.agg(sum($"t").as("tt"))
      val target = langs.crossJoin(broadcast(tot))
        .select($"lang", $"n", expr("200 * t div tt").as("k_target"))
      val w = Window.partitionBy($"lang")
        .orderBy(md5($"doc_id".cast(StringType)), $"doc_id")
      Tables.documents(s, dir)
        .select($"doc_id", $"lang")
        .withColumn("rn", row_number().over(w).cast(LongType))
        .join(broadcast(target), "lang")
        .where($"rn" <= $"k_target")
        .select($"doc_id", $"lang", $"rn", $"k_target")
        .orderBy($"doc_id")
    },
    oracle = Some(
      """WITH langs AS (
        |  SELECT lang, COUNT(*) AS n,
        |    CAST(floor(sqrt(COUNT(*)) * 1e6) AS BIGINT) AS t
        |  FROM documents GROUP BY lang),
        |tot AS (SELECT CAST(SUM(t) AS BIGINT) AS tt FROM langs),
        |target AS (
        |  SELECT lang, n, 200 * t // tt AS k_target
        |  FROM langs CROSS JOIN tot),
        |ranked AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang, rn, k_target
        |FROM ranked JOIN target USING (lang)
        |WHERE rn <= k_target
        |ORDER BY doc_id""".stripMargin))

  /** q_text_pack — TRAINING-SEQUENCE PACKING (added r10): assign every
    * document its (chunk, offset) position in fixed 512-token training
    * sequences under concat-then-chunk packing — the standard LLM
    * pretraining layout (documents concatenated in a deterministic
    * order, the stream sliced into equal windows; what data loaders do
    * before batching). Pure integer arithmetic: n_tok from the shared
    * token stage, start = running Σn_tok − n_tok via ONE window, then
    * chunk = start div 512 and offset = start mod 512 (both engines
    * truncate identically on these non-negative longs).
    *
    * Scale: packing runs PER SOURCE — the window partitions by source,
    * never a global single-partition sort. That is also what production
    * does: training shards are packed independently by design (shard
    * boundaries are chunk boundaries), so the operator parallelizes
    * embarrassingly across shards at any corpus size. */
  val qTextPack: Q = Q(
    "q_text_pack",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tokenized(s, dir)
        .select($"doc_id", $"source", size($"w").cast(LongType).as("n_tok"))
        .withColumn("start", sum($"n_tok").over(w) - $"n_tok")
        .select($"doc_id", $"source", $"n_tok",
          expr("start div 512").as("chunk_id"),
          expr("start % 512").as("chunk_off"))
        .orderBy($"doc_id")
    },
    oracle = Some(
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |packed AS (
        |  SELECT doc_id, source, n_tok,
        |    CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      - n_tok AS start
        |  FROM toks)
        |SELECT doc_id, source, n_tok,
        |  start // 512 AS chunk_id, start % 512 AS chunk_off
        |FROM packed
        |ORDER BY doc_id""".stripMargin))

  /** q_quality_classifier (T) — TRAINED quality gate (added r10): fit a
    * logistic regression on the ~40 % md5-gated labeled split (labels =
    * the heuristic [[QualityScore.keep]] gate — weak supervision), then
    * score EVERY document with the one narrow σ(w·x) expression. Output
    * per doc: calibrated keep probability, the model's decision, and the
    * heuristic's decision side by side (the disagreement band is exactly
    * what a curation team reviews). Training is [[QualityClassifier]]'s
    * fixed-epoch exact-integer-gradient loop — deterministic under any
    * partitioning; model state is 4 doubles cached per (session, dir).
    * `QualityClassifierSpec` pins determinism, planted-label separation,
    * and extreme-docs agreement with the heuristic. */
  val qQualityClassifier: Q = Q(
    "q_quality_classifier",
    (s, dir) => {
      import s.implicits._
      val model = QualityClassifier.Models(s, dir)
      QualityClassifier.withFeatures(QualityScore.fromTokens(Tokenized(s, dir)))
        .select($"doc_id",
          round(model.prob, 6).as("p_keep"),
          model.pred.as("keep_pred"),
          QualityScore.keep.cast("int").as("keep_heur"))
        .orderBy($"doc_id")
    })

  /** q_text_zipf — ZIPF'S-LAW FIT of the corpus rank-frequency curve:
    * OLS slope of ln(freq) on ln(rank) over the term table — the
    * corpus-health diagnostic (natural language sits near slope −1;
    * template spam flattens it, boilerplate dedup failures steepen it)
    * that complements the per-doc diversity rows ([[qTextEntropy]],
    * [[qTextTtr]]) with ONE corpus-level number. Determinism: term
    * counts are exact Longs off the SHARED token stage; ranks are
    * row_number over the total (count DESC, term ASC) order — no tie
    * ambiguity; both log axes quantize ONCE to integer micro-nats
    * (floor(ln·1e6), the WOE device), so all five OLS moments are
    * exact integer sums and slope/intercept are each one double
    * division (q_stat_ols's closed form), rounded at 6 dp. INTEGER
    * HEADROOM at the stated envelope (~10⁵ types, micro-nat axes
    * x ≤ 1.2e7): Σx² ≈ 1.3e19 and the cross-products n·Σx² ≈ 1e24
    * both exceed Long, so the second-order sums accumulate in
    * DECIMAL(38,0) (twin: HUGEINT) and EVERY product — slope/intercept
    * numerators, the shared denominator, and the zero-variance guard —
    * runs widened; Spark's silent non-ANSI Long wraparound can never
    * diverge from DuckDB's checked HUGEINT. A single-term corpus (zero
    * x-variance) is decided in exact integer space → NULL both
    * engines. Scale: occurrences partial-agg to the VOCABULARY domain
    * before the rank window touches anything — the window runs over
    * the bounded term table (tens of thousands of types for a real
    * corpus; a range-binned rank would replace it past that), and the
    * final moment agg collapses it to one row. */
  val qTextZipf: Q = Q(
    "q_text_zipf",
    (s, dir) => {
      import s.implicits._
      val terms = Tokenized(s, dir)
        .select(explode($"lw").as("term"))
        .groupBy($"term").agg(count(lit(1)).as("cnt"))
      val ranked = terms
        .withColumn("r", row_number()
          .over(Window.orderBy($"cnt".desc, $"term".asc)).cast(LongType))
        .select(
          expr("CAST(floor(ln(CAST(r AS DOUBLE)) * 1000000) AS BIGINT)").as("x"),
          expr("CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1000000) AS BIGINT)").as("y"),
          $"cnt")
      ranked.agg(count(lit(1)).as("n"), sum($"cnt").as("total_tokens"),
          sum($"x").as("sx"), sum($"y").as("sy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
        .select($"n".as("n_terms"), $"total_tokens",
          when(expr("CAST(n AS DECIMAL(38,0)) * sxx = CAST(sx AS DECIMAL(38,0)) * sx"),
              lit(null))
            .otherwise(round(
              expr("CAST(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)") /
              expr("CAST(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)"), 6))
            .as("zipf_slope"),
          when(expr("CAST(n AS DECIMAL(38,0)) * sxx = CAST(sx AS DECIMAL(38,0)) * sx"),
              lit(null))
            .otherwise(round(
              expr("CAST(CAST(sy AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sxy AS DOUBLE)") /
              expr("CAST(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)") / 1e6, 6))
            .as("intercept_ln"))
    },
    oracle = Some(
      """WITH terms AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS term
        |        FROM documents)
        |  GROUP BY 1),
        |ranked AS (
        |  SELECT cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, term ASC) AS BIGINT)
        |      AS r
        |  FROM terms),
        |pts AS (
        |  SELECT cnt,
        |    CAST(floor(ln(CAST(r AS DOUBLE)) * 1000000) AS BIGINT) AS x,
        |    CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1000000) AS BIGINT) AS y
        |  FROM ranked),
        |m AS (
        |  SELECT COUNT(*) AS n, CAST(SUM(cnt) AS BIGINT) AS total_tokens,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM pts)
        |SELECT n AS n_terms, total_tokens,
        |  CASE WHEN CAST(n AS HUGEINT) * sxx = CAST(sx AS HUGEINT) * sx
        |    THEN NULL
        |    ELSE ROUND(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE), 6)
        |    END AS zipf_slope,
        |  CASE WHEN CAST(n AS HUGEINT) * sxx = CAST(sx AS HUGEINT) * sx
        |    THEN NULL
        |    ELSE ROUND(CAST(CAST(sy AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sxy AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) / 1e6, 6)
        |    END AS intercept_ln
        |FROM m""".stripMargin))

  /** q_text_naive_bayes — multinomial NAIVE BAYES language classifier,
    * trained and scored entirely in-plan: train on the 80% of docs with
    * doc_id % 5 ≠ 0, predict lang for the held-out 20%. The counting
    * classifier every corpus pipeline starts from (fastText's ancestor;
    * McCallum & Nigam 1998's multinomial event model): class priors are
    * doc counts, token likelihoods are Laplace(+1)-smoothed class-token
    * counts — ALL exact integers, so unlike q_quality_classifier's
    * driver-solved IRLS there is no driver-side model state at all; the
    * "model" is a vocab×classes grid DataFrame that broadcast-joins the
    * test tokens.
    *
    * Determinism (the perplexity/bigram-LM contract): each log
    * likelihood ln((cnt+1)/(tok_c+V)) and each log prior quantizes ONCE
    * to integer micro-nats in a textually identical expression in both
    * engines; scores are exact Long sums of those, argmax tiebreaks
    * (score desc, lang asc), and out-of-vocabulary test tokens route
    * through an explicit per-class OOV likelihood ln(1/(tok_c+V)) —
    * structurally exercised even though the fixture's closed 31-word
    * vocabulary makes the branch empty, so a real corpus can't hit an
    * unhandled path.
    *
    * Scale (100 TB): the grid is |V|×|classes| (bounded model state —
    * for web-scale V, hash features first: q_prep_hash_features), so
    * scoring is one broadcast join + one (doc, class)-keyed sum; the
    * corpus is never shuffled on anything wider than doc_id. Training
    * is two keyed counts over the token stage — the word-count shape. */
  /** The NB per-test-doc prediction frame (doc_id, actual_lang,
    * pred_lang, score_micro, correct) — shared by [[qTextNaiveBayes]]
    * (the per-doc report) and [[qMlConfusion]] (the per-class
    * evaluation), built once per (session, dir). */
  private val nbPredCache =
    new graft.Memo[(SparkSession, String), org.apache.spark.sql.DataFrame]

  private def naiveBayesPred(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame =
    nbPredCache((s, dir)) {
      import s.implicits._
      val isTest = ($"doc_id" % 5) === 0
      val toks = Tokenized(s, dir)
        .select($"doc_id", $"lang", explode($"lw").as("w"))
      // -- train: exact integer counts ------------------------------
      val cnt = toks.where(!isTest)
        .groupBy($"lang", $"w").agg(count(lit(1)).as("cnt"))
      val tokC = cnt.groupBy($"lang").agg(sum($"cnt").as("tok_c"))
      val vocab = cnt.select($"w").distinct()
      val vSize = broadcast(vocab.agg(count(lit(1)).as("v")))
      val trainDocs = Tables.documents(s, dir).where(!isTest)
        .select($"doc_id", $"lang")
      val nTrain = broadcast(trainDocs.agg(count(lit(1)).as("n_tr")))
      val priors = trainDocs.groupBy($"lang")
        .agg(count(lit(1)).as("n_c")).crossJoin(nTrain)
        .select($"lang", expr(
          "CAST(floor(ln(CAST(n_c AS DOUBLE) / CAST(n_tr AS DOUBLE)) " +
            "* 1000000) AS BIGINT)").as("prior_micro"))
      val grid = vocab.crossJoin(broadcast(tokC)).crossJoin(vSize)
        .join(cnt, Seq("lang", "w"), "left")
        .select($"w", $"lang", expr(
          "CAST(floor(ln(CAST(COALESCE(cnt, 0) + 1 AS DOUBLE) " +
            "/ CAST(tok_c + v AS DOUBLE)) * 1000000) AS BIGINT)")
          .as("ll_micro"))
      val oovC = tokC.crossJoin(vSize).select($"lang", expr(
        "CAST(floor(ln(CAST(1 AS DOUBLE) / CAST(tok_c + v AS DOUBLE)) " +
          "* 1000000) AS BIGINT)").as("oov_micro"))
      // -- score the held-out 20% -----------------------------------
      val tf = toks.where(isTest)
        .groupBy($"doc_id", $"w").agg(count(lit(1)).as("tf"))
      val known = tf.join(broadcast(grid), Seq("w"))
        .select($"doc_id", $"lang", ($"tf" * $"ll_micro").as("contrib"))
      val oov = tf.join(broadcast(vocab), Seq("w"), "left_anti")
        .groupBy($"doc_id").agg(sum($"tf").as("oov_tf"))
        .crossJoin(broadcast(oovC))
        .select($"doc_id", $"lang", ($"oov_tf" * $"oov_micro").as("contrib"))
      val scores = known.unionByName(oov)
        .groupBy($"doc_id", $"lang").agg(sum($"contrib").as("ll_sum"))
        .join(broadcast(priors), Seq("lang"))
        .select($"doc_id", $"lang",
          ($"ll_sum" + $"prior_micro").as("score_micro"))
      val byScore = Window.partitionBy($"doc_id")
        .orderBy($"score_micro".desc, $"lang")
      scores.withColumn("rk", row_number().over(byScore))
        .where($"rk" === 1)
        .join(Tables.documents(s, dir).where(isTest)
          .select($"doc_id", $"lang".as("actual_lang")), Seq("doc_id"))
        .select($"doc_id", $"actual_lang", $"lang".as("pred_lang"),
          $"score_micro",
          when($"actual_lang" === $"lang", 1L).otherwise(0L).as("correct"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** The NB scoring pipeline as a DuckDB CTE prefix — the single
    * definition both oracles build on (`ranked`/`test` are the exposed
    * relations), so the evaluation twin can never drift from the
    * classifier twin. */
  private val nbOracleCtes: String =
    """WITH train AS (
        |  SELECT doc_id, lang, lower(text) AS t FROM documents
        |  WHERE doc_id % 5 <> 0),
        |ttok AS (
        |  SELECT doc_id, lang, unnest(string_split(t, ' ')) AS w FROM train),
        |cnt AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM ttok GROUP BY 1, 2),
        |tokc AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS tok_c
        |  FROM cnt GROUP BY 1),
        |vocab AS (SELECT DISTINCT w FROM cnt),
        |vs AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
        |ntr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tr FROM train),
        |priors AS (
        |  SELECT lang,
        |    CAST(floor(ln(CAST(COUNT(*) AS DOUBLE) / CAST(n_tr AS DOUBLE))
        |      * 1000000) AS BIGINT) AS prior_micro
        |  FROM train, ntr GROUP BY lang, n_tr),
        |grid AS (
        |  SELECT vocab.w, tokc.lang,
        |    CAST(floor(ln(CAST(COALESCE(cnt.cnt, 0) + 1 AS DOUBLE)
        |      / CAST(tokc.tok_c + vs.v AS DOUBLE)) * 1000000) AS BIGINT)
        |      AS ll_micro
        |  FROM vocab CROSS JOIN tokc CROSS JOIN vs
        |  LEFT JOIN cnt ON cnt.w = vocab.w AND cnt.lang = tokc.lang),
        |oovc AS (
        |  SELECT lang,
        |    CAST(floor(ln(CAST(1 AS DOUBLE) / CAST(tok_c + v AS DOUBLE))
        |      * 1000000) AS BIGINT) AS oov_micro
        |  FROM tokc, vs),
        |test AS (
        |  SELECT doc_id, lang AS actual_lang, lower(text) AS t
        |  FROM documents WHERE doc_id % 5 = 0),
        |tetok AS (
        |  SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM test),
        |tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM tetok GROUP BY 1, 2),
        |known AS (
        |  SELECT tf.doc_id, grid.lang, tf.tf * grid.ll_micro AS contrib
        |  FROM tf JOIN grid ON grid.w = tf.w),
        |oov AS (
        |  SELECT o.doc_id, oovc.lang, o.oov_tf * oovc.oov_micro AS contrib
        |  FROM (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS oov_tf FROM tf
        |        WHERE w NOT IN (SELECT w FROM vocab) GROUP BY doc_id) o
        |  CROSS JOIN oovc),
        |scores AS (
        |  SELECT doc_id, lang, CAST(SUM(contrib) AS BIGINT) AS ll_sum
        |  FROM (SELECT * FROM known UNION ALL SELECT * FROM oov)
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT s.doc_id, s.lang,
        |    s.ll_sum + p.prior_micro AS score_micro,
        |    row_number() OVER (PARTITION BY s.doc_id
        |      ORDER BY s.ll_sum + p.prior_micro DESC, s.lang) AS rk
        |  FROM scores s JOIN priors p ON p.lang = s.lang)""".stripMargin

  val qTextNaiveBayes: Q = Q(
    "q_text_naive_bayes",
    (s, dir) => {
      import s.implicits._
      naiveBayesPred(s, dir).orderBy($"doc_id")
    },
    oracle = Some(nbOracleCtes +
      """
        |SELECT r.doc_id, t.actual_lang, r.lang AS pred_lang,
        |  r.score_micro,
        |  CAST(CASE WHEN t.actual_lang = r.lang THEN 1 ELSE 0 END
        |    AS BIGINT) AS correct
        |FROM ranked r JOIN test t ON t.doc_id = r.doc_id
        |WHERE r.rk = 1
        |ORDER BY r.doc_id""".stripMargin))

  /** q_ml_confusion — per-class evaluation of [[qTextNaiveBayes]]'s
    * held-out predictions: confusion counts (tp / fp / fn / support)
    * and precision / recall / F1 in exact integer ppm — the EVALUATION
    * operator every trained-model row ultimately answers to, and the
    * table a corpus pipeline gates a classifier rollout on.
    *
    * F1 computes by the harmonic identity 2·tp / (2·tp + fp + fn)
    * DIRECTLY from counts — going through already-rounded ppm
    * precision/recall would compound two roundings; this keeps ONE
    * integer division per metric (truncating div, identical both
    * engines; zero denominators integer-decided → NULL). The class
    * axis comes from the ACTUAL labels, so a class the classifier
    * never predicts still reports (recall 0, precision NULL).
    *
    * Shape: the shared prediction frame is ≤|test docs| rows and the
    * output is |classes|-bounded; one keyed agg per side of the
    * full-outer class meet. Scale is inherited from the NB row —
    * evaluation adds nothing fact-sized. */
  val qMlConfusion: Q = Q(
    "q_ml_confusion",
    (s, dir) => {
      import s.implicits._
      val pred = naiveBayesPred(s, dir)
      val byActual = pred.groupBy($"actual_lang".as("lang"))
        .agg(count(lit(1)).as("support"), sum($"correct").as("tp"))
      val byPred = pred.groupBy($"pred_lang".as("lang"))
        .agg(count(lit(1)).as("n_pred"))
      byActual.join(broadcast(byPred), Seq("lang"), "left")
        .select($"lang", $"tp", $"support",
          (coalesce($"n_pred", lit(0L)) - $"tp").as("fp"),
          ($"support" - $"tp").as("fn"))
        .select($"lang", $"tp", $"fp", $"fn", $"support",
          when($"tp" + $"fp" === 0L, lit(null))
            .otherwise(expr("tp * 1000000 div (tp + fp)"))
            .as("precision_ppm"),
          expr("tp * 1000000 div support").as("recall_ppm"),
          when(lit(2L) * $"tp" + $"fp" + $"fn" === 0L, lit(null))
            .otherwise(expr("2 * tp * 1000000 div (2 * tp + fp + fn)"))
            .as("f1_ppm"))
        .orderBy($"lang")
    },
    oracle = Some(nbOracleCtes +
      """,
        |pred AS (
        |  SELECT r.doc_id, t.actual_lang, r.lang AS pred_lang,
        |    CASE WHEN t.actual_lang = r.lang THEN 1 ELSE 0 END AS correct
        |  FROM ranked r JOIN test t ON t.doc_id = r.doc_id
        |  WHERE r.rk = 1),
        |by_actual AS (
        |  SELECT actual_lang AS lang, CAST(COUNT(*) AS BIGINT) AS support,
        |    CAST(SUM(correct) AS BIGINT) AS tp
        |  FROM pred GROUP BY 1),
        |by_pred AS (
        |  SELECT pred_lang AS lang, CAST(COUNT(*) AS BIGINT) AS n_pred
        |  FROM pred GROUP BY 1)
        |SELECT a.lang, a.tp,
        |  CAST(COALESCE(p.n_pred, 0) - a.tp AS BIGINT) AS fp,
        |  CAST(a.support - a.tp AS BIGINT) AS fn,
        |  a.support,
        |  CASE WHEN a.tp + COALESCE(p.n_pred, 0) - a.tp = 0 THEN NULL
        |    ELSE CAST(a.tp * 1000000 // COALESCE(p.n_pred, 0) AS BIGINT)
        |    END AS precision_ppm,
        |  CAST(a.tp * 1000000 // a.support AS BIGINT) AS recall_ppm,
        |  CASE WHEN 2 * a.tp + (COALESCE(p.n_pred, 0) - a.tp)
        |      + (a.support - a.tp) = 0 THEN NULL
        |    ELSE CAST(2 * a.tp * 1000000
        |      // (2 * a.tp + (COALESCE(p.n_pred, 0) - a.tp)
        |        + (a.support - a.tp)) AS BIGINT) END AS f1_ppm
        |FROM by_actual a LEFT JOIN by_pred p ON p.lang = a.lang
        |ORDER BY a.lang""".stripMargin))

  /** q_text_mutual_info — MUTUAL INFORMATION feature selection
    * I(token; lang): which tokens carry signal about the class — the
    * standard filter-method feature selector (Yang & Pedersen 1997)
    * run before training any text classifier, and the train-side
    * complement of [[qTextNaiveBayes]] (NB consumes all features; MI
    * says which ones earn their keep).
    *
    * The statistic reports N·MI scaled to micro-nats: each (token,
    * class) cell contributes n_wc · ln(n_wc·N / (n_w·n_c)), the ln
    * quantized ONCE per cell over the bounded |V|×|classes| grid (the
    * perplexity device); zero cells contribute exactly 0 (the x·ln x
    * limit) by never materializing — only observed cells join. The
    * scaling by N is monotone, so the top-20 ranking is the MI
    * ranking, with everything after the quantization exact Long
    * multiply-add.
    *
    * Shape: one (lang, token) count off the shared token stage; the
    * margins attach by broadcast (token margin ≤|V| rows, class margin
    * ≤|classes|, N scalar); top-20 is a bounded heap. */
  val qTextMutualInfo: Q = Q(
    "q_text_mutual_info",
    (s, dir) => {
      import s.implicits._
      val wc = Tokenized(s, dir)
        .select($"lang", explode($"lw").as("w"))
        .groupBy($"lang", $"w").agg(count(lit(1)).as("nwc"))
      val wMargin = wc.groupBy($"w").agg(sum($"nwc").as("nw"))
      val cMargin = wc.groupBy($"lang").agg(sum($"nwc").as("nc"))
      val total = broadcast(wc.agg(sum($"nwc").as("nn")))
      wc.join(broadcast(wMargin), Seq("w"))
        .join(broadcast(cMargin), Seq("lang"))
        .crossJoin(total)
        .select($"w", ($"nwc" * expr(
          "CAST(floor(ln(CAST(nwc AS DOUBLE) * nn " +
            "/ (CAST(nw AS DOUBLE) * nc)) * 1000000) AS BIGINT)"))
          .as("cell_micro"))
        .groupBy($"w")
        .agg(sum($"cell_micro").as("mi_scaled_micro"))
        .orderBy($"mi_scaled_micro".desc, $"w")
        .limit(20)
    },
    oracle = Some(
      """WITH toks AS (
        |  SELECT lang, unnest(string_split(lower(text), ' ')) AS w
        |  FROM documents),
        |wc AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS nwc
        |  FROM toks GROUP BY 1, 2),
        |wm AS (SELECT w, CAST(SUM(nwc) AS BIGINT) AS nw FROM wc GROUP BY 1),
        |cm AS (SELECT lang, CAST(SUM(nwc) AS BIGINT) AS nc
        |  FROM wc GROUP BY 1),
        |tot AS (SELECT CAST(SUM(nwc) AS BIGINT) AS nn FROM wc)
        |SELECT wc.w,
        |  CAST(SUM(nwc * CAST(floor(ln(CAST(nwc AS DOUBLE) * nn
        |    / (CAST(nw AS DOUBLE) * nc)) * 1000000) AS BIGINT)) AS BIGINT)
        |    AS mi_scaled_micro
        |FROM wc JOIN wm ON wm.w = wc.w JOIN cm ON cm.lang = wc.lang, tot
        |GROUP BY wc.w
        |ORDER BY mi_scaled_micro DESC, wc.w
        |LIMIT 20""".stripMargin))

  /** The (score, label) frame the ML-evaluation pair shares: score =
    * the distinct-token ratio in exact integer micro-units (a single
    * FEATURE — the gate also weighs stop-ratio and the token band, so
    * the feature is informative but not decisive and the evaluation is
    * non-degenerate), label = the shared [[QualityScore.keep]] gate.
    * Score domain is micro-ratios ∈ [0, 10⁶] — DOMAIN-bounded, so
    * everything downstream of the (score)-keyed partial agg is bounded
    * at any corpus size (the 100 TB argument both rows lean on). */
  private def scoredLabeled(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    QualityScore.fromTokens(Tokenized(s, dir))
      .select($"doc_id",
        expr("(n_distinct * 1000000) div n_tok").as("s"),
        when(QualityScore.keep, 1L).otherwise(0L).as("y"))
  }

  /** The DuckDB twin of [[scoredLabeled]] (shared CTE text so the two
    * evaluation oracles can never drift apart). */
  private val scoredLabeledSql: String =
    """m AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
      |      AS n_distinct,
      |    CAST(len(list_filter(string_split(text, ' '),
      |      t -> t IN ('the', 'a'))) AS BIGINT) AS n_stop
      |  FROM documents),
      |sc AS (
      |  SELECT doc_id, (n_distinct * 1000000) // n_tok AS s,
      |    CASE WHEN ROUND((CAST(n_distinct AS DOUBLE) / n_tok) * 0.5
      |        + (1.0 - CAST(n_stop AS DOUBLE) / n_tok) * 0.3
      |        + least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) * 0.2, 6) >= 0.65
      |      AND n_tok BETWEEN 20 AND 200 THEN 1 ELSE 0 END AS y
      |  FROM m)""".stripMargin

  /** q_ml_auc (added r13) — EXACT ROC-AUC of a curation feature against
    * the quality gate: the feature-screening statistic a pipeline owner
    * computes before promoting a signal into the gate ("how well does
    * distinct-ratio alone rank keepers above rejects?"). AUC via the
    * Mann-Whitney identity with exact tie handling:
    * 2U = Σ_scores n_pos(s)·(2·n_neg_below(s) + n_neg(s)), AUC =
    * 2U/(2·P·N) — every term an exact Long until the one final
    * division (ties contribute exactly ½, no average-rank floats).
    * Scale: one (score)-keyed partial agg (map-side combined), then the
    * running negative-count over the DOMAIN-bounded distinct-score
    * table (≤ 10⁶ + 1 rows at ANY corpus size — bounded by the
    * micro-ratio domain, not the data) computed as a TWO-LEVEL PREFIX
    * SUM (r13 verdict watch-item cleared): scores bucket by `s div
    * 1024`, within-bucket running sums parallelize across bucket
    * partitions, and the only single-partition window left runs over
    * the ≤ ~1024-row bucket-totals table — both levels ~√domain, so
    * widening the score domain past 10⁷ no longer concentrates a
    * full-domain sort on one task. Headroom: 2U ≤ P·2N ≤ 2n² →
    * Long-safe to ~2·10⁹ docs, then the documented DECIMAL(38,0)
    * promotion. */
  /** The exact-AUC engine over a (s: long score, y: 0/1 label) frame,
    * factored so WeightedStatsSpec can pin brute-force pair-count
    * equality, the label-flip identity, and the tie/separation edge
    * cases on planted sets. */
  private[graft] def aucFrame(sy: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val g = sy.groupBy(col("s"))
      .agg(sum(col("y")).as("np"),
        (count(lit(1)) - sum(col("y"))).as("nn"))
    // Two-level exact prefix sum: nn_below(s) = Σ nn over buckets
    // strictly below s's bucket + the running Σ nn within the bucket,
    // excluding s itself. Pure integer arithmetic — value-identical to
    // the single-window form (WeightedStatsSpec pins the equality).
    val bucket = 1024L
    val gb = g.withColumn("b", expr(s"s div $bucket"))
    val wb = org.apache.spark.sql.expressions.Window.orderBy(col("b"))
    val below = gb.groupBy(col("b")).agg(sum(col("nn")).as("bn"))
      .withColumn("bn_below", sum(col("bn")).over(wb) - col("bn"))
      .select(col("b"), col("bn_below"))
    val wi = org.apache.spark.sql.expressions.Window
      .partitionBy(col("b")).orderBy(col("s"))
    gb.join(broadcast(below), Seq("b"))
      .withColumn("nn_below",
        col("bn_below") + sum(col("nn")).over(wi) - col("nn"))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np") * (col("nn_below") * 2 + col("nn"))).as("u2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0L || col("n_neg") === 0L,
          lit(null).cast(DoubleType))
          .otherwise(round(col("u2").cast(DoubleType) /
            (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as("auc"))
  }

  val qMlAuc: Q = Q(
    "q_ml_auc",
    (s, dir) => aucFrame(scoredLabeled(s, dir)),
    oracle = Some(
      s"""WITH $scoredLabeledSql,
         |g AS (
         |  SELECT s, CAST(SUM(y) AS BIGINT) AS np,
         |    CAST(COUNT(*) - SUM(y) AS BIGINT) AS nn
         |  FROM sc GROUP BY s),
         |c AS (
         |  SELECT s, np, nn,
         |    CAST(SUM(nn) OVER (ORDER BY s) - nn AS BIGINT) AS nn_below
         |  FROM g),
         |t AS (
         |  SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
         |    CAST(SUM(nn) AS BIGINT) AS n_neg,
         |    CAST(SUM(np * (2 * nn_below + nn)) AS BIGINT) AS u2
         |  FROM c)
         |SELECT n_pos, n_neg,
         |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
         |    ELSE ROUND(CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg), 6)
         |  END AS auc
         |FROM t""".stripMargin))

  /** q_ml_calibration (added r13) — CALIBRATION TABLE of the same
    * feature: fixed-width 0.1 bins over the micro-ratio score, each
    * with its document count, observed keep rate, and mean score — the
    * reliability-diagram input ("does a 0.8-scoring bin actually keep
    * at 0.8?") and the companion read to q_ml_auc (AUC ranks, the
    * calibration table says whether the MAGNITUDE means anything).
    * Fixed-width integer bins, never ntile: quantile bins tie-break
    * nondeterministically and shuffle corpus-wide, while `s div 10⁵`
    * is a narrow pure function and the table is ≤ 11 rows at any
    * scale. Exact Longs until the two final rounded divisions. */
  val qMlCalibration: Q = Q(
    "q_ml_calibration",
    (s, dir) => {
      import s.implicits._
      scoredLabeled(s, dir)
        .groupBy(expr("s div 100000").as("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum($"y").as("n_keep"),
          round(sum($"y").cast(DoubleType) / count(lit(1)), 6)
            .as("keep_rate"),
          round(sum($"s").cast(DoubleType) / count(lit(1)) / 1e6, 6)
            .as("mean_score"))
        .orderBy($"bin")
    },
    oracle = Some(
      s"""WITH $scoredLabeledSql
         |SELECT s // 100000 AS bin, COUNT(*) AS n_docs,
         |  CAST(SUM(y) AS BIGINT) AS n_keep,
         |  ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS keep_rate,
         |  ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
         |    AS mean_score
         |FROM sc
         |GROUP BY 1
         |ORDER BY 1""".stripMargin))

  val all: Vector[Q] =
    Vector(qTextTokenizeExplode, qTextWordcountTf, qTextStats,
      qTextQuality, qTextTokenCount, qDocFingerprint, qTextFilterPipeline,
      qSampleDeterministic, qTextNormalize, qTextTfidf, qSampleStratified,
      qTextRedactPii, qTextRepetition, qTextPerplexity, qTextCollocations,
      qTextKlDrift, qSampleFixedK, qSampleWeighted, qTextBm25, qTextEntropy,
      qTextTtr, qTextKeywords, qTextBigramLm, qSampleBalanced,
      qTextCharTrigrams, qQualityClassifier, qSampleTemperature, qTextPack,
      qSampleTokenBudget, qSamplePerplexityBucket, qSampleDomainMix,
      qTextChunk, qPipelineFunnel,
      qTextZipf, qTextNaiveBayes, qMlConfusion, qTextMutualInfo,
      qMlAuc, qMlCalibration)
}
