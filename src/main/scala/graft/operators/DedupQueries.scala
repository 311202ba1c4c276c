package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators over the documents corpus — SURVEY.md §2.10
  * rows 49–51 (LLM-data-pipeline north star).
  *
  * Scale notes (100 TB):
  *  - #49 groups on a content hash — one shuffle keyed by md5, partial
  *    count map-side; never materializes pairs.
  *  - #50 generates candidate *pairs* only within equal prefix-key
  *    buckets: an equi self-join (shuffle hash/sort-merge on the key),
  *    never an all-pairs cross product. Bucket sizes are bounded by the
  *    key's selectivity, and AQE splits a skewed bucket at runtime.
  *  - #51 is MinHash-LSH banding: signature computation is per-row
  *    (no shuffle); candidate generation is an equi join on
  *    (band, band_key) — the canonical sub-quadratic near-dup shape.
  */
object DedupQueries {

  /** #49 q_dedup_exact — exact duplicate collapse by md5(text); keeps the
    * smallest doc_id as the canonical representative. */
  val qDedupExact: Q = Q(
    "q_dedup_exact",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .groupBy(md5($"text").as("h"))
        .agg(
          count(lit(1)).as("n_dups"),
          min($"doc_id").as("keep_id"))
        .orderBy($"h")
    },
    oracle = Some(
      """SELECT md5(text) AS h, COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
        |FROM documents
        |GROUP BY h
        |ORDER BY h""".stripMargin))

  /** #50 q_dedup_near — near-dup candidate pairs sharing a normalized
    * 40-char prefix key (FIXTURES.md: 21 such groups at sf0.001). */
  val qDedupNear: Q = Q(
    "q_dedup_near",
    (s, dir) => {
      import s.implicits._
      val keyed = Tables.documents(s, dir)
        .select(substring(lower($"text"), 1, 40).as("k"), $"doc_id")
      keyed.as("a")
        .join(keyed.as("b"),
          col("a.k") === col("b.k") && col("a.doc_id") < col("b.doc_id"))
        .select(
          col("a.doc_id").as("doc_a"),
          col("b.doc_id").as("doc_b"),
          col("a.k").as("prefix_key"))
        .orderBy($"doc_a", $"doc_b")
    },
    oracle = Some(
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  substring(lower(a.text), 1, 40) AS prefix_key
        |FROM documents a JOIN documents b
        |  ON substring(lower(a.text), 1, 40) = substring(lower(b.text), 1, 40)
        | AND a.doc_id < b.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin))

  /** Shared 3-token shingling (see MinHashLsh doc for why unigrams are
    * useless on this corpus). `wordsCol` must hold the split text. */
  object Shingles {
    val size = 3

    /** Array column of space-joined `size`-token shingles. */
    def of(wordsCol: String): org.apache.spark.sql.Column =
      expr(
        s"""transform(
           |  sequence(1, greatest(size($wordsCol) - ${size - 1}, 1)),
           |  i -> concat_ws(' ', slice($wordsCol, i, $size)))""".stripMargin)

    /** The same shingle list in DuckDB SQL (w = string_split(text)). */
    def sql(words: String): String =
      s"""list_transform(range(1, greatest(len($words) - ${size - 1}, 1) + 1),
         |    i -> concat_ws(' ', $words[i], $words[i+1], $words[i+2]))""".stripMargin
  }

  /** MinHash-LSH internals, shared by the query and `MinHashSpec`.
    *
    * k=16 hash "permutations" (seeded xxhash64 over the distinct token
    * set), banded 4×4: docs agreeing on all 4 signature slots of any band
    * become a candidate pair. Probability a pair with Jaccard similarity
    * j collides: 1-(1-j^4)^4 — the classic LSH S-curve.
    */
  object MinHashLsh {
    val numHashes = 16
    val bands = 4
    val rowsPerBand = 4

    /** doc (id, text) → (doc_id, band, band_key) rows, one per band.
      *
      * MinHash is computed over *3-token shingles*, not unigrams: the
      * fixture corpus draws from a 31-word vocabulary, so unigram token
      * sets are nearly identical across documents and unigram-LSH
      * degenerates to all-pairs (measured: 6.4M candidate pairs at
      * sf0.1). Shingles restore discriminative sets — near-identical
      * docs keep Jaccard ≥ 0.9 while unrelated docs drop to ≈ 0.
      *
      * Signatures via explode + codegen'd min-aggregate rather than
      * per-row array HOFs: higher-order functions are CodegenFallback
      * (interpreted), and k×|shingles| interpreted xxhash evals dominate
      * otherwise (~10× slower measured at sf0.1). The aggregate
      * partial-aggregates map-side, so the shuffle carries one 16-long
      * signature row per doc — scale-safe. Duplicate shingles don't
      * change a min, so no distinct pass is needed. */
    def bandKeys(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val shingled = df
        .withColumn("w", split(col("text"), " "))
        .select(col("doc_id"), explode(Shingles.of("w")).as("tok"))
      val sigCols = (0 until numHashes).map { i =>
        min(xxhash64(lit(i), col("tok"))).as(s"h$i")
      }
      val withSig = shingled.groupBy(col("doc_id"))
        .agg(sigCols.head, sigCols.tail: _*)
      val bandStructs = (0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          xxhash64((0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}")): _*)
            .as("band_key"))
      }
      withSig
        .select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
    }

    /** Distinct candidate pairs (doc_a < doc_b) from any band collision. */
    def candidatePairs(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val keys = bandKeys(df)
      keys.as("a")
        .join(keys.as("b"), Seq("band", "band_key"))
        .where(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
    }
  }

  /** #51 q_dedup_minhash (T) — MinHash-LSH candidate pairs over the token
    * sets. Hash functions are engine-specific (xxhash64 seeds), so no
    * DuckDB oracle; `MinHashSpec` asserts planted near-dups are recalled
    * and exact duplicates always collide. */
  val qDedupMinhash: Q = Q(
    "q_dedup_minhash",
    (s, dir) => {
      import s.implicits._
      MinHashLsh.candidatePairs(
          Tables.documents(s, dir).select($"doc_id", $"text"))
        .orderBy($"doc_a", $"doc_b")
    })

  /** q_dedup_ngram_jaccard — exact 3-gram Jaccard similarity over the
    * prefix-key candidate pairs (#50's scheme bounds the pair set), kept
    * at jaccard ≥ 0.5. Set semantics on both sides (array_intersect /
    * list_intersect are distinct); |A∪B| = |A|+|B|−|A∩B| because DuckDB
    * has no list_union. Int/int division in double, round(6) — fixture
    * set sizes terminate at ≤ 6 decimals or never hit an exact boundary.
    *
    * Scale: candidate generation is the equi prefix-key join; the exact
    * Jaccard runs only on candidates — never all pairs. */
  val qDedupNgramJaccard: Q = Q(
    "q_dedup_ngram_jaccard",
    (s, dir) => {
      import s.implicits._
      val keyed = Tables.documents(s, dir)
        .withColumn("w", split(lower($"text"), " "))
        .select(
          substring(lower($"text"), 1, 40).as("k"),
          $"doc_id",
          array_distinct(Shingles.of("w")).as("sh"))
      keyed.as("a")
        .join(keyed.as("b"),
          col("a.k") === col("b.k") && col("a.doc_id") < col("b.doc_id"))
        .select(
          col("a.doc_id").as("doc_a"),
          col("b.doc_id").as("doc_b"),
          size(array_intersect(col("a.sh"), col("b.sh"))).cast(DoubleType)
            .as("ni"),
          (size(col("a.sh")) + size(col("b.sh"))).cast(DoubleType).as("nab"))
        .select($"doc_a", $"doc_b",
          round($"ni" / ($"nab" - $"ni"), 6).as("jaccard"))
        .where($"jaccard" >= 0.5)
        .orderBy($"doc_a", $"doc_b")
    },
    oracle = Some(
      s"""SELECT doc_a, doc_b, jaccard FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    ROUND(
         |      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |      (CAST(len(a.sh) + len(b.sh) AS DOUBLE) - len(list_intersect(a.sh, b.sh))),
         |      6) AS jaccard
         |  FROM (SELECT doc_id, substring(lower(text), 1, 40) AS k,
         |          list_distinct(${Shingles.sql("string_split(lower(text), ' ')")}) AS sh
         |        FROM documents) a
         |  JOIN (SELECT doc_id, substring(lower(text), 1, 40) AS k,
         |          list_distinct(${Shingles.sql("string_split(lower(text), ' ')")}) AS sh
         |        FROM documents) b
         |    ON a.k = b.k AND a.doc_id < b.doc_id)
         |WHERE jaccard >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin))

  /** Parameterized SimHash sketch — `bits`-bit fingerprints, banded into
    * `chunks` equal chunks, pairs kept at Hamming ≤ `maxHamming`.
    *
    * Bit j of the fingerprint is the sign of Σ±1 over features (bit j of
    * each shingle's xxhash64). Pairs within Hamming ≤ chunks−1 are
    * *guaranteed* to agree on some chunk (pigeonhole); distances up to
    * maxHamming are caught best-effort; the exact bit_count(xor)
    * post-filter makes the output precise either way. Everything is
    * explode + codegen agg + equi join — the scale-safe shape.
    *
    * Width rule (100 TB): the expected RANDOM-pair output is
    * n²/2 · P(Ham(bits) ≤ maxHamming) = n²/2 · Σ_{k≤h} C(bits,k)/2^bits
    * — a constant per-pair false-positive floor, so at fixed width the
    * OUTPUT is quadratic no matter how the banding prunes (measured by
    * `ScaleSpec`: 32/6 grows with exponent ≈ 2.0 on a random corpus).
    * Pick (bits, maxHamming) so that floor ≪ the true-dup count: 32/6
    * (P ≈ 2.6e-4) only suits fixture-scale corpora; 64/3 (P ≈ 2.4e-15)
    * is negligible past n = 10⁹. Long packing caps bits at 64; wider
    * sketches would shard the signature across two longs. */
  class SimHashSketch(val bits: Int, val chunks: Int, val maxHamming: Int) {
    require(chunks > 0, s"chunks must be positive, got $chunks")
    require(bits > 0 && bits <= 64 && bits % chunks == 0,
      s"bits must be in (0, 64] and divisible by chunks, got $bits/$chunks")
    private val chunkBits = bits / chunks
    require(chunkBits <= 32, s"chunk keys must fit an int-sized mask")

    /** (doc_id, sig) fingerprints. */
    def fingerprints(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val shingled = df
        .withColumn("w", split(col("text"), " "))
        .select(col("doc_id"), explode(Shingles.of("w")).as("tok"))
        .select(col("doc_id"), xxhash64(col("tok")).as("h"))
      val bitSums = (0 until bits).map { j =>
        sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1)
          .otherwise(-1)).as(s"b$j")
      }
      // Disjoint powers of two sum without carries (1L << 63 lands the
      // two's-complement sign bit correctly), so + packs like bitwise-or.
      val sig = (0 until bits)
        .map(j => when(col(s"b$j") >= 0, 1L << j).otherwise(0L))
        .reduce(_ + _)
      shingled.groupBy(col("doc_id"))
        .agg(bitSums.head, bitSums.tail: _*)
        .select(col("doc_id"), sig.as("sig"))
    }

    /** Candidate pairs with exact Hamming distance ≤ maxHamming. */
    def nearPairs(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val mask = (1L << chunkBits) - 1
      val fps = fingerprints(df)
      val banded = fps.select(col("doc_id"), col("sig"),
        explode(array((0 until chunks).map { c =>
          struct(lit(c).as("band"),
            // The mask drops the arithmetic shift's sign extension.
            shiftright(col("sig"), c * chunkBits).bitwiseAND(mask).as("ckey"))
        }: _*)).as("bk"))
        .select(col("doc_id"), col("sig"),
          col("bk.band").as("band"), col("bk.ckey").as("ckey"))
      banded.as("a")
        .join(banded.as("b"), Seq("band", "ckey"))
        .where(col("a.doc_id") < col("b.doc_id"))
        .select(
          col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
        .where(col("hamming") <= maxHamming)
        .distinct()
    }
  }

  /** Fixture-scale SimHash instance (32-bit, byte chunks, ham ≤ 6),
    * shared by q_dedup_simhash and `SimHashSpec`. See the width rule on
    * [[SimHashSketch]] for why production corpora need 64/3. */
  object SimHash extends SimHashSketch(32, 4, 6)

  /** q_dedup_simhash (T) — SimHash near-dup pairs (hamming ≤ 6 of 32).
    * Engine-specific hashing ⇒ no DuckDB twin; `SimHashSpec` pins
    * identical-doc zero distance, near-dup recall and disjoint rejection. */
  val qDedupSimhash: Q = Q(
    "q_dedup_simhash",
    (s, dir) => {
      import s.implicits._
      SimHash.nearPairs(Tables.documents(s, dir).select($"doc_id", $"text"))
        .orderBy($"doc_a", $"doc_b")
    })

  /** q_dedup_pipeline — the end-to-end keep-list a training-data pipeline
    * actually ships: a document survives iff (a) it is the smallest
    * doc_id among its exact duplicates (md5 group) and (b) no
    * smaller-id near-duplicate exists (prefix-key candidate with 3-gram
    * Jaccard ≥ 0.5 — #50's bucketing + q_dedup_ngram_jaccard's verify).
    * Composes the dedup family into one decision, oracle-checked.
    *
    * Scale: rule (a) is one partial-aggregated shuffle on md5; rule (b)
    * reuses the bucketed candidate join (never all-pairs) and the
    * loser set is the distinct doc_b side — an anti join back against
    * the corpus. Three shuffles total, all keyed, no driver state. */
  val qDedupPipeline: Q = Q(
    "q_dedup_pipeline",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val exactKeep = docs
        .groupBy(md5($"text").as("h"))
        .agg(min($"doc_id").as("doc_id"))
        .select($"doc_id")
      val keyed = docs
        .withColumn("w", split(lower($"text"), " "))
        .select(
          substring(lower($"text"), 1, 40).as("k"),
          $"doc_id",
          array_distinct(Shingles.of("w")).as("sh"))
      val nearLosers = keyed.as("a")
        .join(keyed.as("b"),
          col("a.k") === col("b.k") && col("a.doc_id") < col("b.doc_id"))
        .select(
          col("b.doc_id").as("doc_b"),
          size(array_intersect(col("a.sh"), col("b.sh"))).cast(DoubleType)
            .as("ni"),
          (size(col("a.sh")) + size(col("b.sh"))).cast(DoubleType).as("nab"))
        .where(round($"ni" / ($"nab" - $"ni"), 6) >= 0.5)
        .select($"doc_b".as("doc_id"))
        .distinct()
      exactKeep
        .join(nearLosers, Seq("doc_id"), "left_anti")
        .orderBy($"doc_id")
    },
    oracle = Some(
      s"""WITH keyed AS (
         |  SELECT doc_id, md5(text) AS h, substring(lower(text), 1, 40) AS k,
         |    list_distinct(${Shingles.sql("string_split(lower(text), ' ')")}) AS sh
         |  FROM documents),
         |exact_keep AS (SELECT MIN(doc_id) AS doc_id FROM keyed GROUP BY h),
         |near_losers AS (
         |  SELECT DISTINCT b.doc_id FROM keyed a JOIN keyed b
         |    ON a.k = b.k AND a.doc_id < b.doc_id
         |  WHERE ROUND(
         |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |    (CAST(len(a.sh) + len(b.sh) AS DOUBLE) - len(list_intersect(a.sh, b.sh))),
         |    6) >= 0.5)
         |SELECT doc_id FROM exact_keep
         |WHERE doc_id NOT IN (SELECT doc_id FROM near_losers)
         |ORDER BY doc_id""".stripMargin))

  val all: Vector[Q] = Vector(
    qDedupExact, qDedupNear, qDedupMinhash, qDedupNgramJaccard, qDedupSimhash,
    qDedupPipeline)
}
