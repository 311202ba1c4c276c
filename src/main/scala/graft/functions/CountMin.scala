package graft.functions

import org.apache.spark.sql.{Column, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min sketch — the frequency-estimation member of the mergeable-
  * sketch family (HLL counts distincts, Space-Saving finds the heavy
  * hitters, t-digest does quantiles; Count-Min answers "how often did
  * THIS key occur" for any key, in O(d·w) state independent of the key
  * universe). Cormode & Muthukrishnan's structure: d hash rows of w
  * counters; increment one counter per row on ingest, read back the MIN
  * over rows — every estimate is an OVERCOUNT (one-sided: est ≥ true),
  * and est ≤ true + e·N/w with probability 1 − e^−d per query.
  *
  * Scale notes (100 TB): the buffer is d×w longs (32 KiB here) —
  * partial aggregation ships ONE buffer per partition per group across
  * the shuffle, never the keys; merge is entrywise add, which makes the
  * sketch EXACTLY mergeable (unlike HLL's mode-transition near-identity
  * — CountMinSpec pins bit equality of union-of-parts vs
  * sketch-of-whole). The trained sketch is then MODEL STATE: 4k
  * counters broadcast as a literal, and the estimate reads back as a
  * native Column (element_at + xxhash64 + least — zero UDFs, fully
  * codegen'd), the same literal-lookup pattern as PQ's ADC LUTs.
  *
  * Hash parity contract: [[bucket]] (JVM-side, used by the aggregator)
  * and [[estimate]] (Column-side, used by readers) must agree for every
  * key. Spark's `xxhash64(col, lit(seed))` folds left with seed 42:
  * h = XXH64.hashLong(seedLit, XXH64.hashLong(key, 42)) — bucket()
  * replicates exactly that, and CountMinSpec pins the parity on the
  * full fixture key domain. */
object CountMin {
  val depth = 4
  val width = 1024
  /** Row-seed constants (arbitrary, fixed — golden-ratio/Murmur mixing
    * constants; any distinct values work, but they are part of the
    * sketch's identity: two sketches merge ONLY if seeds match). */
  val seeds: Seq[Long] =
    Seq(0x9e3779b9L, 0x85ebca6bL, 0xc2b2ae35L, 0x27d4eb2fL)

  /** JVM-side row-i bucket of key x; MUST mirror the Column path in
    * [[estimate]] (see hash parity contract above). */
  def bucket(x: Long, i: Int): Int = {
    val h = XXH64.hashLong(seeds(i), XXH64.hashLong(x, 42L))
    (((h % width) + width) % width).toInt
  }

  /** The sketch as a typed Aggregator: buffer = d×w counters, reduce =
    * d increments, merge = entrywise add (map-side partial agg ships
    * one buffer per partition — see scale notes). */
  object Sketch extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](depth * width)
    override def reduce(b: Array[Long], x: Long): Array[Long] = {
      var i = 0
      while (i < depth) { b(i * width + bucket(x, i)) += 1L; i += 1 }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Point-estimate Column for `key` against a materialized sketch:
    * min over rows of the hashed counter, as native expressions over
    * row literals — codegen'd, no UDF, usable in any downstream plan. */
  def estimate(key: Column, sk: Array[Long]): Column = {
    require(sk.length == depth * width,
      s"sketch must be $depth x $width, got ${sk.length}")
    least((0 until depth).map { i =>
      element_at(
        typedLit(sk.slice(i * width, (i + 1) * width).toSeq),
        (pmod(xxhash64(key, lit(seeds(i))), lit(width.toLong)) + 1L)
          .cast("int"))
    }: _*)
  }

  /** The user-frequency sketch over events per (session, sfDir) —
    * MODEL STATE like PQ codebooks: built once (one partial-aggregated
    * pass, d×w longs collected), read by every estimate. */
  object Sketches {
    private val cache =
      new graft.Memo[(SparkSession, String), Array[Long]]

    def apply(s: SparkSession, dir: String): Array[Long] =
      cache((s, dir)) {
        import s.implicits._
        graft.Tables.events(s, dir)
          .select($"user_id").as[Long]
          .select(Sketch.toColumn).head()
      }
  }

  /** The shared readback: top-10 users by exact count, with the
    * sketch's estimate and the (always ≥ 0) overcount. ONE definition
    * consumed by both the batch and streaming rows — CountMinSpec pins
    * their row-level agreement, and a tiebreak/limit edit applied to
    * only one of them would fail that pin for a reason unrelated to
    * sketch semantics. */
  def topFreq(s: SparkSession, dir: String, sk: Array[Long])
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    graft.Tables.events(s, dir)
      .groupBy($"user_id").agg(count(lit(1)).as("n_exact"))
      .orderBy($"n_exact".desc, $"user_id")
      .limit(10)
      .withColumn("n_est", estimate($"user_id", sk))
      .withColumn("overcount", $"n_est" - $"n_exact")
      .orderBy($"n_exact".desc, $"user_id")
  }

  /** The stream-side fold: every micro-batch's keys into ONE sketch
    * buffer (single-group typed agg — partial buffers merge map-side).
    * Shared by q_stream_countmin and CountMinSpec's equality pin. */
  def streamFold(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col("user_id")).as[Long]
      .groupByKey(_ => 0)
      .agg(Sketch.toColumn.name("sk"))
      .toDF("g", "sk")
  }

  /** q_agg_countmin (T) — the sketch answering the canonical question
    * (see [[topFreq]]). Engine-specific hash state ⇒ no DuckDB oracle;
    * CountMinSpec pins the one-sided guarantee and the e·N/w error
    * bound over the WHOLE key domain, exact mergeability, hash parity,
    * and partitioning-invariance. */
  val qAggCountmin: graft.Q = graft.Q(
    "q_agg_countmin",
    (s, dir) => topFreq(s, dir, Sketches(s, dir)))
}
