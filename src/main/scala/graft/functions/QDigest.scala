package graft.functions

import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Q-digest — the QUANTILE member of the mergeable-sketch family
  * (HLL = distincts, Count-Min = frequencies, Space-Saving = heavy
  * hitters; q-digest answers "what value sits at rank p·N" in
  * O(k·log U) state). Shrivastava et al.'s structure over a BOUNDED
  * integer domain: counts attached to dyadic ranges of [0, U), with
  * every stored range guaranteed ≤ ⌈N/k⌉ weight unless it is a leaf,
  * giving rank error ≤ log₂(U)·N/k for any quantile query.
  *
  * Why q-digest and not t-digest here: t-digest's centroids depend on
  * MERGE ORDER, so two runs with different partitionings produce
  * different (both valid) sketches — which violates this engine's
  * bit-determinism contract (SURVEY.md §2 rules; DeterminismSpec runs
  * every row under two shuffle widths). On a bounded integer domain —
  * and every money metric here is exact integer cents under 2¹⁵ — the
  * mergeable state can be the EXACT sparse histogram (the same
  * value-domain-bounded argument as StatTestQueries.centsLadder), and
  * the q-digest compression runs ONCE at finish as a pure function of
  * that histogram: bit-identical under any partitioning, and union-of-
  * parts ≡ sketch-of-whole EXACTLY (entrywise histogram add commutes).
  *
  * Scale (100 TB): the buffer is U = 2¹⁷ longs (1 MiB) — one buffer
  * per partition per group crosses the shuffle, never the rows (the
  * Count-Min shipping argument); for a wider domain the leaf level
  * coarsens first (range-binned cents), trading leaf resolution, not
  * the algorithm. The compressed digest is bounded model state
  * (≤ 3k nodes — QDigestSpec pins the bound), broadcastable as
  * literals like the PQ LUTs.
  */
object QDigest {
  /** Domain: exact integer cents in [0, 2^17). The profiled max GROWS
    * with corpus size (32753 cents at sf0.001, 49002 at sf0.01, 56021
    * at sf0.1 — FIXTURES.md's table is the sf0.001 profile), so the
    * domain is sized with headroom above the largest fixture, not at
    * it. Ingest still REJECTS out-of-domain values loudly rather than
    * clamping (a clamp would silently bias p99). */
  val bits = 17
  val U = 1 << bits // 131072

  /** Compression: nodes above leaf level keep ≤ ceil(N/k) weight.
    * Rank error ≤ bits * N / k ≈ 6.6% of N at k = 256. */
  val k = 256

  /** Histogram-fold Aggregator: buffer = exact dense histogram.
    * reduce = one increment; merge = entrywise add (exact, commutative,
    * associative ⇒ partitioning-invariant by construction). */
  object Hist extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](U)
    override def reduce(b: Array[Long], x: Long): Array[Long] = {
      require(x >= 0 && x < U, s"q-digest domain is [0,$U): got $x")
      b(x.toInt) += 1L
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < U) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** One digest node: dyadic range [lo, hi] (inclusive) with weight. */
  final case class Node(lo: Int, hi: Int, count: Long)

  /** Deterministic q-digest compression of an exact histogram: walk
    * levels bottom-up in increasing node order; an internal node
    * absorbs its two children when the combined weight fits under the
    * threshold. Pure function of the histogram ⇒ one canonical digest
    * per multiset of values. */
  def compress(hist: Array[Long]): Vector[Node] = {
    require(hist.length == U)
    val n = hist.sum
    if (n == 0) return Vector.empty
    val threshold = (n + k - 1) / k // ceil(N/k) >= 1
    // level 0 = leaves (width 1) ... level `bits` = root (width U)
    var current = hist.clone() // weight sitting at each node of level L
    val out = Vector.newBuilder[Node]
    var level = 0
    while (level < bits) {
      val width = 1 << level
      val half = current.length / 2
      val next = new Array[Long](half)
      var i = 0
      while (i < half) {
        val combined = current(2 * i) + current(2 * i + 1)
        if (combined <= threshold) {
          // absorb both children upward (zero weight propagates free)
          next(i) = combined
        } else {
          // children are emitted where they stand; parent starts empty
          if (current(2 * i) > 0)
            out += Node(2 * i * width, (2 * i + 1) * width - 1,
              current(2 * i))
          if (current(2 * i + 1) > 0)
            out += Node((2 * i + 1) * width, (2 * i + 2) * width - 1,
              current(2 * i + 1))
          next(i) = 0L
        }
        i += 1
      }
      current = next
      level += 1
    }
    if (current(0) > 0) out += Node(0, U - 1, current(0))
    out.result().sortBy(nd => (nd.hi, nd.lo))
  }

  /** Rank-p·N query: canonical q-digest readout — nodes in (hi, lo)
    * order, accumulate weights, report the hi of the node where the
    * target rank lands. Deterministic; over-approximates by at most
    * the node width, rank error bounded by bits·N/k. */
  def quantile(digest: Vector[Node], n: Long, pPpm: Long): Long = {
    require(digest.nonEmpty,
      "quantile of an empty digest — guard n == 0 at the call site")
    val target = math.max(1L, pPpm * n / 1000000L)
    var acc = 0L
    var i = 0
    while (i < digest.length) {
      acc += digest(i).count
      if (acc >= target) return digest(i).hi.toLong
      i += 1
    }
    digest.last.hi.toLong
  }

  /** The purchase-cents digest per (session, dir) — bounded model
    * state under the codebook rule (≤ 3k nodes collected, never rows). */
  object Digests {
    private val cache =
      new graft.Memo[(SparkSession, String), (Vector[Node], Long)]

    def apply(s: SparkSession, dir: String): (Vector[Node], Long) =
      cache((s, dir)) {
        import s.implicits._
        val hist = graft.Tables.events(s, dir)
          .select((graft.Dsl.dec2($"value") * 100).cast("long"))
          .as[Long]
          .select(Hist.toColumn).head()
        (compress(hist), hist.sum)
      }
  }

  /** q_agg_qdigest (T) — p50/p90/p99 of event value from the digest,
    * beside the digest's size and the total count. Engine-specific
    * sketch state ⇒ no DuckDB oracle; QDigestSpec pins the rank-error
    * bound against exact order statistics, exact mergeability,
    * partitioning-invariance, node-count/weight bounds, the
    * domain-rejection guard, and the empty-input degenerate (zero
    * rows, like the WHERE-guarded degenerate cases elsewhere — a
    * quantile of nothing is no row, not an exception). */
  val qAggQdigest: graft.Q = graft.Q(
    "q_agg_qdigest",
    (s, dir) => {
      import s.implicits._
      val (digest, n) = Digests(s, dir)
      val rows =
        if (n == 0L) Seq.empty[(Long, Long, Long, Long)]
        else Seq(500000L, 900000L, 990000L)
          .map(p => (p / 10000L, quantile(digest, n, p),
            digest.length.toLong, n))
      rows.toDF("p_pct", "est_cents", "digest_nodes", "n")
    })
}
