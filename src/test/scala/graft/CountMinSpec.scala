package graft

import graft.functions.CountMin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-Min sketch: no DuckDB twin exists for the hash state, so the
  * contract is the structure's own guarantees, pinned deterministically
  * on the fixture: one-sided overcount, the e·N/w error bound, EXACT
  * mergeability (entrywise add — stronger than HLL's near-identity),
  * JVM/Column hash parity, and partitioning-invariance. */
class CountMinSpec extends AnyFunSuite with SparkFixture {
  import CountMin._

  private lazy val events = Tables.events(spark, sfDir)
  private lazy val sketch = Sketches(spark, sfDir)

  private def estimateJvm(sk: Array[Long], x: Long): Long =
    (0 until depth).map(i => sk(i * width + bucket(x, i))).min

  test("JVM bucket() and the Column estimate path agree on every fixture key") {
    import spark.implicits._
    // The aggregator writes through bucket(); readers go through
    // xxhash64 Columns. If the two hash paths ever diverge the sketch
    // silently answers garbage — pin parity over the whole key domain.
    val viaColumn = events.select($"user_id").distinct()
      .withColumn("est", estimate($"user_id", sketch))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    viaColumn.foreach { case (u, est) =>
      assert(est == estimateJvm(sketch, u),
        s"hash-path divergence for user $u")
    }
  }

  test("every estimate is a one-sided overcount within e*N/w of the truth") {
    import spark.implicits._
    val exact = events.groupBy($"user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    // Per-query bound e*N/w holds w.p. 1 - e^-depth ~ 98%; on the fixed
    // fixture + fixed seeds the outcome is deterministic, so assert it
    // for EVERY key (if a seed change ever pushes one key over, the
    // bound ceiling below has ~2x slack before the test lies).
    val bound = math.ceil(math.E * n / width).toLong
    exact.foreach { case (u, true_n) =>
      val est = estimateJvm(sketch, u)
      assert(est >= true_n, s"undercount for user $u: $est < $true_n")
      assert(est - true_n <= bound,
        s"user $u overcount ${est - true_n} exceeds e*N/w = $bound")
    }
  }

  test("union of per-day sketches equals the whole-table sketch EXACTLY") {
    import spark.implicits._
    // Entrywise-add merge is lossless — this is the property that lets
    // a 100 TB pipeline store per-partition/per-day sketch tables and
    // answer corpus-wide frequency queries without re-scanning.
    val perDay = events
      .select(date_trunc("day", $"ts").as("d"), $"user_id")
      .as[(java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(Sketch.toColumn)
      .collect().map(_._2)
    assert(perDay.length > 1, "need multiple days for a meaningful union")
    val merged = perDay.reduce { (a, b) =>
      val out = a.clone()
      var i = 0; while (i < out.length) { out(i) += b(i); i += 1 }
      out
    }
    assert(merged.sameElements(sketch),
      "union-of-parts must equal sketch-of-whole bit-for-bit")
  }

  test("sketch is invariant to partitioning") {
    import spark.implicits._
    val again = events.select($"user_id").as[Long]
      .repartition(7)
      .select(Sketch.toColumn).head()
    assert(again.sameElements(sketch))
  }

  test("streamed sketch equals the batch sketch bit-for-bit, and the rows agree") {
    // Exact mergeability is what makes the incremental sketch-table
    // pattern sound: however the stream was micro-batched, folding the
    // batches must land on the very counters one batch pass produces.
    val streamed = graft.streaming.StreamingQueries.Replay
      .run(spark, sfDir, "countmin_spec", "complete")(streamFold)
      .head().getSeq[Long](1).toArray
    assert(streamed.sameElements(sketch),
      "stream-folded sketch must equal the batch sketch exactly")
    val a = Catalog.byName("q_stream_countmin").build(spark, sfDir)
      .collect().map(_.toSeq)
    val b = Catalog.byName("q_agg_countmin").build(spark, sfDir)
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq,
      "streamed and batch top-10 frequency answers must agree")
  }

  test("catalog row: top-10 rows, overcount >= 0, est column consistent") {
    val rows = Catalog.byName("q_agg_countmin").build(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L, s"negative overcount in $r")
      assert(r.getLong(2) == estimateJvm(sketch, r.getLong(0)))
    }
  }
}
