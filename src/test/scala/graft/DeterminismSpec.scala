package graft

import org.scalatest.funsuite.AnyFunSuite

/** Determinism audit (SURVEY.md §5 item 5): every oracle query must be
  * byte-identical under different shuffle partitioning — catches ORDER BY
  * without a unique key and float-summation-order drift before the driver
  * does. (shuffle.partitions is runtime-mutable, so one shared session
  * serves both runs.) */
class DeterminismSpec extends AnyFunSuite with SparkFixture {

  /** Run body at partitions 7, always restoring the fixture default —
    * an exception at 7 must not leak the setting into later suites.
    * The streaming replay override (spark.graft.replay.shufflePartitions)
    * is varied IN LOCKSTEP: Replay.run re-pins shuffle partitions for
    * its state stores, and without this the sweep would silently run
    * every q_stream_* row at the same fixed layout twice. */
  private val replayKey = "spark.graft.replay.shufflePartitions"
  private def at4[A](body: => A): A = {
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set(replayKey, "4")
    try body finally spark.conf.unset(replayKey)
  }
  private def at7[A](body: => A): A =
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      spark.conf.set(replayKey, "7")
      body
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      spark.conf.unset(replayKey)
    }

  Catalog.all.filter(_.oracle.isDefined).foreach { q =>
    test(s"${q.name} identical at shuffle.partitions 4 vs 7") {
      val a = at4(q.build(spark, sfDir).collect().toSeq)
      val b = at7(q.build(spark, sfDir).collect().toSeq)
      assert(a == b)
    }
  }

  // T-rows have no DuckDB twin but every one is built on seeded hashes /
  // deterministic state, so their RESULT SETS must also be partition-
  // invariant (row order exempt — T-rows aren't hash-compared by the
  // driver). Streaming replays re-run the whole AvailableNow pipeline
  // per build, so this additionally pins replay reproducibility.
  //
  // Exception: rows whose CONTRACT is an error bound rather than a value.
  // The t-digest (percentile_approx) is measured partition-DEPENDENT —
  // merge order shifts centroid representatives — and only guarantees
  // rank error; ApproxPercentileSpec asserts that bracket per layout
  // instead. (HLL stays in the sweep: its merge is a commutative
  // register-max, hence invariant.)
  private val errorBoundContract = Set("q_agg_approx_percentile")
  Catalog.all.filter(q => q.oracle.isEmpty && !errorBoundContract(q.name))
    .foreach { q =>
    test(s"${q.name} (T) same result set at shuffle.partitions 4 vs 7") {
      val a = at4(q.build(spark, sfDir).collect().map(_.toString).sorted.toSeq)
      val b = at7(q.build(spark, sfDir).collect().map(_.toString).sorted.toSeq)
      assert(a == b)
    }
  }
}
