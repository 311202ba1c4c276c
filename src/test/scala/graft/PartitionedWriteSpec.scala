package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB write path (SURVEY.md §7 note (a)): production tables are
  * date-partitioned directories, written with partitionBy — `coalesce(1)`
  * belongs only to the Verify harness. This spec proves the partitioned
  * write/read loop and that partition pruning actually reaches the scan. */
class PartitionedWriteSpec extends AnyFunSuite with SparkFixture {

  test("partitionBy(year) write → filtered read prunes partitions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_part").toString
    val li = Tables.lineitem(spark, sfDir)
      .withColumn("ship_year", year($"l_shipdate"))
    li.write.mode("overwrite").partitionBy("ship_year").parquet(dir)

    // one directory per year
    val years = li.select($"ship_year").distinct().as[Int].collect().sorted
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("ship_year=")).map(_.getName).sorted
    assert(dirs.toSeq == years.map(y => s"ship_year=$y").toSeq)

    val filtered = spark.read.parquet(dir).where($"ship_year" === years.head)
    // pruning must reach the scan as a PartitionFilter, not a data filter
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(ship_year"),
      s"expected partition pruning in:\n$plan")
    // and the data must round-trip exactly
    val want = li.where($"ship_year" === years.head).count()
    assert(filtered.count() == want)
  }

  test("dynamic partition pruning fires on a dim-filtered partition join") {
    // SURVEY §7 note (b): date-partitioned facts exist FOR dynamic
    // partition pruning — the fact's partition filter is only knowable
    // at runtime from the dim side's predicate, and DPP injects it into
    // the scan as a dynamicpruning subquery (fed by the reused broadcast
    // exchange). At 100 TB this is the difference between scanning one
    // year and scanning the decade.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dpp").toString
    Tables.lineitem(spark, sfDir)
      .withColumn("ship_year", year($"l_shipdate"))
      .write.mode("overwrite").partitionBy("ship_year").parquet(dir)
    val fact = spark.read.parquet(dir)
    val years = fact.select($"ship_year").distinct().as[Int].collect().sorted

    // Dim carries the filter; the fact predicate on ship_year is only
    // derivable THROUGH the join. The dim must be file-backed: a
    // LocalRelation dim gets its Filter constant-folded away by
    // ConvertToLocalRelation before the PartitionPruning rule looks for
    // a selective predicate, and DPP never fires (real dims are tables).
    val dimDir = Files.createTempDirectory("graft_dpp_dim").toString
    years.map(y => (y, if (y == years.max) "target" else "rest"))
      .toSeq.toDF("y", "tag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)

    // AQE scoped OFF for the metric inspection: under AQE the fact scan
    // sits inside QueryStageExec wrappers that plan.collect doesn't
    // traverse (and AdaptiveSparkPlanExec is itself a leaf), so the
    // numPartitions check would be dead code — the exact bug this
    // version of the test replaces. DPP is an optimizer-rule feature
    // and fires identically without AQE.
    val aqeKey = "spark.sql.adaptive.enabled"
    val prior = spark.conf.getOption(aqeKey)
    spark.conf.set(aqeKey, "false")
    try {
      val joined = fact.join(dim, $"ship_year" === $"y")
        .where($"tag" === "target")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"expected a dynamicpruning partition filter on the fact scan:\n$plan")

      // The pruning must be REAL, not just present in the plan string:
      // execute THIS DataFrame's plan (collect — count() would build a
      // separate QueryExecution whose metrics we'd never see) and read
      // the fact scan's partition-count metric.
      val got = joined.collect().length.toLong
      val want = fact.where($"ship_year" === years.max).count()
      assert(got == want)
      val factScan = joined.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.partitionFilters.nonEmpty => f
      }
      assert(factScan.nonEmpty, "expected a partition-filtered fact scan")
      val m = factScan.head.metrics("numPartitions")
      assert(m.value == 1,
        s"DPP should scan 1 of ${years.length} partitions, read ${m.value}")
    } finally prior match {
      case Some(v) => spark.conf.set(aqeKey, v)
      case None    => spark.conf.unset(aqeKey)
    }
  }

  test("bucketed tables merge-join with ZERO exchanges (co-located join)") {
    // SURVEY §2.3 scale notes: pre-bucketing both sides of a recurring
    // fact⋈fact join on the join key removes the shuffle entirely — at
    // 100 TB this converts every downstream join on that key from a
    // full-network exchange into local merges. Buckets land as external
    // tables (in-memory session catalog, data under /tmp); the merge
    // hint keeps the demonstration on the SMJ path a fact⋈fact join
    // would take (broadcast would trivially avoid exchanges).
    import spark.implicits._
    val d1 = Files.createTempDirectory("graft_bkt_o").toString
    val d2 = Files.createTempDirectory("graft_bkt_c").toString
    try {
      Tables.orders(spark, sfDir)
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", d1).mode("overwrite").saveAsTable("b_orders")
      Tables.customer(spark, sfDir)
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", d2).mode("overwrite").saveAsTable("b_customer")
      val joined = spark.table("b_orders").hint("merge")
        .join(spark.table("b_customer"), $"o_custkey" === $"c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed-on-key join must not shuffle either side:\n$plan")
      assert(plan.contains("SelectedBucketsCount"),
        "scan must be bucket-aware")
      // Equality with the plain (shuffling) join.
      val want = Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
        .count()
      assert(joined.count() == want)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
