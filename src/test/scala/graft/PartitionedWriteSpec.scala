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
}
