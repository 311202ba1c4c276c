package graft

import org.scalatest.funsuite.AnyFunSuite

/** Determinism audit (SURVEY.md §5 item 5): every oracle query must be
  * byte-identical under different shuffle partitioning — catches ORDER BY
  * without a unique key and float-summation-order drift before the driver
  * does. (shuffle.partitions is runtime-mutable, so one shared session
  * serves both runs.) */
class DeterminismSpec extends AnyFunSuite with SparkFixture {

  Catalog.all.filter(_.oracle.isDefined).foreach { q =>
    test(s"${q.name} identical at shuffle.partitions 4 vs 7") {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val a = q.build(spark, sfDir).collect().toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = q.build(spark, sfDir).collect().toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      assert(a == b)
    }
  }
}
