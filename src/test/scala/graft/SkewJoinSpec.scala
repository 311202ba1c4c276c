package graft

import graft.operators.SkewJoin
import org.scalatest.funsuite.AnyFunSuite

/** Salted skew join: must be row-for-row equivalent to the plain inner
  * join while spreading a hot key across n shuffle partitions. */
class SkewJoinSpec extends AnyFunSuite with SparkFixture {

  test("salted join equals plain join on skewed synthetic data") {
    import spark.implicits._
    // 90% of fact rows share one hot key.
    val fact = (0 until 2000).map { i =>
      (if (i % 10 == 0) i.toLong % 7 else 42L, i.toLong, i * 1.5)
    }.toDF("k", "row_id", "v")
    val dim = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
      (3L, "d"), (4L, "e"), (5L, "f"), (6L, "g")).toDF("k", "name")

    val plain = fact.join(dim, "k")
      .select($"k", $"row_id", $"v", $"name")
      .collect().map(_.toString).sorted
    val salted = SkewJoin.saltedInnerJoin(fact, dim, "k", 8, Seq("row_id"))
      .select($"k", $"row_id", $"v", $"name")
      .collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("salting actually spreads the hot key across salts") {
    import spark.implicits._
    val fact = (0 until 1000).map(i => (42L, i.toLong)).toDF("k", "row_id")
    val salts = fact
      .withColumn("_salt",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.hash($"row_id"),
          org.apache.spark.sql.functions.lit(8)))
      .groupBy($"_salt").count().collect()
    assert(salts.length == 8, "all 8 salt values should be used")
    assert(salts.map(_.getLong(1)).max < 1000,
      "no single salt should hold the entire hot key")
  }

  test("salted join is deterministic across runs (no rand())") {
    import spark.implicits._
    val fact = (0 until 500).map(i => (i.toLong % 3, i.toLong)).toDF("k", "row_id")
    val dim = Seq((0L, "x"), (1L, "y"), (2L, "z")).toDF("k", "name")
    val a = SkewJoin.saltedInnerJoin(fact, dim, "k", 4, Seq("row_id"))
      .collect().map(_.toString).sorted.toSeq
    val b = SkewJoin.saltedInnerJoin(fact, dim, "k", 4, Seq("row_id"))
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
