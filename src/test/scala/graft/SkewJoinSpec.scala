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

  // (A former test re-derived the salt expression inline and asserted
  // its own copy of the formula — deleted: the partition-histogram test
  // below exercises the REAL saltedInnerJoin path and is the actual
  // spread proof.)

  test("salting beats the naive plan: hot-key partition histogram flattens") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // The q_join_skew_salted corpus shape: 90% of fact rows on hot key
    // 0. Compare the post-join row distribution across shuffle
    // partitions (AQE's skew split won't trigger at KB scale, so the
    // naive join shows the raw hash-partition concentration a 100 TB
    // run would suffer).
    val fact = Tables.events(spark, sfDir).select(
      when(pmod($"user_id", lit(10)) < 9, 0L).otherwise($"user_id").as("k"),
      $"event_id")
    val dim = fact.select($"k").distinct()
      .withColumn("label", concat(lit("u"), $"k"))

    def maxPartitionShare(df: org.apache.spark.sql.DataFrame): Double = {
      val sizes = df.groupBy(spark_partition_id()).count()
        .collect().map(_.getLong(1))
      sizes.max.toDouble / sizes.sum
    }

    // AQE's partition coalescing folds these KB-sized shuffles into one
    // partition either way, hiding the histogram this test measures —
    // scope it off so spark_partition_id reflects the hash distribution
    // a full-sized shuffle would have.
    // 32 shuffle partitions (the fixture default of 4 puts the ideal
    // salted share at 0.25 — too coarse to separate from naive).
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val shuffleKey = "spark.sql.shuffle.partitions"
    val prior = spark.conf.getOption(coalesceKey)
    val priorShuffle = spark.conf.getOption(shuffleKey)
    spark.conf.set(coalesceKey, "false")
    spark.conf.set(shuffleKey, "32")
    try {
      val naive = maxPartitionShare(
        fact.join(dim.hint("shuffle_hash"), Seq("k")))
      val salted = maxPartitionShare(
        SkewJoin.saltedInnerJoin(fact, dim.hint("shuffle_hash"), "k", 16,
          Seq("event_id")))
      info(f"max partition share: naive $naive%.3f salted $salted%.3f")
      assert(naive > 0.5, "corpus must actually be skewed for this test")
      assert(salted < naive / 4,
        f"salting must spread the hot key: naive $naive%.3f salted $salted%.3f")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(coalesceKey, v)
        case None    => spark.conf.unset(coalesceKey)
      }
      priorShuffle match {
        case Some(v) => spark.conf.set(shuffleKey, v)
        case None    => spark.conf.unset(shuffleKey)
      }
    }
  }

  test("q_join_skew_salted catalog row equals its plain-join twin in-engine") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val fact = Tables.events(spark, sfDir).select(
      when(pmod($"user_id", lit(10)) < 9, 0L).otherwise($"user_id").as("k"),
      $"event_id")
    val dim = fact.select($"k").distinct()
      .withColumn("label", concat(lit("u"), $"k"))
    val plain = fact.join(dim, Seq("k"))
      .groupBy($"label").agg(count(lit(1)).as("n_events"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaCatalog = Catalog.byName("q_join_skew_salted").build(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaCatalog == plain)
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
