package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization (PqQuantizer): no DuckDB twin exists for the
  * k-means state, so the contract is structural — reproducible codes,
  * compression that beats the trivial baseline, and ADC search that
  * recovers a meaningful share of the exact top-k. */
class PqSpec extends AnyFunSuite with SparkFixture {
  import operators.PqQuantizer

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val codebooks = PqQuantizer.Codebooks(spark, sfDir)
  private lazy val encoded = PqQuantizer.encode(emb, codebooks)

  test("codes are 32-bit-packed, one row per vector, deterministic across partitionings") {
    val rows = Catalog.byName("q_vec_pq").build(spark, sfDir).collect()
    assert(rows.length == emb.count())
    // 8 nibbles → the packed code fits in 32 bits.
    assert(rows.forall(r => r.getLong(1) >= 0L && r.getLong(1) < (1L << 32)))
    // Rebuild over a different physical layout: identical codes (the
    // codebook init is vec_id-ordered and means are rounded — nothing
    // may depend on partitioning).
    val again = PqQuantizer
      .encode(emb.repartition(3), codebooks)
      .select(col("vec_id"), col("code"), col("mse"))
      .orderBy(col("vec_id")).collect()
    assert(rows.map(_.toSeq.toList).toList == again.map(_.toSeq.toList).toList)
  }

  test("reconstruction beats the predict-the-mean baseline on every aggregate") {
    import spark.implicits._
    val meanMse = encoded.agg(avg($"mse")).as[Double].head()
    // Baseline: per-dim variance of the corpus = the MSE of predicting
    // every dim by its mean. PQ must do strictly better.
    val dimVar = emb
      .select(posexplode($"embedding").as(Seq("pos", "x")))
      .groupBy($"pos")
      .agg((avg($"x" * $"x") - avg($"x") * avg($"x")).as("v"))
      .agg(avg($"v")).as[Double].head()
    assert(meanMse > 0.0)
    assert(meanMse < dimVar,
      s"PQ mse $meanMse must beat per-dim variance $dimVar")
  }

  test("ADC top-k recovers a meaningful share of the exact top-k") {
    import spark.implicits._
    val probeId = 0L
    val probeVec = emb.where($"vec_id" === probeId)
      .select($"embedding").head().getSeq[Float](0).toArray
    val adc = PqQuantizer
      .adcSearch(encoded, codebooks, probeVec, probeId, topK = 10)
      .select($"vec_id").as[Long].collect().toSet
    val exact = emb
      .where($"vec_id" =!= probeId)
      .withColumn("_p", typedLit(probeVec.toSeq))
      .select($"vec_id", expr("vec_dot(embedding, _p)").as("sim"))
      .orderBy($"sim".desc, $"vec_id")
      .limit(10).select($"vec_id").as[Long].collect().toSet
    val recall = adc.intersect(exact).size / 10.0
    // 32-bit codes on 64-d near-random unit vectors: modest but real
    // signal expected; 0 overlap would mean the index carries nothing.
    assert(recall >= 0.2, s"ADC recall@10 = $recall")
  }

  test("adc scores approximate true dots: spearman-ish sign agreement on pairs") {
    import spark.implicits._
    val probeId = 1L
    val probeVec = emb.where($"vec_id" === probeId)
      .select($"embedding").head().getSeq[Float](0).toArray
    // Approximate scores for ALL candidates vs their true dots: on a
    // sample of pairs, the ADC ordering should agree with the true
    // ordering clearly more often than chance.
    val adcAll = PqQuantizer
      .adcSearch(encoded, codebooks, probeVec, probeId, topK = 100000)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val trueAll = emb.where($"vec_id" =!= probeId)
      .withColumn("_p", typedLit(probeVec.toSeq))
      .select($"vec_id", expr("vec_dot(embedding, _p)").as("sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ids = trueAll.keys.toArray.sorted
    val rnd = new scala.util.Random(11)
    val pairs = Array.fill(500)((ids(rnd.nextInt(ids.length)),
      ids(rnd.nextInt(ids.length)))).filter { case (a, b) => a != b }
    val agree = pairs.count { case (a, b) =>
      math.signum(adcAll(a) - adcAll(b)) ==
        math.signum(trueAll(a) - trueAll(b))
    }
    assert(agree.toDouble / pairs.length > 0.6,
      s"ADC ordering agreement ${agree.toDouble / pairs.length}")
  }
}
