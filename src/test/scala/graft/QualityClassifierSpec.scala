package graft

import graft.operators.{QualityClassifier, TextQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Trained quality classifier: exact-integer-gradient determinism,
  * separation on planted labels, and agreement with the hand-weighted
  * heuristic on extreme documents. */
class QualityClassifierSpec extends AnyFunSuite with SparkFixture {

  private def labeledFixture = QualityClassifier.Models.labeled(spark, sfDir)

  test("training is bit-identical under different partitionings") {
    // The gradient is a sum of per-row Long micro-units — EXACT, so
    // unlike a float sum there is nothing partitioning can reorder.
    val base = labeledFixture
    val a = QualityClassifier.train(base.repartition(7), iters = 3)
    val b = QualityClassifier.train(base.repartition(2), iters = 3)
    val c = QualityClassifier.train(base.coalesce(1), iters = 3)
    assert(a.w == b.w && b.w == c.w,
      s"weights drifted across partitionings: ${a.w} vs ${b.w} vs ${c.w}")
  }

  test("planted separable labels are fully separated") {
    import spark.implicits._
    // Two well-separated clusters in feature space, 24 rows each with
    // deterministic jitter; a working trainer must classify all 48.
    val rows = (0 until 24).flatMap { i =>
      val j = (i % 7) / 100.0
      Seq((0.85 + j / 2, 0.05 + j, 1.0, 1), // rich, low-stop, long → keep
        (0.25 + j, 0.55 + j, 0.2, 0))       // repetitive, stoppy, short
    }
    val df = rows.toDF("f_distinct", "f_stop", "f_len", "label")
    val m = QualityClassifier.train(df)
    val got = df.withColumn("p", m.pred)
      .where(col("p") =!= col("label")).count()
    assert(got == 0, s"$got of 48 planted rows misclassified (w=${m.w})")
  }

  test("trained model agrees with the heuristic gate on extreme docs") {
    val q = Catalog.byName("q_quality_classifier")
    val out = q.build(spark, sfDir)
    // Join the model's verdicts with the heuristic quality score, then
    // look at the 20 clearest keeps and 20 clearest rejects by the
    // heuristic's own composite — a model trained on the gate's labels
    // must reproduce the gate where the gate is most confident.
    val scored = QualityClassifier.withFeatures(
      TextQueries.QualityScore.fromTokens(TextQueries.Tokenized(spark, sfDir)))
      .select(col("doc_id"), col("quality"),
        TextQueries.QualityScore.keep.cast("int").as("heur"))
    val joined = out.join(scored, "doc_id")
    val topKeeps = joined.where(col("heur") === 1)
      .orderBy(col("quality").desc, col("doc_id")).limit(20)
    val botRejects = joined.where(col("heur") === 0)
      .orderBy(col("quality").asc, col("doc_id")).limit(20)
    assert(topKeeps.where(col("keep_pred") =!= 1).count() == 0,
      "model rejects a top-confidence heuristic keep")
    assert(botRejects.where(col("keep_pred") =!= 0).count() == 0,
      "model keeps a bottom-confidence heuristic reject")
  }

  test("catalog row: one row per doc, probabilities in (0,1), deterministic") {
    val q = Catalog.byName("q_quality_classifier")
    val rows = q.build(spark, sfDir).collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      val p = r.getDouble(1)
      assert(p > 0.0 && p < 1.0, s"degenerate probability $p")
      assert(r.getInt(2) == (if (p >= 0.5) 1 else 0), "pred must match prob")
    }
    val again = q.build(spark, sfDir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("the labeled split is the documented md5 gate (~40%), non-degenerate") {
    val lab = labeledFixture
    val n = lab.count().toDouble
    val total = Tables.documents(spark, sfDir).count().toDouble
    assert(n / total > 0.25 && n / total < 0.55,
      s"gate kept ${n / total} of the corpus; expected ~0.40")
    val pos = lab.where(col("label") === 1).count()
    assert(pos > 0 && pos < n, "labels must contain both classes")
  }

  test("streamed model scoring matches its batch twin on closed windows") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(minutes: Long) =
      java.sql.Timestamp.valueOf(java.time.LocalDateTime
        .of(2024, 1, 1, 0, 0).plusMinutes(minutes))
    // Hand-set weights so the test controls the decisions: rich text
    // (f_distinct 1, f_stop 0, f_len 0.5) → margin +2 → keep;
    // stopword flood (f_distinct 1/30, f_stop 1, f_len 0.6) → ~-3.7 →
    // reject. The heuristic agrees on the first, rejects the second,
    // and ALSO rejects the short third (token band), where the model
    // keeps — the divergence column the row exists to surface.
    val m = operators.QualityClassifier.Model(Seq(-3.0, 4.0, -2.0, 2.0))
    val keepText = (1 to 25).map(i => s"word$i").mkString(" ")
    val stopText = Seq.fill(30)("the").mkString(" ")
    val shortText = (1 to 10).map(i => s"tiny$i").mkString(" ")
    val hour0 = Seq(
      (0L, ts(5), "en", keepText),
      (1L, ts(15), "en", shortText),
      (2L, ts(25), "de", stopText))
    val input = MemoryStream[(Long, java.sql.Timestamp, String, String)]
    val df = graft.streaming.StreamingQueries.modelScore(
      input.toDF().toDF("doc_id", "ts", "lang", "text"), m)
    val q = df.writeStream.format("memory").queryName("sms")
      .outputMode("append").start()
    try {
      input.addData(hour0)
      q.processAllAvailable()
      input.addData((9L, ts(125), "en", keepText)) // close hour 0
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sms").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // en: keepText model-keep + heur-keep; shortText model-keep (f_len
    // 10/50 → margin -3+4-0+0.4 = +1.4) but heuristic-reject (under
    // the 20-token band). de: stopText both reject.
    assert(got == Set(("en", 2L, 2L, 1L), ("de", 1L, 0L, 0L)),
      s"hour-0 closed windows wrong: $got")
    val batch = graft.streaming.StreamingQueries.modelScore(
        hour0.toDF("doc_id", "ts", "lang", "text"), m)
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == batch, "stream and batch twins diverged")
  }

  test("catalog stream row lands model-vs-heuristic counts per window") {
    val rows = Catalog.byName("q_stream_model_score").build(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (total, mk, hk) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(mk <= total && hk <= total)
    }
  }

  test("scoring is a narrow expression (no shuffle, no UDF)") {
    val m = QualityClassifier.Models(spark, sfDir)
    val scored = QualityClassifier.withFeatures(
      TextQueries.QualityScore.fromTokens(TextQueries.Tokenized(spark, sfDir)))
      .select(col("doc_id"), m.prob.as("p"))
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      "scoring must stay codegen-friendly")
  }
}
