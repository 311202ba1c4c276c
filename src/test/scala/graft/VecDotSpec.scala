package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom codegen'd vec_dot expression must be bit-identical to the
  * composed HOF formulation it replaces (same fold order), in both
  * whole-stage-codegen and interpreted execution. */
class VecDotSpec extends AnyFunSuite with SparkFixture {

  private def bothForms() = {
    import spark.implicits._
    val probe = broadcast(
      Tables.embeddings(spark, sfDir).where($"vec_id" === 0)
        .select($"embedding".as("p")))
    Tables.embeddings(spark, sfDir)
      .crossJoin(probe)
      .select(
        $"vec_id",
        expr("vec_dot(embedding, p)").as("native"),
        aggregate(
          zip_with($"embedding", $"p", (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), _ + _).as("composed"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
  }

  test("vec_dot is bit-identical to the composed HOF fold (codegen on)") {
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    val rows = bothForms()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, c) =>
      assert(n == c, s"vec $id: native=$n composed=$c")
    }
  }

  test("vec_dot interpreted eval matches codegen eval") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = bothForms().map(r => r._1 -> r._2).toMap
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      val codegen = bothForms().map(r => r._1 -> r._2).toMap
      assert(interpreted == codegen)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("vec_dot resolves through SQL (extension registration)") {
    import spark.implicits._
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_v")
    val r = spark.sql(
      "SELECT vec_id, vec_dot(embedding, embedding) AS sq FROM emb_v ORDER BY vec_id LIMIT 3")
      .collect()
    // unit-L2-normalized fixtures: self-dot ≈ 1
    r.foreach(row => assert(math.abs(row.getDouble(1) - 1.0) < 1e-5))
  }

  test("vec_dot rejects non-float-array arguments at analysis time") {
    import spark.implicits._
    val err = intercept[Exception] {
      Seq((1L, Seq(1.0, 2.0))).toDF("id", "v")
        .select(expr("vec_dot(v, v)")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array<float>") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
