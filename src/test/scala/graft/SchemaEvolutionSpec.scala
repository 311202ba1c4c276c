package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Schema evolution on the parquet read path — the contract a long-lived
  * 100 TB table depends on: files written before a column existed must
  * keep reading (null-filled) next to files written after, and the union
  * schema must only assemble when asked (mergeSchema is a paid option —
  * it reads every footer — not a default). */
class SchemaEvolutionSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("mergeSchema unions generations; old files null-fill the new column") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_evo").toString
    val orders = Tables.orders(spark, sfDir)

    // Generation 1: the original schema.
    orders.where($"o_orderkey" % 2 === 0)
      .write.mode("append").parquet(dir)
    // Generation 2: a column added mid-life (priority flag).
    orders.where($"o_orderkey" % 2 =!= 0)
      .withColumn("is_urgent", $"o_orderpriority" === "1-URGENT")
      .write.mode("append").parquet(dir)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.contains("is_urgent"))
    assert(merged.count() == orders.count())

    // Old-generation rows surface the new column as NULL; new-generation
    // rows carry their written values — and nothing else changed.
    val gen1Nulls = merged
      .where($"o_orderkey" % 2 === 0 && $"is_urgent".isNull).count()
    assert(gen1Nulls == merged.where($"o_orderkey" % 2 === 0).count())
    val urgentNew = merged.where($"is_urgent" === true).count()
    val urgentRaw = orders.where($"o_orderkey" % 2 =!= 0 &&
      $"o_orderpriority" === "1-URGENT").count()
    assert(urgentNew == urgentRaw && urgentRaw > 0)

    // Without mergeSchema, one footer decides: reads stay cheap and the
    // schema is whichever single file Spark sampled — callers who need
    // the union must say so. (Both outcomes are valid; the point is the
    // row COUNT is still complete either way.)
    val unmerged = spark.read.parquet(dir)
    assert(unmerged.count() == orders.count())

    // An EXPLICIT schema (the production pattern for readers that can't
    // pay mergeSchema's footer sweep) projects the union without it.
    val explicit = spark.read.schema(merged.schema).parquet(dir)
    assert(explicit.where($"is_urgent" === true).count() == urgentRaw)
  }
}
