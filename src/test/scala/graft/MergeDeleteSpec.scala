package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for q_merge_delete (CdcQueries.scala): the three CDC op classes
  * must each leave their mark on the snapshot — deletes RETIRE keys,
  * inserts add theirs, updates replace the generation. The oracle hash
  * proves values; these assertions prove the op semantics can't silently
  * degenerate (e.g. a delete losing the rank instead of dropping the
  * key would still hash-match on some fixtures). */
class MergeDeleteSpec extends AnyFunSuite with SparkFixture {

  private lazy val merged =
    Catalog.byName("q_merge_delete").build(spark, sfDir)

  test("deleted keys are absent, inserted keys present, updates applied") {
    val s = spark
    import s.implicits._
    val keys = merged.select($"o_orderkey").as[Long].collect().toSet
    val base = Tables.orders(s, sfDir)
      .select($"o_orderkey").as[Long].collect().toSet
    val deleted = base.filter(k => (12 to 14).contains((k % 100).toInt))
    val inserted = base.filter(k => (10 to 11).contains((k % 100).toInt))
      .map(_ + 100000000L)
    assert(deleted.nonEmpty && inserted.nonEmpty,
      "fixture must exercise all three op classes")
    assert(deleted.forall(!keys(_)), "a delete tombstone failed to retire")
    assert(inserted.forall(keys), "an insert is missing from the snapshot")
    assert(keys.size == base.size - deleted.size + inserted.size)
    val updated = merged
      .where(pmod($"o_orderkey", lit(100)) < 10 &&
        $"o_orderkey" < 100000000L)
    assert(updated.where($"o_orderstatus" =!= "U").count() == 0,
      "an updated key kept its old generation")
  }
}
