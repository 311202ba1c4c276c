package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties that make q_gdpr_pseudonymize sound beyond the oracle
  * hash-match: collision-freedom on the fixture key space, and join
  * preservation — the token-to-token join returns exactly the rows the
  * raw-key join would. */
class PseudonymizeSpec extends AnyFunSuite with SparkFixture {

  test("audit row: no collisions, and token join == raw-key join") {
    import spark.implicits._
    val got = Catalog.byName("q_gdpr_pseudonymize").build(spark, sfDir)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.size == 5)
    got.values.foreach { case (_, nPseudo, nRaw, _) =>
      assert(nPseudo == nRaw, "collision: pseudo cardinality dropped")
    }
    // raw-key ground truth for n_matched, computed without any hashing
    val rawMatched = Tables.events(spark, sfDir)
      .join(Tables.customer(spark, sfDir).select($"c_custkey").distinct(),
        $"user_id" === $"c_custkey")
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    got.foreach { case (t, (_, _, _, nMatched)) =>
      assert(nMatched == rawMatched.getOrElse(t, 0L),
        s"$t: token join $nMatched != raw join ${rawMatched.get(t)}")
    }
  }

  test("tokens are stable pure functions and never expose the raw id") {
    import spark.implicits._
    val toks = Tables.events(spark, sfDir)
      .select($"user_id",
        substring(md5(concat(lit("pseud-v1:"), $"user_id".cast("string"))),
          1, 16).as("token"))
      .distinct().as[(Long, String)].collect()
    // one token per user (stability) and one user per token (injectivity)
    assert(toks.map(_._1).distinct.length == toks.length)
    assert(toks.map(_._2).distinct.length == toks.length)
    // a 16-hex-char token cannot contain the decimal id by construction,
    // but pin the format so a refactor to plain concat fails loudly
    assert(toks.forall(_._2.matches("[0-9a-f]{16}")))
  }
}
