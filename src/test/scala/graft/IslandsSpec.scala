package graft

import org.scalatest.funsuite.AnyFunSuite
import java.time.LocalDate

/** Ground truth for gaps-and-islands: recompute islands imperatively
  * (walk each user's sorted day list, split on non-consecutive steps)
  * and require the histogram to match exactly. */
class IslandsSpec extends AnyFunSuite with SparkFixture {

  test("histogram equals an imperative consecutive-run recompute") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val days = Tables.events(spark, sfDir)
      .select($"user_id", to_date(date_trunc("day", $"ts")).cast("string")
        .as("day"))
      .distinct().as[(Long, String)].collect()
    val naive = scala.collection.mutable.Map[Long, (Long, Set[Long])]()
    days.groupBy(_._1).foreach { case (u, ds) =>
      val sorted = ds.map(d => LocalDate.parse(d._2).toEpochDay).sorted
      var len = 1L
      def close(): Unit = {
        val (n, us) = naive.getOrElse(len, (0L, Set.empty[Long]))
        naive(len) = (n + 1, us + u)
      }
      sorted.sliding(2).filter(_.length == 2).foreach { w =>
        if (w(1) == w(0) + 1) len += 1 else { close(); len = 1 }
      }
      close()
    }
    val got = Catalog.byName("q_win_islands").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
    assert(got.map(_._1).toSet == naive.keySet)
    got.foreach { case (len, (nI, nU)) =>
      val (eI, eU) = naive(len)
      assert(nI == eI, s"len $len islands")
      assert(nU == eU.size, s"len $len users")
    }
    // islands of every length weighted by length sum to the day-rows
    assert(got.map { case (l, (n, _)) => l * n }.sum == days.length)
  }
}
