package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Independent ground truth for the recursive-CTE row: the DuckDB twin
  * proves both engines' WITH RECURSIVE agree, but a shared SQL-level
  * mistake would pass — so this spec replays the compounding loop
  * imperatively on the driver and requires exact equality, and pins
  * the properties that make the row meaningful (path dependence, base
  * anchoring, per-type chain isolation). */
class RecursiveSpec extends AnyFunSuite with SparkFixture {

  private lazy val rows: Array[(String, String, Long, Long)] =
    Catalog.byName("q_sql_recursive_compound").build(spark, sfDir)
      .select(col("event_type"), col("day").cast("string"),
        col("day_cents"), col("nav_micro"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("nav equals an imperative driver replay of the truncating recurrence") {
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val seq = rs.sortBy(_._2)
      assert(seq.head._4 == 1000000000L, s"$t: base nav must be 10^9")
      var nav = 1000000000L
      var prevY = seq.head._3
      seq.tail.foreach { case (_, day, y, navGot) =>
        val r = (y - prevY) * 1000000L / prevY // Scala / truncates like div
        nav = nav * (1000000L + r) / 1000000L
        assert(nav == navGot, s"$t $day: nav $navGot != replay $nav")
        prevY = y
      }
    }
  }

  test("the series is path-dependent: nav_n differs from the closed form") {
    // If each step compounded exactly (no ppm truncation), nav_n would be
    // 1e9 * y_n / y_1; the recursion truncates per step (toward zero, so
    // the drift's sign depends on the return signs along the path), and
    // the final nav must DIFFER from the closed form for at least one
    // type — equality everywhere would mean the recursion degenerated
    // into the memoryless ratio and the row proves nothing.
    val drifts = rows.groupBy(_._1).map { case (_, rs) =>
      val seq = rs.sortBy(_._2)
      val closed = BigInt(1000000000L) * seq.last._3 / seq.head._3
      closed.toLong - seq.last._4
    }
    assert(drifts.exists(_ != 0), "ppm truncation must bite somewhere")
    assert(rows.groupBy(_._1).forall(_._2.length == 30),
      "each type chains through all 30 fixture days")
  }
}
