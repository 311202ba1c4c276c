package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static lints over the oracle contract (SURVEY.md §2 rules), mirroring
  * tools/preflight.py so `sbt test` catches a bad oracle without needing
  * the DuckDB side. The driver's compare is row-order-sensitive, so every
  * oracle must impose a total order at the TOP level — an ORDER BY inside
  * OVER(...) or a subquery orders nothing in the outer result. */
class OracleLintSpec extends AnyFunSuite {

  /** Scala twin of preflight.has_toplevel_order_by: an "order by" at
    * paren depth 0, skipping quoted string literals (a paren inside
    * '...' must not skew the depth) with whitespace runs collapsed. */
  private def hasToplevelOrderBy(sql: String): Boolean = {
    val s = sql.toLowerCase.split("\\s+").mkString(" ")
    var depth = 0
    var i = 0
    while (i < s.length) {
      s(i) match {
        case '\'' =>
          i += 1
          var open = true
          while (i < s.length && open) {
            if (s(i) == '\'' && i + 1 < s.length && s(i + 1) == '\'') i += 2
            else if (s(i) == '\'') open = false
            else i += 1
          }
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && s.startsWith("order by", i)) return true
      }
      i += 1
    }
    false
  }

  test("every multi-row-capable oracle has a top-level ORDER BY") {
    // Single-row global aggregates are order-free by construction; every
    // other oracle must end in a total sort. We can't know row counts
    // statically, so the exemption list is explicit — a new global-agg
    // query must be added here deliberately.
    val singleRowGlobalAggs = Set("q_agg_global", "q_graph_triangles",
      "q_stat_kruskal", "q_stat_anova", "q_text_zipf", "q_stat_levene",
      "q_funnel_time", "q_stat_cramers_v", "q_ts_pacf", "q_stat_wilcoxon",
      "q_ml_auc")
    val offenders = Catalog.all
      .flatMap(q => q.oracle.map(q.name -> _))
      .filterNot { case (n, _) => singleRowGlobalAggs(n) }
      .filterNot { case (_, sql) => hasToplevelOrderBy(sql) }
      .map(_._1)
    assert(offenders.isEmpty,
      s"oracles without a top-level ORDER BY: ${offenders.mkString(", ")}")
  }

  test("the lint itself rejects OVER(ORDER BY) and subquery-only sorts") {
    assert(!hasToplevelOrderBy("SELECT rank() OVER (ORDER BY x) FROM t"))
    assert(!hasToplevelOrderBy("SELECT * FROM (SELECT x FROM t ORDER BY x)"))
    assert(hasToplevelOrderBy("SELECT x FROM t ORDER BY lower(x)"))
    assert(hasToplevelOrderBy(
      "SELECT * FROM (SELECT x FROM t ORDER BY x) ORDER BY x"))
    // Quoted literals must not skew the depth count or match keywords.
    assert(hasToplevelOrderBy(
      "SELECT regexp_matches(t, '([a-z]') AS m FROM x ORDER BY m"))
    assert(!hasToplevelOrderBy("SELECT ' order by ' FROM t"))
    // Whitespace runs (newlines from stripMargin) collapse before scan.
    assert(hasToplevelOrderBy("SELECT x FROM t ORDER\n   BY x"))
  }

  test("every query name maps to exactly one catalog entry and vice versa") {
    assert(Catalog.all.map(_.name).distinct.size == Catalog.all.size)
    assert(SparkEntry.queries.keySet == Catalog.all.map(_.name).toSet)
    assert(SparkEntry.oracleSql.keySet ==
      Catalog.all.filter(_.oracle.isDefined).map(_.name).toSet)
  }

  test("oracle count matches the SURVEY §2 contract (265 oracle rows)") {
    assert(Catalog.all.count(_.oracle.isDefined) == 265)
  }
}
