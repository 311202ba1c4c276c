package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hand-derived golden values at sf0.001 (SURVEY.md §5 item 2) — a
  * DuckDB-independent sanity layer: row counts from FIXTURES.md and a
  * few independently recomputed aggregates. */
class GoldenSpec extends AnyFunSuite with SparkFixture {

  test("fixture row counts match FIXTURES.md") {
    val want = Map(
      "region" -> 5L, "nation" -> 25L, "supplier" -> 10L,
      "customer" -> 150L, "part" -> 200L, "orders" -> 1500L,
      "lineitem" -> 6000L, "events" -> 1000L,
      "documents" -> 500L, "embeddings" -> 500L)
    want.foreach { case (t, n) =>
      assert(Tables(spark, sfDir, t).count() == n, s"table $t")
    }
  }

  test("q_agg_global matches independently recomputed totals") {
    import spark.implicits._
    val row = Catalog.byName("q_agg_global").build(spark, sfDir).head()
    assert(row.getAs[Long]("n_rows") == 6000L)
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_extendedprice").collect()
    assert(row.getAs[Long]("n_orders") ==
      li.map(_.getLong(0)).distinct.length.toLong)
    // exact 2-dp values: recompute the decimal sum in scaled longs
    val cents = li.map(r => math.round(r.getDouble(1) * 100)).sum
    assert(row.getAs[Double]("sum_price") == cents / 100.0)
  }

  test("q_agg_groupby covers all 6 flag-status groups and counts add up") {
    val rows = Catalog.byName("q_agg_groupby").build(spark, sfDir).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getAs[Long]("count_order")).sum == 6000L)
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("A", "F"), ("A", "O"), ("N", "F"), ("N", "O"), ("R", "F"), ("R", "O")))
  }

  test("q_join_anti is empty because orders covers every customer") {
    assert(Catalog.byName("q_join_anti").build(spark, sfDir).count() == 0L)
  }

  test("q_topk revenues are sorted and bounded by the max product") {
    import spark.implicits._
    val revs = Catalog.byName("q_topk").build(spark, sfDir)
      .select($"revenue").collect().map(_.getDouble(0))
    assert(revs.length == 25)
    assert(revs.sameElements(revs.sorted.reverse))
    val maxPossible = Tables.lineitem(spark, sfDir)
      .select($"l_extendedprice").collect().map(_.getDouble(0)).max
    assert(revs.head <= maxPossible)
  }

  test("q_win_rank emits at most 3 rows per customer, rn dense from 1") {
    val rows = Catalog.byName("q_win_rank").build(spark, sfDir).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getAs[Long]("rn")).sorted.toSeq ==
        (1L to rs.length.toLong))
    }
  }

  test("q_window_tumbling_batch partitions every event into one window") {
    val rows = Catalog.byName("q_window_tumbling_batch").build(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == 1000L) // events @sf0.001
  }

  test("q_sessionize events are partitioned exactly across sessions") {
    val rows = Catalog.byName("q_sessionize").build(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum == 1000L)
    assert(rows.forall(_.getAs[Long]("dur_us") >= 0L))
  }

  test("q_vec_centroids covers all 10 labels with sub-unit centroid norms") {
    val rows = Catalog.byName("q_vec_centroids").build(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("label")).sorted.toSeq == (0 until 10))
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == 500L)
    // spread clusters of unit vectors: mean vector strictly inside the ball
    rows.foreach(r => assert(r.getAs[Double]("centroid_l2") > 0.0 &&
      r.getAs[Double]("centroid_l2") < 1.0))
  }

  test("q_text_stats buckets partition each (lang, source) group") {
    val rows = Catalog.byName("q_text_stats").build(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 500L)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_short") + r.getAs[Long]("n_mid") +
        r.getAs[Long]("n_long") == r.getAs[Long]("n_docs"))
    }
  }

  test("q_dedup_exact keeps one representative per distinct text") {
    import spark.implicits._
    val nDistinct = Tables.documents(spark, sfDir)
      .select($"text").distinct().count()
    assert(Catalog.byName("q_dedup_exact").build(spark, sfDir).count() == nDistinct)
  }

  test("q_win_running_distinct replays exactly against a driver-side " +
      "seen-set per user") {
    val rows = Catalog.byName("q_win_running_distinct").build(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3), r.getLong(4)))
    assert(rows.length == 1000) // every event emits a row at sf0.001
    rows.groupBy(_._2).foreach { case (user, g) =>
      val seen = scala.collection.mutable.Set.empty[String]
      // output is ORDER BY event_id, and event_id is in ts order by
      // fixture contract, so replay in emitted order
      g.sortBy(_._1).foreach { case (id, _, tpe, n) =>
        seen += tpe
        assert(n == seen.size.toLong,
          s"user $user event $id: running distinct $n != ${seen.size}")
      }
    }
  }

  test("q_text_bm25 replays exactly against a driver-side integer " +
      "recompute from raw tokens") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)
        .toLowerCase(java.util.Locale.ROOT).split(" ", -1).toSeq)
    val qterms = Seq("data", "query", "spark")
    val n = docs.length.toLong
    val t = docs.map(_._2.length.toLong).sum
    val df = qterms.map(q =>
      q -> docs.count(_._2.contains(q)).toLong).toMap
    val idf = df.map { case (q, d) =>
      q -> math.floor(math.log((2 * n + 2).toDouble / (2 * d + 1))
        * 1000000).toLong
    }
    val expected = docs.flatMap { case (id, toks) =>
      val dl = toks.length.toLong
      val terms = qterms.map(q => q -> toks.count(_ == q).toLong)
        .filter(_._2 > 0)
      if (terms.isEmpty) None
      else {
        val score = terms.map { case (q, tf) =>
          (idf(q) * 22 * t * tf) / (10 * t * tf + 3 * t + 9 * dl * n)
        }.sum
        Some((id, terms.size.toLong, score))
      }
    }.sortBy(_._1).toSeq
    val got = Catalog.byName("q_text_bm25").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("q_win_rolling_median replays exactly against driver-side frame " +
      "medians over cents") {
    import spark.implicits._
    val got = Catalog.byName("q_win_rolling_median").build(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val events = Tables.events(spark, sfDir)
      .select($"user_id", $"event_id",
        org.apache.spark.sql.functions.unix_micros($"ts"), $"value")
      .as[(Long, Long, Long, Double)].collect()
    val expected = events.groupBy(_._1).iterator.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      ordered.indices.map { i =>
        val frame = ordered.slice(math.max(0, i - 4), i + 1)
          .map(r => math.round(r._4 * 100)).sorted
        val n = frame.length
        val med =
          if (n % 2 == 1) frame(n / 2).toDouble
          else (frame(n / 2 - 1) + frame(n / 2)) / 2.0
        ordered(i)._2 -> med / 100d
      }
    }.toMap
    assert(got == expected)
  }

  test("q_events_attribution replays a running last-click exactly and " +
      "keeps direct conversions as NULL credit") {
    import spark.implicits._
    val got = Catalog.byName("q_events_attribution").build(spark, sfDir)
      .collect().map { r =>
        r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3)))
      }.toMap
    val events = Tables.events(spark, sfDir)
      .select($"user_id", $"event_id",
        org.apache.spark.sql.functions.unix_micros($"ts"), $"event_type")
      .as[(Long, Long, Long, String)].collect()
    val expected = events.groupBy(_._1).iterator.flatMap { case (_, rows) =>
      var lastClick: Option[Long] = None
      rows.sortBy(r => (r._3, r._2)).flatMap { case (_, id, us, tpe) =>
        if (tpe == "click") { lastClick = Some(us); None }
        else if (tpe == "purchase") Some(id -> lastClick)
        else None
      }
    }.toMap
    assert(got == expected)
    // both attribution outcomes must occur on the fixture
    assert(got.values.exists(_.isEmpty), "no direct (NULL) conversion")
    assert(got.values.exists(_.nonEmpty), "no attributed conversion")
  }
}
