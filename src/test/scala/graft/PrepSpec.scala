package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent (DuckDB-free) verification of the feature-prep family —
  * each test recomputes the semantics driver-side from the raw fixture
  * and compares against the catalog row, so a same-bug-both-engines
  * oracle coincidence cannot survive (SURVEY.md §5 layering). */
class PrepSpec extends AnyFunSuite with SparkFixture {

  test("q_prep_bucketize equals a driver-side exact quartile recompute") {
    import spark.implicits._
    val cents = Tables.lineitem(spark, sfDir)
      .select(
        graft.Dsl.dec2($"l_extendedprice") * 100,
        $"l_orderkey", $"l_linenumber", $"l_partkey")
      .collect()
      .map(r => (r.getDecimal(0).longValueExact(),
        r.getAs[Number](1).longValue, r.getAs[Number](2).longValue,
        r.getAs[Number](3).longValue))
      .sortBy(identity)
    val n = cents.length
    val want = cents.zipWithIndex
      .groupBy { case (_, i) => i.toLong * 4 / n + 1 }
      .map { case (b, rows) =>
        val cs = rows.map(_._1._1)
        (b, rows.length.toLong, cs.min / 100.0, cs.max / 100.0,
          cs.sum / 100.0)
      }
      .toSeq.sortBy(_._1)
    val got = Catalog.byName("q_prep_bucketize").build(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
      .toSeq
    assert(got == want)
  }

  test("q_prep_standardize: per-class z-scores have mean ~0 and var ~1, " +
    "and invert back to the raw cents") {
    import spark.implicits._
    val rows = Catalog.byName("q_prep_standardize").build(spark, sfDir)
      .join(Tables.events(spark, sfDir).select($"event_id", $"value"),
        "event_id")
      .select($"event_type", $"z", $"value")
      .collect()
      .groupBy(_.getString(0))
    assert(rows.keySet ==
      Set("click", "error", "purchase", "signup", "view"))
    rows.foreach { case (et, rs) =>
      val zs = rs.map(_.getDouble(1))
      val mean = zs.sum / zs.length
      val varZ = zs.map(z => z * z).sum / zs.length - mean * mean
      assert(math.abs(mean) < 1e-4, s"$et: z mean $mean")
      assert(math.abs(varZ - 1.0) < 1e-2, s"$et: z variance $varZ")
      // Monotone: the largest z must belong to the largest value.
      val byZ = rs.sortBy(_.getDouble(1))
      assert(byZ.last.getDouble(2) == rs.map(_.getDouble(2)).max)
    }
  }

  test("q_prep_split partitions every event exactly once, ~80/20") {
    val out = Catalog.byName("q_prep_split").build(spark, sfDir).collect()
    val n = Tables.events(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n")).sum == n)
    val train = out.filter(_.getString(0) == "train").map(_.getAs[Long]("n")).sum
    val frac = train.toDouble / n
    assert(frac > 0.72 && frac < 0.88, s"train fraction $frac")
  }

  test("q_prep_hash_features: bucket counts per user sum to the user's " +
    "event count, and bucketing matches a driver md5 recompute") {
    import spark.implicits._
    val got = Catalog.byName("q_prep_hash_features").build(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (1 to 8).map(i => r.getLong(i)).toVector)
      .toMap
    val raw = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type",
        org.apache.spark.sql.functions.get_json_object($"props", "$.k")
          .as("k"))
      .collect()
    val want = raw.groupBy(_.getLong(0)).map { case (u, rs) =>
      val counts = Array.fill(8)(0L)
      rs.foreach { r =>
        val feat = r.getString(1) + "#" + r.getString(2)
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(feat.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        counts(hex.charAt(0).toInt % 8) += 1
      }
      u -> counts.toVector
    }
    assert(got == want)
    got.foreach { case (u, cs) =>
      assert(cs.sum == raw.count(_.getLong(0) == u))
    }
  }

  test("q_dq_orphans counts exactly the facts stranded by the planted purge") {
    import spark.implicits._
    val out = Catalog.byName("q_dq_orphans").build(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val keptParts = Tables.part(spark, sfDir).select($"p_partkey")
      .collect().map(_.getLong(0))
      .filterNot(k => md5Hex(k.toString).substring(0, 2) < "1a").toSet
    val wantOrphans = Tables.lineitem(spark, sfDir).select($"l_partkey")
      .collect().map(_.getLong(0)).count(k => !keptParts(k))
    assert(out("lineitem.l_partkey->part") == wantOrphans.toLong)
    assert(out.values.forall(_ > 0),
      "the planted purge must make every audit row non-degenerate")
  }

  test("q_dq_expectations: the firing rule matches an independent recount " +
    "and the passing rules are genuinely zero") {
    import spark.implicits._
    val out = Catalog.byName("q_dq_expectations").build(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), $"l_orderkey" === $"o_orderkey")
      .where($"l_shipdate" < $"o_orderdate").count()
    assert(out("ship_before_order") == want)
    assert(want > 0, "the fixture's broken date invariant must fire")
    Seq("quantity_nonpositive", "discount_range", "tax_range",
      "ship_after_horizon").foreach(r => assert(out(r) == 0L, r))
  }

  test("q_text_ttr matches a driver tokenization for every doc") {
    import spark.implicits._
    val got = Catalog.byName("q_text_ttr").build(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    Tables.documents(spark, sfDir).select($"doc_id", $"text")
      .collect().foreach { r =>
        // split(-1) + ROOT locale: Spark's split keeps trailing empty
        // tokens and lower() is locale-independent — Java's defaults
        // (limit 0, default locale) silently diverge on trailing
        // spaces / tr-locale dotted-I, so the recount must mirror the
        // query's semantics, not the JVM's.
        val toks = r.getString(1)
          .toLowerCase(java.util.Locale.ROOT).split(" ", -1).toSeq
        val tf = toks.groupBy(identity).view.mapValues(_.size)
        val types = tf.size.toLong
        val hapax = tf.count(_._2 == 1).toLong
        val want = (toks.size.toLong, types, hapax,
          types * 1000000L / toks.size, hapax * 1000000L / types)
        assert(got(r.getLong(0)) == want, s"doc ${r.getLong(0)}")
      }
  }

  test("q_sample_balanced keeps exactly the minority count per class") {
    import spark.implicits._
    val perLang = Catalog.byName("q_sample_balanced").build(spark, sfDir)
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val classCounts = Tables.documents(spark, sfDir)
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val m = classCounts.values.min
    assert(perLang.keySet == classCounts.keySet)
    assert(perLang.values.forall(_ == m),
      s"every class must keep exactly $m docs: $perLang")
  }

  test("quantile transform: monotone, midrank-correct, mass-weighted uniform") {
    import org.apache.spark.sql.functions._
    val rows = Catalog.byName("q_prep_quantile_transform").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // strictly increasing in value AND in quantile (midranks of distinct
    // values cannot tie)
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._1 < b._1 && a._3 < b._3 })
    val n = rows.map(_._2).sum
    // endpoints: smallest value's midrank quantile ~ (cv-1)/(2(n-1)),
    // largest ~ 1 - (cv-1)/(2(n-1))
    val head = rows.head; val last = rows.last
    assert(math.abs(head._3 - (head._2 - 1.0) / (2.0 * (n - 1))) < 1e-6)
    assert(math.abs(last._3 - (1.0 - (last._2 - 1.0) / (2.0 * (n - 1)))) < 1e-6)
    // mass-weighted mean quantile of a midrank transform is exactly 1/2
    val wMean = rows.map(r => r._2 * r._3).sum / n
    assert(math.abs(wMean - 0.5) < 1e-6, s"weighted mean $wMean != 0.5")
  }

  test("WoE equals the textbook odds-ratio recompute; IV parts are non-negative") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val raw = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), $"l_partkey" === $"p_partkey")
      .select($"p_brand", ($"l_returnflag" === "R").cast("long"))
      .as[(String, Long)].collect()
    val per = raw.groupBy(_._1).view
      .mapValues(v => (v.count(_._2 == 0L).toLong, v.count(_._2 == 1L).toLong))
      .toMap
    val g = per.values.map(_._1).sum
    val b = per.values.map(_._2).sum
    val got = Catalog.byName("q_prep_woe").build(spark, sfDir)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
    assert(got.length == 25)
    got.foreach { case (br, (n, nBad, woeOpt, ivOpt)) =>
      val (good, bad) = per(br)
      assert(n == good + bad && nBad == bad)
      if (good == 0 || bad == 0) assert(woeOpt.isEmpty && ivOpt.isEmpty)
      else {
        val woe = math.floor(math.log(good.toDouble * b /
          (bad.toDouble * g)) * 1e6).toLong
        assert(woeOpt.contains(woe), s"$br woe")
        val iv = (good.toDouble * b - bad.toDouble * g) / (g.toDouble * b) *
          (woe / 1e6)
        assert(math.abs(ivOpt.get - iv) < 1e-5, s"$br iv")
        // share difference and woe share a sign, so each IV part >= ~0
        // (quantization can nudge a near-zero part a hair negative)
        assert(ivOpt.get > -1e-6, s"$br iv sign")
      }
    }
  }

  test("target encoding shrinks every brand toward the global mean") {
    val rows = Catalog.byName("q_prep_target_encode").build(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.length == 25)
    val gn = rows.map(_._2).sum
    val gMean = rows.map(r => r._3 * r._2).sum / gn
    rows.foreach { case (b, nb, mean, enc) =>
      // m-estimate: enc sits strictly between the raw mean and the global
      // mean (or equals both when they coincide), closer to raw for big n
      val lo = math.min(mean, gMean) - 1e-4
      val hi = math.max(mean, gMean) + 1e-4
      assert(enc >= lo && enc <= hi, s"$b: enc $enc outside [$lo,$hi]")
      val expected = (mean * nb + 100.0 * gMean) / (nb + 100.0)
      assert(math.abs(enc - expected) < 1e-2,
        s"$b: enc $enc != m-estimate $expected")
    }
  }

  test("q_prep_robust_scale equals a naive sort-based median/IQR recompute") {
    import spark.implicits._
    val data = Tables.events(spark, sfDir)
      .select($"event_id", $"event_type",
        (graft.Dsl.dec2($"value") * 100).cast("long"))
      .as[(Long, String, Long)].collect()
    // naive ceil-rank quantiles off the full sorted list per type
    val model = data.groupBy(_._2).view.mapValues { g =>
      val v = g.map(_._3).sorted
      val n = v.length
      def at(rank: Long): Long = v((rank - 1).toInt)
      (at((n + 3) / 4), at((n + 1) / 2), at((3L * n + 3) / 4))
    }.toMap
    val got = Catalog.byName("q_prep_robust_scale").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got.size == data.length)
    data.foreach { case (id, t, c) =>
      val (q1, med, q3) = model(t)
      assert(q1 <= med && med <= q3, s"$t: quartiles out of order")
      val rs = (c - med).toDouble / (q3 - q1).toDouble
      assert(math.abs(got(id) - rs) < 1e-6, s"event $id: ${got(id)} != $rs")
    }
    // scaling is centering: per type the median row maps to exactly 0
    model.foreach { case (t, (_, med, _)) =>
      data.find(d => d._2 == t && d._3 == med).foreach { d =>
        assert(got(d._1) == 0.0, s"$t: median row scales to ${got(d._1)}")
      }
    }
  }
}
