package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent ground truth for the hypothesis-testing family
  * (StatTestQueries) — the DuckDB oracles prove Spark and DuckDB agree,
  * but both run the SAME ladder decomposition, so a shared design bug
  * would pass. These tests recompute each statistic from first
  * principles driver-side (naive midranks over the raw value list,
  * direct ECDF supremum, textbook Welch formulas, per-row sorted-index
  * Gini) on the sf0.001 fixture and require exact agreement. */
class StatTestSpec extends AnyFunSuite with SparkFixture {

  private def cents(): Seq[(String, Long)] = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select($"event_type",
        (Dsl.dec2($"value") * 100).cast("long"))
      .as[(String, Long)].collect().toSeq
  }

  test("Mann-Whitney u2/z equal a naive midrank recompute") {
    val data = cents()
    val all = data.map(_._2)
    val n = all.size.toLong
    val cnt = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val less = {
      var acc = 0L
      cnt.keys.toSeq.sorted.map { v =>
        val p = v -> acc; acc += cnt(v); p
      }.toMap
    }
    val tie3 = cnt.values.map(c => c * c * c - c).sum
    val got = Catalog.byName("q_stat_mann_whitney").build(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(3), r.getDouble(4)))
    assert(got.length == 5)
    got.foreach { case (t, u2Got, zGot) =>
      val g = data.filter(_._1 == t).map(_._2)
      val nt = g.size.toLong
      val nr = n - nt
      // 2*midrank = 2*cnt_less + cnt_eq + 1, summed exactly
      val r2 = g.map(v => 2 * less(v) + cnt(v) + 1).sum
      val u2 = r2 - nt * (nt + 1)
      assert(u2 == u2Got, s"$t: u2 $u2Got != naive $u2")
      val varU = nt.toDouble * nr / 12.0 *
        ((n + 1).toDouble - tie3.toDouble / (n.toDouble * (n - 1).toDouble))
      val z = (u2.toDouble - nt.toDouble * nr.toDouble) /
        (2.0 * math.sqrt(varU))
      assert(math.abs(zGot - z) < 1e-5, s"$t: z $zGot != naive $z")
    }
  }

  test("KS d_num equals the direct ECDF supremum") {
    val data = cents()
    val n = data.size.toLong
    val got = Catalog.byName("q_stat_ks").build(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    assert(got.size == 5)
    val xs = data.map(_._2).distinct.sorted
    got.foreach { case (t, dGot) =>
      val g = data.filter(_._1 == t).map(_._2).sorted
      val r = data.filter(_._1 != t).map(_._2).sorted
      val nt = g.size.toLong
      val d = xs.map { x =>
        val ct = g.count(_ <= x).toLong
        val cr = r.count(_ <= x).toLong
        math.abs(ct * (n - nt) - cr * nt)
      }.max
      assert(d == dGot, s"$t: d_num $dGot != naive $d")
    }
  }

  test("Welch t/df equal the textbook two-sample formulas") {
    val data = cents()
    val byType = data.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = Catalog.byName("q_stat_welch_t").build(spark, sfDir)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(6), r.getDouble(7)))).toMap
    assert(got.size == 10, "5 types pair into 10 tests")
    got.foreach { case ((ta, tb), (tGot, dfGot)) =>
      def stats(v: Seq[Long]): (Double, Double, Long) = {
        val nn = v.size
        val m = v.sum.toDouble / nn
        val va = v.map(x => (x - m) * (x - m)).sum / (nn - 1.0)
        (m, va, nn.toLong)
      }
      val (ma, va, na) = stats(byType(ta))
      val (mb, vb, nb) = stats(byType(tb))
      val se2 = va / na + vb / nb
      val t = (ma - mb) / math.sqrt(se2)
      val df = se2 * se2 /
        ((va / na) * (va / na) / (na - 1) + (vb / nb) * (vb / nb) / (nb - 1))
      assert(math.abs(tGot - t) < 1e-4, s"($ta,$tb): t $tGot != naive $t")
      assert(math.abs(dfGot - df) < 1e-2, s"($ta,$tb): df $dfGot != naive $df")
    }
  }

  test("Pettitt K and change day equal the O(n^2) textbook recompute") {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type",
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.date_trunc("day", $"ts")).as("day"))
      .agg((Dsl.dec2(org.apache.spark.sql.functions.sum(Dsl.dec2($"value")))
        * 100).cast("long").as("y"))
      .as[(String, java.sql.Date, Long)].collect()
    val got = Catalog.byName("q_stat_pettitt").build(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDate(3))))
      .toMap
    assert(got.size == 5)
    got.foreach { case (t, (nGot, kGot, dayGot)) =>
      val ys = daily.filter(_._1 == t).sortBy(_._2.toString).map(_._3)
      val days = daily.filter(_._1 == t).map(_._2.toString).sorted
      val n = ys.length
      assert(nGot == n)
      // direct double-sum definition: K_t = sum_{i<=t<j} sign(y_j - y_i)
      val ks = (1 until n).map { t0 =>
        var k = 0L
        for (i <- 0 until t0; j <- t0 until n)
          k += java.lang.Long.signum(ys(j) - ys(i))
        (math.abs(k), days(t0 - 1))
      }
      val (kBest, dayBest) = ks.minBy { case (k, d) => (-k, d) }
      assert(kGot == kBest, s"$t: K $kGot != naive $kBest")
      assert(dayGot.toString == dayBest, s"$t: day $dayGot != naive $dayBest")
    }
  }

  test("Gini equals the per-row sorted-index formula and sits in [0, 1)") {
    val data = cents()
    val got = Catalog.byName("q_stat_gini").build(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(3))).toMap
    assert(got.size == 5)
    got.foreach { case (t, gGot) =>
      val v = data.filter(_._1 == t).map(_._2).sorted
      val n = v.size.toLong
      val sumX = v.sum
      val sumIX = v.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val g = (2.0 * sumIX - (n + 1).toDouble * sumX) / (n.toDouble * sumX)
      assert(math.abs(gGot - g) < 1e-5, s"$t: gini $gGot != naive $g")
      assert(gGot >= 0.0 && gGot < 1.0, s"$t: gini $gGot out of range")
      assert(gGot > 0.1,
        s"$t: fixture values are heavily spread; a near-zero gini means " +
          "the decomposition collapsed")
    }
  }

  test("Kruskal-Wallis H equals the naive midrank recompute") {
    val data = cents()
    val all = data.map(_._2)
    val n = all.size.toLong
    val cnt = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val less = {
      var acc = 0L
      cnt.keys.toSeq.sorted.map { v =>
        val p = v -> acc; acc += cnt(v); p
      }.toMap
    }
    val row = Catalog.byName("q_stat_kruskal").build(spark, sfDir)
      .collect()
    assert(row.length == 1)
    val (kGot, nGot, hGot, hcGot) =
      (row(0).getLong(0), row(0).getLong(1), row(0).getDouble(2),
        row(0).getDouble(3))
    assert(kGot == 5 && nGot == n)
    // naive: per-type quantized R^2/nt term exactly as specified
    val s = data.groupBy(_._1).values.map { g =>
      val r2 = g.map(_._2).map(v => 2 * less(v) + cnt(v) + 1).sum
      (BigInt(r2) * BigInt(r2) / BigInt(4 * g.size)).toLong
    }.sum
    val h = 12.0 * s.toDouble / (n.toDouble * (n + 1).toDouble) -
      3.0 * (n + 1).toDouble
    assert(math.abs(hGot - h) < 1e-5, s"h $hGot != naive $h")
    val tie3 = cnt.values.map(c => c * c * c - c).sum
    val hc = h / (1.0 - tie3.toDouble /
      (n.toDouble * n.toDouble * n.toDouble - n.toDouble))
    assert(math.abs(hcGot - hc) < 1e-5, s"h_corr $hcGot != naive $hc")
  }

  test("ANOVA F and its exact-integer SSB/SSW match textbook sums of squares") {
    val data = cents()
    val n = data.size.toLong
    val row = Catalog.byName("q_stat_anova").build(spark, sfDir).collect()
    assert(row.length == 1)
    val r = row(0)
    assert(r.getLong(0) == 5 && r.getLong(1) == n)
    assert(r.getLong(2) == 4 && r.getLong(3) == n - 5)
    val groups = data.groupBy(_._1).values.map(_.map(_._2)).toSeq
    // exact-integer assembly mirroring the quantization contract
    val s1sq = groups.map { g =>
      val s1 = BigInt(g.sum); ((s1 * s1) / g.size).toLong
    }.sum
    val gs1 = BigInt(data.map(_._2).sum)
    val gs2 = data.map(v => v._2 * v._2).sum
    val ssb = s1sq - ((gs1 * gs1) / n).toLong
    val ssw = gs2 - s1sq
    assert(r.getLong(4) == ssb, s"ssb ${r.getLong(4)} != naive $ssb")
    assert(r.getLong(5) == ssw, s"ssw ${r.getLong(5)} != naive $ssw")
    val f = (ssb.toDouble / 4.0) / (ssw.toDouble / (n - 5).toDouble)
    assert(math.abs(r.getDouble(6) - f) < 1e-4, s"f ${r.getDouble(6)} != $f")
    // cross-check vs the pure-double textbook decomposition
    val mu = data.map(_._2).sum.toDouble / n
    val ssbD = groups.map { g =>
      val m = g.sum.toDouble / g.size; g.size * (m - mu) * (m - mu)
    }.sum
    assert(math.abs(ssb.toDouble - ssbD) < 1e-2 * ssbD + 10,
      s"integer ssb $ssb far from double ssb $ssbD")
  }

  test("Brown-Forsythe W equals ANOVA on naive |x - median| deviations") {
    val data = cents()
    val n = data.size.toLong
    val row = Catalog.byName("q_stat_levene").build(spark, sfDir).collect()
    assert(row.length == 1)
    val r = row(0)
    assert(r.getLong(0) == 5 && r.getLong(1) == n)
    // naive: ceil-rank median per type from the full sorted list
    val devs = data.groupBy(_._1).values.map { g =>
      val v = g.map(_._2).sorted
      val med = v(((v.length + 1) / 2 - 1))
      g.map(x => math.abs(x._2 - med))
    }.toSeq
    val s1sq = devs.map { d =>
      val s1 = BigInt(d.sum); ((s1 * s1) / d.size).toLong
    }.sum
    val gs1 = BigInt(devs.flatten.sum)
    val gs2 = devs.flatten.map(x => x * x).sum
    val ssb = s1sq - ((gs1 * gs1) / n).toLong
    val ssw = gs2 - s1sq
    assert(r.getLong(4) == ssb, s"ssb ${r.getLong(4)} != naive $ssb")
    assert(r.getLong(5) == ssw, s"ssw ${r.getLong(5)} != naive $ssw")
    val w = (ssb.toDouble / 4.0) / (ssw.toDouble / (n - 5).toDouble)
    assert(math.abs(r.getDouble(6) - w) < 1e-4)
  }

  test("Friedman chi2 equals a naive within-week rank recompute") {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type",
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.date_trunc("day", $"ts")).as("day"))
      .agg((Dsl.dec2(org.apache.spark.sql.functions.sum(Dsl.dec2($"value")))
        * 100).cast("long").as("y"))
      .as[(String, java.sql.Date, Long)].collect()
    val got = Catalog.byName("q_stat_friedman").build(spark, sfDir)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got.size == 5)
    got.foreach { case (t, (nwGot, chiGot)) =>
      val rows = daily.filter(_._1 == t).map { d =>
        val ed = d._2.toLocalDate.toEpochDay
        (ed / 7, ed % 7, d._3)
      }
      val fullWeeks = rows.groupBy(_._1).filter(_._2.length == 7)
      val n = fullWeeks.size.toLong
      assert(nwGot == n, s"$t: weeks $nwGot != $n")
      // doubled midranks within each full week, summed per position
      val r2j = new Array[Long](7)
      fullWeeks.values.foreach { wk =>
        val ys = wk.map(_._3)
        wk.foreach { case (_, j, y) =>
          val less = ys.count(_ < y).toLong
          val eq = ys.count(_ == y).toLong
          r2j(j.toInt) += 2 * less + eq + 1
        }
      }
      val sr2 = r2j.map(r => r * r).sum
      val chi = 3.0 * sr2 / (n * 7.0 * 8.0) - 3.0 * n * 8.0
      assert(math.abs(chiGot - chi) < 1e-5, s"$t: chi2 $chiGot != $chi")
      assert(chiGot >= 0.0, s"$t: Friedman statistic cannot be negative")
    }
  }

  test("Spearman rho equals Pearson over naive midranks of the daily series") {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type",
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.date_trunc("day", $"ts")).as("day"))
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("nn"),
        (Dsl.dec2(org.apache.spark.sql.functions.sum(Dsl.dec2($"value")))
          * 100).cast("long").as("v"))
      .as[(String, java.sql.Date, Long, Long)].collect()
    val got = Catalog.byName("q_stat_spearman").build(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(got.size == 5)
    def midranks(v: Seq[Long]): Seq[Double] = {
      val cnt = v.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val less = {
        var acc = 0L
        cnt.keys.toSeq.sorted.map { x =>
          val p = x -> acc; acc += cnt(x); p
        }.toMap
      }
      v.map(x => less(x) + (cnt(x) + 1) / 2.0)
    }
    got.foreach { case (t, rhoGot) =>
      val g = daily.filter(_._1 == t)
      val xs = midranks(g.map(_._3))
      val ys = midranks(g.map(_._4))
      val n = xs.size
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val num = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
      val den = math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum) *
        math.sqrt(ys.map(b => (b - my) * (b - my)).sum)
      val rho = num / den
      assert(math.abs(rhoGot - rho) < 1e-5, s"$t: rho $rhoGot != naive $rho")
      assert(math.abs(rhoGot) <= 1.0)
    }
  }

  test("Jarque-Bera equals a naive BigInt power-sum recompute") {
    val data = cents()
    val got = Catalog.byName("q_stat_jarque_bera").build(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 5)
    got.foreach { case (t, nGot, jbGot) =>
      val g = data.filter(_._1 == t).map(_._2).map(BigInt(_))
      val n = g.size.toDouble
      assert(nGot == g.size)
      val s1 = g.sum; val s2 = g.map(c => c * c).sum
      val s3 = g.map(c => c * c * c).sum
      val s4 = g.map(c => c * c * c * c).sum
      val (d1, d2, d3, d4) =
        (s1.toDouble / n, s2.toDouble / n, s3.toDouble / n, s4.toDouble / n)
      val m2 = d2 - d1 * d1
      val m3 = d3 - 3 * d1 * d2 + 2 * d1 * d1 * d1
      val m4 = d4 - 4 * d1 * d3 + 6 * d1 * d1 * d2 - 3 * d1 * d1 * d1 * d1
      val sk = m3 / (m2 * math.sqrt(m2))
      val ku = m4 / (m2 * m2) - 3
      val jb = n / 6.0 * (sk * sk + ku * ku / 4.0)
      assert(math.abs(jbGot - jb) < 1e-4, s"$t: jb $jbGot != naive $jb")
      assert(jbGot >= 0.0, s"$t: JB cannot be negative")
    }
  }

  test("runs-test counts and z equal a naive sequence replay") {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type",
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.date_trunc("day", $"ts")).as("day"))
      .agg((Dsl.dec2(org.apache.spark.sql.functions.sum(Dsl.dec2($"value")))
        * 100).cast("long").as("y"))
      .as[(String, java.sql.Date, Long)].collect()
    val got = Catalog.byName("q_stat_runs").build(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getDouble(5)))))
      .toMap
    assert(got.size == 5)
    got.foreach { case (t, (nObs, nUp, nDown, runs, z)) =>
      val ys = daily.filter(_._1 == t).sortBy(_._2.toLocalDate.toEpochDay)
        .map(_._3)
      val dirs = ys.sliding(2).collect {
        case Array(a, b) if b != a => b > a
      }.toVector
      val r = if (dirs.isEmpty) 0L
        else 1L + dirs.sliding(2).count {
          case Vector(a, b) => a != b; case _ => false }
      val (n1, n2) = (dirs.count(identity).toLong, dirs.count(!_).toLong)
      assert((nObs, nUp, nDown, runs) == ((n1 + n2, n1, n2, r)),
        s"$t: counts ${(nObs, nUp, nDown, runs)} != ${(n1 + n2, n1, n2, r)}")
      val varNum = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
      if (varNum <= 0) assert(z.isEmpty, s"$t: z must be NULL")
      else {
        val nn = (n1 + n2).toDouble
        val mu = 2.0 * n1 * n2 / nn + 1.0
        val zNaive = (r - mu) / math.sqrt(varNum / (nn * nn * (nn - 1.0)))
        assert(math.abs(z.get - zNaive) < 1e-5, s"$t: z ${z.get} != $zNaive")
      }
    }
  }

  test("Cramers V equals a naive quantized-chi2 recompute and sits in [0,1]") {
    import spark.implicits._
    val cells = Tables.events(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.hour($"ts").cast("long")
        .as("hod"), $"event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("obs"))
      .as[(Long, String, Long)].collect()
    val n = cells.map(_._3).sum
    val rt = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val ct = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    // exact BigInt mirror of the once-quantized per-cell terms
    val chi2q = cells.map { case (h, t, o) =>
      val num = BigInt(o) * n - BigInt(rt(h)) * ct(t)
      num * num * 1000000 / (BigInt(rt(h)) * ct(t))
    }.sum
    val chi2 = chi2q.toDouble / 1e6 / n
    val df = math.min(rt.size, ct.size) - 1
    val v = math.sqrt(chi2 / n / df)
    val row = Catalog.byName("q_stat_cramers_v").build(spark, sfDir).collect()
    assert(row.length == 1)
    assert(row(0).getLong(0) == rt.size && row(0).getLong(1) == ct.size)
    assert(row(0).getLong(2) == n)
    assert(math.abs(row(0).getDouble(3) - chi2) < 1e-5)
    assert(math.abs(row(0).getDouble(4) - v) < 1e-6)
    assert(row(0).getDouble(4) >= 0.0 && row(0).getDouble(4) <= 1.0)
  }

  test("Poisson bootstrap CI equals a naive md5-weight replay and brackets the mean") {
    import spark.implicits._
    val data = Tables.events(spark, sfDir)
      .select($"event_type", $"event_id",
        (Dsl.dec2($"value") * 100).cast("long"))
      .as[(String, Long, Long)].collect()
    // The operator's draw for replicate b reads 4-hex window j of
    // md5("id-g") with g = (b−1)/8 + 1, j = (b−1)%8 + 1 — replayed
    // here from raw digest bytes (independent code path).
    def hexWin(key: String, j: Int): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
      d.slice(2 * (j - 1), 2 * j).map(b => f"${b & 0xff}%02x").mkString
    }
    val cuts = Seq("5e2d", "bc5a", "eb71", "fb23", "ff10", "ffd9")
    def w(h: String): Long = cuts.indexWhere(h < _) match {
      case -1 => 6L; case i => i.toLong
    }
    val got = Catalog.byName("q_stat_bootstrap").build(spark, sfDir)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.size == 5)
    got.foreach { case (t, (nReps, p5, p50, p95)) =>
      val rows = data.filter(_._1 == t)
      val means = (1 to 64).flatMap { b =>
        val g = (b - 1) / 8 + 1
        val j = (b - 1) % 8 + 1
        var sw = 0L; var swc = 0L
        rows.foreach { case (_, id, c) =>
          val ww = w(hexWin(s"$id-$g", j)); sw += ww; swc += ww * c
        }
        if (sw > 0) Some((swc * 1000000L / sw, b.toLong)) else None
      }.sorted
      assert(nReps == means.size)
      def pick(q: Double): Long =
        means(math.ceil(means.size * q).toInt - 1)._1
      assert((p5, p50, p95) == ((pick(0.05), pick(0.50), pick(0.95))),
        s"$t: ${(p5, p50, p95)} != naive")
      assert(p5 <= p50 && p50 <= p95)
      // the CI must bracket the full-sample mean at these n
      val mean = rows.map(_._3).sum * 1000000L / rows.size
      assert(p5 <= mean && mean <= p95, s"$t: mean $mean outside [$p5,$p95]")
    }
  }
}
