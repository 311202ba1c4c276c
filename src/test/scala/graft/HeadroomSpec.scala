package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Every documented Long-overflow envelope, ASSERTED (r11 verdict ask
  * #2): the r10 q_text_zipf incident was a documented-headroom comment
  * whose bound was silently crossed by fixture growth. Comments don't
  * guard; this spec derives each documented bound's OPERANDS from the
  * largest fixture (sf0.1 — the bench SF, the worst case any gate
  * runs) and asserts ≥ 10× margin below the promotion ceiling, so
  * fixture growth or a new SF fails HERE, loudly, before an
  * engine-divergent wrap.
  *
  * Each entry names the row, quotes its documented bound, and computes
  * the worst-case product in BigInt from the same fixture stages the
  * row reads. The two negative controls prove (a) the margin checker
  * itself trips on a violation and (b) past the bound Spark's ANSI
  * mode DIES loudly (ARITHMETIC_OVERFLOW) rather than wrapping — the
  * failure mode the documented promotions exist to pre-empt. */
class HeadroomSpec extends AnyFunSuite with SparkFixture {

  /** The largest fixture: bounds must hold where the data is biggest. */
  private val hdDir = "/root/testdata/sf0.1"

  private val LongMax = BigInt(Long.MaxValue)
  private val Dec38Max = BigInt(10).pow(38) - 1

  private def assertHeadroom(name: String, worst: BigInt,
      ceiling: BigInt = LongMax, factor: Int = 10): Unit = {
    assert(worst > 0, s"$name: degenerate operand derivation")
    val margin = ceiling / worst
    info(s"$name: worst=$worst margin=${margin}x")
    assert(margin >= factor,
      s"$name: headroom ${margin}x < ${factor}x of the documented bound " +
        "— apply the row's documented DECIMAL(38,0) promotion NOW")
  }

  test("q_text_collocations: cab·B·10⁶ (max-bigram × total-bigrams)") {
    import spark.implicits._
    val bi = operators.TextQueries.Tokenized(spark, hdDir)
      .select(explode(arrays_zip(
        slice($"lw", lit(1), greatest(size($"lw") - 1, lit(0))),
        slice($"lw", lit(2), greatest(size($"lw") - 1, lit(0))))).as("p"))
      .groupBy($"p").agg(count(lit(1)).as("c"))
      .agg(max($"c").as("cab"), sum($"c").as("b")).head()
    assertHeadroom("collocations",
      BigInt(bi.getLong(0)) * BigInt(bi.getLong(1)) * 1000000)
  }

  test("q_basket_rules: lift numerator c·n·10⁶ ≤ n²·10⁶") {
    val n = Tables.orders(spark, hdDir).count()
    assertHeadroom("basket_rules", BigInt(n) * BigInt(n) * 1000000)
  }

  test("q_graph_modularity: q_ppm numerator ≤ 8m²·10⁶ (r11-advice " +
      "corrected bound — nsum can approach +4m²)") {
    val m = operators.GraphQueries.coEdges(spark, hdDir).count()
    assertHeadroom("modularity", BigInt(8) * BigInt(m) * BigInt(m) * 1000000)
  }

  test("q_ts_beta: ΣrΣm ≤ (d·rmax)² over per-type daily log-returns") {
    import spark.implicits._
    val daily = Tables.events(spark, hdDir)
      .groupBy($"event_type", to_date(date_trunc("day", $"ts")).as("day"))
      .agg((sum($"value".cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        * 100).cast("long").as("c"))
    val mm = daily.agg(max($"c").as("hi"), min($"c").as("lo"),
      countDistinct($"day").as("d")).head()
    val (hi, lo, d) = (mm.getLong(0), mm.getLong(1), mm.getLong(2))
    assert(lo > 0, "beta derivation expects positive daily volume")
    val rmaxMicro = math.ceil(math.log(hi.toDouble / lo) * 1e6).toLong
    assertHeadroom("ts_beta",
      (BigInt(d) * BigInt(rmaxMicro)).pow(2))
  }

  test("q_vec_diversity: Σ_d S_d² per label (micro-quantized moments)") {
    import spark.implicits._
    val s2 = Tables.embeddings(spark, hdDir)
      .select($"label", posexplode($"embedding").as(Seq("d", "x")))
      .groupBy($"label", $"d")
      .agg(sum(floor($"x".cast("double") * 1e6).cast("long")).as("s"))
      .groupBy($"label")
      .agg(sum($"s" * $"s").as("ss"), count(lit(1)).as("nd"))
      .agg(max($"ss")).head().getLong(0)
    assertHeadroom("vec_diversity", BigInt(s2))
  }

  test("q_events_decay / q_stream_decay: day_cents·10⁶") {
    import spark.implicits._
    val maxDay = Tables.events(spark, hdDir)
      .groupBy($"event_type", to_date(date_trunc("day", $"ts")).as("day"))
      .agg((sum($"value".cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        * 100).cast("long").as("c"))
      .agg(max($"c")).head().getLong(0)
    assertHeadroom("events_decay", BigInt(maxDay) * 1000000)
  }

  test("q_stat_jarque_bera: Σc⁴ inside DECIMAL(38,0) (the row is " +
      "already promoted — assert the PROMOTED envelope)") {
    import spark.implicits._
    val st = operators.StatTestQueries.cents(spark, hdDir)
      .agg(max(abs($"c")).as("cmax"), count(lit(1)).as("n")).head()
    val (cmax, n) = (st.getLong(0), st.getLong(1))
    assertHeadroom("jarque_bera", BigInt(n) * BigInt(cmax).pow(4), Dec38Max)
  }

  test("q_graph_pagerank: fixed-point mass 850·(N·10⁶)") {
    import spark.implicits._
    val e = Tables.orders(spark, hdDir)
      .join(Tables.lineitem(spark, hdDir), $"o_orderkey" === $"l_orderkey")
      .select(concat(lit("c"), $"o_custkey").as("src"),
        concat(lit("s"), $"l_suppkey").as("dst"))
    val nNodes = e.select($"src".as("n")).union(e.select($"dst".as("n")))
      .distinct().count()
    assertHeadroom("pagerank", BigInt(850) * BigInt(nNodes) * 1000000)
  }

  test("q_graph_hits: auth² ≤ max_deg²·n over the co-purchase graph") {
    import spark.implicits._
    val e = Tables.orders(spark, hdDir)
      .join(Tables.lineitem(spark, hdDir), $"o_orderkey" === $"l_orderkey")
      .select(concat(lit("c"), $"o_custkey").as("src"),
        concat(lit("s"), $"l_suppkey").as("dst")).distinct()
    val maxDeg = e.select($"src".as("n")).union(e.select($"dst".as("n")))
      .groupBy($"n").agg(count(lit(1)).as("d"))
      .agg(max($"d")).head().getLong(0)
    val nNodes = e.select($"src".as("n")).union(e.select($"dst".as("n")))
      .distinct().count()
    assertHeadroom("hits",
      BigInt(maxDeg) * BigInt(maxDeg) * BigInt(nNodes))
  }

  test("q_stat_mann_whitney: rank sum r2 ≤ n(2n+1); ties tie3 ≤ " +
      "n·max_tie²") {
    import spark.implicits._
    val cs = operators.StatTestQueries.cents(spark, hdDir)
    val n = cs.count()
    assertHeadroom("mann_whitney r2", BigInt(n) * (2 * BigInt(n) + 1))
    val maxTie = cs.groupBy($"c").agg(count(lit(1)).as("t"))
      .agg(max($"t")).head().getLong(0)
    assertHeadroom("mann_whitney tie3",
      BigInt(n) * BigInt(maxTie) * BigInt(maxTie))
  }

  test("q_sample_domain_mix: tok·10⁶ per source") {
    import spark.implicits._
    val maxTok = Tables.documents(spark, hdDir)
      .groupBy($"source")
      .agg(sum(size(split($"text", " ")).cast("long")).as("tok"))
      .agg(max($"tok")).head().getLong(0)
    assertHeadroom("domain_mix", BigInt(maxTok) * 1000000)
  }

  test("q_win_rolling_corr: pearson n·Σv² ≤ 49·vmax² over daily cents") {
    import spark.implicits._
    val vmax = Tables.events(spark, hdDir)
      .groupBy($"event_type", to_date(date_trunc("day", $"ts")).as("day"))
      .agg((sum($"value".cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        * 100).cast("long").as("v"))
      .agg(max(abs($"v"))).head().getLong(0)
    assertHeadroom("rolling_corr", BigInt(49) * BigInt(vmax) * BigInt(vmax))
  }

  test("q_vec_feature_hash: Σ|b_v| ≤ n_label·64·10⁶") {
    import spark.implicits._
    val maxLabel = Tables.embeddings(spark, hdDir)
      .groupBy($"label").agg(count(lit(1)).as("n"))
      .agg(max($"n")).head().getLong(0)
    assertHeadroom("feature_hash", BigInt(maxLabel) * 64 * 1000000)
  }

  test("q_stream_vec_index: per-(cell, dim) sum |s| ≤ n·xmax·10⁶") {
    import spark.implicits._
    val st = Tables.embeddings(spark, hdDir)
      .select(posexplode($"embedding").as(Seq("d", "x")))
      .agg(max(abs($"x".cast("double"))).as("xmax"),
        count(lit(1)).as("nd")).head()
    val worst = BigInt(math.ceil(st.getDouble(0) * 1e6).toLong) *
      BigInt(st.getLong(1) / 64) // n vectors = component rows / 64
    assertHeadroom("stream_vec_index", worst)
  }

  test("q_agg_weighted_median: per-group Σw (the cumulative window's " +
      "peak) over quantity weights") {
    import spark.implicits._
    val maxGroup = Tables.lineitem(spark, hdDir)
      .groupBy($"l_returnflag")
      .agg(sum($"l_quantity".cast("long")).as("w"))
      .agg(max($"w")).head().getLong(0)
    assertHeadroom("weighted_median", BigInt(maxGroup))
  }

  test("q_ml_auc: 2U ≤ 2·n² over the document count (the documented " +
      "DECIMAL promotion past ~2·10⁹ docs)") {
    val n = Tables.documents(spark, hdDir).count()
    assertHeadroom("ml_auc", BigInt(2) * BigInt(n) * BigInt(n))
  }

  test("q_prep_loo_encode: per-category Σ cents") {
    import spark.implicits._
    val maxCat = Tables.orders(spark, hdDir)
      .groupBy($"o_orderpriority")
      .agg(sum((graft.Dsl.dec2($"o_totalprice") * 100).cast("long")).as("s"))
      .agg(max($"s")).head().getLong(0)
    assertHeadroom("loo_encode", BigInt(maxCat))
  }

  test("negative control: the margin checker trips on a violation") {
    val ex = intercept[org.scalatest.exceptions.TestFailedException] {
      assertHeadroom("planted", LongMax / 5)
    }
    assert(ex.getMessage.contains("headroom"))
  }

  test("negative control: past the bound Spark ANSI mode dies loudly " +
      "instead of wrapping") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(Long.MaxValue / 2, Long.MaxValue / 2, Long.MaxValue / 2)
        .toDF("x").agg(sum($"x" * 2)).head()
    }
    val msg = ex.toString
    assert(msg.contains("ARITHMETIC_OVERFLOW") || msg.contains("overflow"),
      s"expected a loud overflow, got: $msg")
  }
}
