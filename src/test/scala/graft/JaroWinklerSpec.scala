package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The native jaro_winkler expression: textbook values, an independent
  * reimplementation sweep, the boost-threshold gate, symmetry, and
  * codegen/eval agreement inside a real plan. */
class JaroWinklerSpec extends AnyFunSuite with SparkFixture {

  private def jw(a: String, b: String): Double =
    functions.JaroWinkler.score(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("classic textbook values (Winkler's own examples)") {
    // MARTHA/MARHTA: m=6, t=1, jaro=0.944..., prefix 3 → 0.961111...
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    // DIXON/DICKSONX: m=4, t=0, jaro=0.766..., prefix 2 → 0.813333...
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    // No shared prefix: boost is a no-op even above the gate.
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < 1e-12)
  }

  test("edge semantics: empty, identical, disjoint, symmetry") {
    assert(jw("", "") == 1.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("identical", "identical") == 1.0)
    assert(jw("abc", "xyz") == 0.0) // zero matches
    val pairs = Seq("MARTHA" -> "MARHTA", "DIXON" -> "DICKSONX",
      "prefix" -> "pref", "ab" -> "ba")
    pairs.foreach { case (a, b) => assert(jw(a, b) == jw(b, a)) }
  }

  test("the Winkler boost applies only above the 0.7 jaro gate") {
    // 6 shared prefix chars + 6 disjoint tail chars (the q_dedup_jaro
    // block shape): jaro = (6/12 + 6/12 + 6/6)/3 = 2/3 <= 0.7, so the
    // 4-char prefix must NOT earn a boost.
    val low = jw("abcdefghijkl", "abcdefmnopqr")
    assert(math.abs(low - 2.0 / 3.0) < 1e-12,
      s"boost leaked through the gate: $low")
    // One substitution in 12 chars: jaro = (11/12+11/12+1)/3 ≈ 0.9444
    // > 0.7, prefix 4 → boosted.
    val high = jw("abcdefghijkl", "abcdefghijkx")
    val jaro = (11.0 / 12 + 11.0 / 12 + 1.0) / 3
    assert(math.abs(high - (jaro + 4 * 0.1 * (1 - jaro))) < 1e-12)
  }

  /** Independent reimplementation (set-based, different code path) to
    * sweep against: matches via greedy window scan, transpositions via
    * ordered match sequences. */
  private def reference(s1: String, s2: String): Double = {
    if (s1.isEmpty && s2.isEmpty) return 1.0
    if (s1.isEmpty || s2.isEmpty) return 0.0
    val w = math.max(0, math.max(s1.length, s2.length) / 2 - 1)
    val used = collection.mutable.Set[Int]()
    val matches1 = collection.mutable.ArrayBuffer[Char]()
    val matchIdx2 = collection.mutable.ArrayBuffer[Int]()
    for (i <- s1.indices) {
      val cand = (math.max(0, i - w) to math.min(s2.length - 1, i + w))
        .find(j => !used(j) && s1(i) == s2(j))
      cand.foreach { j => used += j; matches1 += s1(i); matchIdx2 += j }
    }
    val m = matches1.size
    if (m == 0) return 0.0
    val matches2 = matchIdx2.sorted.map(s2(_))
    val t = matches1.zip(matches2).count { case (x, y) => x != y } / 2
    val j = (m.toDouble / s1.length + m.toDouble / s2.length +
      (m - t).toDouble / m) / 3
    if (j <= 0.7) j
    else {
      val p = s1.zip(s2).take(4).takeWhile { case (x, y) => x == y }.size
      j + p * 0.1 * (1 - j)
    }
  }

  test("agrees with an independent reimplementation over planted variants") {
    val base = "deduplication"
    val variants = Seq(
      base, "dedup", "deduplicatoin", "zeduplication", "dedUplication",
      "deduplicationX", "noitacilpuded", "dd", "deduplicaiton",
      "eduplication", "dedpulication", "a", "")
    for (a <- variants; b <- variants) {
      assert(math.abs(jw(a, b) - reference(a, b)) < 1e-12,
        s"mismatch on ($a, $b): ${jw(a, b)} vs ${reference(a, b)}")
    }
  }

  test("codegen and interpreted eval agree inside a real plan") {
    import spark.implicits._
    val df = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
      ("abc", "xyz"), ("same", "same"))
      .toDF("a", "b")
      .select($"a", $"b", expr("jaro_winkler(a, b)").as("jw"))
    val viaPlan = df.collect().map(r => r.getDouble(2)).toSeq
    val direct = Seq(jw("MARTHA", "MARHTA"), jw("DIXON", "DICKSONX"),
      jw("abc", "xyz"), jw("same", "same"))
    assert(viaPlan == direct)
  }

  test("null propagates, not crashes") {
    import spark.implicits._
    val df = Seq((Some("x"), None: Option[String]), (None, Some("y")))
      .toDF("a", "b")
      .select(expr("jaro_winkler(a, b)").as("jw"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("q_dedup_jaro finds the planted typo pairs and nothing cross-block") {
    val out = Catalog.byName("q_dedup_jaro").build(spark, sfDir).collect()
    assert(out.nonEmpty, "planted typos must surface")
    // Every surfaced pair clears the threshold and shares the 6-block.
    out.foreach { r =>
      assert(r.getAs[Double]("jw") >= 0.9)
      assert(r.getAs[String]("name_a").take(6) ==
        r.getAs[String]("name_b").take(6))
    }
  }
}
