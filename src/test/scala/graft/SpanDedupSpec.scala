package graft

import graft.functions.SpanExtend
import graft.operators.DedupQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** q_dedup_spans / q_dedup_span_clean — cross-document SPAN-level dedup.
  *
  * Contract pinned here:
  *  1. planted shared 50+-char spans are recovered EXACTLY (offsets,
  *     length, text) regardless of which document carries them first;
  *  2. on a planted fixture the pipeline equals an independent
  *     brute-force maximal-common-run scan (all pairs × all alignments,
  *     zero shared code);
  *  3. candidate volume tracks FINGERPRINT COLLISIONS, not doc pairs —
  *     growing a corpus with unrelated docs leaves candidates flat
  *     while the pair count grows quadratically;
  *  4. the cleaned-corpus projection excises exactly the covered chars
  *     with keep-first survivor semantics (interval merge + splice);
  *  5. the SpanExtend expression itself: packing, maximality, the
  *     collision path, and codegen == interpreted eval.
  */
class SpanDedupSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def spans(rows: Seq[(Long, String)]): Set[(Long, Long, Long, Long, Long, String)] =
    DedupQueries.spansOf(df(rows)).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getString(5))).toSet

  /** Independent brute-force reference: for every doc pair and every
    * alignment delta, scan the overlap once and emit maximal equal-char
    * runs of length >= minLen. O(n_pairs * (len_a + len_b) * len) —
    * fine for planted fixtures, the ground truth the banded pipeline
    * must equal. */
  private def bruteSpans(rows: Seq[(Long, String)], minLen: Int): Set[(Long, Long, Long, Long, Long, String)] = {
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long, Long, Long, String)]
    for {
      (ida, a) <- rows
      (idb, b) <- rows
      if ida < idb
      delta <- -(b.length - 1) to (a.length - 1)
    } {
      // positions i in a, i - delta in b, both 0-based in-range
      val i0 = math.max(0, delta)
      val i1 = math.min(a.length, b.length + delta)
      var i = i0
      var runStart = -1
      def close(end: Int): Unit = {
        if (runStart >= 0 && end - runStart >= minLen) {
          val len = end - runStart
          out += ((ida, idb, (runStart + 1).toLong, (runStart - delta + 1).toLong,
            len.toLong, a.substring(runStart, end)))
        }
        runStart = -1
      }
      while (i < i1) {
        if (a.charAt(i) == b.charAt(i - delta)) { if (runStart < 0) runStart = i }
        else close(i)
        i += 1
      }
      close(i1)
    }
    out.toSet
  }

  private val filler1 =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho"
  private val filler2 =
    "one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen"
  private val shared =
    "the shared boilerplate block that repeats verbatim across documents!" // 69 chars
  require(shared.length >= DedupQueries.spanMinLen + 10)

  test("planted mid-text span is recovered exactly, both doc orders") {
    // (1, 2): span in the LOWER doc_id first; (4, 3): span planted in
    // the lower doc_id but the pair arrives reversed in input order —
    // both must report canonically as doc_a < doc_b with exact offsets.
    // Distinct delimiters around the planted span: maximal extension
    // must stop EXACTLY at the span boundaries (matching filler spaces
    // around it would legitimately extend the run).
    val rows = Seq(
      1L -> (filler1 + "(" + shared + ") tail one"),
      2L -> ("lead in text goes here [" + shared + "] " + filler2),
      3L -> ("different lead for doc three <" + shared),
      4L -> (shared + "> " + filler1.substring(0, 60)))
    val got = spans(rows)
    val sa1 = filler1.length + 2 // 1-based start in doc 1
    val sb2 = "lead in text goes here [".length + 1
    assert(got.contains((1L, 2L, sa1.toLong, sb2.toLong, shared.length.toLong, shared)),
      s"missing exact (1,2) span; got $got")
    val sa3 = "different lead for doc three <".length + 1
    assert(got.contains((3L, 4L, sa3.toLong, 1L, shared.length.toLong, shared)),
      s"missing exact (3,4) span; got $got")
    // no hallucinated extras beyond brute-force ground truth
    assert(got == bruteSpans(rows, DedupQueries.spanMinLen))
  }

  test("pipeline equals brute force on a messy planted fixture") {
    // overlapping repeats, a full duplicate, multiple spans per pair,
    // same-delta twin spans separated by a mismatch gap
    val twin = "the second shared span sits right after the gap marker!" // 55
    require(twin.length == 55)
    val rows = Seq(
      10L -> (filler1 + " " + shared + " " + filler2),
      11L -> (filler1 + " " + shared + " " + filler2), // exact dup of 10
      12L -> (shared + " gap-a " + twin),
      13L -> (shared + " gap-b " + twin), // two same-delta spans, gap between
      14L -> filler2,
      15L -> ("unrelated " + filler1.toUpperCase))
    val got = spans(rows)
    val want = bruteSpans(rows, DedupQueries.spanMinLen)
    assert(got == want,
      s"pipeline != brute: extra=${got -- want}, missing=${want -- got}")
    // the same-delta twin spans must be TWO rows, not one merged run
    assert(want.count { case (a, b, _, _, _, _) => a == 12L && b == 13L } == 2)
  }

  test("sub-threshold shared runs are filtered, not reported") {
    val short = "just forty-nine shared characters padding!!!!!!!!" // 49
    require(short.length == DedupQueries.spanMinLen - 1)
    val rows = Seq(
      20L -> (filler1 + " " + short),
      21L -> (short + " " + filler2))
    assert(spans(rows).isEmpty)
  }

  test("fixture corpus spans equal brute force on the span-bearing subset") {
    // Full all-pairs × all-deltas brute force over 500 fixture docs is
    // ~1e10 char compares — instead brute-verify the subset holding
    // every span-bearing doc (ground truth for all REPORTED pairs and
    // for absence among 40 controls); the sf0.01 DuckDB twin is the
    // full-corpus gate.
    val all = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val full = spans(all)
    assert(full.nonEmpty, "sf0.001 fixture has near-dup docs; spans expected")
    val hitIds = full.flatMap(s => Seq(s._1, s._2))
    val subsetIds = hitIds ++ all.map(_._1).sorted.take(40)
    val rows = all.filter(r => subsetIds.contains(r._1))
    val got = spans(rows)
    val want = bruteSpans(rows, DedupQueries.spanMinLen)
    assert(got == want,
      s"fixture mismatch: extra=${(got -- want).take(3)}, missing=${(want -- got).take(3)}")
    // restriction consistency: the full run restricted to the subset
    // equals the subset run (the memo-free pipeline is compositional)
    assert(full.filter(s => subsetIds.contains(s._1) && subsetIds.contains(s._2)) == got)
  }

  test("candidate volume tracks fingerprint collisions, not doc pairs") {
    // Grow a corpus of UNRELATED docs (deterministic hex noise) around
    // one planted duplicated pair: doc pairs grow quadratically, but
    // seed candidates must stay ~flat (only the planted collisions).
    def noise(seed: Int): String = {
      val rnd = new java.util.Random(seed)
      (0 until 40).map(_ => java.lang.Long.toHexString(rnd.nextLong()))
        .mkString(" ")
    }
    def corpus(n: Int): Seq[(Long, String)] =
      (0 until n).map(i => (i.toLong, noise(7000 + i))) ++
        Seq(9000L -> (filler1 + " " + shared), 9001L -> (shared + " " + filler2))
    def cands(n: Int): Long =
      DedupQueries.spanSeeds(df(corpus(n))).count()
    val c50 = cands(50)
    val c100 = cands(100)
    val c200 = cands(200)
    info(s"seed candidates: n=50 -> $c50, n=100 -> $c100, n=200 -> $c200")
    assert(c50 > 0, "planted pair must collide")
    // quadratic growth would read ~4x per doubling; demand far less
    assert(c200 <= c50 + 60,
      s"candidates grew with corpus size ($c50 -> $c200) — join is not collision-bounded")
  }

  test("catalog rows run and agree with each other on the fixture") {
    val report = Catalog.byName("q_dedup_spans").build(spark, sfDir)
    val clean = Catalog.byName("q_dedup_span_clean").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    // every doc present; unaffected docs pass through verbatim
    assert(clean.keySet == docs.keySet)
    val touched = report.select("doc_b").as[Long].collect().toSet
    for ((id, text) <- docs) {
      val (ct, removed) = clean(id)
      assert(removed == text.length - ct.length)
      if (!touched.contains(id)) assert(ct == text, s"doc $id altered with no span")
      else assert(ct.length < text.length, s"doc $id has spans but lost no chars")
    }
    // keep-first: the smallest doc_id of every reported pair keeps its text
    val firsts = report.select("doc_a").as[Long].collect().toSet
    for (id <- firsts -- touched) assert(clean(id)._1 == docs(id))
  }

  test("clean splice handles overlap, adjacency, containment and full cover") {
    // Drive the splice through the catalog path semantics directly:
    // brute-compute expected cleaned text by char cover.
    val rows = Seq(
      30L -> (shared + " " + filler1 + " " + shared),   // two spans, keeps all (first)
      31L -> (shared + " " + filler1 + " " + shared),   // exact dup: fully covered
      32L -> (shared.substring(0, 60) + filler2))        // prefix overlap with 30/31
    val report = DedupQueries.spansOf(df(rows)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    val cover: Map[Long, Set[Long]] = report
      .groupBy(_._2).view.mapValues(_.flatMap { case (_, _, sb, len) =>
        sb until (sb + len) }.toSet).toMap
    val expected = rows.map { case (id, text) =>
      val cov = cover.getOrElse(id, Set.empty)
      id -> text.zipWithIndex.collect {
        case (c, i) if !cov.contains((i + 1).toLong) => c }.mkString
    }.toMap
    // doc 30 never appears as doc_b with a smaller partner carrying its
    // spans first? it does vs nothing smaller — keep-first keeps it whole.
    assert(!cover.contains(30L))
    assert(cover.contains(31L) && expected(31L).isEmpty,
      "exact dup must clean to empty")
    // spark-side splice equality
    val got = cleanOf(rows)
    assert(got == expected, s"splice mismatch: $got vs $expected")
  }

  /** Run the q_dedup_span_clean splice over an arbitrary corpus by
    * pointing the aggregate HOF at spansOf(rows) — mirrors the catalog
    * row's plan without the sfDir read. */
  private def cleanOf(rows: Seq[(Long, String)]): Map[Long, String] = {
    import org.apache.spark.sql.functions._
    val iv = DedupQueries.spansOf(df(rows))
      .select(col("doc_b").as("doc_id"),
        struct(col("start_b").as("s"),
          (col("start_b") + col("span_len") - 1).as("e")).as("se"))
      .groupBy("doc_id").agg(sort_array(collect_list(col("se"))).as("iv"))
    df(rows).join(iv, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("iv").isNull, col("text")).otherwise(expr(
          """aggregate(iv,
            |  struct(cast(0 as bigint) as last, '' as acc),
            |  (st, x) -> struct(
            |    greatest(st.last, x.e) as last,
            |    if(x.s > st.last + 1,
            |       concat(st.acc, substring(text, cast(st.last + 1 as int),
            |         cast(x.s - st.last - 1 as int))),
            |       st.acc) as acc),
            |  st -> concat(st.acc,
            |    substring(text, cast(st.last + 1 as int))))""".stripMargin))
          .as("ct"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  // ---- SpanExtend expression unit behavior ----

  private def ext(a: String, b: String, pa: Int, pb: Int): (Long, Long, Long) = {
    val p = SpanExtend.extend(UTF8String.fromString(a), UTF8String.fromString(b), pa, pb)
    ((p >>> 42) & SpanExtend.fieldMax, (p >>> 21) & SpanExtend.fieldMax,
      p & SpanExtend.fieldMax)
  }

  test("SpanExtend: maximal run, packing, collision and bounds paths") {
    // seed mid-run extends to the full maximal run
    assert(ext("xxABCDEFyy", "zzzABCDEFw", 5, 6) == (3L, 4L, 6L))
    // run at text edges
    assert(ext("ABCDE tail", "ABCDE other", 1, 1) == (1L, 1L, 6L))
    // pure collision: chars differ at seed -> 0 sentinel
    assert(SpanExtend.extend(UTF8String.fromString("abc"),
      UTF8String.fromString("xyz"), 2, 2) == 0L)
    // out-of-range positions -> 0, never an exception
    assert(SpanExtend.extend(UTF8String.fromString("abc"),
      UTF8String.fromString("abc"), 9, 1) == 0L)
    assert(SpanExtend.extend(UTF8String.fromString("abc"),
      UTF8String.fromString("abc"), 0, 1) == 0L)
  }

  test("SpanExtend: ASCII byte-walk and non-ASCII decode paths agree " +
      "with an independent char-walk reference") {
    // Independent reference: plain Java-char walk, no shared code with
    // either production path.
    def ref(s: String, t: String, pa: Int, pb: Int): Long = {
      if (pa < 1 || pb < 1 || pa > s.length || pb > t.length) return 0L
      val (i, j) = (pa - 1, pb - 1)
      if (s.charAt(i) != t.charAt(j)) return 0L
      var lo = 0
      while (i - lo - 1 >= 0 && j - lo - 1 >= 0 &&
        s.charAt(i - lo - 1) == t.charAt(j - lo - 1)) lo += 1
      var hi = 1
      while (i + hi < s.length && j + hi < t.length &&
        s.charAt(i + hi) == t.charAt(j + hi)) hi += 1
      ((pa - lo).toLong << 42) | ((pb - lo).toLong << 21) | (lo + hi).toLong
    }
    val rnd = new scala.util.Random(77)
    val asciiAlpha = "abXY "
    val bmpAlpha = "abXY éλß" // forces the decode path (non-ASCII)
    def mk(alpha: String, n: Int): String =
      Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    for (alpha <- Seq(asciiAlpha, bmpAlpha); _ <- 1 to 200) {
      val core = mk(alpha, 1 + rnd.nextInt(12))
      val s = mk(alpha, rnd.nextInt(6)) + core + mk(alpha, rnd.nextInt(6))
      val t = mk(alpha, rnd.nextInt(6)) + core + mk(alpha, rnd.nextInt(6))
      val pa = 1 + rnd.nextInt(s.length)
      val pb = 1 + rnd.nextInt(t.length)
      val got = SpanExtend.extend(
        UTF8String.fromString(s), UTF8String.fromString(t), pa, pb)
      assert(got == ref(s, t, pa, pb),
        s"path divergence on alpha='$alpha' s='$s' t='$t' ($pa,$pb)")
    }
    // The fast path is genuinely byte-indexed: a matched pair where one
    // side is non-ASCII must still agree (mixed -> decode path).
    val (s1, t1) = ("xxABCDé end", "ABCDé other")
    assert(SpanExtend.extend(UTF8String.fromString(s1),
      UTF8String.fromString(t1), 4, 2) == ref(s1, t1, 4, 2))
  }

  test("SpanExtend: codegen and interpreted eval agree") {
    import org.apache.spark.sql.functions._
    val rows = Seq(
      ("xx" + shared + "yy", "zz" + shared, 10, 10),
      (filler1, filler2, 3, 3),
      (shared, shared, 1, 1))
      .toDF("a", "b", "pa", "pb")
    val viaCodegen = rows.select(expr("span_extend(a, b, pa, pb)"))
      .collect().map(_.getLong(0)).toSeq
    val viaEval = rows.collect().map(r =>
      SpanExtend.extend(UTF8String.fromString(r.getString(0)),
        UTF8String.fromString(r.getString(1)), r.getInt(2), r.getInt(3))).toSeq
    assert(viaCodegen == viaEval)
  }

  test("span_extend_ascii equals span_extend on ASCII; the per-doc " +
      "ASCII-gated extension is exact on a mixed-script corpus") {
    import org.apache.spark.sql.functions._
    // The r15 hinted variant skips the per-call full-document ASCII
    // scan; on ASCII inputs it must be bit-equal to the self-checking
    // form, both through SQL resolution (codegen) and the static.
    val rnd = new scala.util.Random(99)
    def mk(n: Int): String =
      Seq.fill(n)("abXY "(rnd.nextInt(5))).mkString
    val cases = (1 to 200).map { _ =>
      val core = mk(1 + rnd.nextInt(12))
      val s = mk(rnd.nextInt(6)) + core + mk(rnd.nextInt(6))
      val t = mk(rnd.nextInt(6)) + core + mk(rnd.nextInt(6))
      (s, t, 1 + rnd.nextInt(s.length), 1 + rnd.nextInt(t.length))
    }
    cases.foreach { case (s, t, pa, pb) =>
      assert(SpanExtend.extendAscii(UTF8String.fromString(s),
        UTF8String.fromString(t), pa, pb) ==
        SpanExtend.extend(UTF8String.fromString(s),
          UTF8String.fromString(t), pa, pb))
    }
    val viaSql = cases.toDF("a", "b", "pa", "pb")
      .select(expr("span_extend_ascii(a, b, pa, pb)"),
        expr("span_extend(a, b, pa, pb)"))
      .collect()
    viaSql.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // The guarded extendSeeds composition (when(ascii) hinted, otherwise
    // self-checking) on a corpus MIXING ASCII and non-ASCII documents:
    // a shared run between two ASCII docs, between an ASCII and a
    // non-ASCII doc, and between two non-ASCII docs must all come out
    // exactly as the unhinted spansOf reports them.
    val run = "the quick shared span of at least fifty characters padding!"
    val mixed = Seq(
      1L -> s"ascii head $run ascii tail one",
      2L -> s"other ascii ${run} trailing text",
      3L -> s"é-prefixed non-ascii $run suffix λ",
      4L -> s"ß second non-ascii $run tail 中")
    val got = spans(mixed)
    assert(got == bruteSpans(mixed, DedupQueries.spanMinLen),
      s"mixed-script guarded pipeline diverged from brute force: $got")
    // All 6 pairs share `run`, so every pair must report something.
    assert(got.map(r => (r._1, r._2)).size == 6,
      s"expected all 6 pairs reported, got $got")
  }

  // ---- crossSpans / q_contamination_spans ----

  /** Brute cross-side reference: maximal runs >= minLen between every
    * (rest, bench) pair — bruteSpans' loop without the id-order
    * canonicalization (sides are disjoint). */
  private def bruteCross(rest: Seq[(Long, String)], bench: Seq[(Long, String)],
      minLen: Int): Set[(Long, Long, Long, Long, Long)] = {
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long, Long, Long)]
    for { (idr, a) <- rest; (idb, b) <- bench
          delta <- -(b.length - 1) to (a.length - 1) } {
      val i0 = math.max(0, delta)
      val i1 = math.min(a.length, b.length + delta)
      var i = i0
      var runStart = -1
      def close(end: Int): Unit = {
        if (runStart >= 0 && end - runStart >= minLen)
          out += ((idr, idb, (runStart + 1).toLong,
            (runStart - delta + 1).toLong, (end - runStart).toLong))
        runStart = -1
      }
      while (i < i1) {
        if (a.charAt(i) == b.charAt(i - delta)) { if (runStart < 0) runStart = i }
        else close(i)
        i += 1
      }
      close(i1)
    }
    out.toSet
  }

  test("crossSpans: planted benchmark leak recovered exactly; equals " +
      "brute force; clean training docs stay silent") {
    val bench = Seq(
      100L -> ("benchmark question one: " + shared),
      101L -> filler2)
    val rest = Seq(
      1L -> (filler1 + " <" + shared + "> trailing context here"), // leaks 100
      2L -> ("totally unrelated training document about nothing at all x"),
      3L -> (filler2 + " and some extra tail"))                     // leaks 101
    val got = DedupQueries.crossSpans(df(rest), df(bench))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val want = bruteCross(rest, bench, DedupQueries.spanMinLen)
    assert(got == want,
      s"crossSpans != brute: extra=${got -- want}, missing=${want -- got}")
    assert(got.exists(s => s._1 == 1L && s._2 == 100L))
    assert(got.exists(s => s._1 == 3L && s._2 == 101L))
    assert(!got.exists(_._1 == 2L), "the clean doc must not report")
    // exact offsets for the delimited plant
    val sr = filler1.length + 3 // after " <"
    val sb = "benchmark question one: ".length + 1
    assert(got.contains((1L, 100L, sr.toLong, sb.toLong, shared.length.toLong)))
  }

  test("q_contamination_spans catalog row matches its own span report") {
    import org.apache.spark.sql.functions._
    val gate = Dsl.md5Gate(col("doc_id"), "0d")
    val docs = Tables.documents(spark, sfDir)
    val spansDf = DedupQueries.crossSpans(docs.where(not(gate)),
      docs.where(gate)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    val want = spansDf.groupBy(_._1).map { case (d, ss) =>
      (d, ss.length.toLong, ss.map(_._2).distinct.length.toLong,
        ss.map(_._3).max) }.toSet
    val got = Catalog.byName("q_contamination_spans").build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == want)
  }
}
