package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native maximal-common-run extension around an aligned seed position
  * pair — the char-verify step of cross-document SPAN-level dedup
  * (`q_dedup_spans`): given texts a/b and 1-based positions pa/pb where
  * a fingerprint collision suggested a match, walk left and right while
  * characters stay equal and return the MAXIMAL common run containing
  * (pa, pb), packed into one long:
  *
  *   (start_a << 42) | (start_b << 21) | run_len      (21 bits each)
  *
  * or 0 when even a(pa) != b(pb) — i.e. the seed was a pure hash
  * collision. Packing keeps the expression primitive-long end to end
  * (no struct allocation inside whole-stage codegen); the 21-bit fields
  * cover the winnowing stage's own < 2^20-grams-per-document bound, and
  * oversize inputs fail LOUDLY (require) instead of bleeding bits.
  *
  * Correctness shape (what makes the caller collision-proof): the
  * returned run is CHARACTER-verified, so a false fingerprint seed can
  * only ever yield a true-but-short common run, which the caller's
  * min-length filter drops; and every true run of length ≥ the
  * winnowing guarantee (window + gram − 1) contains a delta-aligned
  * selected fingerprint in both documents, so extension from any of its
  * seeds reconstructs EXACTLY the same maximal [start_a, start_b, len]
  * triple — duplicates collapse under distinct.
  *
  * Comparison is by Java char (UTF-16 unit), identical to the winnowing
  * stage's String.substring gram extraction; code-unit vs code-point
  * positions coincide for BMP text (the corpus contract the fingerprint
  * stage already documents).
  *
  * Codegen: like [[JaroWinkler]], the generated code calls the static
  * [[SpanExtend.extend]] — a static method call inside whole-stage
  * codegen, never an interpreted CodegenFallback.
  */
object SpanExtend {
  /** 21-bit field bound shared with the SQL-side unpack expressions. */
  val fieldBits = 21
  val fieldMax: Long = (1L << fieldBits) - 1

  private def pack(startA: Long, startB: Long, len: Long): Long = {
    require(startA <= fieldMax && startB <= fieldMax && len <= fieldMax,
      s"span_extend fields exceed $fieldBits bits ($startA, $startB, $len) — pre-chunk")
    (startA << (2 * fieldBits)) | (startB << fieldBits) | len
  }

  /** Static extender, called from both eval and generated code.
    *
    * ASCII FAST PATH (r14 advice — the first cut decoded BOTH full
    * documents per seed, making per-seed cost O(|doc_a| + |doc_b|)
    * allocation + copy rather than the O(run length) the span family's
    * scale contract claims): when both inputs are pure ASCII — the
    * one-probe `isFullAscii` on the UTF8String bytes — byte index ==
    * UTF-16 unit index, so the walk reads the UTF8String bytes in
    * place: zero allocation, cost ∝ the run actually extended. Inputs
    * with any non-ASCII character fall back to a per-seed decode
    * (O(doc length) — the honest bound there; both paths return
    * identical packings for BMP text, spec-pinned in SpanDedupSpec). */
  def extend(a: UTF8String, b: UTF8String, pa: Int, pb: Int): Long =
    if (a.isFullAscii && b.isFullAscii) extendAscii(a, b, pa, pb)
    else {
      val s = a.toString
      val t = b.toString
      if (pa < 1 || pb < 1 || pa > s.length || pb > t.length) return 0L
      val i = pa - 1
      val j = pb - 1
      if (s.charAt(i) != t.charAt(j)) return 0L
      var lo = 0
      while (i - lo - 1 >= 0 && j - lo - 1 >= 0 &&
        s.charAt(i - lo - 1) == t.charAt(j - lo - 1)) lo += 1
      var hi = 1
      while (i + hi < s.length && j + hi < t.length &&
        s.charAt(i + hi) == t.charAt(j + hi)) hi += 1
      pack(pa - lo, pb - lo, lo + hi)
    }

  /** The ASCII walk WITHOUT the dispatch check — [[SpanExtendAscii]]'s
    * engine (r15). The per-call `isFullAscii` dispatch above scans BOTH
    * full documents per seed, and because every codegen row rebuilds a
    * fresh UTF8String over the join buffers, UTF8String's own memo
    * field never hits — jstack sampling over the sf0.1 extension stage
    * put 76% of runnable executor samples inside getIsFullAscii, ~60×
    * the walk itself (avg extended run: 10 chars). Callers that know
    * both inputs are ASCII (a per-DOCUMENT flag computed once in the
    * plan — `length(text) = octet_length(text)` ⟺ full ASCII for valid
    * UTF-8) route here and pay only the walk. PRECONDITION, not
    * re-checked: both inputs pure ASCII — byte index == char index.
    * On non-ASCII input the walk would mis-map positions; the only
    * caller is [[graft.operators.DedupQueries.extendSeeds]]-shaped code
    * gating on the per-doc flags, and SpanDedupSpec pins hinted ==
    * unhinted on mixed corpora. */
  def extendAscii(a: UTF8String, b: UTF8String, pa: Int, pb: Int): Long = {
    val la = a.numBytes
    val lb = b.numBytes
    // 1-based positions must address a real char in both texts.
    if (pa < 1 || pb < 1 || pa > la || pb > lb) return 0L
    val i = pa - 1
    val j = pb - 1
    if (a.getByte(i) != b.getByte(j)) return 0L
    var lo = 0
    while (i - lo - 1 >= 0 && j - lo - 1 >= 0 &&
      a.getByte(i - lo - 1) == b.getByte(j - lo - 1)) lo += 1
    var hi = 1
    while (i + hi < la && j + hi < lb &&
      a.getByte(i + hi) == b.getByte(j + hi)) hi += 1
    pack(pa - lo, pb - lo, lo + hi)
  }
}

case class SpanExtend(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ts = Seq(first.dataType, second.dataType, third.dataType, fourth.dataType)
    if (ts == Seq(StringType, StringType, IntegerType, IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        "span_extend requires (string, string, int, int), got " +
          ts.map(_.catalogString).mkString(", "))
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "span_extend"

  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable || fourth.nullable

  override protected def nullSafeEval(a: Any, b: Any, pa: Any, pb: Any): Any =
    SpanExtend.extend(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      pa.asInstanceOf[Int], pb.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, pa, pb) =>
      s"${ev.value} = graft.functions.SpanExtend.extend($a, $b, $pa, $pb);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): SpanExtend =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}

/** `span_extend_ascii` — the ASCII-hinted twin of [[SpanExtend]] (r15
  * optimization): identical signature and packing, but the generated
  * code calls [[SpanExtend.extendAscii]], skipping the per-call
  * full-document `isFullAscii` scans. ONLY for call sites that guard on
  * per-document ASCII flags (`length(text) = octet_length(text)`), as
  * `DedupQueries.extendSeeds` / `crossSpansFromFps` do with
  * `when(ascii_a AND ascii_b, span_extend_ascii(...))
  *  .otherwise(span_extend(...))` — on non-ASCII input this variant
  * would mis-map byte positions to char positions. SpanDedupSpec pins
  * hinted == unhinted on ASCII inputs and the guarded composition on a
  * mixed-script corpus. */
case class SpanExtendAscii(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ts = Seq(first.dataType, second.dataType, third.dataType, fourth.dataType)
    if (ts == Seq(StringType, StringType, IntegerType, IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        "span_extend_ascii requires (string, string, int, int), got " +
          ts.map(_.catalogString).mkString(", "))
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "span_extend_ascii"

  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable || fourth.nullable

  override protected def nullSafeEval(a: Any, b: Any, pa: Any, pb: Any): Any =
    SpanExtend.extendAscii(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], pa.asInstanceOf[Int], pb.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, pa, pb) =>
      s"${ev.value} = graft.functions.SpanExtend.extendAscii($a, $b, $pa, $pb);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): SpanExtendAscii =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}
