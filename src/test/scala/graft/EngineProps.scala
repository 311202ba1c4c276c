package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based invariants on generated mini-DataFrames (SURVEY.md §5
  * item 3). ScalaCheck runs under sbt's native scalacheck framework; 10
  * cases per property keeps the Spark-job fan-out reasonable. */
object EngineProps extends Properties("graft") with SparkFixture {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val word =
    Gen.oneOf("spark", "data", "row", "scan", "join", "key", "hash", "the", "a", "value")
  private val docGen: Gen[String] =
    Gen.chooseNum(3, 20).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  property("exact dedup is idempotent") = forAll(Gen.listOf(docGen)) { texts =>
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def collapse(d: org.apache.spark.sql.DataFrame) =
      d.groupBy(md5($"text").as("h")).agg(min($"doc_id").as("doc_id"))
        .select($"doc_id", $"h")
    val once = collapse(df).collect().toSet
    val twice = collapse(collapse(df)
      .join(df, "doc_id").select($"doc_id", $"text")).collect().toSet
    once == twice
  }

  property("unionAll counts are additive") =
    forAll(Gen.listOf(Gen.chooseNum(0, 100)), Gen.listOf(Gen.chooseNum(0, 100))) {
      (a, b) =>
        import spark.implicits._
        val da = a.toDF("x"); val db = b.toDF("x")
        da.unionAll(db).count() == (a.size + b.size).toLong
    }

  property("exceptAll implements multiset difference") =
    forAll(Gen.listOf(Gen.chooseNum(0, 10)), Gen.listOf(Gen.chooseNum(0, 10))) {
      (a, b) =>
        import spark.implicits._
        val got = a.toDF("x").exceptAll(b.toDF("x"))
          .collect().map(_.getInt(0)).groupBy(identity).view.mapValues(_.length).toMap
        val bCnt = b.groupBy(identity).view.mapValues(_.length).toMap
        val want = a.groupBy(identity).view
          .mapValues(_.length).toMap
          .map { case (k, n) => k -> math.max(0, n - bCnt.getOrElse(k, 0)) }
          .filter(_._2 > 0)
        got == want
    }

  property("window running sum ends at the group total") =
    forAll(Gen.listOf(Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(-50, 50)))) {
      rows =>
        import spark.implicits._
        val df = rows.zipWithIndex
          .map { case ((u, v), i) => (u, i.toLong, v.toLong) }
          .toDF("user_id", "seq", "v")
        val w = Window.partitionBy($"user_id").orderBy($"seq")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val last = df.withColumn("run", sum($"v").over(w))
          .withColumn("rn", row_number().over(
            Window.partitionBy($"user_id").orderBy($"seq".desc)))
          .where($"rn" === 1)
          .select($"user_id", $"run")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = rows.groupBy(_._1).view
          .mapValues(_.map(_._2.toLong).sum).toMap
        last == want
    }

  property("pivot then unpivot recovers the (key, value, count) triples") =
    forAll(Gen.listOf(Gen.zip(Gen.chooseNum(0L, 3L), Gen.oneOf("a", "b", "c")))) {
      rows =>
        import spark.implicits._
        val df = rows.toDF("k", "v")
        val wide = df.groupBy($"k").pivot("v", Seq("a", "b", "c"))
          .agg(count(lit(1)))
        val back = wide.unpivot(Array($"k"), Array($"a", $"b", $"c"), "v", "n")
          .where($"n".isNotNull && $"n" > 0)
          .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
        val want = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
          .map { case ((k, v), n) => ((k, v), n) }
        back == want
    }

  property("simhash banding pigeonhole: ham <= chunks-1 always shares a chunk") =
    forAll(Gen.long, Gen.listOfN(3, Gen.chooseNum(0, 63))) { (sig, flipBits) =>
      // The candidate-generation guarantee behind SimHashSketch(64,4,3):
      // flipping at most chunks-1 = 3 bits cannot touch all 4 chunks,
      // so at least one 16-bit chunk stays equal — the pair is always a
      // band-join candidate. Pure bit math, no Spark.
      val other = flipBits.distinct.foldLeft(sig)((s, b) => s ^ (1L << b))
      val chunkBits = 16
      val shares = (0 until 4).exists { c =>
        ((sig >>> (c * chunkBits)) & 0xffffL) ==
          ((other >>> (c * chunkBits)) & 0xffffL)
      }
      shares
    }

  property("typed winnow equals the brute-force all-windows reference") = {
    // The shipped mapPartitions winnowing (monotonic deque + adjacent
    // dedup) against a naive O(n·w) reference that materializes every
    // window's min independently — same packed hashes, so any
    // divergence is a deque/dedup logic bug. Pure functions: no Spark
    // jobs, so this property affords real case volume.
    import graft.operators.TextQueries.Fingerprint
    def packedHashes(text: String): IndexedSeq[Long] = {
      val n = math.max(text.length - Fingerprint.gram + 1, 1)
      (0 until n).map { i =>
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(
          text.substring(i, math.min(i + Fingerprint.gram, text.length)))
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
        ((h >>> 20) << 20) | (i + 1).toLong
      }
    }
    def naive(text: String): Set[(Long, Long)] = {
      val ph = packedHashes(text)
      val wEff = math.min(Fingerprint.window, ph.length)
      ((wEff - 1) until ph.length).map { e =>
        val m = (e - wEff + 1 to e).map(ph).min
        (m & ((1L << 20) - 1), m >>> 20)
      }.toSet
    }
    // The rare non-ASCII / surrogate-half chars drive winnow() off its
    // r15 encode-once ASCII fast path onto the per-gram-encode fallback
    // (the naive reference below always encodes per gram, so the
    // equality certifies BOTH paths against the same reference).
    val charGen = Gen.frequency(8 -> Gen.alphaLowerChar, 2 -> Gen.const(' '),
      1 -> Gen.oneOf('é', '中', '\ud83d', '\ude00'))
    val textGen = Gen.chooseNum(0, 200)
      .flatMap(n => Gen.listOfN(n, charGen)).map(_.mkString)
    forAll(textGen) { text =>
      Fingerprint.winnow(text).toSet == naive(text)
    }
  }

  property("native as-of join equals the window formulation on random events") = {
    // The custom AsOfJoinExec (merge + tiebreak) against the oracle-
    // checked window-twin shape, on GENERATED data: random (key, time)
    // lefts and rights with deliberate collisions (small domains force
    // same-key and same-time ties), right tiebreak = unique rid. The
    // fixture tests pin specific edges; this pins the general contract.
    import graft.plans.AsOf
    val evGen = Gen.listOf(Gen.zip(
      Gen.chooseNum(0L, 4L),   // key: small domain → collisions
      Gen.chooseNum(0L, 30L))) // time: small domain → ties
    forAll(evGen, evGen) { (ls, rs) =>
      import spark.implicits._
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("lid", "k", "t")
      val right = rs.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("rid", "rk", "rt")
      val got = AsOf.join(left, right, "k", "t", "rk", "rt",
          rightTieBreakCol = Some("rid"))
        .select($"lid", $"rt", $"rid").collect()
        .map(r => r.getLong(0) ->
          (Option(r.get(1)), Option(r.get(2)))).toMap
      // Reference: for each left row, the right row with max (rt, rid)
      // among rt <= t and rk == k — computed directly on the driver.
      val want = ls.zipWithIndex.map { case ((k, t), i) =>
        val best = rs.zipWithIndex
          .filter { case ((rk, rt), _) => rk == k && rt <= t }
          .sortBy { case ((_, rt), rid) => (rt, rid.toLong) }
          .lastOption
        i.toLong -> (best.map(_._1._2), best.map(_._2.toLong))
      }.toMap
      got.view.mapValues { case (a, b) =>
        (a.map(_.asInstanceOf[Long]), b.map(_.asInstanceOf[Long]))
      }.toMap == want
    }
  }

  property("sessionize never splits a gap <= threshold or merges one above it") =
    forAll(Gen.listOf(Gen.chooseNum(0L, 500L))) { offsets =>
      import spark.implicits._
      val gapMs = 60000L // 1-minute session gap for the generated data
      val rows = offsets.distinct.sorted.zipWithIndex
        .map { case (o, i) => (i.toLong, new java.sql.Timestamp(o * 10000L)) }
      val df = rows.toDF("event_id", "ts")
      val w = Window.orderBy($"ts", $"event_id")
      val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sess = df
        .withColumn("prev", lag($"ts", 1).over(w))
        .withColumn("new_s",
          when($"prev".isNull ||
            unix_millis($"ts") - unix_millis($"prev") > gapMs, 1L).otherwise(0L))
        .withColumn("sid", sum($"new_s").over(wr))
        .select($"event_id", $"ts", $"sid")
        .collect().map(r => (r.getTimestamp(1).getTime, r.getLong(2)))
        .sortBy(_._1).toList
      sess.sliding(2).forall {
        case List((t1, s1), (t2, s2)) =>
          if (t2 - t1 > gapMs) s2 == s1 + 1 else s2 == s1
        case _ => true
      }
    }
}
