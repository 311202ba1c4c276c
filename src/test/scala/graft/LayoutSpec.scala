package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-layout maintenance (LayoutQueries): compaction must merge the
  * fragmented ingest into the computed file count without changing a
  * row, and the sort-clustered layout must localize the hot predicate's
  * rows so parquet min/max stats can skip the rest. */
class LayoutSpec extends AnyFunSuite with SparkFixture {

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))

  test("compaction merges 64 ingest files into ceil(bytes/target) without row changes") {
    val (frag, compact, n) = operators.LayoutQueries.Maintained(spark, sfDir)
    assert(parquetFiles(frag).length == 64)
    val compactFiles = parquetFiles(compact)
    assert(compactFiles.length == n)
    val bytes = parquetFiles(frag).map(_.length).sum
    assert(n == math.max(1, math.ceil(
      bytes.toDouble / operators.LayoutQueries.Maintained.targetFileBytes).toInt))

    // Row-preserving: the full multiset of order keys survives.
    import spark.implicits._
    val a = spark.read.parquet(frag).select($"o_orderkey")
      .as[Long].collect().sorted
    val b = spark.read.parquet(compact).select($"o_orderkey")
      .as[Long].collect().sorted
    assert(a.sameElements(b))
  }

  test("sort-clustered events localize each user slice to one range file") {
    import spark.implicits._
    val sorted = operators.LayoutQueries.Maintained.sortedEvents(spark, sfDir)
    val files = parquetFiles(sorted)
    assert(files.length == 8)

    // The clustering property that makes min/max skipping work: the
    // predicate's rows (user_id <= 1) live in exactly ONE of the 8
    // files, so the other 7 files' row-group stats exclude them.
    val filesWithSlice = files.count { f =>
      spark.read.parquet(f.getAbsolutePath)
        .where($"user_id" <= 1).limit(1).count() > 0
    }
    assert(filesWithSlice == 1,
      s"user_id <= 1 should cluster into 1 file, found in $filesWithSlice")

    // And the predicate reaches the parquet reader as a pushed filter,
    // the other half of the skipping contract.
    val q = Catalog.byName("q_layout_sorted_scan").build(spark, sfDir)
    val explained = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("PushedFilters") &&
      explained.matches("(?s).*PushedFilters: \\[[^\\]]*LessThanOrEqual\\(user_id,1\\).*"),
      s"expected user_id <= 1 pushed to the parquet scan:\n$explained")
  }

  test("partitioned layout prunes 4 of 5 event_type directories at planning time") {
    import spark.implicits._
    val parted = operators.LayoutQueries.Maintained
      .partitionedEvents(spark, sfDir)
    val typeDirs = new java.io.File(parted).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("event_type="))
    assert(typeDirs.length == 5)
    val totalFiles = typeDirs.map(d =>
      d.listFiles().count(_.getName.endsWith(".parquet"))).sum
    val purchaseFiles = typeDirs
      .find(_.getName == "event_type=purchase").get
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(purchaseFiles < totalFiles)

    // AQE scoped off so the scan node is reachable for metric reads
    // (same caveat as PartitionedWriteSpec's DPP check).
    val aqeKey = "spark.sql.adaptive.enabled"
    val prior = spark.conf.getOption(aqeKey)
    spark.conf.set(aqeKey, "false")
    try {
      val q = spark.read.parquet(parted)
        .where($"event_type" === "purchase")
        .groupBy($"user_id").count()
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("PartitionFilters") && p.contains("= purchase"),
        s"expected a static partition filter on event_type:\n$p")
      q.collect()
      val scan = q.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scan.nonEmpty)
      assert(scan.head.metrics("numFiles").value == purchaseFiles,
        s"pruned scan must read only the purchase directory's files " +
          s"(${scan.head.metrics("numFiles").value} vs $purchaseFiles)")
    } finally prior match {
      case Some(v) => spark.conf.set(aqeKey, v)
      case None    => spark.conf.unset(aqeKey)
    }
  }

  test("z-order clusters BOTH dimensions where the single-column sort clusters one") {
    import spark.implicits._
    val z = operators.LayoutQueries.Maintained.zorderedEvents(spark, sfDir)
    val sorted = operators.LayoutQueries.Maintained.sortedEvents(spark, sfDir)
    val zFiles = parquetFiles(z)
    assert(zFiles.length == 8)

    def filesWith(files: Array[java.io.File],
        pred: org.apache.spark.sql.Column): Int =
      files.count { f =>
        spark.read.parquet(f.getAbsolutePath).where(pred).limit(1)
          .count() > 0
      }

    val dayPred = $"ts" < lit("2024-01-11 00:00:00").cast("timestamp")
    val userPred = $"user_id".between(2, 5)

    // The 2-D slice (the catalog row's predicate) lives in a strict
    // subset of the z-layout's files — file min/max stats can skip the
    // rest for a predicate on EITHER column.
    val both = filesWith(zFiles, dayPred && userPred)
    assert(both < 8, s"2-D slice should not span all z files ($both)")

    // The contrast that justifies Morton over a plain sort: a DAY slice
    // is localized by the z-layout but spans every user-sorted file
    // (days are uniform within each user range).
    val dayZ = filesWith(zFiles, dayPred)
    val daySorted = filesWith(parquetFiles(sorted), dayPred)
    assert(daySorted == 8,
      s"user-sorted layout cannot localize a day slice ($daySorted)")
    assert(dayZ < daySorted,
      s"z-layout must beat the sorted layout on the day dimension " +
        s"($dayZ vs $daySorted)")

    // Row preservation: clustering is a rewrite, never a filter.
    assert(spark.read.parquet(z).count() ==
      Tables.events(spark, sfDir).count())

    // Both predicates reach the parquet reader on the catalog row.
    val q = Catalog.byName("q_layout_zorder").build(spark, sfDir)
    val explained = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("PushedFilters") &&
      explained.contains("GreaterThanOrEqual(user_id,2)") &&
      explained.contains("LessThan(ts,"),
      s"expected both dimensions pushed:\n$explained")
  }

  test("morton16 interleaves bits exactly (scala reference on random keys)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(200)((rnd.nextInt(65536).toLong,
      rnd.nextInt(65536).toLong))
    def ref(a: Long, b: Long): Long =
      (0 until 16).map(i => (((a >> i) & 1L) << (2 * i)) |
        (((b >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val got = pairs.toDF("a", "b")
      .select(operators.LayoutQueries.Maintained
        .morton16(col("a"), col("b")).as("z"))
      .as[Long].collect()
    assert(got.toSeq == pairs.map { case (a, b) => ref(a, b) })
  }

  test("scale16 survives planted ranges past the Long-multiply overflow") {
    // The pre-r8 quantize computed (x - lo) * 65535 in Long, which wraps
    // once the key range exceeds Long.MaxValue/65535 ≈ 1.4e14 and
    // silently destroys clustering. scale16 goes through double; pin the
    // contract at a planted 2^50 range (chosen power-of-2 so every
    // division below is IEEE-exact and the expected values are sharp).
    import spark.implicits._
    val sc = operators.LayoutQueries.Maintained.scale16 _
    val hi = 1L << 50
    assert(BigInt(hi) * 65535 > BigInt(Long.MaxValue),
      "planted range must actually overflow the old formula")
    val xs = Seq(0L, 1L, hi / 2, hi)
    val got = xs.toDF("x")
      .select(sc($"x", lit(0L), lit(hi)).as("s")).as[Long].collect().toSeq
    assert(got.head == 0L && got(2) == 32767L && got(3) == 65535L,
      s"endpoints/midpoint off: $got")
    assert(got == got.sorted && got.forall(v => v >= 0 && v <= 65535))
    // negative low end: full span 2^51, zero lands mid-lattice
    val got2 = Seq(-hi, 0L, hi).toDF("x")
      .select(sc($"x", lit(-hi), lit(hi)).as("s")).as[Long].collect().toSeq
    assert(got2 == Seq(0L, 32767L, 65535L), s"negative-lo case off: $got2")
    // non-power-of-2 extreme: 1-ulp slack allowed, never out of range
    val hi3 = 1_400_000_000_000_001L
    val got3 = Seq(0L, hi3 / 3, hi3).toDF("x")
      .select(sc($"x", lit(0L), lit(hi3)).as("s")).as[Long].collect().toSeq
    assert(got3.forall(v => v >= 0 && v <= 65535))
    assert(math.abs(got3(1) - 21845L) <= 1 && got3(2) >= 65534L)
    // tiny range still spreads over the full lattice (the divide-first
    // failure mode this formula was chosen against)
    val got4 = Seq(0L, 15L, 29L).toDF("x")
      .select(sc($"x", lit(0L), lit(29L)).as("s")).as[Long].collect().toSeq
    assert(got4.head == 0L && got4.last == 65535L && got4(1) > 30000L,
      s"small range not spread to the lattice: $got4")
  }

  test("sorted-scan result equals the same slice over the raw table") {
    import spark.implicits._
    val viaLayout = Catalog.byName("q_layout_sorted_scan")
      .build(spark, sfDir).collect().map(_.toSeq)
    val raw = Tables.events(spark, sfDir)
      .where($"user_id" <= 1)
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n"), graft.Dsl.sumMoney($"value").as("sum_value"))
      .orderBy($"user_id", $"event_type")
      .collect().map(_.toSeq)
    assert(viaLayout.map(_.toList).toList == raw.map(_.toList).toList)
    assert(viaLayout.nonEmpty)
  }
}
