package graft

import org.scalatest.funsuite.AnyFunSuite

/** The pinned-persist footprint envelope, ASSERTED (r12 verdict #3/#4):
  * the Memo'd stages persist for the JVM with no eviction by design
  * ("sized for the fixture corpus" — DedupQueries' lifetime note), and
  * comments don't guard (the zipf lesson). This spec builds the two
  * corpus-scale pinned stages at the LARGEST fixture (sf0.1 — the bench
  * SF, the worst case any gate runs), then asserts the whole JVM's
  * pinned set keeps ≥ 10× headroom under the heap and that every
  * pinned level can spill — so fixture growth degrades to disk reads,
  * never an executor OOM. Bench emits the same reading per run
  * (pinned_mem_bytes / pinned_disk_bytes / pinned_rdds), which is what
  * attributes — or clears — late-catalog rep spikes as memory
  * pressure. */
class PinnedFootprintSpec extends AnyFunSuite with SparkFixture {

  private val hdDir = "/root/testdata/sf0.1"

  test("pinned stages at the bench SF keep >= 10x heap headroom, and " +
      "every pinned level spills to disk") {
    // The two corpus-scale JVM-lifetime pins (the bench warm items).
    operators.DedupQueries.Shingled(spark, hdDir).count()
    operators.TextQueries.Tokenized(spark, hdDir).count()
    val infos = spark.sparkContext.getRDDStorageInfo
    val mem = infos.map(_.memSize).sum
    val disk = infos.map(_.diskSize).sum
    val heap = Runtime.getRuntime.maxMemory
    info(f"pinned: ${infos.length} rdds, mem ${mem / 1e6}%.1f MB, " +
      f"disk ${disk / 1e6}%.1f MB, heap ${heap / 1e6}%.1f MB " +
      f"(margin ${heap.toDouble / math.max(mem, 1)}%.0fx)")
    assert(mem > 0, "the stages must actually be pinned in memory")
    assert(mem * 10 <= heap,
      f"pinned ${mem / 1e6}%.1f MB breaches 10x headroom under the " +
        f"${heap / 1e6}%.1f MB heap — evict or re-tier the Memo'd " +
        "stages (MEMORY_AND_DISK alone no longer suffices)")
    infos.foreach { i =>
      assert(i.storageLevel.useDisk,
        s"${i.name}: pinned at ${i.storageLevel} — a non-spillable " +
          "level turns fixture growth into an OOM instead of disk reads")
    }
  }
}
