package graft

import org.scalatest.funsuite.AnyFunSuite

/** Concurrency pins for [[Memo]] — the r8 review replaced the map-wide
  * synchronized build with per-key lazy cells; these tests are the
  * contract that keeps it that way: same-key first calls build ONCE,
  * distinct-key builds overlap, and cache hits never queue behind an
  * unrelated in-flight build (the warmup-serialization failure mode the
  * r8 ADVICE flagged). */
class MemoSpec extends AnyFunSuite {

  test("same key builds exactly once under racing first calls; " +
    "distinct keys build in parallel") {
    import scala.concurrent._
    import scala.concurrent.duration._
    val memo = new Memo[Int, Int]
    val builds = new java.util.concurrent.atomic.AtomicInteger
    val gate = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
    implicit val ec: ExecutionContextExecutorService =
      ExecutionContext.fromExecutorService(pool)
    try {
      val t0 = System.nanoTime()
      val futures = (0 until 8).flatMap { k =>
        Seq.fill(4)(Future {
          gate.await()
          memo(k) { builds.incrementAndGet(); Thread.sleep(300); k * 10 }
        })
      }
      gate.countDown()
      val vals = Await.result(Future.sequence(futures), 30.seconds)
      val secs = (System.nanoTime() - t0) / 1e9
      assert(vals == (0 until 8).flatMap(k => Seq.fill(4)(k * 10)))
      assert(builds.get == 8, s"${builds.get} builds for 8 keys — a key " +
        "either rebuilt (double persist/write!) or was cached wrong")
      // one global lock would serialize 8 × 300 ms ≥ 2.4 s; per-key
      // cells overlap them (generous ceiling for a loaded machine)
      assert(secs < 1.8,
        f"distinct-key builds serialized: $secs%.2f s for 8 × 300 ms")
    } finally pool.shutdown()
  }

  test("a cache hit never waits behind another key's in-flight build") {
    val memo = new Memo[String, Int]
    assert(memo("warm") { 1 } == 1)
    val started = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val slow = new Thread(() => {
      memo("slow") { started.countDown(); release.await(); 2 }; ()
    })
    slow.start()
    started.await()
    val t0 = System.nanoTime()
    val hit = memo("warm") { 99 } // thunk must not run — key is cached
    val ms = (System.nanoTime() - t0) / 1e6
    release.countDown()
    slow.join()
    assert(hit == 1, "hit re-ran its build thunk")
    assert(ms < 200, f"hit blocked $ms%.0f ms behind an unrelated build")
    assert(memo("slow") { -1 } == 2)
  }
}
