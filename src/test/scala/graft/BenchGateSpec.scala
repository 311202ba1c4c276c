package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench contention gate (r11 verdict #5) against planted load
  * sequences — the decision that decides whether a BENCH_r{N}.json
  * reading self-describes as a measurement or as contended. */
class BenchGateSpec extends AnyFunSuite {

  /** Drive awaitIdle with a scripted loadavg sequence (the last value
    * repeats) and a no-op sleep; returns (waitedSec, contended). */
  private def run(loads: Double*): (Int, Boolean) = {
    val it = loads.iterator
    var last = loads.head
    def next(): Double = { if (it.hasNext) last = it.next(); last }
    Bench.awaitIdle(() => next(), gate = 2.0, budgetSec = 60,
      sleep = _ => (), log = _ => ())
  }

  test("an idle machine passes immediately: zero wait, not contended") {
    assert(run(0.3) == (0, false))
  }

  test("load decaying below the gate inside the budget: bounded wait, " +
      "not contended") {
    // One loadavg read per decision (the compared value is the logged
    // value); the gate must stop at the first below-gate reading and
    // report the reading as valid.
    val (waited, contended) = run(7.9, 6.0, 4.0, 2.5, 1.4)
    assert(!contended)
    assert(waited == 40)
  }

  test("the wait never oversteps the budget: gate_waited_sec <= knob " +
      "even when the budget is not a multiple of the 10 s tick") {
    val it = Iterator.continually(7.9)
    val (waited, contended) = Bench.awaitIdle(() => it.next(), gate = 2.0,
      budgetSec = 15, sleep = _ => (), log = _ => ())
    assert(contended)
    assert(waited == 10, s"must stop at the last full tick inside 15 s, " +
      s"got $waited")
  }

  test("load that never decays: the full budget is spent and the " +
      "reading self-describes as contended") {
    assert(run(7.9) == (60, true))
  }

  test("an unreadable loadavg (-1) is flagged contended, never idle") {
    // -1 < gate would sail through the wait loop — the flag must still
    // mark the reading invalid ('cannot measure idleness' != 'idle').
    assert(run(-1.0) == (0, true))
  }

  // --- externalCores: the mid-loop detector (r12, second cut) ---
  // The first cut flagged on max 1-min loadavg and self-flagged every
  // healthy run (the bench's own 32-thread loop drives loadavg ~14 by
  // itself). These pin the replacement: self-load subtracts out, a
  // neighbour shows up as whole cores, unmeasurable flags.

  test("externalCores: a run where all busy CPU is the bench's own " +
      "reads ~0 external cores") {
    // 130 s loop, 30 cores busy — all of it this JVM's process time.
    val ext = Bench.externalCores(busy0 = 1000.0, busy1 = 1000.0 + 3900.0,
      self0 = 500.0, self1 = 500.0 + 3900.0, elapsedSec = 130.0)
    assert(ext == 0.0)
  }

  test("externalCores: an ambient neighbour burning 4 cores shows up " +
      "as ~4, regardless of how hard the bench itself runs") {
    val ext = Bench.externalCores(busy0 = 0.0, busy1 = 3900.0 + 520.0,
      self0 = 0.0, self1 = 3900.0, elapsedSec = 130.0)
    assert(math.abs(ext - 4.0) < 1e-9)
  }

  test("externalCores: kernel/harness background under the 2-core gate " +
      "does not flag; a test-JVM-sized neighbour over it would") {
    val idleFloor = Bench.externalCores(0.0, 39.0, 0.0, 0.0, 130.0)
    assert(idleFloor < 2.0, "a ~0.3-core background must pass the gate")
    val neighbour = Bench.externalCores(0.0, 1300.0, 0.0, 0.0, 130.0)
    assert(neighbour >= 2.0, "a 10-core neighbour must trip the gate")
  }

  test("externalCores: clock skew producing a small negative delta " +
      "clamps to 0 instead of going negative") {
    val ext = Bench.externalCores(0.0, 100.0, 0.0, 100.5, 130.0)
    assert(ext == 0.0)
  }

  test("externalCores: any unmeasurable input (-1 reads, zero elapsed) " +
      "returns -1, which the caller must flag contended") {
    assert(Bench.externalCores(-1.0, 100.0, 0.0, 50.0, 130.0) == -1.0)
    assert(Bench.externalCores(0.0, -1.0, 0.0, 50.0, 130.0) == -1.0)
    assert(Bench.externalCores(0.0, 100.0, -1.0, 50.0, 130.0) == -1.0)
    assert(Bench.externalCores(0.0, 100.0, 0.0, -1.0, 130.0) == -1.0)
    assert(Bench.externalCores(0.0, 100.0, 0.0, 50.0, 0.0) == -1.0)
  }

  // --- maxWindowExternalCores: burst sensitivity over the loop ---

  /** Samples at 1 Hz over `totalSec`, bench itself burning `selfCores`
    * throughout and a neighbour burning `burstCores` during
    * [burstFrom, burstTo). */
  private def samples(totalSec: Int, selfCores: Double, burstCores: Double,
      burstFrom: Int, burstTo: Int): Seq[(Double, Double, Double)] = {
    var busy = 0.0; var self = 0.0
    (0 to totalSec).map { t =>
      val s = (t.toDouble, busy, self)
      val ext = if (t >= burstFrom && t < burstTo) burstCores else 0.0
      busy += selfCores + ext; self += selfCores
      s
    }
  }

  test("maxWindowExternalCores: a 20 s 10-core burst inside a 130 s " +
      "loop is caught at ~10 even though the whole-loop average is " +
      "diluted to ~1.5") {
    val ss = samples(130, selfCores = 30.0, burstCores = 10.0,
      burstFrom = 60, burstTo = 80)
    val avg = Bench.externalCores(ss.head._2, ss.last._2,
      ss.head._3, ss.last._3, 130.0)
    assert(avg < 2.0, s"the dilution premise must hold, got $avg")
    val win = Bench.maxWindowExternalCores(ss, minWindowSec = 10.0)
    assert(win >= 9.0, s"the 10 s window over the burst must read ~10, " +
      s"got $win")
  }

  test("maxWindowExternalCores: an idle loop under heavy self-load " +
      "reads 0 in every window — self-load can never flag") {
    val ss = samples(130, selfCores = 32.0, burstCores = 0.0, 0, 0)
    assert(Bench.maxWindowExternalCores(ss, 10.0) == 0.0)
  }

  test("maxWindowExternalCores: a loop shorter than the window floor " +
      "falls back to the full span; unmeasurable samples poison to -1") {
    val short = samples(6, selfCores = 30.0, burstCores = 4.0, 0, 6)
    assert(math.abs(Bench.maxWindowExternalCores(short, 10.0) - 4.0) < 0.5)
    val bad = samples(130, 30.0, 0.0, 0, 0)
      .updated(5, (5.0, -1.0, 150.0))
    assert(Bench.maxWindowExternalCores(bad, 10.0) == -1.0)
    assert(Bench.maxWindowExternalCores(Nil, 10.0) == -1.0)
  }

  // --- burstVote: per-rep burst attribution (r13 verdict #1) ---
  // The loop-wide windows flagged nothing at ext 1.91 < gate 2.0 while
  // a burst landed 26 s on plan-unchanged cheap rows; per-rep external
  // readings let the median SELF-HEAL by excluding overlapped reps.

  test("burstVote: a planted burst rep is excluded and the median stays in band") {
    // q_agg_mode-shaped scenario: healthy 0.21 s reps around one rep
    // inflated to 5.39 s by a 6-core neighbour.
    val (voting, nBurst, stands) = Bench.burstVote(
      Vector(0.21, 5.39, 0.22), Vector(0.0, 6.0, 0.0), gate = 2.0)
    assert(voting == Vector(0.21, 0.22))
    assert(nBurst == 1 && !stands)
    val median = voting.sorted.apply(voting.size / 2)
    assert(median <= 0.25, s"median must stay in the healthy band, got $median")
  }

  test("burstVote: sub-gate external readings never exclude a rep") {
    val (voting, nBurst, stands) = Bench.burstVote(
      Vector(0.2, 0.3, 0.25), Vector(1.9, 0.1, 0.0), gate = 2.0)
    assert(voting.size == 3 && nBurst == 0 && !stands)
  }

  test("burstVote: all reps overlapped -> median stands on bursts and flags") {
    val (voting, nBurst, stands) = Bench.burstVote(
      Vector(4.0, 5.0, 6.0), Vector(3.0, 8.0, 2.5), gate = 2.0)
    assert(voting == Vector(4.0, 5.0, 6.0))
    assert(nBurst == 3 && stands)
  }

  test("burstVote: no reps is empty-clean but must not flag (error path owns it)") {
    val (voting, nBurst, stands) = Bench.burstVote(Vector(), Vector(), 2.0)
    assert(voting.isEmpty && nBurst == 0 && !stands)
  }

  test("repAttribMinSec floor keeps jiffy noise out of rep verdicts") {
    // The floor is what exempts sub-second reps (±ncpu*0.02/dt cores of
    // tick noise); it must sit where the noise bound at the floor is
    // safely under the default 2-core gate on this 32-cpu box.
    assert(Bench.repAttribMinSec >= 1.0)
    assert(32 * 0.02 / Bench.repAttribMinSec < 2.0)
  }

  // --- cgroup throttle attribution (r14 verdict #3): the external-CPU-
  // invisible inflation class. parseThrottle handles both hierarchy
  // versions; throttledDirty thresholds a rep; dirtyVote folds the flag
  // into the same self-healing median policy as bursts.

  test("parseThrottle: v2 (throttled_usec) and v1 (throttled_time ns) " +
      "texts parse to seconds; junk parses to the unmeasurable sentinel") {
    assert(Bench.parseThrottle(
      "usage_usec 100\nnr_periods 7\nnr_throttled 3\nthrottled_usec 2500000\n")
      == ((3L, 2.5)))
    assert(Bench.parseThrottle(
      "nr_periods 0\nnr_throttled 2\nthrottled_time 1500000000\n" +
        "nr_bursts 0\nburst_time 0\n")
      == ((2L, 1.5)))
    assert(Bench.parseThrottle("") == ((-1L, -1.0)))
    assert(Bench.parseThrottle("nr_throttled notanumber\n") == ((-1L, -1.0)))
    // nr_throttled alone (no time key) must not read as measurable
    assert(Bench.parseThrottle("nr_throttled 5\n") == ((-1L, -1.0)))
  }

  test("throttledDirty: >= 10% of rep wall throttled flags; sub-floor " +
      "reps and trace throttling stay clean") {
    assert(Bench.throttledDirty(10.0, 1.0))      // exactly the fraction
    assert(Bench.throttledDirty(15.0, 14.0))     // near-fully capped
    assert(!Bench.throttledDirty(10.0, 0.5))     // 5% — under threshold
    assert(!Bench.throttledDirty(0.5, 0.4))      // sub-floor rep exempt
    assert(!Bench.throttledDirty(10.0, 0.0))     // untouched
  }

  test("dirtyVote: a throttled rep is excluded exactly like a burst " +
      "rep, and all-throttled medians stand but flag") {
    // The r14 recursive-compound signature: reps degrade 4 -> 18 s at
    // zero external cores, but with material throttled time per rep.
    val timings = Vector(4.11, 17.83, 18.31)
    val dirty = timings.zip(Vector(0.0, 9.0, 9.5)).map { case (t, thr) =>
      0.0 >= 2.0 || Bench.throttledDirty(t, thr) }
    val (voting, nDirty, stands) = Bench.dirtyVote(timings, dirty)
    assert(voting == Vector(4.11) && nDirty == 2 && !stands)
    val (v2, n2, s2) = Bench.dirtyVote(Vector(17.0, 18.0),
      Vector(true, true))
    assert(v2 == Vector(17.0, 18.0) && n2 == 2 && s2)
  }

  test("burstVote remains dirtyVote over the >= gate flag (one policy)") {
    val t = Vector(0.21, 5.39, 0.22)
    val e = Vector(0.0, 6.0, 0.0)
    assert(Bench.burstVote(t, e, 2.0) ==
      Bench.dirtyVote(t, e.map(_ >= 2.0)))
  }

  test("cgroupCpuStatPath resolves a readable stat source on this box " +
      "(or honestly reports none)") {
    Bench.cgroupCpuStatPath() match {
      case Some((p, v)) =>
        assert(Set("v1", "v2")(v))
        val parsed = Bench.parseThrottle(
          java.nio.file.Files.readString(p))
        assert(parsed._1 >= 0L && parsed._2 >= 0.0,
          s"resolved source $p must parse: $parsed")
      case None => succeed // a box with no quota machinery is legal
    }
  }
}
