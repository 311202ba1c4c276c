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
}
