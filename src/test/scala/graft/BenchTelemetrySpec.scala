package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the bench artifact's contention self-diagnosis — the logic that
  * decides whether a BENCH_r{N}.json measured the engine or the machine.
  * Three workload-independent signals (see `Bench` scaladoc); each is
  * exercised alone, because each catches a contention mode the others
  * are blind to.
  */
class BenchTelemetrySpec extends AnyFunSuite with Matchers {

  private val quietRatios = Seq.fill(73)(1.0)
  private val quietWalls = Seq.fill(73)(15.0)

  test("quiet run: no signal trips") {
    assert(!Bench.contentionVerdict(quietRatios, quietWalls, totalStealSec = 0.5,
      totalWallSec = 40.0))
  }

  test("signal 1: guest-OS descheduling trips on the spin RATIO") {
    // external same-host load parks the probe thread: wall grows,
    // thread-cpu does not, ratio >> 1
    val descheduled = Seq.fill(73)(2.4)
    assert(Bench.contentionVerdict(descheduled, quietWalls, 0.0, 40.0))
  }

  test("signal 2: host slowdown mid-run trips on absolute spin WALL vs the run's best") {
    // host steal / frequency throttling inflate thread-cpu WITH wall —
    // ratio stays 1.0 — but the fixed probe work visibly slows for the
    // affected stretch of the run
    val walls = Seq.fill(36)(15.0) ++ Seq.fill(37)(40.0) // median 40 > 1.5 * 15
    assert(Bench.contentionVerdict(quietRatios, walls, 0.0, 40.0))
  }

  test("signal 3: hypervisor steal counter trips when steal exceeds 10% of wall") {
    assert(Bench.contentionVerdict(quietRatios, quietWalls, totalStealSec = 8.4,
      totalWallSec = 63.8))
    // unavailable counter (-1) abstains rather than tripping
    assert(!Bench.contentionVerdict(quietRatios, quietWalls, totalStealSec = -1.0,
      totalWallSec = 63.8))
  }

  test("steal parse: /proc/stat aggregate-cpu line, jiffies to seconds") {
    // cpu user nice system idle iowait irq softirq STEAL guest guest_nice
    Bench.parseStealSec("cpu  3378047 0 1916229 130463598 40238 0 31882 566726 0 0") shouldBe
      5667.26 +- 0.01
    Bench.parseStealSec("cpu 1 2 3 4 5 6 7 0 0 0") shouldBe 0.0
    // malformed / too-short / wrong-label lines abstain with -1
    Bench.parseStealSec("cpu0 1 2 3 4 5 6 7 8 9") shouldBe -1.0
    Bench.parseStealSec("cpu 1 2 3") shouldBe -1.0
  }
}
