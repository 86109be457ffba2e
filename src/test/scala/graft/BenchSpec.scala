package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for Bench's pure decision logic (the timed paths themselves are
  * exercised by the driver's per-round runs). */
class BenchSpec extends AnyFunSuite {

  test("timingRegressions flags >1.5x moves above the noise floors, slowest first") {
    val prev = Map(
      "big_slow" -> 1000L,    // 1000 -> 1600: flagged
      "big_ok" -> 1000L,      // 1000 -> 1400: under 1.5x
      "tiny" -> 50L,          // 50 -> 400: prev under the 100 ms floor
      "small_latest" -> 150L, // 150 -> 280: latest under the 300 ms floor
      "huge" -> 2000L,        // 2000 -> 9000: flagged, slowest
      "gone" -> 500L)         // absent from latest: ignored
    val latest = Map(
      "big_slow" -> 1600L, "big_ok" -> 1400L, "tiny" -> 400L,
      "small_latest" -> 280L, "huge" -> 9000L,
      "new_entry" -> 5000L)   // absent from prev: ignored (no baseline)
    val got = Bench.timingRegressions(latest, prev)
    assert(got === Seq(("huge", 2000L, 9000L), ("big_slow", 1000L, 1600L)))
  }

  test("timingRegressions boundary: exactly 1.5x is NOT a regression") {
    assert(Bench.timingRegressions(Map("e" -> 300L), Map("e" -> 200L)).isEmpty)
    assert(Bench.timingRegressions(Map("e" -> 301L), Map("e" -> 200L)).nonEmpty)
  }
}
