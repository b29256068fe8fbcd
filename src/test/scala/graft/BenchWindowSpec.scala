package graft

import org.scalatest.funsuite.AnyFunSuite

/** Edge cases of the bench's fourth contended-detector
  * (Bench.windowFlags): the contiguous-slow-window scan added after
  * the r11 driver artifact carried an 11-query, 3-16x interference
  * band that the calib / noisy-median / loadavg detectors all missed.
  */
class BenchWindowSpec extends AnyFunSuite {

  private val runs = 5

  /** Build the samples map: every query runs at `base` in all passes,
    * except (query, pass) overrides. Pass is 1-based. */
  private def samples(names: Seq[String], base: Double,
                      overrides: Map[(String, Int), Double] = Map.empty)
      : Map[String, IndexedSeq[Double]] =
    names.map { n =>
      n -> (1 to runs).map(p => overrides.getOrElse((n, p), base)).toIndexedSeq
    }.toMap

  private val names = ('a' to 'l').map(c => s"q_$c") // 12 queries

  test("quiet run: nothing flagged") {
    assert(Bench.windowFlags(names, samples(names, 0.5), Set.empty, runs).isEmpty)
  }

  test("window severity: none without a window; graded on MEDIAN damage with one (r13)") {
    // no window: severity is none regardless of ratios
    assert(Bench.windowSeverity(windowed = false, maxMedianRatio = 99.0) === "none")
    // window seen but medians held (the r12 driver shape: samples
    // flagged, max median/min 1.59) -> mild, does NOT flip contended
    assert(Bench.windowSeverity(windowed = true, maxMedianRatio = 1.59) === "mild")
    assert(Bench.windowSeverity(windowed = true, maxMedianRatio = 2.0) === "mild")
    // a flagged median beyond 2x its own min (the r11 poisoning
    // shape) -> contended
    assert(Bench.windowSeverity(windowed = true, maxMedianRatio = 2.01) === "contended")
    assert(Bench.windowSeverity(windowed = true, maxMedianRatio = 16.0) === "contended")
  }

  test("4+ contiguous slow samples in one pass flag exactly those queries") {
    // pass 3 runs alphabetical; queries c..f run 3x their 0.5s min
    val slow = Seq("q_c", "q_d", "q_e", "q_f")
    val ov = slow.map(n => (n, 3) -> 1.5).toMap
    val flagged = Bench.windowFlags(names, samples(names, 0.5, ov), Set.empty, runs)
    assert(flagged.toSet == slow.toSet)
  }

  test("3 contiguous slow samples stay under the threshold") {
    val ov = Seq("q_c", "q_d", "q_e").map(n => (n, 3) -> 1.5).toMap
    assert(Bench.windowFlags(names, samples(names, 0.5, ov), Set.empty, runs).isEmpty)
  }

  test("pass-1 slowness is never read (cold codegen/JIT is charged there by design)") {
    val ov = names.take(8).map(n => (n, 1) -> 5.0).toMap
    assert(Bench.windowFlags(names, samples(names, 0.5, ov), Set.empty, runs).isEmpty)
  }

  test("a failed query inside the window does not split it (review r12)") {
    // 5-query window c..g in pass 3, but q_e failed (no cross-pass
    // min): the old boolean scan split c,d | f,g — neither half
    // reached 4 — and published windowed=false on a polluted run.
    val slow = Seq("q_c", "q_d", "q_f", "q_g")
    val ov = slow.map(n => (n, 3) -> 1.5).toMap
    val flagged = Bench.windowFlags(
      names, samples(names, 0.5, ov), failed = Set("q_e"), runs)
    assert(flagged.toSet == slow.toSet)
  }

  test("a LONG-running failed query breaks the window instead of bridging it") {
    // q_e failed after 60s (OOM in a final stage): two slow pairs a
    // minute apart are NOT one contiguous interference window —
    // bridging across that much unknown wall-clock would flag a
    // clean run contended (second review pass, r12)
    val base = samples(names, 0.5,
      Seq("q_c", "q_d", "q_f", "q_g").map(n => (n, 3) -> 1.5).toMap)
    val withLongFail = base.updated("q_e", IndexedSeq.fill(runs)(60.0))
    assert(Bench.windowFlags(
      names, withLongFail, failed = Set("q_e"), runs).isEmpty)
  }

  test("a sub-100ms query inside the window does not split it (review r12)") {
    // q_e's min is 20 ms — too small to carry timing signal — and it
    // sits between four confirmed-slow >=100ms neighbors.
    val base = samples(names, 0.5,
      Seq("q_c", "q_d", "q_f", "q_g").map(n => (n, 3) -> 1.5).toMap)
    val withTiny = base.updated("q_e", IndexedSeq.fill(runs)(0.02))
    assert(Bench.windowFlags(names, withTiny, Set.empty, runs).toSet ==
      Set("q_c", "q_d", "q_f", "q_g"))
  }

  test("a chain of sub-100ms jitter alone never flags") {
    // every query is tiny; pass 3 doubles them all — classic OS
    // jitter at this resolution, not a window
    val tiny = names.map { n =>
      n -> (1 to runs).map(p => if (p == 3) 0.06 else 0.02).toIndexedSeq
    }.toMap
    assert(Bench.windowFlags(names, tiny, Set.empty, runs).isEmpty)
  }

  test("a fast >=100ms sample ends the segment (positive evidence of a quiet box)") {
    // c,d slow; e ran at its min (informative fast); f,g slow — two
    // separate 2-runs, not one 4-window
    val ov = Seq("q_c", "q_d", "q_f", "q_g").map(n => (n, 3) -> 1.5).toMap
    assert(Bench.windowFlags(names, samples(names, 0.5, ov), Set.empty, runs).isEmpty)
  }

  test("reversed passes are scanned in reversed order") {
    // pass 2 runs REVERSED (l..a); queries f,e,d,c are contiguous in
    // that order too, so a window there must flag
    val ov = Seq("q_c", "q_d", "q_e", "q_f").map(n => (n, 2) -> 1.5).toMap
    val flagged = Bench.windowFlags(names, samples(names, 0.5, ov), Set.empty, runs)
    assert(flagged.toSet == Set("q_c", "q_d", "q_e", "q_f"))
  }

  test("the 100ms absolute floor keeps a 2x-but-tiny excess from counting as slow") {
    // min 80 ms, sample 170 ms: >2x but only 90 ms of excess — below
    // the floor, so NOT slow (and min < 100 ms makes it neutral, not
    // fast: it must not split a surrounding window either)
    val base = samples(names, 0.5,
      Seq("q_c", "q_d", "q_f", "q_g").map(n => (n, 3) -> 1.5).toMap)
    val withMid = base.updated("q_e",
      (1 to runs).map(p => if (p == 3) 0.17 else 0.08).toIndexedSeq)
    assert(Bench.windowFlags(names, withMid, Set.empty, runs).toSet ==
      Set("q_c", "q_d", "q_f", "q_g"))
  }
}
