package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the noise_suspect verdict table (Bench.isNoiseSuspect) — the
  * attribution contract between BENCH_r{N}.json and the judge. */
class BenchNoiseSpec extends AnyFunSuite {

  test("3x the committed reference flags regardless of steal") {
    assert(Bench.isNoiseSuspect(6.1, Some(2.0), stealSec = 0.0))
  }

  test("2x-3x flags ONLY with recorded per-query steal (the r10 " +
    "dd_ngram_jaccard case: 4.64s vs 1.97s ref, 1.2s steal)") {
    assert(Bench.isNoiseSuspect(4.64, Some(1.97), stealSec = 1.2))
    assert(!Bench.isNoiseSuspect(4.64, Some(1.97), stealSec = 0.0),
      "quiet-host 2x-3x is a (mild) regression, not noise")
    assert(!Bench.isNoiseSuspect(4.64, Some(1.97), stealSec = 0.5),
      "steal floor is strict")
  }

  test("below 2x never flags; sub-second absolute floor never flags; " +
    "no committed reference never flags") {
    assert(!Bench.isNoiseSuspect(3.9, Some(2.0), stealSec = 9.9))
    assert(!Bench.isNoiseSuspect(0.45, Some(0.1), stealSec = 9.9))
    assert(!Bench.isNoiseSuspect(60.0, None, stealSec = 9.9))
  }
}
