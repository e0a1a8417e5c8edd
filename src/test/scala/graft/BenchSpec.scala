package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's host-load sentinel verdict — pure logic, no Spark. */
class BenchSpec extends AnyFunSuite {

  test("sentinel verdict: quiet / loaded / noisy / unknown boundaries") {
    val v = Bench.sentinelVerdict _
    // identical triples → quiet
    assert(v(Seq(1.0, 1.1, 1.2), Seq(1.0, 1.1, 1.2)) == "quiet")
    // ±15% host swing (the measured same-code spread) stays quiet
    assert(v(Seq(1.0, 1.0, 1.1), Seq(1.1, 1.15, 1.2)) == "quiet")
    // medians drift 2x with >0.3s swing → loaded (either direction)
    assert(v(Seq(1.0, 1.0, 1.1), Seq(1.9, 2.0, 2.1)) == "loaded")
    assert(v(Seq(1.9, 2.0, 2.1), Seq(1.0, 1.0, 1.1)) == "loaded")
    // sub-noise-floor drift on a fast query is NOT loaded
    assert(v(Seq(0.1, 0.1, 0.1), Seq(0.2, 0.25, 0.3)) == "quiet")
    // stable medians but one triple spreads >2x with >0.5s swing → noisy
    assert(v(Seq(1.0, 1.05, 3.5), Seq(1.0, 1.1, 1.2)) == "noisy")
    // crashed sentinel → unknown
    assert(v(Seq(-1.0, -1.0, -1.0), Seq(1.0, 1.0, 1.0)) == "unknown")
  }
}
