package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.BenchStats.trendOf

/** Pins the quiet record's `"trend"` field semantics (round 18) —
  * the two r17 rep lists that motivated the flag, plus the boundary
  * rules that keep it from crying wolf on jitter. */
class BenchStatsSpec extends AnyFunSuite {

  test("r17 sql_frontend reps flag rising despite one jittery dip") {
    // Steady reps [1.409, 1.844, 1.576, 2.33]: 1.7x drift, tau 0.67.
    // Strict monotonicity would miss this on the 1.844 -> 1.576 dip.
    assert(trendOf(Seq(1.269, 1.409, 1.844, 1.576, 2.33)) == Some("rising"))
  }

  test("r17 streaming_attribution reps flag falling") {
    assert(trendOf(Seq(4.351, 3.866, 2.967, 1.872, 2.715)) == Some("falling"))
  }

  test("rep 1 is excluded: a warmth cliff alone never flags") {
    // The universal shape — rep 1 pays codegen/classload, steady flat.
    assert(trendOf(Seq(6.858, 2.0, 2.01, 1.99, 2.0)).isEmpty)
  }

  test("sub-floor swings never flag, however monotone") {
    assert(trendOf(Seq(0.5, 0.4, 0.45, 0.5, 0.55)).isEmpty)
    assert(trendOf(Seq(0.5, 0.70, 0.80, 0.90, 0.99)).isEmpty) // 0.29 < floor
  }

  test("alternating reps (pure noise) never flag even past the floor") {
    assert(trendOf(Seq(1.0, 1.0, 2.0, 1.0, 2.0)).isEmpty) // tau 0.33
  }

  test("exact ties dilute tau (tau-a) rather than drop from the denominator") {
    // Ms-rounded rep lists carry identical values; their signum-0
    // pairs stay IN the denominator, biasing |tau| low — a
    // deliberately conservative rule (r18 advice: pin it as
    // intended). Steady [1.0, 1.0, 1.0, 2.0]: three rises, three
    // ties, tau = 0.5 — flags exactly at the boundary; one more tie
    // (steady [1.0, 1.0, 1.0, 1.0, 2.0]) drops tau to 0.4 and the
    // same genuine final rise no longer flags.
    assert(trendOf(Seq(9.9, 1.0, 1.0, 1.0, 2.0)) == Some("rising"))
    assert(trendOf(Seq(9.9, 1.0, 1.0, 1.0, 1.0, 2.0)).isEmpty)
  }

  test("fewer than 3 steady reps never flag (no basis for a trend)") {
    assert(trendOf(Seq(1.0, 1.0, 9.0)).isEmpty)
    assert(trendOf(Seq.empty).isEmpty)
  }
}
