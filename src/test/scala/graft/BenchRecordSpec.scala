package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's cross-run drift check (Bench.parsePriorMins /
  * driftOutliers): pure text-in/verdict-out, pinned here without a
  * bench run. The check exists because a box that is busy for a WHOLE
  * run inflates every trial uniformly — the in-run canary stays blind
  * (its small table can remain page-cached while the correctness
  * gate's DuckDB pass evicted the big ones), and BENCH_r08 recorded
  * q45 at 6.2 s against a committed 0.59 s with `contended: false`.
  */
class BenchRecordSpec extends AnyFunSuite {

  private val record =
    """{"metric":"total_min","value":10.0,"unit":"sec","estimator":"min_of_trials",""" +
      """"queries_min":{"q01_scan_project":0.350,"q45_item_stats":0.590,"q83_fingerprint":0.650},""" +
      """"canary":{"start":0.5,"mid":0.4,"end":0.4},"contended":false,"sf":"/data/sf0.1"}"""

  test("parsePriorMins reads queries_min for the matching sf dir only; junk degrades to no-check") {
    val m = Bench.parsePriorMins(record, "/data/sf0.1")
    assert(m === Map(
      "q01_scan_project" -> 0.35, "q45_item_stats" -> 0.59, "q83_fingerprint" -> 0.65))
    // a record from another scale (a smoke run overwrote the file in
    // place) must disable the check, not compare apples to oranges
    assert(Bench.parsePriorMins(record, "/data/sf0.01").isEmpty)
    // malformed/foreign text is "no prior", never an exception
    assert(Bench.parsePriorMins("{not json", "/data/sf0.1").isEmpty)
    assert(Bench.parsePriorMins("", "/data/sf0.1").isEmpty)
  }

  test("driftOutliers flags the BENCH_r08 shape (3x AND >0.5s absolute) and nothing else") {
    val prior = Bench.parsePriorMins(record, "/data/sf0.1")
    val now = Seq(
      "q01_scan_project" -> 0.36, // stable: not an outlier
      "q45_item_stats" -> 6.194,  // the r8 artifact: 10x over 0.59 s
      "q83_fingerprint" -> 1.2,   // < 3x: box noise, not flagged
      "q99_new_query" -> 50.0)    // no committed prior: never flagged
    assert(Bench.driftOutliers(now, prior) === Seq("q45_item_stats"))
    // a sub-second query's multiplicative wobble is noise: 4.5x but
    // only +0.35 s absolute stays under the flag
    assert(Bench.driftOutliers(Seq("q_tiny" -> 0.45), Map("q_tiny" -> 0.1)).isEmpty)
    // and the conjunction the other way: +5 s on a 10 s query is not 3x
    assert(Bench.driftOutliers(Seq("q_big" -> 15.0), Map("q_big" -> 10.0)).isEmpty)
  }

  test("confirmVerdict adjudicates flagged outliers: clean re-times = contended-suspect, slow re-times = regressions") {
    val prior = Bench.parsePriorMins(record, "/data/sf0.1")
    // the BENCH_r11 shape: q45 flagged at 30.4s mid-run, re-timed
    // clean at run end — contention, and the record now says so
    assert(Bench.confirmVerdict(
      Seq("q45_item_stats"), Seq("q45_item_stats" -> 0.62), prior)
      === (Seq.empty, true))
    // a re-time STILL over the threshold survives as a confirmed
    // regression and the run is NOT contended-suspect
    assert(Bench.confirmVerdict(
      Seq("q45_item_stats"), Seq("q45_item_stats" -> 6.1), prior)
      === (Seq("q45_item_stats"), false))
    // mixed: one clean, one slow — the slow one is the regression,
    // and the presence of a confirmed outlier defeats the suspect label
    assert(Bench.confirmVerdict(
      Seq("q45_item_stats", "q83_fingerprint"),
      Seq("q45_item_stats" -> 0.62, "q83_fingerprint" -> 7.0), prior)
      === (Seq("q83_fingerprint"), false))
    // no outliers flagged: nothing to confirm, never suspect
    assert(Bench.confirmVerdict(Seq.empty, Seq.empty, prior) === (Seq.empty, false))
  }

  test("driftAdvisories is the 2x-AND->1s tier BELOW the flag — the r12 qa4 residual shape") {
    val prior = Bench.parsePriorMins(record, "/data/sf0.1")
    val now = Seq(
      "q01_scan_project" -> 0.36, // stable
      "q45_item_stats" -> 6.194,  // a 3x OUTLIER: flagged, so NOT an advisory
      "q83_fingerprint" -> 1.80)  // 2.8x and +1.15 s: the advisory tier
    assert(Bench.driftAdvisories(now, prior) === Seq("q83_fingerprint"))
    assert(Bench.driftOutliers(now, prior) === Seq("q45_item_stats"))
    // the r12 shape that motivated the tier: qa4 0.85 -> 1.97 s
    // (2.3x, +1.12 s) was below the 3x flag so the confirm pass never
    // saw it and a judge had to adjudicate by hand
    assert(Bench.driftAdvisories(Seq("qa4" -> 1.97), Map("qa4" -> 0.85)) === Seq("qa4"))
    assert(Bench.driftOutliers(Seq("qa4" -> 1.97), Map("qa4" -> 0.85)).isEmpty)
    // both legs of the conjunction: 2.5x but only +0.75 s stays quiet,
    // +1.5 s but under 2x stays quiet
    assert(Bench.driftAdvisories(Seq("q_s" -> 1.25), Map("q_s" -> 0.5)).isEmpty)
    assert(Bench.driftAdvisories(Seq("q_b" -> 11.5), Map("q_b" -> 10.0)).isEmpty)
    // a confirmed advisory = re-time still over the advisory bar
    assert(Bench.driftOutliers(Seq("qa4" -> 1.9), Map("qa4" -> 0.85), 2.0, 1.0)
      === Seq("qa4"))
    assert(Bench.driftOutliers(Seq("qa4" -> 0.9), Map("qa4" -> 0.85), 2.0, 1.0).isEmpty)
  }
}
