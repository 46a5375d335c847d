package graft

import graft.ann.LshGeometry
import org.scalatest.funsuite.AnyFunSuite

/** Pure-math checks on the LSH geometry solver — no Spark session.
  * Calibration anchors come from the round-4 sf≈1 soak (PLANS.md):
  * 4 planes at gate scale, 8 at the 20k-vector corpus where fixed
  * 4-plane geometry went quadratic (158M pair slots → 12.4M).
  */
class LshGeometrySpec extends AnyFunSuite {

  test("gate scale resolves to the calibrated fixed geometry (12 tables x 4 planes, no probe)") {
    // every driver-gate corpus (500..2000 vectors) must keep the
    // geometry the small-SF oracles were hash-calibrated against
    for (n <- Seq(0L, 1L, 500L, 2000L))
      assert(LshGeometry.forCorpus(n, tau = 0.4) === LshGeometry(12, 4, probe1 = false), s"n=$n")
  }

  test("20k vectors: soak geometry — 8 planes, probe on, tables bounded, recall target held") {
    val g = LshGeometry.forCorpus(20000, tau = 0.4)
    assert(g.planes === 8)
    assert(g.probe1)
    assert(g.tables <= 16, s"tables ${g.tables} — probe was supposed to keep tables cheap")
    assert(LshGeometry.recallAt(g, 0.4) >= 0.87)
  }

  test("planes are monotone in n and keep the mean bucket bounded") {
    val sizes = Seq(1000L, 10000L, 100000L, 1000000L, 1000000000L)
    val planes = sizes.map(LshGeometry.planesFor(_))
    assert(planes === planes.sorted)
    sizes.zip(planes).foreach { case (n, p) =>
      assert(n.toDouble / math.pow(2, p) <= 128.0, s"n=$n planes=$p mean bucket too big")
    }
  }

  test("the maxTables cap backs planes off instead of missing the recall target") {
    val g = LshGeometry.forCorpus(1000000, tau = 0.4)
    assert(g.tables <= 64)
    assert(LshGeometry.recallAt(g, 0.4) >= 0.87,
      s"cap traded recall away silently: $g -> ${LshGeometry.recallAt(g, 0.4)}")
    // and the backoff really was a backoff: the unconstrained plane
    // choice wants more tables than the cap allows
    assert(g.planes < LshGeometry.planesFor(1000000))
  }

  test("realistic near-dup threshold (tau=0.9) scales to a billion rows cheaply") {
    val g = LshGeometry.forCorpus(1000000000L, tau = 0.9)
    assert(g.planes === LshGeometry.planesFor(1000000000L),
      "high-tau geometry should not need the plane backoff")
    assert(g.tables <= 16, s"tables ${g.tables}")
    assert(LshGeometry.recallAt(g, 0.9) >= 0.87)
  }

  test("recall floor: derived geometry meets the target; closer pairs only do better") {
    for (n <- Seq(2000L, 20000L, 200000L); tau <- Seq(0.4, 0.7, 0.9)) {
      val g = LshGeometry.forCorpus(n, tau)
      assert(LshGeometry.recallAt(g, tau) >= 0.87, s"n=$n tau=$tau g=$g")
      // monotone in cosine: the floor is the worst case
      assert(LshGeometry.recallAt(g, tau + 0.05) >= LshGeometry.recallAt(g, tau))
    }
  }

  test("1-bit probe strictly raises the per-table hit for interior p") {
    for (tau <- Seq(0.2, 0.4, 0.6, 0.8, 0.9); planes <- Seq(4, 8, 12))
      assert(LshGeometry.perTableHit(tau, planes, probe1 = true) >
        LshGeometry.perTableHit(tau, planes, probe1 = false))
  }

  test("top-k search design point: gate corpora resolve to the calibrated 16x4; half-pinned calls solve the open knob") {
    import graft.ann.Knn
    // q71/q74's bench + spec calibration: 16 tables x 4 planes at
    // every gate corpus size
    for (n <- Seq(500L, 2000L))
      assert(LshGeometry.resolve(n, Knn.SearchTau, 0, 0, probe1 = false) ===
        LshGeometry(16, 4, probe1 = false), s"n=$n")
    // pinned planes + auto tables must solve tables FOR THE PINNED
    // planes (solving for the auto choice collapses recall — the
    // round-5 review finding): 8 unprobed planes at tau=0.4 need far
    // more than the 4-plane 12
    val half = LshGeometry.resolve(2000L, 0.4, tables = 0, planes = 8, probe1 = false)
    assert(half.planes === 8 && !half.probe1)
    // the honest 8-plane unprobed table count is 81; resolve clamps
    // at maxTables=64 (shortfall visible via recallAt) — either way,
    // FAR above the 4-plane 12 the old resolution would have used
    assert(LshGeometry.tablesFor(8, 0.4, 0.87, probe1 = false) === 81)
    assert(half.tables === 64, s"under-tabled pinned-plane geometry: $half")
    // fully-pinned calls pass through verbatim
    assert(LshGeometry.resolve(sys.error("count must not run"), 0.4, 12, 4, probe1 = true) ===
      LshGeometry(12, 4, probe1 = true))
  }

  test("IVF cell sizing: gate corpora keep the calibrated 64-cell index; sqrt(n) past it") {
    import graft.ann.Knn.cellsFor
    // every gate corpus (<= 4096 vectors) must train the exact index
    // the q72 oracle/spec was calibrated against
    for (n <- Seq(0L, 500L, 2000L, 4096L)) assert(cellsFor(n) === 64, s"n=$n")
    assert(cellsFor(1000000) === 1000)
    assert(cellsFor(1000000000L) === 31623)
    // capped: the centroid literal stays driver-materializable
    assert(cellsFor(100000000000L) === 65536)
    val sizes = Seq(1000L, 100000L, 10000000L, 1000000000L)
    val cells = sizes.map(cellsFor)
    assert(cells === cells.sorted)
  }
}
