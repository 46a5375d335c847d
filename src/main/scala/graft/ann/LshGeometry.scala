package graft.ann

/** Data-derived random-hyperplane LSH geometry.
  *
  * The round-4 sf≈1 soak (PLANS.md) measured why fixed geometry is a
  * scale bug: at 20k vectors the 4-plane gate default leaves 1250-row
  * mean buckets — 158M in-bucket pair slots, the quadratic regime —
  * while 8 planes cut the pairwise work 13×. This module turns that
  * observation into the closed-form solver the library defaults use:
  *
  *  - `planes` from corpus size: mean bucket population per table is
  *    n / 2^planes, so planes = ⌈log2(n / targetBucket)⌉ keeps the
  *    per-bucket pairwise verify work bounded as n grows.
  *  - `tables` from the recall target: a pair at cosine τ agrees with
  *    one hyperplane with p = 1 − arccos(τ)/π, collides in one table
  *    with hit = p^planes (plus the 1-bit-multiprobe term when
  *    `probe1` — a near-miss on exactly one hyperplane still meets),
  *    and is found by ANY of t independent tables with
  *    1 − (1 − hit)^t. Solve t for the target recall.
  *  - `probe1` whenever the derived planes exceed the 4-plane gate
  *    default: per-table hit decays geometrically in planes, and the
  *    1-bit probe buys back a planes·p^(planes−1)(1−p) term for a
  *    (planes+1)× fan-out on ONE side of the bucket join only — far
  *    cheaper than the extra tables it replaces (at n=4000, τ=0.4:
  *    5 probed tables match the recall of 12 unprobed ones).
  *
  * The recall floor is the WORST case — pairs exactly at τ; anything
  * more similar has higher p and is found with higher probability
  * (exact copies collide in every table, always). Note the τ-scaling
  * economics: at the realistic near-dup threshold τ=0.9 (p≈0.856) a
  * billion-row corpus needs ~14 probed tables at 23 planes (mean
  * bucket ≈ 119), while τ=0.4 at that scale is intrinsically
  * expensive — `maxTables` caps the spend by backing planes off
  * (bigger buckets, more verify work) rather than silently missing
  * the recall target; if even the gate planes can't reach the target
  * within `maxTables`, tables clamp to the cap and the shortfall is
  * visible via [[recallAt]].
  */
final case class LshGeometry(tables: Int, planes: Int, probe1: Boolean)

object LshGeometry {

  /** The gate-scale plane count — geometry below ~2k rows resolves to
    * this, which keeps every small-SF oracle bit-identical to the
    * fixed 4-plane era.
    */
  val GatePlanes = 4

  /** Planes keeping the EXPECTED per-table bucket population
    * (n / 2^planes) near `targetBucket`. Monotone in n; floors at
    * [[GatePlanes]].
    */
  def planesFor(n: Long, targetBucket: Int = 128): Int =
    if (n <= targetBucket) GatePlanes
    else math.max(GatePlanes,
      math.ceil(math.log(n.toDouble / targetBucket) / math.log(2.0)).toInt)

  /** P(one random hyperplane puts both vectors of a cosine-τ pair on
    * the same side) = 1 − θ/π.
    */
  def collisionProb(tau: Double): Double = {
    val t = math.max(-1.0, math.min(1.0, tau))
    1.0 - math.acos(t) / math.Pi
  }

  /** Per-table hit probability for a cosine-τ pair: all `planes` bits
    * agree, plus (with `probe1`) exactly one disagreeing bit — the
    * bucket the 1-bit expansion reaches.
    */
  def perTableHit(tau: Double, planes: Int, probe1: Boolean): Double = {
    val p = collisionProb(tau)
    val base = math.pow(p, planes)
    if (probe1) base + planes * math.pow(p, planes - 1) * (1.0 - p) else base
  }

  /** Expected recall of `g` for pairs AT the threshold τ (the floor —
    * closer pairs do better): 1 − (1 − hit)^tables.
    */
  def recallAt(g: LshGeometry, tau: Double): Double =
    1.0 - math.pow(1.0 - perTableHit(tau, g.planes, g.probe1), g.tables)

  /** Smallest table count reaching `targetRecall` for τ-pairs at the
    * given planes/probe setting.
    */
  def tablesFor(
      planes: Int,
      tau: Double,
      targetRecall: Double = 0.87,
      probe1: Boolean = false): Int = {
    require(targetRecall > 0 && targetRecall < 1, s"targetRecall must be in (0,1): $targetRecall")
    val hit = perTableHit(tau, planes, probe1)
    if (hit >= 1.0) 1
    else math.max(1, math.ceil(math.log1p(-targetRecall) / math.log1p(-hit)).toInt)
  }

  /** The solver the library defaults call: planes from corpus size,
    * probe1 iff planes exceed the gate default, tables from the
    * recall target — backed off to fewer planes (bigger buckets,
    * never a missed recall target) if the table count would exceed
    * `maxTables`.
    *
    * At n ≤ 2048·(targetBucket/128), τ=0.4 this returns the exact
    * fixed geometry the small-SF oracles were calibrated against:
    * (tables=12, planes=4, probe1=false).
    */
  def forCorpus(
      n: Long,
      tau: Double = 0.4,
      targetRecall: Double = 0.87,
      targetBucket: Int = 128,
      maxTables: Int = 64): LshGeometry = {
    def geom(planes: Int): LshGeometry = {
      val probe = planes > GatePlanes
      LshGeometry(tablesFor(planes, tau, targetRecall, probe), planes, probe)
    }
    var planes = planesFor(n, targetBucket)
    var g = geom(planes)
    while (g.tables > maxTables && planes > GatePlanes) {
      planes -= 1
      g = geom(planes)
    }
    if (g.tables > maxTables) g.copy(tables = maxTables) else g
  }

  /** Geometry resolution for the library entry points, honoring
    * pinned knobs (> 0) and solving the rest — so a HALF-pinned call
    * can never silently land in the no-recall regime:
    *
    *  - nothing pinned: [[forCorpus]] (n is only counted here —
    *    by-name and lazily forced, so fully-pinned AND planes-pinned
    *    calls never pay the count action);
    *  - planes pinned, tables auto: tables are solved FOR THE PINNED
    *    plane count and the caller's probe flag (solving for the
    *    auto planes would under-table steep geometries — 8 unprobed
    *    planes at τ=0.4 need 80 tables, not 12), clamped to
    *    `maxTables` (shortfall visible via [[recallAt]]);
    *  - tables pinned, planes auto: the solver's planes/probe stand,
    *    recall is whatever the pinned table count buys;
    *  - both pinned: used verbatim, probe1 as given.
    *
    * The probe flag follows the solver only when planes are auto;
    * pinned planes leave probing entirely to the caller.
    */
  def resolve(
      n: => Long,
      tau: Double,
      tables: Int,
      planes: Int,
      probe1: Boolean,
      targetRecall: Double = 0.87,
      targetBucket: Int = 128,
      maxTables: Int = 64): LshGeometry =
    if (tables > 0 && planes > 0) LshGeometry(tables, planes, probe1)
    else {
      // lazy: the planes-pinned/tables-auto branch solves tablesFor
      // directly and must not pay the corpus count() behind `n`
      lazy val g = forCorpus(n, tau, targetRecall, targetBucket, maxTables)
      val pl = if (planes > 0) planes else g.planes
      val probe = probe1 || (planes <= 0 && g.probe1)
      val tbl =
        if (tables > 0) tables
        else if (planes <= 0) g.tables
        else math.min(maxTables, tablesFor(pl, tau, targetRecall, probe))
      LshGeometry(tbl, pl, probe)
    }
}
