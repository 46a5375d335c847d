package graft.operators

import graft.{Qdef, Tables}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates — the patterns that replace
  * exact distinct/quantile work at 100 TB (SURVEY §2.12).
  *
  * The key property is MERGEABILITY: per-partition (or per-day,
  * per-shard) sketches combine associatively, so rollups never
  * rescan the base data and the shuffle carries a few KB per group
  * instead of the value set itself. Accuracy bounds are asserted
  * against exact answers in `SketchesSpec` (rows-only check — sketch
  * internals are engine-specific, so no DuckDB hash oracle).
  */
object Sketches {

  /** Per-nation distinct customers, exact vs approx_count_distinct
    * (HLL++, default 5% rsd) vs a Datasketches HLL estimate.
    */
  private val q90 = Qdef(
    "q90_sketch_distinct",
    (s, d) =>
      Tables.customer(s, d)
        .groupBy("c_nationkey")
        .agg(
          approx_count_distinct(col("c_custkey"), 0.01).as("approx_nd"),
          hll_sketch_estimate(hll_sketch_agg(col("c_custkey"))).as("hll_nd"))
        .orderBy("c_nationkey"),
    None)

  /** Approximate order-price quantiles per priority
    * (approx_percentile with accuracy 10000).
    */
  private val q91 = Qdef(
    "q91_sketch_quantiles",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(expr(
          "approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), 10000)").as("q"))
        .select(col("o_orderpriority"),
          col("q")(0).as("p50"), col("q")(1).as("p90"), col("q")(2).as("p99"))
        .orderBy("o_orderpriority"),
    None)

  /** Two-level rollup by sketch MERGE: per-nation HLL sketches are
    * unioned up to regions without touching customer rows again —
    * the exact shape of a 100 TB hierarchy rollup (sketch once,
    * merge everywhere).
    */
  private val q92 = Qdef(
    "q92_sketch_merge_rollup",
    (s, d) => {
      val perNation = Tables.customer(s, d)
        .groupBy("c_nationkey")
        .agg(hll_sketch_agg(col("c_custkey")).as("sk"))
      perNation
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_regionkey")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("region_nd"))
        .orderBy("n_regionkey")
    },
    None)

  /** Bloom-filter join pre-filter: build a bloom over the (small)
    * filtered dimension's keys, semi-filter the fact scan with
    * `might_contain` BEFORE the shuffle, then finish with the exact
    * join. At 100 TB this is the difference between shuffling the
    * whole fact table and shuffling only candidate rows (Catalyst
    * injects the same shape itself as a runtime filter when stats
    * allow; this makes the pattern explicit and testable). False
    * positives are filtered by the exact join — results are identical
    * to the plain join, only the shuffled volume changes.
    */
  def bloomPrefilteredJoin(
      fact: org.apache.spark.sql.DataFrame,
      factKey: String,
      dim: org.apache.spark.sql.DataFrame,
      dimKey: String,
      expectedKeys: Long = 10000L): org.apache.spark.sql.DataFrame = {
    // might_contain requires a CONSTANT bloom binary (that is how the
    // optimizer's own runtime filters inject it: as the materialized
    // result of a scalar subquery). The filter is a few KB — collect
    // it once and inline it as a literal in the fact-side scan filter.
    val bf: Array[Byte] = dim
      .agg(call_function("graft_bloom_agg",
        xxhash64(col(dimKey)), lit(expectedKeys), lit(8 * expectedKeys)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    // No broadcast hint on the finishing join: a dim small enough to
    // broadcast gets broadcast by AQE/size stats anyway, while a dim
    // that is big enough to NEED a bloom pre-filter must be free to
    // plan as a shuffle join (a forced driver broadcast would OOM —
    // the bloom itself stays a few KB regardless of dim row count).
    fact
      .filter(call_function("graft_might_contain", lit(bf), xxhash64(col(factKey))))
      .join(dim, col(factKey) === col(dimKey))
  }

  /** q93: revenue of lineitems whose part is a "blue" part, via the
    * bloom pre-filter. Bloom false positives are removed by the exact
    * join, so the result is BY CONSTRUCTION identical to the plain
    * join — which is exactly what the DuckDB oracle runs (the sketch
    * changes shuffled volume, never the answer).
    */
  private val q93 = Qdef(
    "q93_bloom_join",
    (s, d) => {
      val blueParts = Tables.part(s, d)
        .filter(col("p_name").contains("blue"))
        .select("p_partkey")
      bloomPrefilteredJoin(Tables.lineitem(s, d), "l_partkey", blueParts, "p_partkey")
        .agg(graft.Tables.dsum(col("l_extendedprice")).as("revenue"),
          count(lit(1)).as("n_lines"))
    },
    Some(s"""SELECT ${Qdef.DSUM("l_extendedprice")} AS revenue, COUNT(*) AS n_lines
             FROM lineitem JOIN part ON l_partkey = p_partkey
             WHERE p_name LIKE '%blue%'"""))

  val all: Seq[Qdef] = Seq(q90, q91, q92, q93)
}
