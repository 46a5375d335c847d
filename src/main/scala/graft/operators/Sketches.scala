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

  val all: Seq[Qdef] = Seq(q90, q91, q92)
}
