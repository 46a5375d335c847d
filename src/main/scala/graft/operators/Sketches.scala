package graft.operators

import graft.{Qdef, Tables}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates — the patterns that replace
  * exact distinct/quantile work at 100 TB (SURVEY §2.12).
  *
  * The key property is MERGEABILITY: per-partition (or per-day,
  * per-shard) sketches combine associatively, so rollups never
  * rescan the base data and the shuffle carries a few KB per group
  * instead of the value set itself.
  *
  * Oracle form (r3): sketch estimates are engine-specific, so the
  * estimate itself can never hash-match DuckDB. Instead each query
  * emits the EXACT answer plus within-tolerance booleans computed
  * from the live sketch, and the oracle emits the exact answer plus
  * literal TRUE — a drifting sketch flips a boolean and fails the
  * hash compare. The exact side exists only as the checkable
  * yardstick at gate scale; the sketch path is the 100 TB artifact
  * (raw estimates stay available via [[distinctSketches]]).
  */
object Sketches {

  /** Per-nation distinct-customer sketches (approx_count_distinct =
    * HLL++ at 1% rsd, plus a Datasketches HLL estimate) — the raw
    * production shape, estimates exposed.
    */
  def distinctSketches(customer: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    customer
      .groupBy("c_nationkey")
      .agg(
        approx_count_distinct(col("c_custkey"), 0.01).as("approx_nd"),
        hll_sketch_estimate(hll_sketch_agg(col("c_custkey"))).as("hll_nd"))

  private val q90 = Qdef(
    "q90_sketch_distinct",
    (s, d) => {
      // exact and sketch sides are SEPARATE aggregations joined on the
      // 25-row group key: mixing countDistinct into the sketch agg
      // triggers Catalyst's distinct rewrite, whose partial phase
      // builds one HLL sketch per (nation, custkey) PAIR — 150k
      // object-hash sketches with sort-based fallback (profiled 6×
      // slower at sf0.1). Two clean scans beat one poisoned one; in
      // production only the sketch side runs at all.
      val exact = Tables.customer(s, d)
        .groupBy("c_nationkey")
        .agg(countDistinct(col("c_custkey")).as("exact_nd"))
      // THE production shape, not an inline copy of it — a future
      // rsd/sketch-config change must move the checked query and the
      // exposed helper together
      val approx = distinctSketches(Tables.customer(s, d))
      exact.join(approx, "c_nationkey")
        .select(col("c_nationkey"), col("exact_nd"),
          (abs(col("approx_nd") - col("exact_nd")).cast("double") /
            col("exact_nd").cast("double") <= 0.05).as("approx_ok"),
          (abs(col("hll_nd") - col("exact_nd")).cast("double") /
            col("exact_nd").cast("double") <= 0.05).as("hll_ok"))
        .orderBy("c_nationkey")
    },
    Some("""SELECT c_nationkey, COUNT(DISTINCT c_custkey) AS exact_nd,
            TRUE AS approx_ok, TRUE AS hll_ok
            FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"""))

  /** Approximate order-price quantiles per priority (approx_percentile
    * at accuracy 10000) checked in-row against Spark's exact
    * interpolated percentile; min/max anchor the row with exact,
    * hash-safe data values (cross-engine interpolated doubles would
    * not be).
    */
  private val q91 = Qdef(
    "q91_sketch_quantiles",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"),
          expr("approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), 10000)").as("a"),
          expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))").as("e"))
        .select(col("o_orderpriority"), col("n_orders"), col("min_price"), col("max_price"),
          (abs(col("a")(0) - col("e")(0)) / col("e")(0) <= 0.02).as("p50_ok"),
          (abs(col("a")(1) - col("e")(1)) / col("e")(1) <= 0.02).as("p90_ok"),
          (abs(col("a")(2) - col("e")(2)) / col("e")(2) <= 0.02).as("p99_ok"))
        .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority, COUNT(*) AS n_orders,
            MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
            TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Two-level rollup by sketch MERGE: per-nation HLL sketches are
    * unioned up to regions without touching customer rows again —
    * the exact shape of a 100 TB hierarchy rollup (sketch once,
    * merge everywhere). The exact per-region distinct rides along as
    * the oracle yardstick.
    */
  private val q92 = Qdef(
    "q92_sketch_merge_rollup",
    (s, d) => {
      val perNation = Tables.customer(s, d)
        .groupBy("c_nationkey")
        .agg(hll_sketch_agg(col("c_custkey")).as("sk"))
      val merged = perNation
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_regionkey")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("region_nd"))
      val exact = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_regionkey")
        .agg(countDistinct(col("c_custkey")).as("exact_nd"))
      merged.join(exact, "n_regionkey")
        .select(col("n_regionkey"), col("exact_nd"),
          (abs(col("region_nd") - col("exact_nd")).cast("double") /
            col("exact_nd").cast("double") <= 0.05).as("merged_ok"))
        .orderBy("n_regionkey")
    },
    Some("""SELECT n_regionkey, COUNT(DISTINCT c_custkey) AS exact_nd, TRUE AS merged_ok
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_regionkey ORDER BY n_regionkey"""))

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
    // dataset-qualified join keys: bare col(...) would throw
    // AMBIGUOUS_REFERENCE whenever factKey and dimKey share a name —
    // the natural-key call shape this public helper invites
    val pruned = fact
      .filter(call_function("graft_might_contain", lit(bf), xxhash64(col(factKey))))
    pruned.join(dim, pruned(factKey) === dim(dimKey))
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

  /** q9b: heavy hitters (frequent items) — the top-k token census a
    * corpus profile needs, with a Count-Min sketch riding along as the
    * mergeable 100 TB artifact. The exact side is one shuffled
    * token-count aggregate with a deterministic (count desc, token)
    * top-k; the sketch side is `count_min_sketch` — per-partition
    * partial sketches merge associatively, so at scale per-shard
    * sketches roll up without rescanning tokens (same property as the
    * HLL rollup in q92). The sketch binary is a few KB independent of
    * corpus size; probing the k winners happens driver-side on that
    * constant (bounded, like the bloom in [[bloomPrefilteredJoin]]).
    * CMS guarantees estimate ≥ exact always; the upper bound
    * (exact + eps·N) holds only with per-item probability 1-delta, so
    * the tolerance boolean uses 5× that slack plus a constant — the
    * exceedance probability decays exponentially per sketch row
    * (~(1/10)^7 ≈ 1e-7 at 5×), so the boolean never flips on a gate
    * dataset while still catching a broken sketch outright.
    */
  private val q9b = Qdef(
    "q9b_sketch_topk",
    (s, d) => {
      val eps = 0.0001
      // staged: the exact top-k job and the sketch/total job BOTH
      // consume the exploded token frame — unstaged, each re-ran the
      // scan + tokenize + explode over the whole corpus (the most
      // expensive phase of this query, paid twice)
      val tok = graft.Stage(Tables.documents(s, d)
        .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("token")))
      val top = tok.groupBy("token").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("token"))
        .limit(20)
      val row = tok.agg(
        expr(s"count_min_sketch(token, ${eps}d, 0.99d, 1)").as("cms"),
        count(lit(1)).as("total")).head()
      val cms = org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("cms")))
      val slack = 5L * (eps * row.getAs[Long]("total")).toLong + 10L
      val est = udfFreeEstimates(s, top.collect().map(r =>
        (r.getString(0), r.getLong(1), cms.estimateCount(r.getString(0)))), slack)
      est.orderBy(col("exact_n").desc, col("token"))
    },
    Some("""WITH tok AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
                         FROM documents),
            top AS (SELECT token, COUNT(*) AS exact_n FROM tok GROUP BY token
                    ORDER BY exact_n DESC, token LIMIT 20)
            SELECT token, exact_n, TRUE AS cms_ok FROM top
            ORDER BY exact_n DESC, token"""))

  /** The k probed winners re-enter the engine as a tiny local frame —
    * a deliberate, bounded driver hop (k rows, one sketch), never a
    * data-path collect.
    */
  private def udfFreeEstimates(
      s: org.apache.spark.sql.SparkSession,
      probed: Array[(String, Long, Long)],
      slack: Long): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    probed.toSeq
      .map { case (t, n, e) => (t, n, e >= n && e <= n + slack) }
      .toDF("token", "exact_n", "cms_ok")
  }

  val all: Seq[Qdef] = Seq(q90, q91, q92, q93, q9b)
}
