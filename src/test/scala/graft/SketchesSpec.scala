package graft

import org.apache.spark.sql.functions._

/** q90–q92 — sketch accuracy bounds vs exact answers (SURVEY §2.12). */
class SketchesSpec extends SparkSpec {

  test("q90: approx and HLL distinct counts within 5% of exact per nation") {
    val exact = Tables.customer(spark, sf)
      .groupBy("c_nationkey").agg(countDistinct("c_custkey").as("nd"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("q90_sketch_distinct")(spark, sf).collect()
    assert(approx.length === exact.size)
    approx.foreach { r =>
      val (k, a, h) = (r.getInt(0), r.getLong(1), r.getLong(2))
      assert(math.abs(a - exact(k)).toDouble / exact(k) <= 0.05, s"approx_nd off at nation $k")
      assert(math.abs(h - exact(k)).toDouble / exact(k) <= 0.05, s"hll_nd off at nation $k")
    }
  }

  test("q91: approx percentiles bracket the exact ones") {
    val approx = SparkEntry.queries("q91_sketch_quantiles")(spark, sf).collect()
    val exact = Tables.orders(spark, sf)
      .groupBy("o_orderpriority")
      .agg(expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))").as("q"))
      .select(col("o_orderpriority"), col("q")(0).as("p50"), col("q")(1).as("p90"), col("q")(2).as("p99"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    approx.foreach { r =>
      val (e50, e90, e99) = exact(r.getString(0))
      // approx_percentile returns an actual data value near the rank;
      // require within 2% relative of the exact interpolated value
      assert(math.abs(r.getDouble(1) - e50) / e50 <= 0.02)
      assert(math.abs(r.getDouble(2) - e90) / e90 <= 0.02)
      assert(math.abs(r.getDouble(3) - e99) / e99 <= 0.02)
    }
  }

  test("q92: merged region sketches equal nation-sketch union within 5%") {
    val exact = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_regionkey").agg(countDistinct("c_custkey").as("nd"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val merged = SparkEntry.queries("q92_sketch_merge_rollup")(spark, sf).collect()
    assert(merged.length === exact.size)
    merged.foreach { r =>
      val (k, v) = (r.getInt(0), r.getLong(1))
      assert(math.abs(v - exact(k)).toDouble / exact(k) <= 0.05, s"region $k merged estimate off")
    }
  }

  test("q93: bloom-prefiltered join equals the exact join") {
    import graft.operators.Sketches
    val li = Tables.lineitem(spark, sf)
    val blue = Tables.part(spark, sf).filter(col("p_name").contains("blue")).select("p_partkey")
    val exact = li.join(blue, col("l_partkey") === col("p_partkey"))
      .agg(Tables.dsum(col("l_extendedprice")).as("r"), count(lit(1)).as("n")).head()
    val bloomed = Sketches.bloomPrefilteredJoin(li, "l_partkey", blue, "p_partkey")
      .agg(Tables.dsum(col("l_extendedprice")).as("r"), count(lit(1)).as("n")).head()
    assert(bloomed.getDouble(0) === exact.getDouble(0))
    assert(bloomed.getLong(1) === exact.getLong(1))
  }

  test("GraftExtensions and per-session registration share one builder list") {
    // GraftExtensions consumes VectorExpressions.builders verbatim, so
    // covering the builders covers both surfaces: apply() must accept
    // every entry, and each registered builder must construct a
    // resolvable expression through the session registry.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw on any entry
    functions.VectorExpressions.register(spark)
    functions.VectorExpressions.names.foreach { n =>
      assert(spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(n)), s"$n not registered")
    }
    assert(functions.VectorExpressions.builders.map(_._1).distinct.size ===
      functions.VectorExpressions.builders.size, "duplicate function names")
  }
}
