package graft

import org.apache.spark.sql.functions._

/** q90–q92 — sketch accuracy bounds vs exact answers (SURVEY §2.12). */
class SketchesSpec extends SparkSpec {

  test("q90: exact distincts match and sketch tolerance booleans hold per nation") {
    val exact = Tables.customer(spark, sf)
      .groupBy("c_nationkey").agg(countDistinct("c_custkey").as("nd"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("q90_sketch_distinct")(spark, sf).collect()
    assert(rows.length === exact.size)
    rows.foreach { r =>
      val k = r.getInt(0)
      assert(r.getLong(1) === exact(k))
      assert(r.getBoolean(2), s"approx_nd out of tolerance at nation $k")
      assert(r.getBoolean(3), s"hll_nd out of tolerance at nation $k")
    }
    // raw-estimate production path stays within the same bound
    graft.operators.Sketches.distinctSketches(Tables.customer(spark, sf))
      .collect().foreach { r =>
        val k = r.getInt(0)
        assert(math.abs(r.getLong(1) - exact(k)).toDouble / exact(k) <= 0.05)
      }
  }

  test("q91: approx percentiles within 2% of exact (boolean row form)") {
    val rows = SparkEntry.queries("q91_sketch_quantiles")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"p50 off for ${r.getString(0)}")
      assert(r.getBoolean(5), s"p90 off for ${r.getString(0)}")
      assert(r.getBoolean(6), s"p99 off for ${r.getString(0)}")
    }
  }

  test("q92: merged region sketches within 5% of exact (boolean row form)") {
    val exact = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_regionkey").agg(countDistinct("c_custkey").as("nd"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val merged = SparkEntry.queries("q92_sketch_merge_rollup")(spark, sf).collect()
    assert(merged.length === exact.size)
    merged.foreach { r =>
      val k = r.getInt(0)
      assert(r.getLong(1) === exact(k))
      assert(r.getBoolean(2), s"region $k merged estimate out of tolerance")
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
    // registration alone doesn't prove the builder CONSTRUCTS — a
    // lambda that throws (bad index arithmetic, wrong arity) still
    // registers its name. Every builder must build an Expression from
    // SOME combination of literal children at arity <= 4 (several
    // builders demand construction-time foldables: litInt widths,
    // litMatrix centroid tables), so probe a small palette per slot.
    locally {
      import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
      import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}
      val palette = Seq[Expression](
        Literal("x"), Literal(1),
        // 1-element vector: lets graft_lsh_buckets construct (its
        // threshold vector must match the 1-row matrix literal below)
        Literal.create(Seq(1.0), ArrayType(DoubleType)),
        Literal.create(Seq(1.0, 2.0), ArrayType(DoubleType)),
        Literal.create(Seq(Seq(1.0, 2.0)), ArrayType(ArrayType(DoubleType))),
        // [left, right] string pairs — the BPE merge-table shape
        Literal.create(Seq(Seq("a", "b")), ArrayType(ArrayType(StringType))))
      def combos(k: Int): Iterator[Seq[Expression]] =
        if (k == 0) Iterator(Seq.empty)
        else combos(k - 1).flatMap(rest => palette.iterator.map(_ +: rest))
      functions.VectorExpressions.builders.foreach { case (name, _, b) =>
        val constructs = (1 to 4).iterator.flatMap(combos).exists { cs =>
          try { b(cs); true }
          catch { case scala.util.control.NonFatal(_) => false }
        }
        assert(constructs, s"$name: builder constructs from no literal-child combination at arity 1..4")
      }
    }
    assert(functions.VectorExpressions.builders.map(_._1).distinct.size ===
      functions.VectorExpressions.builders.size, "duplicate function names")
  }
}
