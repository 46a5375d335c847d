package graft

import graft.operators.{Cohort, CohortQuery}
import org.apache.spark.sql.functions._

/** JSON cohort-query DSL semantics (SURVEY §2.5). */
class CohortQuerySpec extends SparkSpec {

  test("DSL CNF equals hand-composed combinators") {
    val json =
      """{"and": [
        |  {"or": [{"source": "orders", "field": "o_orderpriority", "op": "eq", "value": "1-URGENT"}]},
        |  {"or": [{"source": "customer", "field": "c_mktsegment", "op": "eq", "value": "BUILDING"},
        |          {"source": "customer", "field": "c_acctbal", "op": "gt", "value": 7000}]}
        |]}""".stripMargin
    val dsl = CohortQuery.population(spark, sf, json).collect().map(_.getLong(0)).toSet
    val urgent = Cohort.atom("u", Tables.orders(spark, sf),
      col("o_orderpriority") === "1-URGENT", col("o_custkey"))
    val building = Cohort.atom("b", Tables.customer(spark, sf),
      col("c_mktsegment") === "BUILDING", col("c_custkey"))
    val rich = Cohort.atom("r", Tables.customer(spark, sf),
      col("c_acctbal") > 7000, col("c_custkey"))
    val direct = Cohort.and(Seq(urgent.keys, Cohort.or(Seq(building, rich))))
      .collect().map(_.getLong(0)).toSet
    assert(dsl === direct)
  }

  test("bare atom works as a 1-ary OR-group; ops in/between/like parse") {
    val json =
      """{"and": [
        |  {"source": "orders", "field": "o_orderpriority", "op": "in", "value": ["1-URGENT", "2-HIGH"]},
        |  {"source": "customer", "field": "c_acctbal", "op": "between", "value": [0, 5000]},
        |  {"source": "customer", "field": "c_name", "op": "like", "value": "Customer%"}
        |]}""".stripMargin
    val n = CohortQuery.count(spark, sf, json).head().getLong(0)
    assert(n > 0)
    // n > 0 only proves the ops parse — bind their SEMANTICS against
    // directly composed predicates (a 'between' dropping its upper
    // bound or a 'like' doing contains would still count > 0)
    val inKeys = Tables.orders(spark, sf)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_custkey").as("subject")).distinct()
    val btwKeys = Tables.customer(spark, sf)
      .filter(col("c_acctbal").between(0, 5000))
      .select(col("c_custkey").as("subject")).distinct()
    val likeKeys = Tables.customer(spark, sf)
      .filter(col("c_name").like("Customer%"))
      .select(col("c_custkey").as("subject")).distinct()
    assert(n === Cohort.and(Seq(inKeys, btwKeys, likeKeys)).count(),
      "in/between/like DSL ops diverge from directly composed predicates")
  }

  test("visit population keys atoms by order, not customer") {
    val json =
      """{"population": "visit", "and": [
        |  {"source": "orders", "field": "o_orderpriority", "op": "eq", "value": "1-URGENT"},
        |  {"source": "lineitem", "field": "l_returnflag", "op": "eq", "value": "R"}
        |]}""".stripMargin
    val n = CohortQuery.count(spark, sf, json).head().getLong(0)
    // must equal the hand-built visit cohort q49 minus its date filter superset
    val urgentVisits = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("subject")).distinct()
    val returnVisits = Tables.lineitem(spark, sf).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("subject")).distinct()
    assert(n === Cohort.and(Seq(urgentVisits, returnVisits)).count())
  }

  test("malformed specs fail loudly") {
    intercept[IllegalArgumentException] {
      CohortQuery.population(spark, sf, """{"and": [{"source": "nope", "field": "x", "op": "eq", "value": 1}]}""")
    }
    intercept[IllegalArgumentException] {
      CohortQuery.population(spark, sf, """{"or": []}""") // no 'and' root
    }
    intercept[IllegalArgumentException] {
      CohortQuery.population(spark, sf,
        """{"and": [{"source": "orders", "field": "o_orderkey", "op": "xor", "value": 1}]}""")
    }
    // a JSON integer past Long range must be refused, not WRAPPED:
    // BigInt.toLong would silently turn 2^64+1 into 1 and the query
    // would confidently answer "o_custkey > 1"
    intercept[IllegalArgumentException] {
      CohortQuery.population(spark, sf,
        """{"and": [{"source": "orders", "field": "o_custkey", "op": "gt", "value": 18446744073709551617}]}""")
    }
  }

  test("item surfaces refuse blank and NaN-shaped inputs loudly") {
    import graft.operators.Cohort
    // Some("") would pass an Option presence check and contains("")
    // matches EVERY row — a blank search box must not list the table
    intercept[IllegalArgumentException] {
      Cohort.metadataSearch(Tables.part(spark, sf), Some(""))
    }
    intercept[IllegalArgumentException] {
      Cohort.metadataSearch(Tables.part(spark, sf), None, Some(""))
    }
    // a constant-valued group's stddev is 0, not NaN: the moment
    // difference lands a few double-ulps negative (1.47 - 2.1²/3) and
    // an unclamped sqrt would serve NaN (Spark) or error (DuckDB)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val const = Seq(("g", 0.70), ("g", 0.70), ("g", 0.70)).toDF("k", "v")
    val std = Cohort.itemStats(const, "v", Some("k")).select("std_q").head().getDouble(0)
    assert(std == 0.0, s"constant group stddev must be exactly 0, got $std")
  }

  test("spec validation: blank patterns, empty groups, and out-of-range windows are typed errors, not wrong answers") {
    import graft.operators.Cohort
    // a blank q= alongside a valid regex must not OR the whole table
    // into the answer (contains("") is true for every row)
    val part = Tables.part(spark, sf)
    val direct = Cohort.metadataSearch(part, None, Some("^small .*(bolt|rod)$")).count()
    val mixed = Cohort.metadataSearch(part, Some(""), Some("^small .*(bolt|rod)$")).count()
    assert(mixed === direct, "a blank substring widened the regex search")
    assert(mixed < part.count(), "search degenerated into a full-table listing")
    intercept[IllegalArgumentException] { Cohort.metadataSearch(part, Some(""), Some("")) }
    // withinDays past Int range would silently wrap to a 0-day window
    intercept[IllegalArgumentException] {
      CohortQuery.population(spark, sf,
        """{"population":"user","and":[{"type":"temporal","first":"view","then":"purchase","withinDays":4294967296}]}""")
    }
    // windowMinutes * 60e6 micros must not overflow Long into a negative window
    intercept[IllegalArgumentException] {
      CohortQuery.population(spark, sf,
        """{"population":"user","and":[{"type":"era","windowMinutes":200000000000000,"minEras":1}]}""")
    }
    // empty or-group / empty and: validation errors, not empty.reduceLeft 500s
    intercept[IllegalArgumentException] {
      CohortQuery.population(spark, sf, """{"and":[{"or":[]}]}""")
    }
    intercept[IllegalArgumentException] {
      CohortQuery.population(spark, sf, """{"and":[]}""")
    }
    // a non-positive era window would invert every era (me < ms)
    // silently instead of erroring (ms-vs-us unit mix-ups)
    intercept[IllegalArgumentException] {
      graft.operators.Relational.mergedEras(Tables.events(spark, sf), windowUs = 0L)
    }
  }

  test("maintained atom counts equal the recompute bit-for-bit across deltas and a compaction") {
    import spark.implicits._
    import graft.sources.Snapshots
    val root = tmpDir("cohort-maintained")
    val specJson =
      """{"population": "subject", "atoms": [
           {"source": "orders", "field": "o_orderpriority", "op": "eq", "value": "1-URGENT"},
           {"source": "orders", "field": "o_totalprice", "op": "gt", "value": 100},
           {"source": "orders", "field": "o_orderpriority", "op": "eq", "value": "NEVER"}]}"""
    val (subjectName, preds) = CohortQuery.maintainedSpec(specJson)
    val subject = col(subjectName)
    val keys = Seq("o_orderkey")
    def recompute(): Seq[(Int, Long)] =
      CohortQuery.atomCounts(spark, sf, specJson,
        sources = Map("orders" -> Snapshots.latest(spark, root, keys)))
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    def present(st: org.apache.spark.sql.DataFrame): Seq[(Int, Long)] =
      CohortQuery.presentAtomCounts(spark, st, preds.size)
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq

    // v1: two subjects, overlapping atom membership (subject 10 holds
    // TWO urgent orders — a later single retraction must NOT drop it)
    Snapshots.commit(Seq(
      (1L, 10L, "1-URGENT", 150.0), (2L, 10L, "1-URGENT", 50.0),
      (3L, 20L, "2-HIGH", 200.0), (4L, 30L, "1-URGENT", 90.0))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"), root)
    var state = CohortQuery.atomState(Snapshots.latest(spark, root, keys), subject, preds)
    assert(present(state) === recompute())
    assert(present(state) === Seq((0, 2L), (1, 2L), (2, 0L)))

    // v2 delta: retract one of subject 10's urgent orders (membership
    // survives via the other), flip order 3 to urgent, add subject 40
    Snapshots.commitDelta(Seq(
      (1L, 10L, "1-URGENT", 150.0, true),
      (3L, 20L, "1-URGENT", 200.0, false),
      (5L, 40L, "3-LOW", 500.0, false))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice", "_deleted"), root)
    state = CohortQuery.applyBatchToAtomState(state,
      Snapshots.asOf(spark, root, 1L, keys), Snapshots.read(spark, root, 2L),
      keys, subject, preds)
    assert(present(state) === recompute())
    assert(present(state) === Seq((0, 3L), (1, 2L), (2, 0L)))

    // v3 delta: retract subject 10's LAST urgent order — it must leave
    // atom 0 now (the n-reaches-0 transition)
    Snapshots.commitDelta(Seq((2L, 10L, "1-URGENT", 50.0, true))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice", "_deleted"), root)
    state = CohortQuery.applyBatchToAtomState(state,
      Snapshots.asOf(spark, root, 2L, keys), Snapshots.read(spark, root, 3L),
      keys, subject, preds)
    assert(present(state) === recompute())
    assert(present(state).head === ((0, 2L)))

    // compaction appends a FULL restating the merged view: rebuilding
    // the state from that full must land exactly where the maintained
    // chain is
    Snapshots.compact(spark, root, keys)
    val fullV = Snapshots.latestVersion(spark, root)
    val rebuilt = CohortQuery.atomState(Snapshots.read(spark, root, fullV), subject, preds)
    assert(present(rebuilt) === present(state))
    assert(present(rebuilt) === recompute())
  }
}
