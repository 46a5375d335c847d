package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Declarative cohort queries — the JSON query surface of the
  * reference (a query is an AND of OR-groups of criteria, optionally
  * minus exclusion criteria, evaluated against a subject or visit
  * population). A reference user posts a query description and gets a
  * population + count back; this is that endpoint as a library call:
  *
  * {{{
  * {
  *   "population": "subject",          // or "visit"
  *   "and": [
  *     {"or": [ {"source": "orders", "field": "o_orderpriority",
  *               "op": "eq", "value": "1-URGENT"} ]},
  *     {"or": [ {"source": "customer", "field": "c_acctbal",
  *               "op": "gt", "value": 7000} ]}
  *   ],
  *   "not": [ {"source": "lineitem", "field": "l_returnflag",
  *             "op": "eq", "value": "R"} ]
  * }
  * }}}
  *
  * ops: eq ne gt ge lt le like in between. Atoms resolve to distinct
  * key sets before any set algebra (SURVEY §4), so the evaluation
  * plan is identical to the hand-composed [[Cohort]] combinators.
  */
object CohortQuery {

  /** Named-source frames a caller may substitute for the live tables —
    * the seam the serving layer's instant-addressed cohort queries go
    * through: `sources("orders")`, when present, replaces every
    * resolution of the `orders` source (an as-of store read there
    * makes the whole query "as of instant t", the reference's
    * implicit property). Absent names fall back to the live table.
    */
  type SourceOverrides = Map[String, DataFrame]

  private def resolve(
      over: SourceOverrides, name: String)(live: => DataFrame): DataFrame =
    over.getOrElse(name, live)

  /** subject-population keys: how each source maps to c_custkey. */
  private def subjectKey(
      spark: SparkSession, dir: String, source: String,
      over: SourceOverrides): (DataFrame, Column) =
    source match {
      case "customer" => (resolve(over, "customer")(Tables.customer(spark, dir)), col("c_custkey"))
      case "orders"   => (resolve(over, "orders")(Tables.orders(spark, dir)), col("o_custkey"))
      case "lineitem" =>
        // measurements hang off visits; key them to the visit's subject
        val j = resolve(over, "lineitem")(Tables.lineitem(spark, dir))
          .join(resolve(over, "orders")(Tables.orders(spark, dir))
            .select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
        (j, col("o_custkey"))
      case s => throw new IllegalArgumentException(s"unknown subject source: $s")
    }

  /** visit-population keys: how each source maps to o_orderkey. */
  private def visitKey(
      spark: SparkSession, dir: String, source: String,
      over: SourceOverrides): (DataFrame, Column) =
    source match {
      case "orders"   => (resolve(over, "orders")(Tables.orders(spark, dir)), col("o_orderkey"))
      case "lineitem" => (resolve(over, "lineitem")(Tables.lineitem(spark, dir)), col("l_orderkey"))
      case s => throw new IllegalArgumentException(s"unknown visit source: $s")
    }

  /** user-population keys (the event stream's subject axis) — the
    * population the typed temporal/era atoms key by.
    */
  private def userKey(
      spark: SparkSession, dir: String, source: String,
      over: SourceOverrides): (DataFrame, Column) =
    source match {
      case "events" => (resolve(over, "events")(Tables.events(spark, dir)), col("user_id"))
      case s => throw new IllegalArgumentException(s"unknown user source: $s")
    }

  private def lit0(v: JValue): Any = v match {
    case JString(s)  => s
    // isValidLong: JInt holds a BigInt and .toLong silently WRAPS past
    // Long range — {"value": 2^64+1} would quietly compare against 1
    case JInt(i) if i.isValidLong => i.toLong
    case JLong(l)    => l
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case JBool(b)    => b
    case other       => throw new IllegalArgumentException(s"unsupported literal: $other")
  }

  private def predicate(field: String, op: String, value: JValue): Column = {
    val c = col(field)
    op match {
      case "eq"   => c === lit(lit0(value))
      case "ne"   => c =!= lit(lit0(value))
      case "gt"   => c > lit(lit0(value))
      case "ge"   => c >= lit(lit0(value))
      case "lt"   => c < lit(lit0(value))
      case "le"   => c <= lit(lit0(value))
      case "like" => c.like(lit0(value).toString)
      case "in" => value match {
        case JArray(vs) => c.isin(vs.map(lit0): _*)
        case other      => throw new IllegalArgumentException(s"'in' needs an array, got $other")
      }
      case "between" => value match {
        case JArray(lo :: hi :: Nil) => c >= lit(lit0(lo)) && c <= lit(lit0(hi))
        case other => throw new IllegalArgumentException(s"'between' needs [lo, hi], got $other")
      }
      case other => throw new IllegalArgumentException(s"unknown op: $other")
    }
  }

  private def strField(atom: JValue, name: String): String =
    atom \ name match {
      case JString(s) => s
      case JNothing   => throw new IllegalArgumentException(s"atom is missing '$name': $atom")
      case other      => throw new IllegalArgumentException(s"atom '$name' must be a string, got $other")
    }

  private def numField(atom: JValue, name: String): Long =
    atom \ name match {
      case JInt(i) if i.isValidLong => i.toLong
      case JLong(l) => l
      case JNothing => throw new IllegalArgumentException(s"atom is missing '$name': $atom")
      case other    => throw new IllegalArgumentException(s"atom '$name' must be an integer, got $other")
    }

  /** One criterion → distinct key set. `type` picks the atom family:
    * plain field predicates (default), or the typed event-shape
    * criteria — `temporal` ({first, then, withinDays}, q4c semantics)
    * and `era` ({windowMinutes, minEras}, q4d semantics) — which key
    * by user_id and therefore require the `user` population.
    */
  private def atomKeys(
      spark: SparkSession, dir: String, population: String, atom: JValue,
      over: SourceOverrides): DataFrame = {
    val typ = atom \ "type" match {
      case JString(t) => t
      case JNothing   => "field"
      case other      => throw new IllegalArgumentException(s"bad atom type: $other")
    }
    typ match {
      case "field" =>
        val source = strField(atom, "source")
        val field = strField(atom, "field")
        val op = strField(atom, "op")
        val value = atom \ "value"
        val (df, key) = population match {
          case "subject" => subjectKey(spark, dir, source, over)
          case "visit"   => visitKey(spark, dir, source, over)
          case "user"    => userKey(spark, dir, source, over)
          case p => throw new IllegalArgumentException(s"unknown population: $p")
        }
        df.filter(predicate(field, op, value)).select(key.as("subject")).distinct()
      case "temporal" =>
        require(population == "user", "temporal atoms key by user_id — use population 'user'")
        // range-checked BEFORE the narrowing .toInt: an unvalidated
        // 2^32 would wrap to 0 days and silently answer a different
        // question — the same wraparound class every cursor value is
        // already guarded against
        val wd = numField(atom, "withinDays")
        require(wd >= 1 && wd <= 36500,
          s"withinDays must be in [1, 36500] (100 years), got $wd")
        Cohort.temporalAtom(resolve(over, "events")(Tables.events(spark, dir)),
          strField(atom, "first"), strField(atom, "then"), wd.toInt).keys
      case "era" =>
        require(population == "user", "era atoms key by user_id — use population 'user'")
        // bounded so windowMinutes * 60e6 micros cannot overflow Long
        // into a negative window (52.6M minutes ≈ 100 years)
        val wm = numField(atom, "windowMinutes")
        require(wm >= 1 && wm <= 52600000L,
          s"windowMinutes must be in [1, 52600000] (~100 years), got $wm")
        Cohort.eraAtom(resolve(over, "events")(Tables.events(spark, dir)),
          wm * 60000000L,
          numField(atom, "minEras")).keys
      case other => throw new IllegalArgumentException(s"unknown atom type: $other")
    }
  }

  private def popOf(spec: JValue): String = spec \ "population" match {
    case JString(p) => p
    case JNothing   => "subject"
    case other      => throw new IllegalArgumentException(s"bad population: $other")
  }

  /** Evaluate a JSON query spec → distinct population key set.
    * `sources` substitutes named frames for the live tables (e.g. an
    * as-of store read as `orders` — see [[SourceOverrides]]).
    */
  def population(
      spark: SparkSession, dir: String, json: String,
      sources: SourceOverrides = Map.empty): DataFrame = {
    val spec = JsonMethods.parse(json)
    val pop = popOf(spec)
    val groups = spec \ "and" match {
      case JArray(gs) if gs.nonEmpty => gs.map { g =>
        g \ "or" match {
          // non-empty required: an empty OR-group has no defined
          // semantics (vacuously-false would make the whole AND
          // empty; vacuously-true would drop the criterion) and the
          // bare reduce below would surface it as an unexplained
          // empty.reduceLeft 500 instead of this validation error
          case JArray(atoms) if atoms.nonEmpty =>
            atoms.map(a => atomKeys(spark, dir, pop, a, sources))
          case JArray(_) =>
            throw new IllegalArgumentException(s"empty 'or' group in: $g")
          case JNothing      => List(atomKeys(spark, dir, pop, g, sources)) // bare atom = 1-ary OR
          case other         => throw new IllegalArgumentException(s"bad or-group: $other")
        }
      }
      case JArray(_) =>
        throw new IllegalArgumentException("query needs at least one criterion in 'and'")
      case other => throw new IllegalArgumentException(s"query needs an 'and' array, got $other")
    }
    val base = Cohort.and(groups.map(g => g.reduce(_ union _).distinct()))
    spec \ "not" match {
      case JArray(atoms) =>
        atoms.foldLeft(base)((acc, a) => Cohort.not(acc, atomKeys(spark, dir, pop, a, sources)))
      case JNothing => base
      case other    => throw new IllegalArgumentException(s"bad not-list: $other")
    }
  }

  /** Evaluate a spec → 1-row count (the reference's query result). */
  def count(
      spark: SparkSession, dir: String, json: String,
      sources: SourceOverrides = Map.empty): DataFrame =
    Cohort.countSubjects(population(spark, dir, json, sources))

  /** Per-atom subject counts — the reference exposes every
    * criterion's own population size next to the query result. Spec
    * shape: `{"population": ..., "atoms": [atom, ...]}` with the same
    * atom grammar as [[population]]. ONE job: each atom's distinct
    * key set is tagged with its index and unioned, so a single
    * partial-agg pass counts all atoms; atoms matching nothing still
    * report 0 via the broadcast index join.
    */
  def atomCounts(
      spark: SparkSession, dir: String, json: String,
      sources: SourceOverrides = Map.empty): DataFrame = {
    val spec = JsonMethods.parse(json)
    val pop = popOf(spec)
    val atoms = spec \ "atoms" match {
      case JArray(as) if as.nonEmpty => as
      case other => throw new IllegalArgumentException(
        s"atom-counts needs a non-empty 'atoms' array, got $other")
    }
    val tagged = atoms.zipWithIndex.map { case (a, i) =>
      atomKeys(spark, dir, pop, a, sources).select(lit(i).as("atom"), col("subject"))
    }
    val counts = tagged.reduce(_ unionByName _)
      .groupBy("atom").agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
    spark.range(atoms.size).select(col("id").cast("int").as("atom"))
      .join(broadcast(counts), Seq("atom"), "left")
      .select(col("atom"), coalesce(col("n"), lit(0L)).as("n_subjects"))
      .orderBy("atom")
  }

  /** The demo spec used by the oracle-checked q4a query. */
  val demoSpec: String =
    """{
      |  "population": "subject",
      |  "and": [
      |    {"or": [
      |      {"source": "orders",   "field": "o_orderpriority", "op": "eq", "value": "1-URGENT"},
      |      {"source": "lineitem", "field": "l_returnflag",    "op": "eq", "value": "R"}
      |    ]},
      |    {"or": [
      |      {"source": "customer", "field": "c_mktsegment", "op": "eq", "value": "BUILDING"},
      |      {"source": "customer", "field": "c_acctbal",    "op": "gt", "value": 7000}
      |    ]}
      |  ],
      |  "not": [
      |    {"source": "customer", "field": "c_acctbal", "op": "lt", "value": 0}
      |  ]
      |}""".stripMargin

  /** The event-shape demo spec for q4e: era AND (temporal OR field)
    * NOT field, over the user population — every typed atom family in
    * one declarative query.
    */
  val eventsSpec: String =
    """{
      |  "population": "user",
      |  "and": [
      |    {"type": "era", "windowMinutes": 30, "minEras": 60},
      |    {"or": [
      |      {"type": "temporal", "first": "view", "then": "purchase", "withinDays": 1},
      |      {"source": "events", "field": "value", "op": "between", "value": [250, 300]}
      |    ]}
      |  ],
      |  "not": [
      |    {"source": "events", "field": "value", "op": "gt", "value": 300}
      |  ]
      |}""".stripMargin

  val q4e: graft.Qdef = graft.Qdef(
    "q4e_cohort_dsl_events",
    (s, d) => count(s, d, eventsSpec),
    Some("""WITH e AS (SELECT user_id, event_type, value, event_id, epoch_ns(ts) // 1000 AS us FROM events),
            iv AS (SELECT user_id, event_id, us AS s, us + 1800000000 AS e FROM e),
            m AS (SELECT user_id, event_id, s, e,
                         MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
                  FROM iv),
            g AS (SELECT user_id, s,
                         SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY s, event_id
                             ROWS UNBOUNDED PRECEDING) AS grp
                  FROM m),
            mg AS (SELECT user_id, grp FROM g GROUP BY 1, 2),
            q AS (SELECT user_id FROM mg GROUP BY user_id HAVING COUNT(*) >= 60),
            t AS (SELECT DISTINCT a.user_id FROM e a WHERE a.event_type = 'view' AND EXISTS (
                    SELECT 1 FROM e b WHERE b.user_id = a.user_id AND b.event_type = 'purchase'
                      AND b.us >= a.us AND b.us <= a.us + CAST(86400000000 AS BIGINT))),
            f AS (SELECT DISTINCT user_id FROM e WHERE value BETWEEN 250 AND 300),
            x AS (SELECT DISTINCT user_id FROM e WHERE value > 300)
            SELECT COUNT(*) AS n_subjects FROM (
              (SELECT user_id FROM q
               INTERSECT
               (SELECT user_id FROM t UNION SELECT user_id FROM f))
              EXCEPT SELECT user_id FROM x) z"""))

  // ------------------------------------------- maintained atom counts
  //
  // The reference answers per-criterion counts next to every query
  // result, and its store is import-fed: at 100 TB those counts must
  // update O(import batch), not O(store re-scan). The state below is
  // the multi-atom generalization of Warehouse.applyBatchToAgg's
  // signed partials: one sparse (atom, subject, n-matching-rows) frame
  // whose per-batch transition touches only batch-sized inputs plus
  // one before-image semi-join — and whose presentation (subjects with
  // n > 0 per atom) is bit-identical to recomputing [[atomCounts]]
  // over the merged store at every version.

  /** Parse `{"population": subject|visit, "atoms": [...]}` where every
    * atom is a FIELD atom on the `orders` source (the store-fed
    * table), to (subject key column, per-atom predicates). Loud on
    * anything the maintained path cannot transition incrementally.
    */
  private[graft] def maintainedSpec(json: String): (String, Seq[Column]) = {
    val spec = JsonMethods.parse(json)
    val subject = popOf(spec) match {
      case "subject" => "o_custkey"
      case "visit"   => "o_orderkey"
      case p => throw new IllegalArgumentException(
        s"maintained atom counts cover the orders store's populations (subject|visit), got '$p'")
    }
    val atoms = spec \ "atoms" match {
      case JArray(as) if as.nonEmpty => as
      case other => throw new IllegalArgumentException(
        s"atom-counts needs a non-empty 'atoms' array, got $other")
    }
    val preds = atoms.map { a =>
      val typ = a \ "type" match {
        case JString(t) => t; case JNothing => "field"
        case other => throw new IllegalArgumentException(s"bad atom type: $other")
      }
      require(typ == "field" && strField(a, "source") == "orders",
        "maintained atom counts cover field atoms on the store-fed 'orders' source — " +
          s"evaluate other atoms through the normal (recompute) path: $a")
      predicate(strField(a, "field"), strField(a, "op"), a \ "value")
    }
    (subject, preds)
  }

  /** Sparse maintained state of `table`: one row per (atom index,
    * subject) with n = how many table rows match that atom's
    * predicate. ONE scan — the per-row atom indicators ride a single
    * posexplode, so adding atoms never adds passes. A predicate that
    * evaluates null on a row contributes 0 (exactly the rows
    * `filter(pred)` would drop in [[atomCounts]]).
    */
  def atomState(table: DataFrame, subject: Column, preds: Seq[Column]): DataFrame =
    table
      .select(subject.as("subject"),
        posexplode(array(preds.map(p => when(p, 1L).otherwise(0L)): _*)).as(Seq("atom", "m")))
      .filter(col("m") === 1L)
      .groupBy("atom", "subject").agg(sum("m").as("n"))

  /** One import batch applied to a maintained state WITHOUT touching
    * the base table beyond the before-image semi-join (batch keys
    * broadcast): minus the touched keys' previous contributions, plus
    * the surviving batch rows' — the [[graft.operators.Warehouse
    * .applyBatchToAgg]] transition, per atom. Assumes ≤1 row per key
    * per batch (the store's documented contract). Rows whose net n
    * reaches 0 leave the state, so it stays sparse forever.
    */
  def applyBatchToAtomState(
      state: DataFrame, prevTable: DataFrame, batch: DataFrame,
      keys: Seq[String], subject: Column, preds: Seq[Column]): DataFrame = {
    val b = graft.sources.Snapshots.normDeleted(batch)
    val before = prevTable.join(b.select(keys.map(col): _*), keys, "left_semi")
    val neg = atomState(before, subject, preds).withColumn("n", -col("n"))
    val pos = atomState(b.filter(!col("_deleted")).drop("_deleted"), subject, preds)
    state.unionByName(neg).unionByName(pos)
      .groupBy("atom", "subject").agg(sum("n").as("n"))
      .filter(col("n") =!= 0L)
  }

  /** Present a maintained state as [[atomCounts]]'s exact output
    * shape: (atom, n_subjects), zeros included for atoms matching no
    * subject.
    */
  def presentAtomCounts(spark: SparkSession, state: DataFrame, nAtoms: Int): DataFrame =
    spark.range(nAtoms).select(col("id").cast("int").as("atom"))
      .join(broadcast(state.filter(col("n") > 0L)
        .groupBy("atom").agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))),
        Seq("atom"), "left")
      .select(col("atom"), coalesce(col("n"), lit(0L)).as("n_subjects"))
      .orderBy("atom")

  val q4a: graft.Qdef = graft.Qdef(
    "q4a_cohort_json_dsl",
    (s, d) => count(s, d, demoSpec),
    Some("""SELECT COUNT(*) AS n_subjects FROM (
              ((SELECT DISTINCT o_custkey AS subject FROM orders WHERE o_orderpriority = '1-URGENT'
                UNION
                SELECT DISTINCT o_custkey AS subject FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE l_returnflag = 'R')
               INTERSECT
               (SELECT DISTINCT c_custkey AS subject FROM customer WHERE c_mktsegment = 'BUILDING'
                UNION
                SELECT DISTINCT c_custkey AS subject FROM customer WHERE c_acctbal > 7000))
              EXCEPT
              SELECT DISTINCT c_custkey AS subject FROM customer WHERE c_acctbal < 0) t"""))
}
