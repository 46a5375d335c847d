package graft.operators

import graft.{Qdef, Tables}
import graft.Qdef.{DAVG, DSUM}
import graft.Tables.{davg, dsum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cohort query semantics — SURVEY §2.5, modeled on lens-warehouse's
  * query model: a query is an AND of OR-groups of atoms (criteria);
  * each atom yields the set of matching subjects; results are subject
  * populations and their counts, plus per-item value statistics /
  * histograms / code-list frequencies and metadata search.
  *
  * Subjects are customers (`c_custkey`). Scale design: every atom
  * reduces to a distinct key set FIRST (partial-agg distinct, tiny
  * output), then set algebra runs on key sets only — OR is
  * union+distinct, AND is a chain of left-semi joins (broadcast-able
  * when a side is small), NOT is a left-anti join. At 100 TB the fact
  * scan dominates and each atom is one pushed-down scan; the
  * intersections never shuffle more than the key sets themselves.
  */
object Cohort {

  /** A criterion: rows of `source` matching `predicate`, keyed by
    * `subjectKey` → distinct subject set.
    */
  final case class Atom(name: String, keys: DataFrame)

  def atom(name: String, source: DataFrame, predicate: org.apache.spark.sql.Column,
      subjectKey: org.apache.spark.sql.Column): Atom =
    Atom(name, source.filter(predicate).select(subjectKey.as("subject")).distinct())

  def or(atoms: Seq[Atom]): DataFrame = {
    require(atoms.nonEmpty, "cohort OR-group needs at least one atom")
    atoms.map(_.keys).reduce(_ union _).distinct()
  }

  def and(sets: Seq[DataFrame]): DataFrame = {
    require(sets.nonEmpty, "cohort AND needs at least one criteria group")
    sets.reduce((a, b) => a.join(b, Seq("subject"), "left_semi"))
  }

  def not(base: DataFrame, minus: DataFrame): DataFrame =
    base.join(minus, Seq("subject"), "left_anti")

  /** CNF query: AND of OR-groups. */
  def cnf(groups: Seq[Seq[Atom]]): DataFrame = and(groups.map(or))

  def countSubjects(set: DataFrame): DataFrame =
    set.agg(count(lit(1)).as("n_subjects"))

  // ------------------------------------------- parameterized item API
  // The reference serves item statistics / histograms / code-list
  // frequencies for ANY item as endpoints; these are the general
  // forms, and the oracle-pinned q45/q46/q47 Qdefs below are fixed
  // instances of them (one definition — a drift between the service
  // surface and the checked queries is structurally impossible).
  // Fields arrive as COLUMN references (`col(field)` resolves against
  // the schema or fails analysis), never spliced into SQL text.

  /** Item value statistics (min/max/mean/sample-stddev/median/count)
    * for a numeric column, optionally per group. Mean and stddev are
    * decimal-exact ([[Tables.dsum]]) so results are independent of
    * aggregation order at any parallelism.
    */
  def itemStats(df: DataFrame, field: String, by: Option[String] = None,
      scale: Int = 2): DataFrame = {
    val c = col(field)
    val sApp = dsum(c, scale)
    val sq = dsum(c * c, 2 * scale)
    val n = count(c)
    val aggs = Seq(
      min(c).as("min_q"),
      max(c).as("max_q"),
      davg(c, scale).as("avg_q"),
      // Sample stddev is undefined for n < 2: guard the (n - 1)
      // division or ANSI mode throws DIVIDE_BY_ZERO for any singleton
      // group (routine on the parameterized endpoint — e.g. stats by a
      // unique-ish key), failing the whole request. NULL matches
      // DuckDB's stddev_samp for n = 1. All-null groups are already
      // safe: the null sum short-circuits every division.
      // greatest(0, ·): the decimal-exact sums are doubles by here,
      // and a constant-valued group's moment difference can land a few
      // ulps NEGATIVE (e.g. three 0.70s: 1.47 - 2.1²/3 ≈ -1.5e-16) —
      // sqrt would serve NaN where stddev is 0. Clamped identically
      // in the q45 oracle SQL.
      when(n > 1, sqrt(greatest(lit(0.0), sq - sApp * sApp / n) / (n - lit(1)))).as("std_q"),
      percentile(c, lit(0.5)).as("med_q"),
      n.as("n_obs"))
    by match {
      case Some(b) => df.groupBy(b).agg(aggs.head, aggs.tail: _*).orderBy(b)
      case None    => df.agg(aggs.head, aggs.tail: _*)
    }
  }

  /** Fixed-width value histogram over a numeric column. */
  def itemHistogram(df: DataFrame, field: String, width: Double): DataFrame = {
    require(width > 0 && !width.isNaN && !width.isInfinite,
      s"histogram width must be a finite positive number, got $width")
    df.withColumn("bucket", floor(col(field) / width).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  /** Code-list value frequencies with population share. The global
    * total arrives via a broadcast cross join of a 1-row aggregate —
    * not an unpartitioned window, which would funnel all groups
    * through a single partition.
    */
  def valueFrequencies(df: DataFrame, field: String): DataFrame = {
    val counts = df.groupBy(field).agg(count(lit(1)).as("n"))
    counts
      .crossJoin(broadcast(counts.agg(sum("n").as("total"))))
      .withColumn("share", col("n").cast("double") / col("total").cast("double"))
      .select(field, "n", "share")
      .orderBy(field)
  }

  /** Metadata search by substring or regex — the reference's
    * find-items/find-forms. `contains`/`rlike` are Column operations
    * on the name column; the pattern is data, not SQL text.
    */
  def metadataSearch(meta: DataFrame, substr: Option[String],
      regex: Option[String] = None): DataFrame = {
    // an empty pattern is NO pattern — dropped BEFORE the predicates
    // are built, not just before the presence check: contains("") and
    // rlike("") match EVERY row, so a blank q= alongside a valid
    // regex= would OR the whole table into the answer (the blank
    // search box becoming a full-table listing, through the two-param
    // door the old exists() guard left open)
    val sub = substr.filter(_.nonEmpty)
    val re = regex.filter(_.nonEmpty)
    require(sub.nonEmpty || re.nonEmpty,
      "metadata search needs a non-empty substring or regex")
    val preds = sub.map(s => col("p_name").contains(s)).toSeq ++
      re.map(r => col("p_name").rlike(r))
    meta.filter(preds.reduce(_ || _))
      .select("p_partkey", "p_name", "p_type")
      .orderBy("p_partkey")
  }

  // ------------------------------------------------------------ atoms
  // urgent:   subject has a visit (order) with priority 1-URGENT
  // returns:  subject has a measurement (lineitem) with returnflag R
  // building: subject attribute c_mktsegment = BUILDING
  // rich:     subject attribute c_acctbal > 7000

  private def urgent(s: SparkSession, d: String): Atom =
    atom("urgent", Tables.orders(s, d), col("o_orderpriority") === "1-URGENT", col("o_custkey"))

  private def returns(s: SparkSession, d: String): Atom = {
    val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R").select("l_orderkey")
    val keys = li.join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("subject")).distinct()
    Atom("returns", keys)
  }

  private def building(s: SparkSession, d: String): Atom =
    atom("building", Tables.customer(s, d), col("c_mktsegment") === "BUILDING", col("c_custkey"))

  private def rich(s: SparkSession, d: String): Atom =
    atom("rich", Tables.customer(s, d), col("c_acctbal") > 7000, col("c_custkey"))

  // ---------------------------------------------------------- queries

  private val oracleAtoms = Map(
    "urgent" -> "SELECT o_custkey AS subject FROM orders WHERE o_orderpriority = '1-URGENT'",
    "returns" -> ("SELECT o_custkey AS subject FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "WHERE l_returnflag = 'R'"),
    "building" -> "SELECT c_custkey AS subject FROM customer WHERE c_mktsegment = 'BUILDING'",
    "rich" -> "SELECT c_custkey AS subject FROM customer WHERE c_acctbal > 7000")

  private def oset(name: String) = s"(SELECT DISTINCT subject FROM (${oracleAtoms(name)}) src_$name)"

  private val q40 = Qdef(
    "q40_cohort_atom_counts",
    (s, d) =>
      Seq(urgent(s, d), returns(s, d), building(s, d), rich(s, d))
        .map(a => a.keys.agg(count(lit(1)).as("n_subjects")).withColumn("atom", lit(a.name))
          .select("atom", "n_subjects"))
        .reduce(_ union _)
        .orderBy("atom"),
    Some(oracleAtoms.toSeq.sortBy(_._1).map { case (n, _) =>
      s"SELECT '$n' AS atom, COUNT(*) AS n_subjects FROM ${oset(n)} t_$n"
    }.mkString(" UNION ALL ") + " ORDER BY atom"))

  private val q41 = Qdef(
    "q41_cohort_and",
    (s, d) =>
      countSubjects(and(Seq(urgent(s, d).keys, building(s, d).keys, rich(s, d).keys))),
    Some(s"""SELECT COUNT(*) AS n_subjects FROM
            (${oset("urgent")} INTERSECT ${oset("building")} INTERSECT ${oset("rich")}) t"""))

  private val q42 = Qdef(
    "q42_cohort_or",
    (s, d) => countSubjects(or(Seq(urgent(s, d), returns(s, d)))),
    Some(s"""SELECT COUNT(*) AS n_subjects FROM
            (${oset("urgent")} UNION ${oset("returns")}) t"""))

  private val q43 = Qdef(
    "q43_cohort_cnf",
    (s, d) =>
      countSubjects(cnf(Seq(Seq(urgent(s, d), returns(s, d)), Seq(building(s, d), rich(s, d))))),
    Some(s"""SELECT COUNT(*) AS n_subjects FROM
            ((${oset("urgent")} UNION ${oset("returns")})
             INTERSECT
             (${oset("building")} UNION ${oset("rich")})) t"""))

  private val q44 = Qdef(
    "q44_cohort_not",
    (s, d) => countSubjects(not(building(s, d).keys, urgent(s, d).keys)),
    Some(s"""SELECT COUNT(*) AS n_subjects FROM
            (${oset("building")} EXCEPT ${oset("urgent")}) t"""))

  /** Item value statistics per form — lens-warehouse's numeric-item
    * stats endpoint (min/max/mean/stddev/median). Decimal-exact
    * moments; exact interpolated median (quantity values are integral
    * so the interpolation is FP-exact in both engines).
    */
  private val q45 = Qdef(
    "q45_item_stats",
    (s, d) => itemStats(Tables.lineitem(s, d), "l_quantity", Some("l_returnflag")),
    Some(s"""SELECT l_returnflag,
            MIN(l_quantity) AS min_q, MAX(l_quantity) AS max_q,
            ${DAVG("l_quantity")} AS avg_q,
            SQRT(GREATEST(0.0, ${DSUM("l_quantity * l_quantity", 4)} - ${DSUM("l_quantity")} * ${DSUM("l_quantity")} / COUNT(l_quantity)) / (COUNT(l_quantity) - 1)) AS std_q,
            quantile_cont(l_quantity, 0.5) AS med_q,
            COUNT(l_quantity) AS n_obs
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Fixed-width value histogram — lens-warehouse's item histogram. */
  private val q46 = Qdef(
    "q46_item_histogram",
    (s, d) => itemHistogram(Tables.orders(s, d), "o_totalprice", 50000),
    Some("""SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket, COUNT(*) AS n
            FROM orders GROUP BY 1 ORDER BY bucket NULLS FIRST"""))

  private val q47 = Qdef(
    "q47_value_frequencies",
    (s, d) => valueFrequencies(Tables.orders(s, d), "o_orderpriority"),
    Some("""SELECT o_orderpriority, n, CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE) AS share
            FROM (SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY 1) t
            ORDER BY o_orderpriority"""))

  /** Metadata search — find items/forms by name pattern. */
  private val q48 = Qdef(
    "q48_metadata_search",
    (s, d) =>
      Tables.part(s, d)
        .filter(col("p_name").like("%blue%") || col("p_name").rlike("^small .*(bolt|rod)$"))
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey, p_name, p_type FROM part
            WHERE p_name LIKE '%blue%' OR regexp_matches(p_name, '^small .*(bolt|rod)$')
            ORDER BY p_partkey"""))

  /** Visit-level population (lens-warehouse queries run against
    * subjects OR visits): visits = orders, atoms keyed by o_orderkey.
    * An urgent visit in 1997 that contains a returned measurement.
    */
  private val q49 = Qdef(
    "q49_cohort_visits",
    (s, d) => {
      val urgent97 = atom("urgent97", Tables.orders(s, d),
        col("o_orderpriority") === "1-URGENT" &&
          col("o_orderdate") >= "1997-01-01" && col("o_orderdate") < "1998-01-01",
        col("o_orderkey"))
      val withReturn = atom("with_return", Tables.lineitem(s, d),
        col("l_returnflag") === "R", col("l_orderkey"))
      countSubjects(and(Seq(urgent97.keys, withReturn.keys)))
        .withColumnRenamed("n_subjects", "n_visits")
    },
    Some("""SELECT COUNT(*) AS n_visits FROM
            ((SELECT DISTINCT o_orderkey AS subject FROM orders
              WHERE o_orderpriority = '1-URGENT'
                AND o_orderdate >= '1997-01-01' AND o_orderdate < '1998-01-01')
             INTERSECT
             (SELECT DISTINCT l_orderkey AS subject FROM lineitem WHERE l_returnflag = 'R')) t"""))

  /** As-of cohort counts — the reference's flagship property: its
    * immutable store makes every query implicitly "as of transaction
    * t", so a cohort count is reproducible after later imports. Here
    * the same CNF (has a returned-status visit AND has an urgent
    * visit) is evaluated against two pinned versions of the orders
    * store: v2's import amends statuses and retracts visits, so the
    * two counts differ deterministically — and re-running at v1 still
    * returns the v1 answer. One as-of merge + two key-set semi-joins
    * per version; at 100 TB the as-of read shape is q94/q95's.
    */
  private val q4b = Qdef(
    "q4b_cohort_asof",
    (s, d) => {
      val root = Warehouse.store(s, d)
      // status 'F' exists at BOTH versions (base statuses are {P,O,F};
      // the v2 import amends some F rows to 'R' and retracts others),
      // so each arm is a non-trivial population and the two counts
      // differ deterministically — an 'R'-based atom would be empty at
      // v1 and verify nothing about the as-of read.
      def countAt(v: Long): DataFrame = {
        val visits = graft.sources.Snapshots.asOf(s, root, v, Seq("o_orderkey"))
        countSubjects(cnf(Seq(
          Seq(atom("finished", visits, col("o_orderstatus") === "F", col("o_custkey"))),
          Seq(atom("urgent", visits, col("o_orderpriority") === "1-URGENT", col("o_custkey"))))))
          .select(lit(v).as("version"), col("n_subjects"))
      }
      countAt(1L).unionByName(countAt(2L)).orderBy("version")
    },
    Some("""WITH v2 AS (SELECT o_custkey,
                   CASE WHEN o_orderkey % 10 = 3 THEN 'R' ELSE o_orderstatus END AS o_orderstatus,
                   o_orderpriority
                 FROM orders WHERE o_orderkey % 10 <> 7),
            c1 AS (SELECT COUNT(*) AS n_subjects FROM (
                     SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
                     INTERSECT
                     SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') t1),
            c2 AS (SELECT COUNT(*) AS n_subjects FROM (
                     SELECT DISTINCT o_custkey FROM v2 WHERE o_orderstatus = 'F'
                     INTERSECT
                     SELECT DISTINCT o_custkey FROM v2 WHERE o_orderpriority = '1-URGENT') t2)
            SELECT CAST(1 AS BIGINT) AS version, n_subjects FROM c1
            UNION ALL
            SELECT CAST(2 AS BIGINT) AS version, n_subjects FROM c2
            ORDER BY version"""))

  /** Temporal cohort criterion — the clinical "event B within N days
    * after event A" pattern (adverse event after exposure, follow-up
    * visit after treatment): subjects with a `thenType` event no
    * earlier than, and within `withinDays` of, a `firstType` event.
    *
    * Scale: both event slices are pushed-down scans; they meet in ONE
    * shuffle on user_id with the time window as a residual join
    * predicate, and the left-semi form never materializes the
    * (view × purchase) pair fan-out — each subject emits at most one
    * row. Composes with [[cnf]] like any other atom.
    */
  def temporalAtom(events: DataFrame, firstType: String, thenType: String,
      withinDays: Int): Atom = {
    val a = events.filter(col("event_type") === firstType)
      .select(col("user_id"), col("ts").as("ts_a"))
    val b = events.filter(col("event_type") === thenType)
      .select(col("user_id").as("uid_b"), col("ts").as("ts_b"))
    val followed = a.join(b,
      col("user_id") === col("uid_b") &&
        col("ts_b") >= col("ts_a") &&
        col("ts_b") <= col("ts_a") + expr(s"INTERVAL $withinDays DAYS"),
      "left_semi")
    Atom(s"${firstType}_then_$thenType",
      followed.select(col("user_id").as("subject")).distinct())
  }

  /** Era-count criterion — the "exposure era" shape of a clinical
    * warehouse (events within a gap window fold into continuous eras;
    * the criterion asks for subjects with at least `minEras` of them).
    * Built on [[Relational.mergedEras]]'s single user_id shuffle; the
    * era count is a per-subject aggregate on the already-partitioned
    * data, so the atom costs one shuffle total and composes with
    * [[cnf]] like any other atom.
    */
  def eraAtom(events: DataFrame, windowUs: Long, minEras: Long): Atom =
    Atom(s"eras_ge_$minEras",
      Relational.mergedEras(events, windowUs)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_eras"))
        .filter(col("n_eras") >= minEras)
        .select(col("user_id").as("subject")))

  /** q4c: count of subjects who purchased within 7 days after a view —
    * a temporal conversion criterion expressed as a cohort atom.
    */
  private val q4c = Qdef(
    "q4c_cohort_temporal",
    (s, d) =>
      countSubjects(temporalAtom(Tables.events(s, d), "view", "purchase", 7).keys),
    // ts normalized to micros (epoch_ns // 1000) like every event
    // oracle: Spark's Tables.events truncates TIMESTAMP(NANOS) to µs,
    // so a raw-ns comparison would diverge on sub-µs data
    Some("""WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events)
            SELECT COUNT(*) AS n_subjects FROM (
              SELECT DISTINCT a.user_id FROM e a
              WHERE a.event_type = 'view' AND EXISTS (
                SELECT 1 FROM e b
                WHERE b.user_id = a.user_id AND b.event_type = 'purchase'
                  AND b.us >= a.us AND b.us <= a.us + CAST(604800000000 AS BIGINT))) t"""))

  /** q4d: subjects with at least 65 half-hour activity eras — the
    * era-duration criterion as a checkable cohort count.
    */
  private val q4d = Qdef(
    "q4d_cohort_era",
    (s, d) =>
      countSubjects(eraAtom(Tables.events(s, d), 1800000000L, 65L).keys),
    Some("""WITH iv AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS s,
                               epoch_ns(ts) // 1000 + 1800000000 AS e FROM events),
            m AS (SELECT user_id, event_id, s, e,
                         MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
                  FROM iv),
            g AS (SELECT user_id, s, e,
                         SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY s, event_id
                             ROWS UNBOUNDED PRECEDING) AS grp
                  FROM m),
            mg AS (SELECT user_id, grp FROM g GROUP BY 1, 2),
            q AS (SELECT user_id FROM mg GROUP BY user_id HAVING COUNT(*) >= 65)
            SELECT COUNT(*) AS n_subjects FROM q"""))

  val all: Seq[Qdef] =
    Seq(q40, q41, q42, q43, q44, q45, q46, q47, q48, q49,
      CohortQuery.q4a, q4b, q4c, q4d, CohortQuery.q4e)
}
