package graft.operators

import graft.{Qdef, Tables}
import graft.Qdef.{DAVG, DSUM}
import graft.Tables.{davg, dsum}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core — SURVEY §2.1–§2.4 and §2.6.
  *
  * Everything is declarative DataFrame code so Catalyst handles
  * pushdown / pruning / join selection; dimension sides of star joins
  * carry explicit `broadcast` hints, fact⋈fact joins shuffle on their
  * keys (AQE re-plans skew at runtime). Each query ends in a total
  * ORDER BY purely for oracle determinism — at production scale the
  * caller drops the sort (and Catalyst's EliminateSorts removes it
  * under any downstream aggregate anyway).
  */
object Relational {

  private def ts(s: String): Column = to_timestamp(lit(s))

  // ---------------------------------------------------------------- §2.1

  private val q01 = Qdef(
    "q01_scan_project",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_quantity") < 25)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice"),
    Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_quantity < 25
            ORDER BY l_orderkey, l_linenumber, l_extendedprice"""))

  private val q02 = Qdef(
    "q02_filter_pred",
    (s, d) =>
      Tables.orders(s, d)
        .filter(
          (col("o_orderstatus") === "O" && col("o_totalprice").between(50000, 150000)) ||
          (col("o_orderpriority").like("1-%") && !(col("o_orderstatus") === "F")))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders
            WHERE (o_orderstatus = 'O' AND o_totalprice BETWEEN 50000 AND 150000)
               OR (o_orderpriority LIKE '1-%' AND NOT (o_orderstatus = 'F'))
            ORDER BY o_orderkey"""))

  /** Flagship: TPC-H Q1 shape (grouped multi-aggregate over the big fact). */
  val q03 = Qdef(
    "q03_agg_group",
    (s, d) =>
      // spread (r14): eight decimal-exact aggregates fused onto a
      // single-row-group scan ran on ONE core — measured 1.6 s → 0.9 s
      // at sf0.1 including the round-robin exchange; a no-op on
      // multi-split inputs, and decimal sums are reduction-order-exact
      // so the result is bit-identical.
      Tables.spread(Tables.lineitem(s, d))
        .filter(col("l_shipdate") <= ts("2000-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some(s"""SELECT l_returnflag, l_linestatus,
            ${DSUM("l_quantity")} AS sum_qty,
            ${DSUM("l_extendedprice")} AS sum_base_price,
            ${DSUM("l_extendedprice * (1 - l_discount)", 6)} AS sum_disc_price,
            ${DSUM("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
            ${DAVG("l_quantity")} AS avg_qty,
            ${DAVG("l_extendedprice")} AS avg_price,
            ${DAVG("l_discount", 6)} AS avg_disc,
            COUNT(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  /** Global aggregate; stddev via decimal-exact moments so the double
    * result is bit-identical to the oracle (plain stddev's low bits
    * depend on reduction order).
    */
  private val q04 = Qdef(
    "q04_agg_global",
    (s, d) => {
      val o = Tables.orders(s, d)
      val sApp = dsum(col("o_totalprice"))
      val sqApp = dsum(col("o_totalprice") * col("o_totalprice"), 4)
      val n = count(col("o_totalprice"))
      o.agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_custs"),
        dsum(col("o_totalprice")).as("sum_price"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        davg(col("o_totalprice")).as("avg_price"),
        // greatest(0, ·): the two decimal-exact sums become DOUBLES
        // before this expression, and FP rounding can land the moment
        // difference a few ulps NEGATIVE when the true variance is ~0
        // (constant column: sq=1.47 vs (2.1)²/3 differs by -1.5e-16)
        // — sqrt would answer NaN in Spark and error in DuckDB where
        // the right stddev is 0. Clamp BOTH engines identically.
        sqrt(greatest(lit(0.0), (sqApp - sApp * sApp / n)) / (n - lit(1))).as("std_price"))
    },
    Some(s"""SELECT COUNT(*) AS n_orders,
            COUNT(DISTINCT o_custkey) AS n_custs,
            ${DSUM("o_totalprice")} AS sum_price,
            MIN(o_totalprice) AS min_price,
            MAX(o_totalprice) AS max_price,
            ${DAVG("o_totalprice")} AS avg_price,
            SQRT(GREATEST(0.0, ${DSUM("o_totalprice * o_totalprice", 4)} - ${DSUM("o_totalprice")} * ${DSUM("o_totalprice")} / COUNT(o_totalprice)) / (COUNT(o_totalprice) - 1)) AS std_price
            FROM orders"""))

  private val q05 = Qdef(
    "q05_distinct",
    (s, d) =>
      Tables.customer(s, d).select("c_mktsegment").distinct().orderBy("c_mktsegment"),
    Some("SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"))

  private val q06 = Qdef(
    "q06_count_distinct_group",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_custs"), count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_custs, COUNT(*) AS n_orders
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  private val q07 = Qdef(
    "q07_case_expr",
    (s, d) =>
      Tables.orders(s, d)
        .withColumn("bucket",
          when(col("o_totalprice") < 50000, "low")
            .when(col("o_totalprice") < 150000, "mid")
            .otherwise("high"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("bucket"),
    Some(s"""SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                        WHEN o_totalprice < 150000 THEN 'mid'
                        ELSE 'high' END AS bucket,
            COUNT(*) AS n, ${DSUM("o_totalprice")} AS sum_price
            FROM orders GROUP BY 1 ORDER BY bucket"""))

  private val q08 = Qdef(
    "q08_having",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
        .filter(col("n_orders") >= 8)
        .orderBy("o_custkey"),
    Some(s"""SELECT o_custkey, COUNT(*) AS n_orders, ${DSUM("o_totalprice")} AS spend
            FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 8 ORDER BY o_custkey"""))

  // ---------------------------------------------------------------- §2.2

  private val q10 = Qdef(
    "q10_join_inner",
    (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderdate") >= ts("1998-01-01")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(dsum(col("l_extendedprice")).as("revenue"), count(lit(1)).as("n_lines"))
        .orderBy("o_orderpriority"),
    Some(s"""SELECT o_orderpriority, ${DSUM("l_extendedprice")} AS revenue, COUNT(*) AS n_lines
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderdate >= TIMESTAMP '1998-01-01'
            GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** TPC-H Q5 shape: fact⋈fact shuffle join + broadcast dimensions. */
  private val q11 = Qdef(
    "q11_join_multiway",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1999-01-01"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("n_name")
    },
    Some(s"""SELECT n_name, ${DSUM("l_extendedprice * (1 - l_discount)", 6)} AS revenue, COUNT(*) AS n_lines
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
              AND c_mktsegment = 'BUILDING' AND r_name = 'ASIA'
            GROUP BY n_name ORDER BY n_name"""))

  private val q12 = Qdef(
    "q12_join_left",
    (s, d) =>
      Tables.nation(s, d)
        .join(Tables.customer(s, d), col("n_nationkey") === col("c_nationkey"), "left")
        .groupBy("n_name")
        .agg(count(col("c_custkey")).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy("n_name"),
    Some(s"""SELECT n_name, COUNT(c_custkey) AS n_cust, ${DSUM("c_acctbal")} AS sum_bal
            FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
            GROUP BY n_name ORDER BY n_name"""))

  private val q13 = Qdef(
    "q13_join_semi",
    (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
            ORDER BY c_custkey"""))

  private val q14 = Qdef(
    "q14_join_anti",
    (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_acctbal FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
            ORDER BY c_custkey"""))

  private val q15 = Qdef(
    "q15_join_full",
    (s, d) => {
      val sup = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nk_s"))
        .agg(count(lit(1)).as("n_supp"))
      val cus = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .groupBy(col("c_nationkey").as("nk_c")).agg(count(lit(1)).as("n_cust"))
      sup.join(cus, col("nk_s") === col("nk_c"), "full_outer")
        .select(coalesce(col("nk_s"), col("nk_c")).as("nationkey"), col("n_supp"), col("n_cust"))
        .orderBy("nationkey")
    },
    Some("""SELECT COALESCE(nk_s, nk_c) AS nationkey, n_supp, n_cust
            FROM (SELECT s_nationkey AS nk_s, COUNT(*) AS n_supp FROM supplier GROUP BY 1) a
            FULL OUTER JOIN (SELECT c_nationkey AS nk_c, COUNT(*) AS n_cust FROM customer
                             WHERE c_acctbal > 9000 GROUP BY 1) b
            ON nk_s = nk_c ORDER BY nationkey"""))

  private val q16 = Qdef(
    "q16_cross_join",
    (s, d) =>
      Tables.region(s, d).select("r_name")
        .crossJoin(Tables.orders(s, d).select("o_orderstatus").distinct())
        .orderBy("r_name", "o_orderstatus"),
    Some("""SELECT r_name, o_orderstatus
            FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) t
            ORDER BY r_name, o_orderstatus"""))

  private val q17 = Qdef(
    "q17_in_subquery",
    (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d).filter(col("c_mktsegment") === "AUTOMOBILE")
            .select("c_custkey"),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus"),
    Some(s"""SELECT o_orderstatus, COUNT(*) AS n, ${DSUM("o_totalprice")} AS sum_price
            FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
            GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Scalar subquery; the scalar is a decimal-exact mean so the filter
    * threshold is bit-identical to the oracle's.
    */
  private val q18 = Qdef(
    "q18_scalar_subquery",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val gavg = li.agg(davg(col("l_extendedprice")).as("gavg"))
      li.crossJoin(broadcast(gavg))
        .filter(col("l_extendedprice") > col("gavg") * 1.5)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_expensive"))
        .orderBy("l_returnflag")
    },
    Some(s"""SELECT l_returnflag, COUNT(*) AS n_expensive FROM lineitem
            WHERE l_extendedprice > (SELECT ${DAVG("l_extendedprice")} FROM lineitem) * 1.5
            GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- §2.3

  private val q20 = Qdef(
    "q20_sort_limit",
    (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20"""))

  private val q21 = Qdef(
    "q21_topk_per_group",
    (s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rn")
    },
    Some("""SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
              SELECT o_orderpriority, o_orderkey, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
              FROM orders) t
            WHERE rn <= 3 ORDER BY o_orderpriority, rn"""))

  /** Running (prefix) sum — the window aggregate is decimal so every
    * prefix is exact, not dependent on the engine's frame evaluation.
    */
  private val q22 = Qdef(
    "q22_window_running",
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("running_spend",
          sum(col("o_totalprice").cast("decimal(28,2)")).over(w).cast("double"))
        .select("o_custkey", "o_orderkey", "running_spend")
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2)))
                        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                              ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
            FROM orders ORDER BY o_custkey, o_orderkey"""))

  private val q23 = Qdef(
    "q23_window_rank",
    (s, d) => {
      val w = Window.partitionBy("s_nationkey").orderBy(col("s_acctbal").desc)
      Tables.supplier(s, d)
        .select(col("s_nationkey"), col("s_suppkey"),
          rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
        .orderBy("s_nationkey", "rnk", "s_suppkey")
    },
    Some("""SELECT s_nationkey, s_suppkey,
                   RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS rnk,
                   DENSE_RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS drnk
            FROM supplier ORDER BY s_nationkey, rnk, s_suppkey"""))

  /** Lag over event time; the delta is integer microseconds (both
    * engines floor ns→µs identically) to keep it float-free.
    */
  private val q24 = Qdef(
    "q24_window_lag",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
        .select("user_id", "event_id", "gap_us")
        .orderBy("user_id", "event_id")
    },
    Some("""SELECT user_id, event_id,
                   us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap_us
            FROM (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us FROM events) t
            ORDER BY user_id, event_id"""))

  /** q25: NTILE bucketing per group (quartiles of account balance
    * within each market segment) — the percentile-assignment shape.
    * The window partitions by segment, so no single task ever sees the
    * whole table; the tie-break on c_custkey makes the assignment
    * total-ordered and thus engine-identical.
    */
  private val q25 = Qdef(
    "q25_ntile",
    (s, d) => {
      val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
      Tables.customer(s, d)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          ntile(4).over(w).as("quartile"))
        .orderBy("c_mktsegment", "c_custkey")
    },
    Some("""SELECT c_mktsegment, c_custkey, c_acctbal,
                   NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS quartile
            FROM customer ORDER BY c_mktsegment, c_custkey"""))

  /** q26: explicit window frames — per-user first/latest event type
    * (unbounded frame) and a 3-row moving average of the value (ROWS
    * 2 PRECEDING). Frame sums add ≤3 doubles in frame order on both
    * engines; rounded to 6 dp for the oracle.
    */
  private val q26 = Qdef(
    "q26_window_frames",
    (s, d) => {
      val base = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val whole = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val trail = base.rowsBetween(-2, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          first(col("event_type")).over(whole).as("first_type"),
          last(col("event_type")).over(whole).as("last_type"),
          round(avg(col("value")).over(trail), 6).as("avg3"))
        .orderBy("user_id", "event_id")
    },
    Some("""WITH e AS (SELECT user_id, event_id, event_type, value, epoch_ns(ts) // 1000 AS us FROM events)
            SELECT user_id, event_id,
                   FIRST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_type,
                   LAST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type,
                   round(AVG(value) OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS avg3
            FROM e ORDER BY user_id, event_id"""))

  /** q19: salted hot-key aggregation — l_returnflag has only three
    * values, the worst aggregation skew shape (every row funnels into
    * 3 reducers). [[Skew.saltedAgg]] spreads each key over 16 salt
    * buckets in the partial phase; the finish phase shuffles one row
    * per (key, salt). The oracle is the PLAIN aggregate: salting must
    * never change the answer (decimal partials keep the sum exact
    * across the two phases).
    */
  private val q19 = Qdef(
    "q19_skew_agg",
    (s, d) =>
      Skew.saltedAgg(
        Tables.lineitem(s, d).select("l_returnflag", "l_quantity"),
        Seq("l_returnflag"),
        salts = 16,
        partial = Seq(count(lit(1)).as("pn"),
          sum(col("l_quantity").cast("decimal(28,2)")).as("pq")),
        finish = Seq(sum("pn").as("n_items"),
          sum("pq").cast("double").as("sum_qty")))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, COUNT(*) AS n_items,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- §2.4

  private def urgentKeys(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("custkey"))

  private def buildingKeys(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))

  private val q30 = Qdef(
    "q30_union",
    (s, d) =>
      urgentKeys(s, d).union(buildingKeys(s, d)).distinct().orderBy("custkey"),
    Some("""SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            UNION
            SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            ORDER BY custkey"""))

  private val q31 = Qdef(
    "q31_intersect",
    (s, d) =>
      urgentKeys(s, d).intersect(buildingKeys(s, d)).orderBy("custkey"),
    Some("""SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            INTERSECT
            SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            ORDER BY custkey"""))

  private val q32 = Qdef(
    "q32_except",
    (s, d) =>
      buildingKeys(s, d).except(urgentKeys(s, d)).orderBy("custkey"),
    Some("""SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            EXCEPT
            SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            ORDER BY custkey"""))

  private val q33 = Qdef(
    "q33_rollup",
    (s, d) =>
      Tables.orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus", "o_orderpriority"),
    Some(s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, ${DSUM("o_totalprice")} AS sum_price
            FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
            ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""))

  private val q34 = Qdef(
    "q34_cube",
    (s, d) =>
      // spread (r14): the cube's 4× Expand fan-out sat on the
      // single-task lineitem scan — measured 1.56 s → 0.95 s at sf0.1
      // (q03's rationale; decimal sums keep the result bit-identical).
      Tables.spread(Tables.lineitem(s, d))
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${DSUM("l_quantity")} AS sum_qty
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  private val q35 = Qdef(
    "q35_pivot",
    (s, d) => {
      val wide = Tables.events(s, d)
        .withColumn("day", date_trunc("day", col("ts")))
        .groupBy("day")
        .pivot("event_type", eventTypes)
        .count()
      eventTypes.foldLeft(wide)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
        .orderBy("day")
    },
    Some(s"""SELECT date_trunc('day', ts)::TIMESTAMP AS day,
            ${eventTypes.map(t => s"COUNT(*) FILTER (WHERE event_type = '$t') AS \"$t\"").mkString(", ")}
            FROM events GROUP BY 1 ORDER BY day"""))

  private val q36 = Qdef(
    "q36_unpivot",
    (s, d) => {
      val nations = Tables.nation(s, d).select("n_nationkey")
      val nc = Tables.customer(s, d).groupBy(col("c_nationkey")).agg(count(lit(1)).as("cnt_c"))
      val ns = Tables.supplier(s, d).groupBy(col("s_nationkey")).agg(count(lit(1)).as("cnt_s"))
      nations
        .join(nc, col("n_nationkey") === col("c_nationkey"), "left")
        .join(ns, col("n_nationkey") === col("s_nationkey"), "left")
        .select(col("n_nationkey"),
          coalesce(col("cnt_c"), lit(0L)).as("n_cust"),
          coalesce(col("cnt_s"), lit(0L)).as("n_supp"))
        .unpivot(Array(col("n_nationkey")), Array(col("n_cust"), col("n_supp")), "metric", "value")
        .orderBy("n_nationkey", "metric")
    },
    Some("""SELECT n_nationkey, 'n_cust' AS metric,
                   (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey) AS value
            FROM nation
            UNION ALL
            SELECT n_nationkey, 'n_supp' AS metric,
                   (SELECT COUNT(*) FROM supplier WHERE s_nationkey = n_nationkey) AS value
            FROM nation
            ORDER BY n_nationkey, metric"""))

  /** q37: GROUPING SETS — the general form rollup/cube specialize,
    * via Spark 4's native `Dataset.groupingSets` (no SQL hop, no
    * session state). `grouping(...)` disambiguates a real NULL key
    * from a grouping-set placeholder; the composed gid (grouping(a)*2 +
    * grouping(b)) is portable across engines, unlike engine-specific
    * GROUPING_ID bit orders.
    */
  private val q37 = Qdef(
    "q37_grouping_sets",
    (s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .select("n_name", "o_orderstatus", "o_totalprice")
        .groupingSets(
          Seq(Seq(col("n_name")), Seq(col("o_orderstatus")),
            Seq(col("n_name"), col("o_orderstatus")), Seq()),
          col("n_name"), col("o_orderstatus"))
        .agg(
          (grouping(col("n_name")) * 2 + grouping(col("o_orderstatus"))).as("gid"),
          count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("revenue"))
        .orderBy("gid", "n_name", "o_orderstatus"),
    Some(s"""WITH base AS (
              SELECT n_name, o_orderstatus, o_totalprice
              FROM orders JOIN customer ON o_custkey = c_custkey
                          JOIN nation ON c_nationkey = n_nationkey)
            SELECT n_name, o_orderstatus,
                   GROUPING(n_name) * 2 + GROUPING(o_orderstatus) AS gid,
                   COUNT(*) AS n, ${DSUM("o_totalprice")} AS revenue
            FROM base
            GROUP BY GROUPING SETS ((n_name), (o_orderstatus), (n_name, o_orderstatus), ())
            ORDER BY gid, n_name NULLS FIRST, o_orderstatus NULLS FIRST"""))

  // ---------------------------------------------------------------- §2.6

  private val q50 = Qdef(
    "q50_time_series",
    (s, d) =>
      Tables.orders(s, d)
        .withColumn("month", date_trunc("month", col("o_orderdate")))
        .groupBy("month")
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy("month"),
    Some(s"""SELECT date_trunc('month', o_orderdate)::TIMESTAMP AS month,
            ${DSUM("o_totalprice")} AS revenue, COUNT(*) AS n_orders
            FROM orders GROUP BY 1 ORDER BY month"""))

  /** Batch twin of the streaming tumbling-window aggregate (st01). */
  private val q51 = Qdef(
    "q51_tumbling_window",
    (s, d) =>
      Tables.events(s, d)
        .withColumn("hour", date_trunc("hour", col("ts")))
        .groupBy("hour", "event_type")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("hour", "event_type"),
    Some(s"""SELECT date_trunc('hour', ts)::TIMESTAMP AS hour, event_type,
            COUNT(*) AS n, ${DSUM("value")} AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY hour, event_type"""))

  /** Gap-based sessionization (30 min), float-free via integer µs. */
  private val q52 = Qdef(
    "q52_sessionize",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      Tables.events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
        .withColumn("is_new", when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1))
        .groupBy("user_id")
        .agg(count(col("is_new")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id,
                   COUNT(*) FILTER (WHERE gap_us IS NULL OR gap_us > 1800000000) AS n_sessions,
                   COUNT(*) AS n_events
            FROM (SELECT user_id, us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap_us
                  FROM (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us FROM events) a) b
            GROUP BY user_id ORDER BY user_id"""))

  private val q53 = Qdef(
    "q53_json_extract",
    (s, d) =>
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("k").asc_nulls_last), // DuckDB default NULLS LAST parity
    Some(s"""SELECT CAST(json_extract_string(props, '$$.k') AS INT) AS k,
            COUNT(*) AS n, ${DSUM("value")} AS sum_value
            FROM events GROUP BY 1 ORDER BY k"""))

  /** As-of join — for each purchase, the latest click of the same user
    * at or before it. Spark has no ASOF operator; the scalable
    * formulation is NOT an inequality join (quadratic per key) but a
    * tagged union + one window pass: sort (user, time) once, carry the
    * last-seen right row forward. One shuffle, linear work, any key
    * cardinality. Oracle: DuckDB's native ASOF LEFT JOIN.
    *
    * Tie note: among right rows with identical (user, us) this window
    * picks max event_id deterministically, while ASOF's choice among
    * exact-timestamp ties is unspecified — the events data has no
    * duplicate (user_id, ts) pairs (verified), so the hash check is
    * stable; re-check if the generator ever changes.
    */
  private val q54 = Qdef(
    "q54_asof_join",
    (s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val a = e.filter(col("event_type") === "purchase")
      val b = e.filter(col("event_type") === "click")
      val tagged = a.select(col("user_id"), col("us"), lit(1).as("tag"),
          col("event_id").as("aid"), lit(null).cast("long").as("bid"),
          lit(null).cast("long").as("bus"))
        .unionByName(b.select(col("user_id"), col("us"), lit(0).as("tag"),
          lit(null).cast("long").as("aid"), col("event_id").as("bid"),
          col("us").as("bus")))
      // tag orders a click before a purchase at the same microsecond →
      // "at or before" (>=) semantics, matching the oracle's a.us >= b.us
      val w = Window.partitionBy("user_id").orderBy("us", "tag", "bid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("b_event_id", last("bid", ignoreNulls = true).over(w))
        .withColumn("b_us", last("bus", ignoreNulls = true).over(w))
        .filter(col("aid").isNotNull)
        .select(col("aid").as("a_event_id"), col("b_event_id"),
          (col("us") - col("b_us")).as("gap_us"))
        .orderBy("a_event_id")
    },
    Some("""WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events),
            a AS (SELECT event_id AS a_event_id, user_id, us AS a_us FROM e WHERE event_type = 'purchase'),
            b AS (SELECT event_id AS b_event_id, user_id, us AS b_us FROM e WHERE event_type = 'click')
            SELECT a.a_event_id, b.b_event_id, a.a_us - b.b_us AS gap_us
            FROM a ASOF LEFT JOIN b ON a.user_id = b.user_id AND a.a_us >= b.b_us
            ORDER BY a_event_id"""))

  /** Range join — clicks within 5 minutes after each view, same user.
    * Scale path: quantize time into 5-minute bins and equi-join on
    * (user, bin) with each view probing its own and the next bin —
    * the shuffle key stays compact and hash-joinable instead of an
    * inequality-only (broadcast-nested-loop) join.
    */
  private val q55 = Qdef(
    "q55_range_join",
    (s, d) => {
      val winUs = 300000000L // 5 min in µs
      val e = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val v = e.filter(col("event_type") === "view")
        .select(col("event_id").as("v_id"), col("user_id"), col("us").as("v_us"),
          floor(col("us") / winUs).as("bin"))
        .withColumn("probe", explode(array(col("bin"), col("bin") + 1)))
      val c = e.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("us").as("c_us"),
          floor(col("us") / winUs).as("c_bin"))
      v.join(c,
          col("user_id") === col("c_user") && col("probe") === col("c_bin") &&
            col("c_us") > col("v_us") && col("c_us") <= col("v_us") + winUs,
          "left")
        .groupBy("v_id")
        .agg(count(col("c_id")).as("n_clicks_5m"))
        .orderBy("v_id")
    },
    Some("""WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events),
            v AS (SELECT event_id AS v_id, user_id, us AS v_us FROM e WHERE event_type = 'view'),
            c AS (SELECT event_id AS c_id, user_id AS c_user, us AS c_us FROM e WHERE event_type = 'click')
            SELECT v.v_id, COUNT(c.c_id) AS n_clicks_5m
            FROM v LEFT JOIN c ON v.user_id = c.c_user
                               AND c.c_us > v.v_us AND c.c_us <= v.v_us + 300000000
            GROUP BY v.v_id ORDER BY v.v_id"""))

  /** Month-over-month retention: of the customers who ordered in
    * month m, how many also order in m+1. Two scans of the distinct
    * (customer, month) set — itself a partial-agg distinct — self-
    * joined on (customer, next month); the rate divides two
    * engine-identical integers.
    */
  private val q56 = Qdef(
    "q56_retention",
    (s, d) => {
      val um = Tables.orders(s, d)
        .select(col("o_custkey"), to_date(date_trunc("month", col("o_orderdate"))).as("m"))
        .distinct()
      val b = um.select(col("o_custkey").as("b_cust"), col("m").as("b_m"))
      um.join(b, col("o_custkey") === col("b_cust") && col("b_m") === add_months(col("m"), 1), "left")
        .groupBy("m")
        .agg(count(lit(1)).as("active"), count(col("b_cust")).as("retained"))
        .withColumn("retention", col("retained").cast("double") / col("active").cast("double"))
        .orderBy("m")
    },
    Some("""WITH um AS (SELECT DISTINCT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS m FROM orders)
            SELECT a.m, COUNT(*) AS active, COUNT(b.o_custkey) AS retained,
                   CAST(COUNT(b.o_custkey) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS retention
            FROM um a LEFT JOIN um b ON a.o_custkey = b.o_custkey AND b.m = a.m + INTERVAL 1 MONTH
            GROUP BY a.m ORDER BY a.m"""))

  /** Ordered funnel: users who viewed, then clicked after the view,
    * then purchased after the click. One distinct-user-stage pass,
    * then sequential min-after-min per user — a single shuffle on
    * user_id, no self-joins (the naive 3-way event self-join is
    * quadratic on hot users).
    */
  private val q57 = Qdef(
    "q57_funnel",
    (s, d) => {
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val perUser = e.groupBy("user_id").agg(
        min(when(col("event_type") === "view", col("us"))).as("t_view"))
      val withClick = e.join(perUser, "user_id")
        .groupBy(col("user_id"), col("t_view"))
        .agg(min(when(col("event_type") === "click" && col("us") > col("t_view"), col("us"))).as("t_click"))
      val withBuy = e.join(withClick, "user_id")
        .groupBy(col("user_id"), col("t_view"), col("t_click"))
        .agg(min(when(col("event_type") === "purchase" && col("us") > col("t_click"), col("us"))).as("t_buy"))
      withBuy.agg(
        count(col("t_view")).as("n_view"),
        count(col("t_click")).as("n_view_click"),
        count(col("t_buy")).as("n_view_click_buy"))
    },
    Some("""WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events),
            v AS (SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN us END) AS t_view
                  FROM e GROUP BY user_id),
            c AS (SELECT e.user_id, v.t_view,
                         MIN(CASE WHEN e.event_type = 'click' AND e.us > v.t_view THEN e.us END) AS t_click
                  FROM e JOIN v ON e.user_id = v.user_id GROUP BY e.user_id, v.t_view),
            b AS (SELECT e.user_id, c.t_view, c.t_click,
                         MIN(CASE WHEN e.event_type = 'purchase' AND e.us > c.t_click THEN e.us END) AS t_buy
                  FROM e JOIN c ON e.user_id = c.user_id GROUP BY e.user_id, c.t_view, c.t_click)
            SELECT COUNT(t_view) AS n_view, COUNT(t_click) AS n_view_click,
                   COUNT(t_buy) AS n_view_click_buy FROM b"""))

  /** q58: time-series gap fill — the dense-grid + forward-fill shape
    * every monitoring/era query needs (the reference's time-series
    * views assume a continuous axis). Grid = per-key hour range
    * exploded from `sequence()` (bounded: keys × hours, independent of
    * row count); left join back on the composite key; forward fill via
    * the portable count-of-non-nulls trick (running count of observed
    * buckets numbers each fill-group, then the group's single non-null
    * value is broadcast with a per-group max) — no IGNORE NULLS
    * dependence, identical semantics on both engines. One shuffle on
    * (event_type, hour), one on event_type for the running window.
    */
  private val q58 = Qdef(
    "q58_gap_fill",
    (s, d) => {
      val h = Tables.events(s, d)
        .withColumn("hour", date_trunc("hour", col("ts")))
        .groupBy("event_type", "hour")
        .agg(count(lit(1)).as("n"))
      val grid = h.groupBy("event_type")
        .agg(min("hour").as("mn"), max("hour").as("mx"))
        .select(col("event_type"),
          explode(sequence(col("mn"), col("mx"), expr("interval 1 hour"))).as("hour"))
      val run = Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(h, Seq("event_type", "hour"), "left")
        .withColumn("grp", count(col("n")).over(run))
        .withColumn("n_filled", max(col("n")).over(Window.partitionBy("event_type", "grp")))
        .withColumn("was_gap", col("n").isNull)
        .select("event_type", "hour", "n_filled", "was_gap")
        .orderBy("event_type", "hour")
    },
    Some("""WITH h AS (SELECT event_type, date_trunc('hour', ts)::TIMESTAMP AS hour, COUNT(*) AS n
                       FROM events GROUP BY 1, 2),
            b AS (SELECT event_type, MIN(hour) AS mn, MAX(hour) AS mx FROM h GROUP BY 1),
            grid AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour FROM b),
            j AS (SELECT g.event_type, g.hour, h.n,
                         COUNT(h.n) OVER (PARTITION BY g.event_type ORDER BY g.hour
                           ROWS UNBOUNDED PRECEDING) AS grp
                  FROM grid g LEFT JOIN h ON h.event_type = g.event_type AND h.hour = g.hour)
            SELECT event_type, hour, MAX(n) OVER (PARTITION BY event_type, grp) AS n_filled,
                   (n IS NULL) AS was_gap
            FROM j ORDER BY event_type, hour"""))

  /** q5a: overlapping-interval merge ("era" construction — the
    * classic clinical-warehouse operator that folds overlapping visit
    * or exposure intervals into continuous eras). Each event opens a
    * 30-minute interval; per subject, intervals whose start lies at or
    * under the running max end are merged. The scalable formulation is
    * the single window pass (sort once per user, carry max(end)
    * forward, flag interval starts, prefix-sum the flags into era
    * ids) — one shuffle on user_id, linear work, no self-join (the
    * naive overlap self-join is quadratic on hot subjects). All
    * arithmetic is integer microseconds → hash-exact oracle.
    */
  /** Per-subject merged eras (one row per era: user_id, grp, ms, me) —
    * the single-window-pass core of q5a, also consumed by the cohort
    * era criterion ([[Cohort.eraAtom]]). Each event opens a
    * `windowUs`-long interval; per subject, intervals whose start lies
    * at or under the running max end fold into one era. One shuffle on
    * user_id, linear per subject, no overlap self-join.
    */
  def mergedEras(events: DataFrame, windowUs: Long = 1800000000L): DataFrame = {
    // a non-positive window (a ms-vs-us unit mix-up, a negative from
    // subtraction) makes e = s + windowUs <= s: every event becomes
    // its own "era" with me < ms and negative covered time — silently
    // admitting the wrong subjects through the cohort criterion
    require(windowUs > 0,
      s"mergedEras: windowUs must be positive MICROSECONDS, got $windowUs")
    val byStart = Window.partitionBy("user_id").orderBy("s", "event_id")
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + windowUs).as("e"))
      .withColumn("pmax",
        max(col("e")).over(byStart.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("is_new",
        when(col("pmax").isNull || col("s") > col("pmax"), 1L).otherwise(0L))
      .withColumn("grp",
        sum(col("is_new")).over(byStart.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "grp")
      .agg(min("s").as("ms"), max("e").as("me"))
  }

  private val q5a = Qdef(
    "q5a_interval_merge",
    (s, d) =>
      mergedEras(Tables.events(s, d))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"), sum(col("me") - col("ms")).as("covered_us"))
        .orderBy("user_id"),
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
            mg AS (SELECT user_id, grp, MIN(s) AS ms, MAX(e) AS me FROM g GROUP BY 1, 2)
            SELECT user_id, COUNT(*) AS n_intervals, CAST(SUM(me - ms) AS BIGINT) AS covered_us
            FROM mg GROUP BY user_id ORDER BY user_id"""))

  /** Hopping (sliding) windows: every event lands in window/slide
    * overlapping windows (15 min windows every 5 min — the alerting /
    * rate-metric shape q51's tumbling windows can't express). Uses
    * Spark's native `window(ts, size, slide)`, which expands each row
    * into its window instances NARROWLY (an Expand node, no join, no
    * per-row loop) before the one partial-agg shuffle on
    * (window, event_type) — at 100 TB the cost is the same single
    * aggregate exchange as q51 times the ×3 expansion factor, and the
    * factor is a query constant, not data-dependent. The oracle
    * reproduces Spark's epoch-aligned window starts with integer
    * microsecond floor arithmetic (exact on both engines).
    */
  private val q5b = Qdef(
    "q5b_sliding_window",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "15 minutes", "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("window_start", "event_type"),
    Some(s"""WITH e AS (SELECT make_timestamp((epoch_ns(ts) // 1000 // 300000000) * 300000000) AS b,
                               event_type, value FROM events),
            w AS (SELECT b - to_microseconds(i * 300000000) AS window_start, event_type, value
                  FROM e, unnest(generate_series(0, 2)) AS u(i))
            SELECT window_start, event_type, COUNT(*) AS n, ${DSUM("value")} AS sum_value
            FROM w GROUP BY 1, 2 ORDER BY window_start, event_type"""))

  val all: Seq[Qdef] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08,
    q10, q11, q12, q13, q14, q15, q16, q17, q18, q19,
    q20, q21, q22, q23, q24, q25, q26,
    q30, q31, q32, q33, q34, q35, q36, q37,
    q50, q51, q52, q53, q54, q55, q56, q57, q58, q5a, q5b)
}
