package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted aggregation / join equivalence to their unsalted twins. */
class SkewSpec extends SparkSpec {

  test("saltedAgg equals direct aggregation") {
    val li = Tables.lineitem(spark, sf)
    val direct = li.groupBy("l_returnflag")
      .agg(Tables.dsum(col("l_quantity")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Skew.saltedAgg(
      li, Seq("l_returnflag"), salts = 8,
      partial = Seq(sum(col("l_quantity").cast("decimal(28,2)")).as("ps"), count(lit(1)).as("pn")),
      finish = Seq(sum("ps").cast("double").as("s"), sum("pn").as("n")))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted === direct)
  }

  test("saltedJoin equals plain join") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey", "l_quantity")
    val sup = Tables.supplier(spark, sf).select("s_suppkey", "s_nationkey")
    val plain = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(li, sup, "l_suppkey", "s_suppkey", salts = 4)
      .groupBy("s_nationkey").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("salts < 1 is a loud refusal, never a silently empty join") {
    // pmod(h, 0) is NULL off-ANSI: every salted equi-condition would
    // be unsatisfiable and the join would return ZERO rows silently
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
    val sup = Tables.supplier(spark, sf).select("s_suppkey")
    for (bad <- Seq(0, -3)) {
      val e = intercept[IllegalArgumentException](
        Skew.saltedJoin(li, sup, "l_suppkey", "s_suppkey", salts = bad))
      assert(e.getMessage.contains("salts"), e.getMessage)
    }
  }
}
