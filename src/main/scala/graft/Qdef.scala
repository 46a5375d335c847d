package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One checkable operator: a Spark implementation plus (when
  * SQL-expressible) a DuckDB oracle producing identical column names,
  * row order, and bit-identical values (see SURVEY §5 for the
  * determinism rules: decimal-exact float aggregates, explicit total
  * ORDER BY, NULLS FIRST parity).
  */
final case class Qdef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Qdef {
  /** Decimal-exact SUM reported as double — bit-identical across
    * engines regardless of aggregation order (SQL twin of
    * [[Tables.dsum]]).
    */
  def DSUM(x: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($x AS DECIMAL(28,$scale))) AS DOUBLE)"

  /** Decimal-exact mean as double (SQL twin of [[Tables.davg]]). */
  def DAVG(x: String, scale: Int = 2): String =
    s"${DSUM(x, scale)} / COUNT($x)"
}
