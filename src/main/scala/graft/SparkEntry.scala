package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §7. */
object SparkEntry {

  /** All checkable operators, assembled from the per-module registries. */
  def defs: Seq[Qdef] = {
    val ds =
      operators.Relational.all ++ operators.Cohort.all ++
        dedup.Dedup.all ++ ann.Knn.all ++ operators.TextAnalysis.all ++
        operators.Sketches.all ++ operators.Warehouse.all ++ operators.Curate.all ++
        operators.Mix.all ++ operators.TrainingRun.all
    // the Maps below are last-wins: a duplicate name across the ten
    // hand-maintained registries would silently DROP an operator from
    // Bench, Verify, and the DuckDB gate at once, with every signal
    // staying green. Fail loudly instead.
    val dup = ds.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate Qdef name(s) across registries: ${dup.mkString(", ")}")
    ds
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q03.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.run).toMap

  /** DuckDB twin for each SQL-expressible query (same column names,
    * same ORDER BY, decimal-exact float aggregates — SURVEY §5).
    */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(o => q.name -> o.linesIterator.map(_.trim).mkString(" "))).toMap
}
