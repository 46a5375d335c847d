package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §4).
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default in every graft session) already splits oversized
  * join partitions at runtime — prefer that for plain joins. These
  * helpers cover the cases AQE does not: hot-key *aggregations*, and
  * joins where the skewed side must be spread before the shuffle
  * (e.g. a subsequent window over the same key).
  */
object Skew {

  /** Two-phase salted aggregation: partial-aggregate on
    * (keys, salt ∈ [0, salts)) so one hot key fans out over `salts`
    * reducers, then finish on the keys alone. The second shuffle
    * carries one row per (key, salt) — negligible. Works for any
    * commutative-associative aggregate passed as (partial, finish).
    */
  /** Deterministic per-row salt: hash of the full row content. rand()
    * would be a nondeterministic shuffle key — under stage retry,
    * re-executed map tasks would re-salt rows differently than the
    * partitions already consumed, corrupting the aggregate
    * (SPARK-23207-class bug). Identical rows share a salt, which is
    * harmless for skew spreading.
    */
  private def rowSalt(df: DataFrame, salts: Int): Column = {
    // loud, not NULL: pmod(h, 0) is NULL off-ANSI, which would make
    // every salted equi-join condition unsatisfiable — a silently
    // EMPTY result for any non-empty inputs (and a mid-job ANSI error
    // otherwise); negative salt counts are the same failure
    require(salts >= 1, s"salts must be >= 1, got $salts")
    pmod(xxhash64(df.columns.map(col): _*), lit(salts))
  }

  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      salts: Int,
      partial: Seq[Column],
      finish: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", rowSalt(df, salts))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finish.head, finish.tail: _*)
  }

  /** Salted equi-join of a skewed fact against a dimension too big to
    * broadcast: fact rows get salt = hash(row) mod `salts`; the dim is
    * exploded once per salt value so every (key, salt) bucket finds
    * its match. Shuffle volume: fact unchanged, dim × salts — choose
    * `salts` ≈ (hottest-key row count) / (target partition rows).
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      salts: Int): DataFrame = {
    val f = fact.withColumn("__salt", rowSalt(fact, salts))
    val d = dim.withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    f.join(d, f(factKey) === d(dimKey) && f("__salt") === d("__salt"))
      .drop("__salt")
  }
}
