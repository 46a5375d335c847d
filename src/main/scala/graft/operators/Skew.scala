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
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      salts: Int,
      partial: Seq[Column],
      finish: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(rand(seed = 7)), lit(salts)))
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
    val f = fact.withColumn("__salt", pmod(xxhash64(rand(seed = 11)), lit(salts)))
    val d = dim.withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    f.join(d, f(factKey) === d(dimKey) && f("__salt") === d("__salt"))
      .drop("__salt")
  }
}
