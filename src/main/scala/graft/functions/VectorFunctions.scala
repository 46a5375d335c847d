package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns (SURVEY §2.8).
  *
  * All folds are sequential left-to-right double accumulation
  * (`aggregate` over `zip_with` products), which matches DuckDB's
  * `list_sum(list_transform(...))` bit-for-bit — that is what lets the
  * brute-force KNN query be hash-checked against the oracle instead of
  * rows-only. Pure `functions._` compositions: codegen'd, no UDF.
  */
object VectorFunctions {

  /** Dot product in double precision, sequential fold. */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Euclidean norm in double precision, sequential fold. */
  def norm2(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity given precomputed norms (norms are computed once
    * per row, not once per pair — the thing that matters when the pair
    * count is quadratic in the bucket size).
    */
  def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    dotD(a, b) / (na * nb)

  /** Squared euclidean distance (IVF assignment metric; avoids the sqrt). */
  def distSq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, x) => acc + x)
}
