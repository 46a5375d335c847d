package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns (SURVEY §2.8).
  *
  * Backed by the native codegen expressions in [[VectorExpressions]]
  * (registered per session from [[graft.Tables.load]]): a tight
  * primitive loop inside whole-stage codegen, ~100× the throughput of
  * the `aggregate`/`zip_with` higher-order versions they replaced
  * (those are `CodegenFallback` — interpreted, boxing per element).
  *
  * All folds remain sequential left-to-right double accumulation,
  * which matches DuckDB's `list_sum(list_transform(...))` bit-for-bit —
  * that is what lets the brute-force KNN query be hash-checked against
  * the oracle instead of rows-only.
  */
object VectorFunctions {

  /** Dot product in double precision, sequential fold. */
  def dotD(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Euclidean norm in double precision, sequential fold. */
  def norm2(a: Column): Column = call_function("graft_norm2", a)

  /** True iff the array contains a null element (codegen'd validity
    * probe — see [[graft.functions.HasNullElem]]).
    */
  def vecHasNull(a: Column): Column = call_function("graft_vec_has_null", a)

  /** Cosine similarity given precomputed norms (norms are computed once
    * per row, not once per pair — the thing that matters when the pair
    * count is quadratic in the bucket size).
    *
    * Zero-norm guard: a zero vector has no direction, so its cosine
    * with anything is NULL — never a match under any `>= tau` filter.
    * Without the guard, Spark 4's default ANSI mode throws
    * DIVIDE_BY_ZERO and kills the whole query (and with ANSI off the
    * NaN would sort ABOVE tau in Spark's nan-safe ordering, silently
    * matching the zero vector to everything in its bucket).
    */
  def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    when(na * nb > 0.0, dotD(a, b) / (na * nb))

  /** Squared euclidean distance (IVF assignment metric; avoids the sqrt). */
  def distSq(a: Column, b: Column): Column = call_function("graft_distsq", a, b)
}
