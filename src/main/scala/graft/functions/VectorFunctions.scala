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
    * Un-scorable guard: the cosine is NULL — never a match under any
    * `>= tau` filter — unless the norm product is FINITE and positive:
    *
    *  - zero norm: a zero vector has no direction; without the guard
    *    Spark 4's default ANSI mode throws DIVIDE_BY_ZERO and kills
    *    the whole query (with ANSI off, the 0/0 NaN would sort ABOVE
    *    tau in Spark's NaN-greatest ordering, silently matching the
    *    zero vector to everything in its bucket);
    *  - NaN norm (a NaN element): `NaN > 0.0` is TRUE in Spark's
    *    NaN-greatest comparison, so a bare positivity guard lets one
    *    NaN embedding score NaN against every bucket/cell neighbor —
    *    and NaN >= tau is also true, so that single garbage row would
    *    silently out-match (and in the dedup verdicts, DELETE) every
    *    higher-id vector it shares a bucket with;
    *  - infinite norm (element overflow): the vector cannot be scored
    *    in double precision at all.
    *
    * `nn > 0 && nn < +Inf` excludes all three in one codegen'd pair of
    * comparisons on the already-computed norms (NaN fails `< +Inf`,
    * zero and NaN fail/pass as above); finite positive norms bound the
    * dot by Cauchy-Schwarz, so the quotient itself is always finite.
    */
  def cosine(a: Column, b: Column, na: Column, nb: Column): Column = {
    val nn = na * nb
    when(nn > 0.0 && nn < Double.PositiveInfinity, dotD(a, b) / nn)
  }

  /** Squared euclidean distance (IVF assignment metric; avoids the sqrt). */
  def distSq(a: Column, b: Column): Column = call_function("graft_distsq", a, b)

  /** THE scorable-embedding predicate — the library-wide un-scorable
    * classes (null array, null element, zero norm — which also covers
    * the empty array — NaN or infinite norm) in one definition, so
    * the dedup verdict paths, centroid seeding/training, and width
    * probing can never drift on what counts as garbage. `> 0 &&
    * < +Inf` excludes NaN in Spark's NaN-greatest ordering: NaN
    * passes `> 0` but fails `< +Inf`.
    */
  def scorableEmb(c: Column): Column = {
    val n = norm2(c)
    c.isNotNull && !vecHasNull(c) && n > 0.0 && n < Double.PositiveInfinity
  }
}
