package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path (SURVEY §7 r2,
  * pulled into r1 after profiling).
  *
  * The `functions._` higher-order versions (`aggregate` over
  * `zip_with`) are `CodegenFallback`: every pair evaluation walks an
  * interpreted lambda per element with boxing — measured 26 s for 2.3 M
  * cosine pairs at sf0.1. These expressions generate a tight primitive
  * loop inside whole-stage codegen instead (with a matching interpreted
  * `nullSafeEval` for completeness).
  *
  * CONTRACT: the fold is a sequential left-to-right double
  * accumulation, identical to both the higher-order version it
  * replaces and DuckDB's `list_sum(list_transform(...))` — this is
  * what keeps q70's oracle hash-exact. Array elements must be non-null
  * (embedding columns; enforced upstream by schema). Array LENGTHS
  * are not schema-enforceable: mismatched-dims pairs yield NULL, the
  * same verdict as the zip_with form this replaces (zip_with pads the
  * shorter side with nulls → null product → null sum) and the
  * library's un-scorable convention — a silent min-length truncation
  * would instead score a corrupt prefix row as cosine 1.0 against its
  * own extension and wrongfully DELETE it in the dedup paths.
  */
private[graft] trait VectorBinaryLoop extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // a non-null pair can still produce NULL (dims mismatch)
  override def nullable: Boolean = true

  private def elemGet(e: Expression): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => "getFloat"
      case DoubleType => "getDouble"
      case t          => throw new IllegalArgumentException(s"vector op over array<$t>")
    }

  /** Java statement(s) updating `acc` from `(double) xi` and `(double) yi`. */
  protected def updateJava(acc: String, xi: String, yi: String): String
  protected def updateEval(acc: Double, xi: Double, yi: Double): Double

  private def getD(e: Expression, a: ArrayData, i: Int): Double =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => a.getFloat(i).toDouble
      case _         => a.getDouble(i)
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc = updateEval(acc, getD(left, x, i), getD(right, y, i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = (double) $a.${elemGet(left)}($i);
         |    double $yi = (double) $b.${elemGet(right)}($i);
         |    ${updateJava(acc, xi, yi)}
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** Sequential-fold double dot product of two float/double arrays. */
case class DotProductD(left: Expression, right: Expression) extends VectorBinaryLoop {
  override protected def updateJava(acc: String, xi: String, yi: String): String =
    s"$acc += $xi * $yi;"
  override protected def updateEval(acc: Double, xi: Double, yi: Double): Double =
    acc + xi * yi
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_dot"
}

/** Sequential-fold squared euclidean distance. */
case class DistSqD(left: Expression, right: Expression) extends VectorBinaryLoop {
  override protected def updateJava(acc: String, xi: String, yi: String): String =
    s"double d = $xi - $yi; $acc += d * d;"
  override protected def updateEval(acc: Double, xi: Double, yi: Double): Double = {
    val d = xi - yi
    acc + d * d
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_distsq"
}

/** Sequential-fold L2 norm (sqrt of sum of squares). */
case class NormL2(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_norm2"

  private def getter: String =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => "getFloat"
      case DoubleType => "getDouble"
      case t          => throw new IllegalArgumentException(s"norm over array<$t>")
    }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    while (i < x.numElements()) {
      val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = (double) $a.$getter($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** True iff the array contains a null element — the codegen'd
  * validity probe for dense-vector inputs. The vector folds above
  * read null elements as 0.0 (ArrayData getters return defaults), so
  * operators that must ROUTE malformed vectors rather than silently
  * zero them (semanticDedup's keep-by-default branch) gate on this.
  * The SQL higher-order `exists(a, isnull)` computes the same thing
  * but is eval-only — an interpreted lambda per corpus row on a scan
  * path that should stay inside whole-stage codegen.
  */
case class HasNullElem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_vec_has_null"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var i = 0
    while (i < x.numElements()) {
      if (x.isNullAt(i)) return true
      i += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      s"""
         |${ev.value} = false;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if ($a.isNullAt($i)) { ${ev.value} = true; break; }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Static twin of [[ArgMinCell]]'s loop, shared by interpreted eval and
  * generated code (same pattern as [[TextExprHelpers]]).
  */
object ArgMinHelper {
  def argmin(x: ArrayData, cents: Array[Array[Double]], isFloat: Boolean): Int = {
    var best = -1
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val ce = cents(c)
      val n = math.min(x.numElements(), ce.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = (if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)) - ce(i)
        acc += d * d
        i += 1
      }
      // strict < keeps the FIRST minimum: with centroids ordered by
      // cid this reproduces the old window tie-break (dist, cid)
      if (acc < bestD) { bestD = acc; best = c }
      c += 1
    }
    best
  }
}

/** `graft_argmin_cell(embedding, centroid_matrix)` — index of the
  * nearest (squared-euclidean) centroid among a LITERAL centroid
  * matrix. This is what makes IVF cell assignment a pure narrow map:
  * the k×dims centroid table rides along as a plan constant (same way
  * broadcast-hash-join keys do), so assigning 100 TB of vectors is one
  * codegen'd scan — no k× crossJoin fan-out, no row_number shuffle.
  */
case class ArgMinCell(child: Expression, cents: Seq[Seq[Double]]) extends UnaryExpression {
  require(cents.nonEmpty, "argmin over an empty centroid set")
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  // a NaN element makes EVERY centroid distance NaN, so no centroid
  // ever wins the strict-< race — the un-scorable verdict is NULL
  // (the library convention), not a sentinel cell id that silently
  // routes the vector where no probe ever looks
  override def nullable: Boolean = true
  override def prettyName: String = "graft_argmin_cell"

  private lazy val centArr: Array[Array[Double]] = cents.map(_.toArray).toArray
  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any): Any = {
    val b = ArgMinHelper.argmin(a.asInstanceOf[ArrayData], centArr, isFloat)
    if (b < 0) null else b
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("cents", centArr, "double[][]")
      val b = ctx.freshName("best")
      s"""
         |int $b = graft.functions.ArgMinHelper.argmin($a, $ref, $isFloat);
         |if ($b < 0) { ${ev.isNull} = true; } else { ${ev.value} = $b; }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Static twin of [[LshBuckets]]' loop — all `tables` bucket keys of
  * one embedding in ONE pass over the plane matrix (same pattern as
  * [[ArgMinHelper]]).
  */
object LshBucketHelper {
  /** planes: (tables·perTable) rows × dims, tables-outer/planes-inner
    * (the [[graft.ann.Knn.hyperplanes]] fill order); thresh: one
    * centering offset per plane row (all-zero for plain banding).
    * Bit j of table t is set iff dot(x, planes(t·perTable+j)) >
    * thresh(t·perTable+j) under SPARK's comparison (Double.compare —
    * NaN-greatest, exactly GreaterThan's ordering, so a NaN element
    * flips the same bits the old when(dotD > lit) tree did). A row
    * whose length differs from the plane width gets bucket 0 in
    * every table — the old tree's dotD returned NULL there and
    * when().otherwise(0) landed on 0.
    */
  def buckets(
      x: ArrayData, planes: Array[Array[Double]], thresh: Array[Double],
      perTable: Int, isFloat: Boolean): Array[Long] = {
    val tables = planes.length / perTable
    val out = new Array[Long](tables)
    val n = x.numElements()
    if (planes.length == 0 || n != planes(0).length) return out
    var t = 0
    while (t < tables) {
      var bkt = 0L
      var j = 0
      while (j < perTable) {
        val p = planes(t * perTable + j)
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += (if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)) * p(i)
          i += 1
        }
        if (java.lang.Double.compare(acc, thresh(t * perTable + j)) > 0) bkt |= 1L << j
        j += 1
      }
      out(t) = bkt
      t += 1
    }
    out
  }
}

/** `graft_lsh_buckets(embedding, planes, thresholds, planes_per_table)`
  * — ALL LSH table buckets of a row in one codegen'd pass.
  *
  * Replaces the tables×planes separate `when(graft_dot(emb, lit) > t)`
  * expression trees the banding used to build: one plan constant
  * (the flattened plane matrix) instead of 48–144 64-element array
  * literals, one traversal of the embedding per plane instead of a
  * separate codegen'd fold re-reading the ArrayData per (table,
  * plane), and a plan/task-binary small enough to stop the
  * "Broadcasting large task binary" warnings the literal forest
  * caused. NULL-TOLERANT BY CONTRACT: a null embedding banded to
  * bucket 0 in every table under the old tree (dotD null →
  * when().otherwise(0)), so this returns the all-zero bucket array
  * for null input rather than null — the banded row set is
  * bit-identical.
  */
case class LshBuckets(
    child: Expression, planes: Seq[Seq[Double]], threshs: Seq[Double],
    perTable: Int) extends UnaryExpression {
  require(perTable >= 1 && planes.nonEmpty && planes.length % perTable == 0,
    s"plane matrix rows (${planes.length}) must be a positive multiple of planes_per_table ($perTable)")
  require(threshs.length == planes.length,
    s"one threshold per plane row: got ${threshs.length} for ${planes.length} rows")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_lsh_buckets"

  private lazy val planeArr: Array[Array[Double]] = planes.map(_.toArray).toArray
  private lazy val threshArr: Array[Double] = threshs.toArray
  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def zeros: Array[Long] = new Array[Long](planes.length / perTable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    val arr =
      if (v == null) zeros
      else LshBucketHelper.buckets(v.asInstanceOf[ArrayData], planeArr, threshArr,
        perTable, isFloat)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val pRef = ctx.addReferenceObj("planes", planeArr, "double[][]")
    val tRef = ctx.addReferenceObj("threshs", threshArr, "double[]")
    val arr = ctx.freshName("bkts")
    val nTables = (planes.length / perTable).toString
    val perT = perTable.toString
    val isF = isFloat.toString
    ev.copy(
      code = code"""
        ${c.code}
        long[] $arr;
        if (${c.isNull}) {
          $arr = new long[$nTables];
        } else {
          $arr = graft.functions.LshBucketHelper.buckets(
            ${c.value}, $pRef, $tRef, $perT, $isF);
        }
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-session registration so `functions.call_function` can resolve
  * the graft expressions by name (called idempotently from
  * [[graft.Tables.load]], the chokepoint every query passes through).
  */
object VectorExpressions {

  private def litInt(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()

  /** Evaluate a foldable array<array<double>> argument (a `typedLit`
    * centroid matrix) to its Scala form at plan-build time.
    */
  private def litMatrix(e: Expression): Seq[Seq[Double]] = {
    require(e.foldable, "centroid matrix must be a literal")
    val ad = e.eval().asInstanceOf[ArrayData]
    (0 until ad.numElements()).map { i =>
      val row = ad.getArray(i)
      (0 until row.numElements()).map(row.getDouble).toSeq
    }
  }

  /** Evaluate a foldable array<double> argument (a `typedLit`
    * threshold vector) to its Scala form at plan-build time.
    */
  private def litVec(e: Expression): Seq[Double] = {
    require(e.foldable, "threshold vector must be a literal")
    val ad = e.eval().asInstanceOf[ArrayData]
    (0 until ad.numElements()).map(ad.getDouble).toSeq
  }

  /** Evaluate a foldable array<array<string>> argument (a `typedLit`
    * merge table) to (left, right) pairs at plan-build time.
    */
  private def litPairs(e: Expression): Seq[(String, String)] = {
    require(e.foldable, "merge table must be a literal")
    val ad = e.eval().asInstanceOf[ArrayData]
    (0 until ad.numElements()).map { i =>
      val p = ad.getArray(i)
      require(p.numElements() == 2, "each merge must be a [left, right] pair")
      (p.getUTF8String(0).toString, p.getUTF8String(1).toString)
    }
  }

  /** Single source of truth — (name, usage, builder) — consumed by
    * both the per-session registration below and
    * [[graft.GraftExtensions]], so the two surfaces cannot drift.
    * The bloom pair wraps Spark's catalyst expressions, which back
    * the optimizer's runtime filters but are not SQL-registered.
    */
  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", "_FUNC_(a, b) - sequential-fold double dot product",
      es => DotProductD(es(0), es(1))),
    ("graft_distsq", "_FUNC_(a, b) - squared euclidean distance",
      es => DistSqD(es(0), es(1))),
    ("graft_norm2", "_FUNC_(a) - L2 norm",
      es => NormL2(es.head)),
    ("graft_vec_has_null", "_FUNC_(a) - true iff the array contains a null element",
      es => HasNullElem(es.head)),
    ("graft_argmin_cell", "_FUNC_(a, cents) - index of nearest centroid in a literal matrix",
      es => ArgMinCell(es(0), litMatrix(es(1)))),
    ("graft_lsh_buckets",
      "_FUNC_(a, planes, thresholds, planes_per_table) - all LSH table buckets in one pass",
      es => LshBuckets(es(0), litMatrix(es(1)), litVec(es(2)), litInt(es(3)))),
    ("graft_shingle_hashes", "_FUNC_(text, k) - distinct xxhash64 word k-shingles",
      es => ShingleHashes64(es(0), litInt(es(1)))),
    ("graft_minhash", "_FUNC_(shingles, perms) - MinHash signature",
      es => MinHashSig(es(0), litInt(es(1)))),
    ("graft_band_hashes", "_FUNC_(sig, bands, rows) - LSH band hashes",
      es => BandHashes(es(0), litInt(es(1)), litInt(es(2)))),
    ("graft_md5lo64", "_FUNC_(str) - lower 64 md5 bits (matches DuckDB md5_number_lower)",
      es => Md5Lo64(es.head)),
    ("graft_shingle_strings", "_FUNC_(text, k) - word k-shingles as strings",
      es => ShingleStrings(es(0), litInt(es(1)))),
    ("graft_max_run", "_FUNC_(sorted) - longest equal-adjacent run in a sorted string array",
      es => MaxRunLength(es.head)),
    ("graft_bpe_encode", "_FUNC_(text, merges) - BPE-encode with a learned merge table (rank = index)",
      es => BpeEncode(es(0), litPairs(es(1)))),
    ("graft_bloom_agg", "_FUNC_(hash, nitems, nbits) - bloom filter aggregate",
      es => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        es(0), es(1), es(2))),
    ("graft_might_contain", "_FUNC_(bloom, hash) - bloom membership probe",
      es => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(es(0), es(1))))

  val names: Seq[String] = builders.map(_._1)

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, _, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}
