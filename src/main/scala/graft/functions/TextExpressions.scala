package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers called from both interpreted eval and generated code
  * (the same pattern Spark's own regexp expressions use): one tight
  * JVM pass per document instead of a tree of interpreted higher-order
  * array lambdas.
  */
object TextExprHelpers {

  // hoisted per-class, not per-row: UTF8String.split compiles its
  // regex on EVERY call (String.split fast-paths only single literal
  // chars), which put a Pattern.compile per corpus row — three times
  // over — inside the exact codegen'd scan these helpers exist to
  // speed up
  private val WS = java.util.regex.Pattern.compile("\\s+")
  private val Space = UTF8String.fromString(" ")
  private def wsTokens(text: UTF8String): Array[UTF8String] =
    WS.split(text.toLowerCase.trim.toString, -1).map(UTF8String.fromString)

  /** Distinct xxhash64 values (seed 42, same as Spark's `xxhash64`) of
    * the word k-shingles of `trim(lower(text))` split on whitespace —
    * the fast twin of the
    * `array_distinct(transform(shingles(tokens(text), k), xxhash64))`
    * composition it replaces. Returns null when the doc has < k tokens
    * (mirrors the empty-array-then-absent-after-explode behavior).
    */
  def shingleHashes(text: UTF8String, k: Int): ArrayData = {
    if (text == null) return null
    val toks = wsTokens(text)
    if (toks.length < k) return null
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i + k <= toks.length) {
      val sh = UTF8String.concatWs(Space, java.util.Arrays.copyOfRange(toks, i, i + k): _*)
      seen.add(XxHash64Function.hash(sh, StringType, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  private val md5Digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** The LOWER 64 bits of MD5(s): digest bytes 8..15 assembled
    * little-endian — bit-identical to DuckDB's `md5_number_lower`,
    * which is what makes hash-dependent operators built on it (q63's
    * simhash) oracle-checkable (the q83 precedent: xxhash64 has no
    * DuckDB twin, md5 both engines share). The signed-long bit
    * pattern equals DuckDB's UBIGINT; per-bit extraction, XOR and
    * bit_count agree on all 64 bits regardless of the sign
    * interpretation.
    */
  def md5Lo64(s: UTF8String): Long = {
    val md = md5Digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (d(i) & 0xFFL); i -= 1 }
    h
  }

  /** All word k-shingles of a document as strings (non-distinct —
    * occurrence counts matter for vocabulary building). Null when the
    * doc has fewer than k tokens.
    */
  def shingleStrings(text: UTF8String, k: Int): ArrayData = {
    if (text == null) return null
    val toks = wsTokens(text)
    if (toks.length < k) return null
    val out = new Array[AnyRef](toks.length - k + 1)
    var i = 0
    while (i + k <= toks.length) {
      out(i) = UTF8String.concatWs(Space, java.util.Arrays.copyOfRange(toks, i, i + k): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Longest run of equal adjacent elements in a SORTED string array —
    * i.e. the multiplicity of the most frequent element. Sorting first
    * turns "mode count" into a single adjacent-compare pass, so
    * per-document n-gram repetition (Gopher/C4-style quality rules)
    * stays a pure narrow map: no explode, no per-doc groupBy shuffle.
    * Null elements are ignored (never part of a run) — the registered
    * SQL function must not NPE on a nullable array, even though the
    * shipped call sites only feed containsNull=false arrays.
    */
  def maxRunLength(a: ArrayData): Int = {
    val n = a.numElements()
    var best = 0
    var run = 0
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      val cur = a.getUTF8String(i)
      if (cur == null) { run = 0; prev = null }
      else {
        run = if (prev != null && cur.equals(prev)) run + 1 else 1
        if (run > best) best = run
        prev = cur
      }
      i += 1
    }
    best
  }

  /** BPE-encode one document against a learned merge-rank table
    * (rank = learning order, [[graft.operators.TextAnalysis.bpeMerges]]).
    * Canonicalization matches the learner exactly — lowercase, trim,
    * whitespace split, code-point symbols — so the encoder segments
    * precisely the vocabulary the merges were learned on.
    *
    * Per word: repeatedly merge the LOWEST-rank adjacent pair until no
    * adjacent pair has a rank. This greedy-priority loop yields the
    * same segmentation as replaying the merges in rank order (a merge
    * can only create pairs involving its own output symbol, and any
    * pair containing that symbol was necessarily learned LATER — so
    * merging rank k never un-blocks a rank < k), which the spec
    * exploits as an independent oracle.
    *
    * The rank map is plan-embedded (a GPT-2-scale 50k-merge table is
    * ~1 MB — fine to ship with the serialized plan; the encode itself
    * is a pure narrow map, the 100 TB-safe shape).
    */
  def bpeEncode(text: UTF8String, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    if (text == null) return null
    val toks = wsTokens(text)
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef]()
    var w = 0
    while (w < toks.length) {
      val word = toks(w).toString
      if (word.nonEmpty) encodeWord(word, ranks, out)
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def encodeWord(
      word: String,
      ranks: java.util.HashMap[String, Integer],
      out: scala.collection.mutable.ArrayBuffer[AnyRef]): Unit = {
    // split on CODE POINTS (same as the learner): per-char would break
    // astral-plane characters into unpaired surrogate halves
    var syms: Array[String] =
      word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    var more = syms.length > 1
    while (more) {
      var bestRank = Int.MaxValue
      var bestL: String = null
      var bestR: String = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestL = syms(i); bestR = syms(i + 1) }
        i += 1
      }
      if (bestL == null) more = false
      else {
        // merge ALL occurrences of the chosen pair, left to right —
        // the learner's own substitution pass
        val merged = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == bestL && syms(i + 1) == bestR) {
            merged += bestL + bestR; i += 2
          } else { merged += syms(i); i += 1 }
        }
        syms = merged.toArray
        more = syms.length > 1
      }
    }
    var j = 0
    while (j < syms.length) { out += UTF8String.fromString(syms(j)); j += 1 }
  }

  /** `perms`-permutation MinHash signature of a shingle-hash set:
    * m_i = min over shingles of xxhash64(seed=i)(h). One per-row pass —
    * no explode, no aggregation shuffle.
    */
  def minhashSig(sh: ArrayData, perms: Int): ArrayData = {
    if (sh == null || sh.numElements() == 0) return null
    val sig = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i < sh.numElements()) {
      val h = sh.getLong(i)
      var p = 0
      while (p < perms) {
        val v = XxHash64Function.hash(h, LongType, p)
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** Helper for LSH banding: hash each of `bands` contiguous
  * `rowsPerBand`-slices of a signature to one long.
  */
object BandHelpers {
  def bandHashes(sig: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    if (sig == null) return null
    // a short signature (perms < bands*rowsPerBand) would fold ZERO
    // values into the trailing bands, giving every document the same
    // constant hash there — all n docs share one bucket and the
    // banded self-join goes silently quadratic. Fail loudly instead.
    require(sig.numElements() >= bands.toLong * rowsPerBand,
      s"signature has ${sig.numElements()} values but banding needs " +
        s"$bands x $rowsPerBand — raise perms or lower bands/rowsPerBand")
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = XxHash64Function.hash(b.toLong, LongType, 42L)
      var r = 0
      while (r < rowsPerBand) {
        // no bounds branch: the require above guarantees
        // numElements >= bands*rowsPerBand, so idx is always in range
        h = XxHash64Function.hash(sig.getLong(b * rowsPerBand + r), LongType, h)
        r += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_band_hashes(sig, bands, rows)` — codegen'd LSH band hashes
  * (index in the output array = band id, pairs with `posexplode`).
  */
case class BandHashes(child: Expression, bands: Int, rowsPerBand: Int) extends UnaryExpression {
  require(bands >= 1 && rowsPerBand >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_band_hashes"

  override protected def nullSafeEval(sig: Any): Any =
    BandHelpers.bandHashes(sig.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, sig =>
      s"${ev.value} = graft.functions.BandHelpers.bandHashes($sig, $bands, $rowsPerBand);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `graft_md5lo64(str)` — codegen'd lower-64-bits-of-MD5 token hash,
  * bit-identical to DuckDB's `md5_number_lower` (see
  * [[TextExprHelpers.md5Lo64]]).
  */
case class Md5Lo64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_md5lo64"

  override protected def nullSafeEval(t: Any): Any =
    TextExprHelpers.md5Lo64(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextExprHelpers.md5Lo64($t)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `graft_shingle_hashes(text, k)` — codegen'd scalar producing the
  * distinct xxhash64 k-shingle set of a document.
  */
case class ShingleHashes64(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle width must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(t: Any): Any =
    TextExprHelpers.shingleHashes(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ec = nullSafeCodeGen(ctx, ev, t =>
      s"""
         |${ev.value} = graft.functions.TextExprHelpers.shingleHashes($t, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
    ec
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `graft_shingle_strings(text, k)` — codegen'd scalar producing all
  * word k-shingles of a document as strings (vocabulary building).
  */
case class ShingleStrings(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle width must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingle_strings"

  override protected def nullSafeEval(t: Any): Any =
    TextExprHelpers.shingleStrings(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"""
         |${ev.value} = graft.functions.TextExprHelpers.shingleStrings($t, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `graft_max_run(sorted_strings)` — codegen'd longest-equal-run
  * count over a sorted string array (= top element multiplicity).
  */
case class MaxRunLength(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_max_run"

  override protected def nullSafeEval(a: Any): Any =
    TextExprHelpers.maxRunLength(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextExprHelpers.maxRunLength($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `graft_bpe_encode(text, merges)` — codegen'd BPE tokenizer: encode
  * a document against a learned merge table (array<array<string>> of
  * [left, right] pairs in learning order; rank = array index). The
  * merge table must be a plan-time literal (`typedLit` — the same
  * contract as `graft_argmin_cell`'s centroid matrix).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bpe_encode"

  // duplicate pairs keep their FIRST (lowest) rank — re-learning an
  // already-merged pair can't happen in a well-formed table, but the
  // registered SQL function must not let a malformed literal make the
  // encoder non-deterministic
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.putIfAbsent(l + " " + r, Int.box(i))
    }
    m
  }

  override protected def nullSafeEval(t: Any): Any =
    TextExprHelpers.bpeEncode(t.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val ref = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
      s"${ev.value} = graft.functions.TextExprHelpers.bpeEncode($t, $ref);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `graft_minhash(shingle_hashes, perms)` — codegen'd MinHash
  * signature over a shingle-hash array.
  */
case class MinHashSig(child: Expression, perms: Int) extends UnaryExpression {
  require(perms >= 1, "permutation count must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(sh: Any): Any =
    TextExprHelpers.minhashSig(sh.asInstanceOf[ArrayData], perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, sh =>
      s"""
         |${ev.value} = graft.functions.TextExprHelpers.minhashSig($sh, $perms);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
