package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-pipeline operators (SURVEY §2.7/§2.9).
  *
  * Everything is a composition of `org.apache.spark.sql.functions._`
  * (higher-order array functions + codegen'd string/hash functions) —
  * no UDFs, so every derived column stays inside whole-stage codegen
  * and Catalyst can prune/push around it.
  */
object TextFunctions {

  /** Lower-cased, whitespace-collapsed, trimmed text (dedup canon form). */
  def normText(c: Column): Column = trim(regexp_replace(lower(c), "\\s+", " "))

  /** Whitespace tokens of the lower-cased text. */
  def tokens(c: Column): Column = split(trim(lower(c)), "\\s+")

  // THE token/char count definitions (the q80/q82 oracle contract) —
  // ONE definition each, shared by TextAnalysis's gate-checked queries
  // AND the curation pipeline: the packing mass qa3 shards by and the
  // quality filters qa0 applies must be exactly the counts the DuckDB
  // twins verify, never a hand-mirrored copy that can drift (the same
  // hazard the shared predLang/qualityScore refactor closed).

  /** Whitespace-token count (q80's n_ws_tokens / q82's n_tokens). */
  def nWsTokens(text: Column): Column =
    size(split(trim(text), "\\s+")).cast("long")

  /** BPE-proxy token count: letter runs, digit runs, and single
    * non-alphanumeric marks (q80's n_bpe_tokens).
    */
  def nBpeTokens(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
      .cast("long")

  /** Character count (q82's n_chars_m). */
  def nCharsM(text: Column): Column = length(text).cast("long")

  /** Punctuation/symbol character count (q82's n_punct_chars). */
  def nPunctChars(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("long")

  /** Word k-shingles ("w1 w2 w3") of a token array; empty when the doc
    * has fewer than k tokens (lazy CASE keeps `sequence` from seeing a
    * negative range).
    */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => array_join(slice(toks, i + lit(1), lit(k)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Distinct xxhash64 values of the k-shingle set — the unit all
    * near-dup operators work over (8 bytes/shingle instead of the
    * string, which is what survives a 100 TB shuffle). Backed by the
    * codegen'd [[ShingleHashes64]] expression (the higher-order
    * `transform`/`slice`/`array_join` composition is CodegenFallback —
    * interpreted — and dominated the dedup profile); null (not empty)
    * for docs with fewer than k tokens.
    */
  def shingleHashes(text: Column, k: Int): Column =
    call_function("graft_shingle_hashes", text, lit(k))

  /** MinHash signature of a shingle-hash set (codegen'd, per-row —
    * no explode/aggregate shuffle).
    */
  def minhashSig(sh: Column, perms: Int): Column =
    call_function("graft_minhash", sh, lit(perms))

  /** Lower 64 bits of MD5 as a long — bit-identical to DuckDB's
    * `md5_number_lower`, so operators hashed with it (q63's simhash)
    * stay oracle-checkable. Codegen'd ([[Md5Lo64]]).
    */
  def md5Lo64(c: Column): Column = call_function("graft_md5lo64", c)

  /** BPE-encode text against a learned merge table (rank = position in
    * `merges` — [[graft.operators.TextAnalysis.bpeMerges]] returns
    * (left, right, count) triples, so drop the count first:
    * `bpeEncode(col, bpeMerges(docs, n).map { case (l, r, _) => (l, r) })`).
    * Codegen'd narrow map; the table rides the plan as a
    * literal, so encoding shuffles nothing at any corpus size.
    */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    call_function("graft_bpe_encode", text,
      typedLit(merges.map(m => Seq(m._1, m._2))))

  // Fixed per-language signature word lists (language-ID + quality
  // signals). Tiny by design: the scale path is a broadcast lookup,
  // and literal IN-lists keep the whole scorer inside codegen.
  val stopEn = Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")
  val stopDe = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf")
  val stopFr = Seq("le", "la", "les", "et", "est", "une", "que", "pour", "dans", "sur")
  val stopEs = Seq("el", "los", "las", "y", "es", "un", "una", "por", "con", "para")
  val stopZh = Seq("的", "是", "不", "了", "在", "有", "我", "他", "这", "中")

  /** Winnowing-style fingerprint sketch: the sorted mod-`m`-selected
    * subset of the distinct k-shingle hashes. This is the raw
    * `array<long>` form for library callers (containment/overlap
    * tests); driver-visible queries expose only its scalar digest
    * (see q83 — the harness cannot hash array columns). Null when the
    * doc has fewer than k tokens, like [[shingleHashes]].
    */
  def fingerprintSketch(text: Column, k: Int, m: Int): Column =
    sort_array(filter(shingleHashes(text, k), h => pmod(h, lit(m)) === 0))

  /** Number of DISTINCT tokens that belong to a fixed word list.
    * Distinct-hit semantics (array_intersect) chosen because they are
    * bit-for-bit reproducible in the DuckDB oracle via list_intersect.
    */
  def distinctHits(toks: Column, words: Seq[String]): Column =
    size(array_intersect(toks, array(words.map(lit): _*)))

  /** SQL IN-list literal for the same word list (oracle twin). */
  def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  // --------------------------- the ONE-definition curation predicates
  // q81/q82/q86 pin these against DuckDB twins, and the curation
  // pipeline (Curate.annotated/curated, qa0/qa3) composes the same
  // rules — previously as verbatim copies, which is exactly how a
  // future tweak (new language, new threshold) would leave the packed
  // corpus split differently than the oracle-checked building blocks
  // say. One Column-level definition each makes that drift impossible.

  /** q81's language argmax over per-language distinct stopword hits:
    * priority-ordered ties (en ≥ de ≥ fr ≥ es ≥ zh) — the first
    * language whose hit count is ≥ every later one wins.
    */
  def predLang(sEn: Column, sDe: Column, sFr: Column, sEs: Column, sZh: Column): Column =
    when(sEn >= sDe && sEn >= sFr && sEn >= sEs && sEn >= sZh, "en")
      .when(sDe >= sFr && sDe >= sEs && sDe >= sZh, "de")
      .when(sFr >= sEs && sFr >= sZh, "fr")
      .when(sEs >= sZh, "es")
      .otherwise("zh")

  /** q82's quality score: length term × (1 − punct ratio) × stop-hit
    * term. nChars = 0 (empty document) guards the punct ratio to 0 —
    * 0/0 is engine-dependent and a NaN quality would pass Spark's
    * NaN-greatest ≥ filter while DuckDB disagrees. nTokens ≥ 1 always
    * (split of "" is [""]).
    */
  def qualityScore(nTokens: Column, nChars: Column, nPunct: Column, stopHits: Column): Column =
    least(lit(1.0), nTokens.cast("double") / 200.0) *
      (lit(1.0) - when(nChars > 0, nPunct.cast("double") / nChars.cast("double"))
        .otherwise(lit(0.0))) *
      (lit(0.5) + lit(0.5) * stopHits.cast("double") / nTokens.cast("double"))

  /** q86's deterministic train/val/test assignment: the first two hex
    * chars of md5(doc_id) against the 80/10/10 prefix thresholds —
    * growing the corpus never reshuffles existing docs between splits.
    */
  def hashSplit(docId: Column): Column = {
    val bucket = substring(md5(docId.cast("string").cast("binary")), 1, 2)
    when(bucket < "cd", "train").when(bucket < "e6", "val").otherwise("test")
  }
}
