package graft.operators

import graft.{Qdef, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — SURVEY §2.9.
  *
  * Token counting, language-ID, quality scoring and fingerprinting are
  * all single-pass per-row `functions._` compositions (no shuffle at
  * all until the final oracle ORDER BY) — at 100 TB these run as one
  * codegen'd scan stage with full column pruning.
  */
object TextAnalysis {

  private val q80 = Qdef(
    "q80_token_count",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          nWsTokens(col("text")).as("n_ws_tokens"),
          nBpeTokens(col("text")).as("n_bpe_tokens"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
            len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
            len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]', 0)) AS n_bpe_tokens
            FROM documents ORDER BY doc_id"""))

  /** Stopword-signature language-ID. Scores are distinct-hit counts per
    * language word list; prediction is the argmax with a fixed
    * tie-break order (en > de > fr > es > zh). The synthetic corpus
    * shares one vocabulary across langs, so accuracy is incidental —
    * the oracle checks the scoring computation itself.
    */
  private val q81 = Qdef(
    "q81_langid", {
      (s, d) =>
        val toks = tokens(col("text"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            distinctHits(toks, stopEn).cast("long").as("s_en"),
            distinctHits(toks, stopDe).cast("long").as("s_de"),
            distinctHits(toks, stopFr).cast("long").as("s_fr"),
            distinctHits(toks, stopEs).cast("long").as("s_es"),
            distinctHits(toks, stopZh).cast("long").as("s_zh"))
          .withColumn("pred_lang",
            predLang(col("s_en"), col("s_de"), col("s_fr"), col("s_es"), col("s_zh")))
          .withColumn("is_match", (col("lang") === col("pred_lang")).cast("long"))
          .orderBy("doc_id")
    },
    Some(s"""WITH t AS (SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents),
             sc AS (SELECT doc_id, lang,
                     CAST(len(list_intersect(toks, ${inList(stopEn)})) AS BIGINT) AS s_en,
                     CAST(len(list_intersect(toks, ${inList(stopDe)})) AS BIGINT) AS s_de,
                     CAST(len(list_intersect(toks, ${inList(stopFr)})) AS BIGINT) AS s_fr,
                     CAST(len(list_intersect(toks, ${inList(stopEs)})) AS BIGINT) AS s_es,
                     CAST(len(list_intersect(toks, ${inList(stopZh)})) AS BIGINT) AS s_zh
                   FROM t),
             p AS (SELECT *,
                     CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
                          WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
                          WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
                          WHEN s_es >= s_zh THEN 'es'
                          ELSE 'zh' END AS pred_lang
                   FROM sc)
             SELECT doc_id, lang, s_en, s_de, s_fr, s_es, s_zh, pred_lang,
                    CAST(lang = pred_lang AS BIGINT) AS is_match
             FROM p ORDER BY doc_id"""))

  /** Length / punctuation / stopword quality score. Every ratio divides
    * two engine-identical integers in double precision, and the
    * composite multiplies them in one fixed order — bit-identical to
    * the oracle without any rounding.
    */
  private val q82 = Qdef(
    "q82_quality_score", {
      (s, d) =>
        val toks = tokens(col("text"))
        Tables.documents(s, d)
          .select(col("doc_id"),
            nCharsM(col("text")).as("n_chars_m"),
            nWsTokens(col("text")).as("n_tokens"),
            length(regexp_replace(col("text"), "\\s", "")).cast("long").as("n_nonws_chars"),
            nPunctChars(col("text")).as("n_punct_chars"),
            distinctHits(toks, stopEn).cast("long").as("n_stop_hits"))
          .withColumn("mean_tok_len", col("n_nonws_chars").cast("double") / col("n_tokens").cast("double"))
          // n_tokens >= 1 always (split of "" is [""]), but n_chars_m
          // is 0 for an empty document: guard the one ratio whose
          // denominator can vanish — 0/0 is engine- and mode-dependent
          // (IEEE NaN vs NULL vs ANSI error), and a NaN quality passes
          // Spark's NaN-greatest comparison while DuckDB disagrees
          .withColumn("punct_ratio",
            when(col("n_chars_m") > 0,
              col("n_punct_chars").cast("double") / col("n_chars_m").cast("double"))
              .otherwise(lit(0.0)))
          .withColumn("stop_ratio", col("n_stop_hits").cast("double") / col("n_tokens").cast("double"))
          // the SHARED definition (TextFunctions.qualityScore) — the
          // same expression tree the projected ratio columns above
          // came from, so values are identical; Curate composes it too
          .withColumn("quality",
            qualityScore(col("n_tokens"), col("n_chars_m"), col("n_punct_chars"), col("n_stop_hits")))
          .orderBy("doc_id")
    },
    Some(s"""WITH m AS (SELECT doc_id,
                    CAST(length(text) AS BIGINT) AS n_chars_m,
                    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
                    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS n_nonws_chars,
                    CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct_chars,
                    CAST(len(list_intersect(string_split_regex(trim(lower(text)), '\\s+'), ${inList(stopEn)})) AS BIGINT) AS n_stop_hits
                  FROM documents),
             r AS (SELECT *,
                    CAST(n_nonws_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS mean_tok_len,
                    CASE WHEN n_chars_m > 0
                         THEN CAST(n_punct_chars AS DOUBLE) / CAST(n_chars_m AS DOUBLE)
                         ELSE 0.0 END AS punct_ratio,
                    CAST(n_stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio
                  FROM m)
             SELECT doc_id, n_chars_m, n_tokens, n_nonws_chars, n_punct_chars, n_stop_hits,
                    mean_tok_len, punct_ratio, stop_ratio,
                    least(1.0, CAST(n_tokens AS DOUBLE) / 200.0) * (1.0 - punct_ratio) * (0.5 + 0.5 * stop_ratio) AS quality
             FROM r ORDER BY doc_id"""))

  /** Bottom-k document fingerprint: md5 of the 8 smallest md5(3-gram
    * shingle) hashes — a public winnowing/bottom-k sketch whose hash
    * (md5) both engines share, so the WHOLE query is oracle-checkable
    * (the r1 xxhash64 variant was rows-only: DuckDB has no xxhash64).
    * The rolling-hash sketch stays available as
    * [[graft.functions.TextFunctions.fingerprintSketch]] (invariants
    * covered in DedupAnnSpec).
    *
    * Driver contract (CORRECTNESS r1 lesson): every output column must
    * be SCALAR — the harness sorts/hashes columns with pandas, which
    * cannot factorize an array column.
    *
    * Scale: one codegen'd scan; the only interpreted piece is the
    * per-doc `transform(_, md5)` (one pass over each doc's shingles,
    * no shuffle, no pairwise work).
    */
  private val q83 = Qdef(
    "q83_fingerprint",
    (s, d) => {
      val sh = call_function("graft_shingle_strings", col("text"), lit(3))
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"), transform(sh, x => md5(x)).as("hs"))
        .select(col("doc_id"),
          md5(col("text")).as("doc_digest"),
          md5(concat_ws("", slice(sort_array(col("hs")), 1, 8))).as("fingerprint"),
          coalesce(array_min(col("hs")), lit("")).as("min_shingle_md5"),
          coalesce(size(col("hs")), lit(0)).cast("long").as("n_shingles"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (SELECT doc_id, text, string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
            h AS (SELECT doc_id, text,
                    CASE WHEN len(toks) >= 3
                         THEN list_transform(generate_series(1, len(toks) - 2),
                                i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                         ELSE CAST([] AS VARCHAR[]) END AS hs
                  FROM t)
            SELECT doc_id,
                   md5(text) AS doc_digest,
                   md5(array_to_string(list_sort(hs)[1:8], '')) AS fingerprint,
                   coalesce(list_min(hs), '') AS min_shingle_md5,
                   CAST(len(hs) AS BIGINT) AS n_shingles
            FROM h ORDER BY doc_id"""))

  /** Corpus bigram vocabulary: top-50 word bigrams by occurrence —
    * the vocabulary-building shape (explode per-row shingles, one
    * count shuffle with map-side combine, top-k). Deterministic ties
    * by bigram text.
    */
  private val q84 = Qdef(
    "q84_ngram_vocab",
    (s, d) =>
      Tables.documents(s, d)
        // outer-explode + null filter: stops InferFiltersFromGenerate
        // planting two extra shingle_strings evaluations in the scan
        // (the q6h lesson)
        .select(explode_outer(call_function("graft_shingle_strings", col("text"), lit(2))).as("bigram"))
        .filter(col("bigram").isNotNull)
        .groupBy("bigram")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(50),
    Some("""WITH t AS (SELECT string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
            g AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1])) AS bigram
                  FROM t WHERE len(toks) >= 2)
            SELECT bigram, COUNT(*) AS n FROM g GROUP BY bigram
            ORDER BY n DESC, bigram LIMIT 50"""))

  /** Gopher/C4-style per-document repetition metrics: duplicate-token
    * fraction, top-token fraction, top-bigram fraction. The most
    * frequent element's multiplicity is computed as the longest equal
    * run of the SORTED token/bigram array (codegen'd
    * [[graft.functions.MaxRunLength]]) — documents are independent, so
    * the whole query is one narrow codegen'd scan: no explode, no
    * per-doc groupBy shuffle, which is what keeps it linear at 100 TB.
    * The oracle computes the same multiplicities the orthodox way
    * (unnest + GROUP BY + MAX) — two different algorithms, identical
    * integers, so every frac divides bit-identically.
    */
  private val q85 = Qdef(
    "q85_repetition", {
      (s, d) =>
        val toks = tokens(col("text"))
        val bigrams = call_function("graft_shingle_strings", col("text"), lit(2))
        Tables.documents(s, d)
          .select(col("doc_id"),
            size(toks).cast("long").as("n_tokens"),
            size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
            call_function("graft_max_run", sort_array(toks)).cast("long").as("top_token_count"),
            coalesce(call_function("graft_max_run", sort_array(bigrams)), lit(0))
              .cast("long").as("top_bigram_count"),
            coalesce(size(bigrams), lit(0)).cast("long").as("n_bigrams"))
          .withColumn("dup_token_frac",
            (col("n_tokens") - col("n_distinct_tokens")).cast("double") /
              col("n_tokens").cast("double"))
          .withColumn("top_token_frac",
            col("top_token_count").cast("double") / col("n_tokens").cast("double"))
          .withColumn("top_bigram_frac",
            when(col("n_bigrams") > 0,
              col("top_bigram_count").cast("double") / col("n_bigrams").cast("double"))
              .otherwise(lit(0.0)))
          .orderBy("doc_id")
    },
    Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
            base AS (SELECT doc_id,
                       CAST(len(toks) AS BIGINT) AS n_tokens,
                       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
                       CAST(CASE WHEN len(toks) >= 2 THEN len(toks) - 1 ELSE 0 END AS BIGINT) AS n_bigrams
                     FROM t),
            tokc AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_token_count FROM (
                       SELECT doc_id, tk, COUNT(*) AS c
                       FROM (SELECT doc_id, unnest(toks) AS tk FROM t) GROUP BY doc_id, tk)
                     GROUP BY doc_id),
            bgc AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram_count FROM (
                      SELECT doc_id, b, COUNT(*) AS c
                      FROM (SELECT doc_id,
                              unnest(list_transform(generate_series(1, len(toks) - 1),
                                i -> toks[i] || ' ' || toks[i+1])) AS b
                            FROM t WHERE len(toks) >= 2) GROUP BY doc_id, b)
                    GROUP BY doc_id)
            SELECT base.doc_id, n_tokens, n_distinct_tokens, top_token_count,
                   COALESCE(top_bigram_count, 0) AS top_bigram_count, n_bigrams,
                   CAST(n_tokens - n_distinct_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS dup_token_frac,
                   CAST(top_token_count AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_token_frac,
                   CASE WHEN n_bigrams > 0
                        THEN CAST(COALESCE(top_bigram_count, 0) AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
                        ELSE 0.0 END AS top_bigram_frac
            FROM base JOIN tokc USING (doc_id) LEFT JOIN bgc USING (doc_id)
            ORDER BY doc_id"""))

  /** Deterministic train/val/test split — the standard
    * hash-the-stable-id recipe (e.g. C4/Dolma-style pipelines): bucket
    * by the first two hex chars of md5(doc_id), ~80/10/10. Hashing
    * beats rand() for the same reason the skew salts do
    * ([[graft.operators.Skew]]): stage retries and later re-runs
    * reproduce the exact same assignment, and adding documents never
    * reshuffles existing ones between splits. md5 is shared by both
    * engines, so the whole assignment is oracle-checkable; the split
    * decision itself is a comparison on the hex prefix (no numeric
    * conversion needed). One narrow map + one partial-agg shuffle.
    */
  private val q86 = Qdef(
    "q86_hash_split", {
      (s, d) =>
        Tables.documents(s, d)
          .withColumn("split", hashSplit(col("doc_id")))
          .groupBy("split", "lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("sum_chars"),
            min("doc_id").as("min_doc_id"))
          .orderBy("split", "lang")
    },
    Some("""WITH a AS (SELECT lang, doc_id, n_chars,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
                        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                        ELSE 'test' END AS split
                 FROM documents)
            SELECT split, lang, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   MIN(doc_id) AS min_doc_id
            FROM a GROUP BY split, lang ORDER BY split, lang"""))

  /** Deterministic per-source sampling for mixture construction (keep
    * source A at 100%, B at 25%, ... — the public Pile/Dolma-style
    * weighting step). Same hash-threshold recipe as [[q86]]'s split,
    * with TWO deliberate differences: a per-source rate expressed as a
    * 4-hex-char threshold (65536 levels), and a ":mix" salt on the
    * hashed id so the keep/drop decision is INDEPENDENT of the split
    * assignment — sharing q86's raw md5(doc_id) prefix would send
    * every low-rate survivor into the train split. Pure narrow filter
    * + one partial-agg shuffle.
    *
    * Sources NOT named in `rates` are EXCLUDED (rate 0): a mixture
    * recipe is an allowlist — the named weights define the corpus,
    * and an unlisted source flowing through at an implicit 1.0 would
    * silently swamp the mix it was omitted from. Pass an explicit
    * `src -> 1.0` to keep a source whole.
    */
  def sampleByRates(docs: org.apache.spark.sql.DataFrame,
      rates: Map[String, Double]): org.apache.spark.sql.DataFrame = {
    val bucket = substring(
      md5(concat(col("doc_id").cast("string"), lit(":mix")).cast("binary")), 1, 4)
    val keep = rates.foldLeft(lit(false)) { case (acc, (src, r)) =>
      when(col("source") === src,
        if (r >= 1.0) lit(true)
        else bucket < lit(f"${(r * 65536).toLong}%04x")).otherwise(acc)
    }
    docs.filter(keep)
  }

  private val mixRates: Map[String, Double] =
    (0 until 20).map(i => s"src$i" -> (i % 4 match {
      case 0 => 1.0
      case 1 => 0.5
      case 2 => 0.25
      case 3 => 0.1
    })).toMap

  private val q87 = Qdef(
    "q87_source_mix",
    (s, d) =>
      sampleByRates(Tables.documents(s, d), mixRates)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("sum_chars"))
        .orderBy("source"),
    Some {
      val cases = mixRates.toSeq.sorted.map { case (src, r) =>
        if (r >= 1.0) s"WHEN source = '$src' THEN TRUE"
        else f"WHEN source = '$src' THEN substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 4) < '${(r * 65536).toLong}%04x'"
      }.mkString(" ")
      s"""SELECT source, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
          FROM documents WHERE CASE $cases ELSE FALSE END
          GROUP BY source ORDER BY source"""
    })

  /** q8h: overlapping context-window chunking — q88's complement: the
    * packer assembles SHORT docs into fixed windows, this op cuts
    * LONG docs down into width-token chunks every `stride` tokens
    * (overlap = width − stride carries context across boundaries, the
    * standard RAG/pretraining chunker). The rule both engines
    * implement: n_chunks = ⌈sz / stride⌉ (integral DIV — a double
    * ceil has the q6h off-by-one exactly where stride divides sz),
    * starts stride-aligned, every token in ≥ 1 chunk, tail chunks may
    * run short. Scale: ONE narrow projection + a posexplode whose
    * fan-out is sz/stride per doc — no shuffle anywhere except the
    * oracle's total ORDER BY; `slice` on the tokens array means the
    * text is tokenized once per doc, not once per chunk.
    */
  def chunkOverlap(docs: org.apache.spark.sql.DataFrame, width: Int, stride: Int)
      : org.apache.spark.sql.DataFrame = {
    require(width > 0 && stride > 0 && stride <= width,
      s"need 0 < stride <= width, got width=$width stride=$stride")
    docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"), size(col("t")).as("sz"))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), expr(s"(sz - 1) DIV $stride"))).as("i"))
      .select(col("doc_id"),
        col("i").cast("long").as("chunk_id"),
        (col("i") * stride).cast("long").as("start_tok"),
        slice(col("t"), col("i") * stride + 1, lit(width)).as("c"))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        size(col("c")).cast("long").as("n_tokens"),
        array_join(col("c"), " ").as("chunk_text"))
  }

  private val q8h = Qdef(
    "q8h_chunk_overlap",
    (s, d) => chunkOverlap(Tables.documents(s, d), width = 64, stride = 48)
      .orderBy("doc_id", "chunk_id"),
    Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
            s AS (SELECT doc_id, toks, len(toks) AS sz FROM t),
            c AS (SELECT doc_id, toks,
                    unnest(generate_series(0, (sz - 1) // 48)) AS i
                  FROM s),
            f AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
                    CAST(i * 48 AS BIGINT) AS start_tok,
                    toks[i*48+1 : i*48+64] AS ch
                  FROM c)
            SELECT doc_id, chunk_id, start_tok,
                   CAST(len(ch) AS BIGINT) AS n_tokens,
                   array_to_string(ch, ' ') AS chunk_text
            FROM f ORDER BY doc_id, chunk_id"""))

  /** Concat-and-chunk sequence packing: per source shard, documents
    * are concatenated in doc_id order and cut into fixed
    * `budget`-token training chunks (docs may straddle a boundary —
    * the standard pretraining packer). A partitioned running sum
    * assigns each doc its chunk span; chunk stats aggregate the
    * spans. The window partitions by source — an unpartitioned global
    * cumsum would serialize 100 TB through one task; per-shard packing
    * is also what any parallel packer does in practice. Shuffles: one
    * per-shard window sort + the chunk aggregate.
    */
  private val q88 = Qdef(
    "q88_pack_chunks",
    (s, d) =>
      packChunks(Tables.documents(s, d), budget = 256L, shards = 2)
        .orderBy("source", "shard", "chunk"),
    Some("""WITH t AS (SELECT doc_id, source, doc_id % 2 AS shard,
                   CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
                 FROM documents),
            c AS (SELECT *,
                   CAST(SUM(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_after,
                   CAST(SUM(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS cum_before
                  FROM t),
            e AS (SELECT source, shard, doc_id, cum_before, cum_after,
                   unnest(generate_series(cum_before // 256, (cum_after - 1) // 256)) AS chunk
                  FROM c),
            x AS (SELECT source, shard, chunk,
                   least(cum_after, (chunk + 1) * 256) -
                   greatest(cum_before, chunk * 256) AS toks_in_chunk
                  FROM e)
            SELECT source, shard, chunk, COUNT(*) AS n_docs,
                   CAST(SUM(toks_in_chunk) AS BIGINT) AS n_tokens
            FROM x GROUP BY source, shard, chunk ORDER BY source, shard, chunk"""))

  /** Packing worker: per (source, shard) the docs are concatenated in
    * doc_id order and cut into `budget`-token chunks. `shards`
    * sub-divides each source deterministically (`doc_id % shards`) —
    * window parallelism is #sources × shards, so a corpus with few
    * huge sources still spreads across the cluster; each shard packs
    * independently, exactly like parallel packer workers do.
    */
  def packChunks(docs: org.apache.spark.sql.DataFrame, budget: Long,
      shards: Int = 1): org.apache.spark.sql.DataFrame = {
    // ROWS frame, not the default RANGE: rows tied on doc_id (a
    // caller violating doc_id uniqueness) would share one cum_after
    // under RANGE and their spans double-count — same guard as
    // TrainingRun's packer, oracle framed identically
    val w = Window.partitionBy("source", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), col("source"), (col("doc_id") % shards).as("shard"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("cum_after", sum("n_tokens").over(w))
      .withColumn("cum_before", col("cum_after") - col("n_tokens"))
      .withColumn("chunk",
        explode(sequence(expr(s"cum_before div $budget"),
          expr(s"(cum_after - 1) div $budget"))))
      // tokens of this doc landing inside this chunk
      .withColumn("toks_in_chunk",
        least(col("cum_after"), (col("chunk") + 1) * budget) -
          greatest(col("cum_before"), col("chunk") * budget))
      .groupBy("source", "shard", "chunk")
      .agg(count(lit(1)).as("n_docs"), sum("toks_in_chunk").as("n_tokens"))
  }

  /** BM25 keyword scoring (k1=1.2, b=0.75, Lucene-style
    * idf = ln(1 + (N-df+0.5)/(df+0.5))) over whitespace tokens.
    *
    * Scale shape: per-doc term frequencies are a narrow map (no
    * inverted index needed for a fixed small query-term set); the
    * corpus stats (N, Σdl, per-term df) are ONE tiny global aggregate
    * broadcast back — so the whole query is two scans and zero big
    * shuffles. Scores are rounded to 4 dp and the ORDER BY uses the
    * rounded value, so the ranking is stable across engines (the only
    * transcendental, ln, is term-global).
    */
  def bm25(docs: org.apache.spark.sql.DataFrame, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, topN: Int = 20): org.apache.spark.sql.DataFrame = {
    val base = docs.select(
      col("doc_id") +:
        size(tokens(col("text"))).cast("long").as("dl") +:
        terms.map(t =>
          size(filter(tokens(col("text")), x => x === lit(t))).cast("long").as(s"tf_$t")): _*)
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      sum("dl").as("sum_dl") +:
        terms.map(t => sum((col(s"tf_$t") > 0).cast("long")).as(s"df_$t")): _*)
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val score = terms.map { t =>
      val tf = col(s"tf_$t").cast("double")
      val df = col(s"df_$t").cast("double")
      val idf = log(lit(1.0) + (col("n_docs").cast("double") - df + lit(0.5)) / (df + lit(0.5)))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl))
    }.reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .withColumn("score_r", round(score, 4))
      .select(col("doc_id") +: col("dl") +: terms.map(t => col(s"tf_$t")) :+ col("score_r"): _*)
      .orderBy(col("score_r").desc, col("doc_id"))
      .limit(topN)
  }

  private val bm25Terms = Seq("merge", "filter", "stream")

  /** The BM25 scoring pipeline as chained DuckDB CTEs (t → base →
    * stats → sc, ending in per-doc `score_r`) — ONE definition shared
    * by the q8a oracle and q8g's lexical leg, so the two can never
    * drift on the scoring arithmetic.
    */
  private def bm25Ctes(terms: Seq[String]): String = {
    val tfCols = terms.map(t =>
      s"CAST(len(list_filter(toks, x -> x = '$t')) AS BIGINT) AS tf_$t").mkString(", ")
    val dfCols = terms.map(t =>
      s"CAST(SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t").mkString(", ")
    val scoreTerms = terms.map(t =>
      s"""ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_$t AS DOUBLE) + 0.5) / (CAST(df_$t AS DOUBLE) + 0.5))
          * (CAST(tf_$t AS DOUBLE) * 2.2)
          / (CAST(tf_$t AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))""")
      .mkString(" + ")
    s"""t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents),
        base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, $tfCols FROM t),
        stats AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl, $dfCols FROM base),
        sc AS (SELECT doc_id, dl, ${terms.map(t => s"tf_$t").mkString(", ")},
                 round($scoreTerms, 4) AS score_r
               FROM base, stats)"""
  }

  private val q8a = Qdef(
    "q8a_bm25",
    (s, d) => bm25(Tables.documents(s, d), bm25Terms),
    Some(
      s"""WITH ${bm25Ctes(bm25Terms)}
          SELECT doc_id, dl, ${bm25Terms.map(t => s"tf_$t").mkString(", ")}, score_r
          FROM sc ORDER BY score_r DESC, doc_id LIMIT 20"""))

  /** Default PII-shaped patterns (RE2-compatible, so the same strings
    * run in Java regex and DuckDB): email, IPv4, phone-ish digit runs.
    * The synthetic corpus contains none of these (no digits at all) —
    * redaction behavior on matching text is covered by the synthetic
    * spec in TextQualitySpec; [[q89]] exercises the same operator
    * non-vacuously with a word pattern that does occur.
    */
  val piiPatterns: Seq[String] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b",
    "\\+?\\d[\\d\\s().-]{6,}\\d")

  /** Redact every match of `patterns` in `textCol`, counting matches
    * per row. One narrow codegen'd map — no shuffle, no UDF.
    */
  def scrubPatterns(docs: org.apache.spark.sql.DataFrame, textCol: String,
      patterns: Seq[String], replacement: String = "[REDACTED]"): org.apache.spark.sql.DataFrame = {
    val pat = patterns.map(p => s"(?:$p)").mkString("|")
    docs
      .withColumn("n_redactions",
        size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long"))
      .withColumn(textCol, regexp_replace(col(textCol), pat, replacement))
  }

  private val redactPat = "\\b(?:customer|vector|stream)\\b"

  private val q89 = Qdef(
    "q89_redact",
    (s, d) =>
      scrubPatterns(Tables.documents(s, d), "text", Seq(redactPat))
        .select(col("doc_id"), col("n_redactions"),
          md5(col("text").cast("binary")).as("scrubbed_hash"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
            CAST(len(regexp_extract_all(text, '\b(?:customer|vector|stream)\b', 0)) AS BIGINT) AS n_redactions,
            md5(regexp_replace(text, '\b(?:customer|vector|stream)\b', '[REDACTED]', 'g')) AS scrubbed_hash
            FROM documents ORDER BY doc_id"""))

  /** Deterministic global corpus shuffle — the shuffle-before-sharding
    * step of a training pipeline, keyed by md5(seed:doc_id) instead of
    * rand() for the usual reasons (stage-retry stability, exact
    * reproducibility per seed, and a NEW seed gives an independent
    * order). Sorting by the hash is a range-partitioned sort — it
    * scales out; no single task ever sees the whole corpus.
    */
  /** The ONE definition of the shuffle key — shared by the query form
    * below and [[graft.sources.Sources.shardedShuffleWrite]] (the two
    * must order identically or the written shards would not be a
    * prefix-consistent extension of the query's sample).
    */
  def shuffleKey(seed: String): org.apache.spark.sql.Column =
    md5(concat(lit(s"$seed:"), col("doc_id").cast("string")).cast("binary"))

  def deterministicShuffle(docs: org.apache.spark.sql.DataFrame, seed: String): org.apache.spark.sql.DataFrame =
    docs
      .withColumn("shuffle_key", shuffleKey(seed))
      .orderBy("shuffle_key")

  /** Query form: first 50 docs of seed "s42"'s order. Sort + limit
    * plans as TakeOrderedAndProject (per-partition top-50, tiny driver
    * merge — no global sort materialization).
    */
  private val q8b = Qdef(
    "q8b_shuffle",
    (s, d) =>
      deterministicShuffle(Tables.documents(s, d), "s42")
        .select("doc_id", "shuffle_key")
        .limit(50)
        // explicit logical order: limit alone guarantees nothing about
        // row order (today Sort+Limit fuses into TakeOrdered, but the
        // hash gate must not depend on a physical-plan detail)
        .orderBy("shuffle_key"),
    Some("""SELECT doc_id, md5('s42:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
            FROM documents ORDER BY shuffle_key LIMIT 50"""))

  /** Statistical LM quality scoring (the KenLM-style perplexity-proxy
    * filter of public pipelines, with the corpus itself as the model):
    * score each doc by its mean bigram log-probability under the
    * corpus bigram model, P(w2|w1) ≈ C(w1 w2)/C(w1).
    *
    * Scale shape: the model is two count aggregations (bigram,
    * unigram) over the corpus. Its row count is the number of DISTINCT
    * OBSERVED BIGRAMS — which on natural text grows with the corpus
    * (Heaps-law), not just the vocabulary — so the scoring join
    * carries no broadcast hint: size stats/AQE broadcast a small model
    * (closed domains, pruned models) and shuffle-join a large one on
    * the bigram key. Production LM filters prune the model (min-count,
    * top-K) precisely to keep it broadcastable. Cross-engine hash
    * exactness: each distinct bigram's log-prob is rounded to 8 dp
    * (ln is per-MODEL-ENTRY, not per-occurrence) and summed as
    * DECIMAL(28,10) — exact, order-independent addition — before one
    * final double division by the bigram count.
    */
  def lmScore(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // outer-explode on both tokenizing scans (the q6h lesson — see
    // contaminated); the final per-doc left join keeps the cheap id
    // scan
    val fanned = docs
    val bigrams = fanned.select(col("doc_id"),
      explode_outer(call_function("graft_shingle_strings", col("text"), lit(2))).as("bigram"))
      .filter(col("bigram").isNotNull)
    val bigramCounts = bigrams.groupBy("bigram").agg(count(lit(1)).as("cb"))
    val unigramCounts = fanned
      .select(explode_outer(tokens(col("text"))).as("w"))
      .filter(col("w").isNotNull)
      .groupBy("w").agg(count(lit(1)).as("cu"))
    val model = bigramCounts
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .join(unigramCounts, col("w1") === col("w"))
      .select(col("bigram"),
        round(log(col("cb").cast("double") / col("cu").cast("double")), 8)
          .cast("decimal(28,10)").as("logp"))
    val scored = bigrams
      .join(model, "bigram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("logp").as("sum_logp"))
      .withColumn("avg_logp", col("sum_logp").cast("double") / col("n_bigrams").cast("double"))
    docs.select("doc_id").join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("avg_logp"), lit(0.0)).as("avg_logp"))
  }

  private val q8c = Qdef(
    "q8c_lm_score",
    (s, d) => lmScore(Tables.documents(s, d)).orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
            b AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1])) AS bigram
                  FROM t WHERE len(toks) >= 2),
            cb AS (SELECT bigram, COUNT(*) AS cb FROM b GROUP BY bigram),
            cu AS (SELECT w, COUNT(*) AS cu FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
            model AS (SELECT bigram,
                    CAST(round(ln(CAST(cb AS DOUBLE) / CAST(cu AS DOUBLE)), 8) AS DECIMAL(28,10)) AS logp
                  FROM cb JOIN cu ON split_part(bigram, ' ', 1) = w),
            sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams, SUM(logp) AS sum_logp
                   FROM b JOIN model USING (bigram) GROUP BY doc_id)
            SELECT d.doc_id,
                   COALESCE(n_bigrams, 0) AS n_bigrams,
                   COALESCE(CAST(sum_logp AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 0.0) AS avg_logp
            FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
            ORDER BY d.doc_id"""))

  /** Learn `nMerges` BPE merges from the corpus — the vocabulary-
    * construction step of a tokenizer pipeline. The DISTRIBUTED part
    * is the word-frequency aggregation (one count shuffle over the
    * corpus, map-side combined); merge learning then runs on the
    * collected word-count table, which is vocab-bounded (≪ corpus —
    * the same corpus/vocab split every public BPE trainer makes:
    * counts once over the data, trains on the counts). Ties break by
    * (count desc, pair lexicographic), so the learned merges are
    * deterministic for a given corpus.
    *
    * The collected table is PRUNED on the cluster side first — at web
    * scale the distinct whitespace-token table (typos, URLs, numbers)
    * reaches 10⁸–10⁹ rows and an unpruned collect is a driver OOM.
    * `minCount` drops hapax-ish noise in the count aggregate itself
    * (the standard frequency-pruning step of public BPE trainers);
    * `maxVocab` caps the driver table to the top-V words by
    * (count desc, word asc) via a TakeOrdered plan, so the driver
    * never receives more than V rows no matter the corpus. Defaults
    * (minCount=1, maxVocab=2²²) are behavior-identical on any corpus
    * whose distinct-word table fits the cap — the gate corpora are
    * thousands of words — while bounding the collect at ~4M rows
    * (tens of MB) by construction. Merge learning is order-independent
    * (pair counting is commutative; ties break by value), so the
    * TakeOrdered's row order does not leak into the result.
    *
    * Returns (left_symbol, right_symbol, weighted_pair_count) in
    * merge order.
    */
  def bpeMerges(docs: org.apache.spark.sql.DataFrame, nMerges: Int,
                minCount: Long = 1L, maxVocab: Int = 1 << 22): Seq[(String, String, Long)] = {
    require(maxVocab > 0, s"maxVocab must be positive, got $maxVocab")
    val wordCounts: Array[(Array[String], Long)] = docs
      .select(explode(tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxVocab)
      .collect()
      .map { r =>
        // split on CODE POINTS, not UTF-16 units: per-char would break
        // astral-plane characters (emoji, CJK ext-B) into unpaired
        // surrogate halves and learn garbage symbols
        val syms = r.getString(0).codePoints().toArray
          .map(cp => new String(Character.toChars(cp)))
        (syms, r.getLong(1))
      }
    var words = wordCounts
    val merges = Seq.newBuilder[(String, String, Long)]
    for (_ <- 0 until nMerges) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (pairCounts.nonEmpty) {
        val ((l, r), c) = pairCounts.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((l, r, c))
        words = words.map { case (syms, wc) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              out += l + r; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, wc)
        }
      }
    }
    merges.result()
  }

  /** q8e: corpus-wide BPE ENCODE — the other half of the tokenizer
    * pipeline (q8d learns the merge table; this applies it). Returns
    * (doc_id, tokens) with the document's BPE token sequence under the
    * learner's canonicalization.
    *
    * Scale shape: learning is q8d's one map-side-combined word-count
    * shuffle + a vocab-bounded driver loop; encoding is a pure narrow
    * codegen map ([[graft.functions.BpeEncode]]) with the rank table
    * plan-embedded (~1 MB at GPT-2's 50k merges) — the whole corpus
    * tokenizes without a single exchange, at any corpus size.
    */
  def bpeTokens(docs: org.apache.spark.sql.DataFrame, merges: Seq[(String, String)]): org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"), bpeEncode(col("text"), merges).as("tokens"))

  /** The DuckDB twin of the BPE merge loop, UNROLLED: `n` chained CTE
    * stages, each reproducing one learner iteration exactly — pair
    * counting over adjacent symbol zips, argmax with the (count desc,
    * pair lexicographic) tie-break, then the leftmost-greedy
    * non-overlapping merge apply via gaps-and-islands (a run of k
    * consecutive match positions merges at odd ranks within the run,
    * which IS the learner's i+=2 skip). The iteration count is pinned
    * by the query form, so "iterative loop" stops being a reason the
    * twin can't exist: the loop is finite and data-independent, so it
    * unrolls into one SQL string (the qa3 chained-CTE precedent).
    * MATERIALIZED on every stage: p/e both read the previous words
    * state, and an inlining engine would otherwise double the work
    * per level (2^n blowup).
    *
    * Validity bounds, stated rather than hoped: (1) tokenizer parity
    * (lower → trim → '\s+' split, code-point symbols via
    * string_split(w,'')) is the q80/q84 convention already
    * driver-hash-verified; (2) minCount=1/maxVocab=2²² must not bind
    * (gate corpora: thousands of distinct words vs a 4M cap); (3) the
    * lexicographic tie-break compares Scala UTF-16 vs DuckDB UTF-8
    * binary — identical below U+10000; a TIE between astral-plane
    * pairs could diverge (none exist in the gate corpora, and
    * TextQualitySpec pins the learner's own semantics independently).
    */
  private def bpeTwinCtes(n: Int): String = {
    val init =
      """tok AS MATERIALIZED (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w FROM documents),
        |wc AS MATERIALIZED (SELECT w, count(*) AS c FROM tok WHERE w <> '' GROUP BY w),
        |w0 AS MATERIALIZED (SELECT w, c, string_split(w, '') AS syms FROM wc)""".stripMargin
    val steps = (1 to n).map { k =>
      s""",
         |p$k AS MATERIALIZED (
         |  SELECT u.pr[1] AS l, u.pr[2] AS r, CAST(sum(c) AS BIGINT) AS pc
         |  FROM w${k - 1}, unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)])) AS u(pr)
         |  GROUP BY 1, 2),
         |m$k AS MATERIALIZED (SELECT l, r, pc FROM p$k ORDER BY pc DESC, l, r LIMIT 1),
         |e$k AS MATERIALIZED (
         |  SELECT w, c, g.i AS pos, syms[g.i] AS sym, syms[g.i + 1] AS nxt,
         |         (syms[g.i] = m.l AND syms[g.i + 1] = m.r) AS mt
         |  FROM w${k - 1} LEFT JOIN m$k m ON TRUE,
         |       unnest(generate_series(1, len(syms))) AS g(i)),
         |h$k AS MATERIALIZED (
         |  SELECT *, CASE WHEN mt THEN (row_number() OVER (PARTITION BY w, isl ORDER BY pos) % 2 = 1)
         |            ELSE FALSE END AS strt
         |  FROM (SELECT *, CASE WHEN mt THEN pos - row_number() OVER (PARTITION BY w, mt ORDER BY pos) END AS isl
         |        FROM e$k)),
         |i$k AS MATERIALIZED (
         |  SELECT *, coalesce(lag(strt) OVER (PARTITION BY w ORDER BY pos), FALSE) AS consumed FROM h$k),
         |w$k AS MATERIALIZED (
         |  SELECT w, c, list(CASE WHEN strt THEN sym || nxt ELSE sym END ORDER BY pos) AS syms
         |  FROM i$k WHERE NOT consumed GROUP BY w, c)""".stripMargin
    }
    init + steps.mkString
  }

  /** Query form: learn 30 merges, encode, report per-doc token and
    * distinct-token counts. The twin exploits the learner/encoder
    * equivalence BpeEncodeSpec proves (replaying merges in rank order
    * equals the greedy-priority encode): the unrolled learner's FINAL
    * words state after 30 iterations IS each distinct word's encoded
    * symbol sequence, so per-doc stats are a join from the document's
    * word occurrences back to that state — no second encode pass.
    */
  private val q8e = Qdef(
    "q8e_bpe_encode",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val merges = bpeMerges(docs, 30).map { case (l, r, _) => (l, r) }
      // spread (r14): the per-doc BPE encode loop fused onto the
      // single-row-group scan ran on one core — and the total ORDER BY
      // range-samples its child, so the encode was paid twice, both
      // times single-threaded. Measured 1.1 s → 0.5-0.75 s at sf0.1;
      // no-op on multi-split inputs, per-row encode is row-order-free.
      bpeTokens(Tables.spread(docs), merges)
        .select(col("doc_id"),
          size(col("tokens")).cast("long").as("n_tokens"),
          size(array_distinct(col("tokens"))).cast("long").as("n_distinct"))
        .orderBy("doc_id")
    },
    Some(s"""WITH ${bpeTwinCtes(30)},
             |dt AS MATERIALIZED (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w FROM documents),
             |dj AS MATERIALIZED (
             |  SELECT d.doc_id, v.syms FROM dt d JOIN w30 v USING (w) WHERE d.w <> ''),
             |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |               CAST(count(DISTINCT u.s) AS BIGINT) AS n_distinct
             |        FROM dj, unnest(syms) AS u(s) GROUP BY doc_id)
             |SELECT s.doc_id, coalesce(a.n_tokens, 0) AS n_tokens, coalesce(a.n_distinct, 0) AS n_distinct
             |FROM documents s LEFT JOIN agg a USING (doc_id) ORDER BY s.doc_id""".stripMargin))

  /** Query form: first 20 merges with ranks, hash-checked against the
    * unrolled 20-stage DuckDB twin (see [[bpeTwinCtes]]).
    * TextQualitySpec additionally pins a hand-computed example and the
    * first-merge-equals-brute-force invariant on the real corpus.
    */
  private val q8d = Qdef(
    "q8d_bpe_merges",
    (s, d) => {
      val spark = s
      import spark.implicits._
      bpeMerges(Tables.documents(s, d), 20).zipWithIndex
        .map { case ((l, r, c), i) => (i.toLong + 1, l, r, c) }
        .toDF("rank", "left", "right", "pair_count")
    },
    Some {
      val union = (1 to 20).map { k =>
        s"""SELECT CAST($k AS BIGINT) AS rank, l AS "left", r AS "right", pc AS pair_count FROM m$k"""
      }.mkString("\nUNION ALL ")
      s"WITH ${bpeTwinCtes(20)}\n$union\nORDER BY rank"
    })

  /** Deterministic per-stratum BALANCED downsampling: cap every
    * stratum at ~`cap` docs by deriving each stratum's keep-rate from
    * its own mass (rate = cap/n), instead of [[sampleByRates]]'s fixed
    * configured rates — the class-rebalancing step of a training-data
    * pipeline (cap the dominant language/source instead of guessing
    * weights). Two passes, both scale-clean: one partial-agg count per
    * stratum (a handful of rows), broadcast back, then a NARROW
    * hash-threshold filter — the corpus itself never shuffles. The
    * keep decision hashes the salted doc id against an integer
    * threshold out of 2³² computed with pure integer division, so
    * both engines derive bit-identical thresholds; the ":bal" salt
    * keeps it independent of q86's split and q87's mix decisions.
    * 32 threshold bits (not q87's 16): at 16 bits any stratum past
    * cap·65536 rows floors the threshold to 0 and silently DROPS the
    * whole stratum — exactly the multi-million-doc dominant stratum
    * the cap exists for. 32 bits pushes the cliff past cap·4.3e9
    * rows, and the floor of 1 below even that keeps the sample
    * non-empty (~n/2³² ≈ cap survivors) instead of empty.
    */
  def balancedSample(
      docs: org.apache.spark.sql.DataFrame,
      strataCol: String,
      cap: Long,
      idCol: String = "doc_id"): org.apache.spark.sql.DataFrame = {
    require(cap > 0, s"balancedSample: cap must be positive, got $cap")
    // cap * 2^32 is computed in Long below: cap >= 2^31 overflows it
    // negative, and greatest(_, 1) would then floor every oversize
    // stratum's threshold to 1 — the silent near-total-drop cliff this
    // function exists to avoid, moved from n_stratum to cap. The
    // 32-bit threshold domain caps cap itself; a 2-billion-doc
    // PER-STRATUM sample wants rate-based sampleByRates anyway.
    require(cap < (1L << 31),
      s"balancedSample: cap must fit the 32-bit threshold domain (< 2^31), got $cap")
    val counts = docs.groupBy(strataCol).agg(count(lit(1)).as("n_stratum"))
      // threshold < 2^32 whenever n_stratum > cap (the only regime
      // that compares); 8 lowercase hex chars, same order as the md5
      // prefix it gates. Integral `div`, NOT `/`: Column./ is double
      // division, and truncating a double quotient is one rounding
      // step away from DuckDB's exact `//` on adversarial counts
      .withColumn("thr_hex",
        lower(lpad(hex(greatest(expr(s"${cap * 4294967296L}L div n_stratum"), lit(1L))), 8, "0")))
    val bucket = substring(
      md5(concat(col(idCol).cast("string"), lit(":bal")).cast("binary")), 1, 8)
    docs.join(broadcast(counts), strataCol)
      .filter(col("n_stratum") <= cap || bucket < col("thr_hex"))
      .drop("thr_hex")
  }

  private val q8f = Qdef(
    "q8f_stratified_sample",
    (s, d) =>
      balancedSample(Tables.documents(s, d), "lang", cap = 50)
        .groupBy("lang")
        .agg(max("n_stratum").as("n_stratum"),
          count(lit(1)).as("n_kept"),
          sum("n_chars").as("sum_chars"),
          min("doc_id").as("min_doc_id"))
        .orderBy("lang"),
    Some("""WITH c AS (SELECT lang, COUNT(*) AS n_stratum FROM documents GROUP BY lang),
            k AS (SELECT d.doc_id, d.lang, d.n_chars, c.n_stratum
                  FROM documents d JOIN c USING (lang)
                  WHERE c.n_stratum <= 50 OR
                        substr(md5(CAST(d.doc_id AS VARCHAR) || ':bal'), 1, 8)
                          < printf('%08x', greatest(50 * 4294967296 // c.n_stratum, 1)))
            SELECT lang, MAX(n_stratum) AS n_stratum, COUNT(*) AS n_kept,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   MIN(doc_id) AS min_doc_id
            FROM k GROUP BY lang ORDER BY lang"""))

  /** Hybrid retrieval — the standard RAG/curation shape: a lexical
    * BM25 leg and a semantic embedding-ANN leg retrieve candidates
    * independently, and reciprocal-rank fusion (RRF, Cormack et al.)
    * merges them: fused = Σ_legs 1/(rrfK + rank), summed over the legs
    * that returned the doc. Rank-based fusion needs no score
    * calibration between the legs, and with fixed-arity double
    * arithmetic over integer ranks the fused score is bit-identical
    * across engines — no float-aggregation noise.
    *
    * Scale shape: the lexical leg is [[bm25]] (two scans, one
    * constant-size stats broadcast, distributed TakeOrdered for the
    * top-k — the rank window then runs over the k SURVIVORS, never
    * the corpus); the semantic leg is the LSH candidate path
    * ([[graft.ann.Knn.lshTopK]]) for ONE query vector — bucket-join
    * sized, not corpus × corpus. The fusion join holds kLex + kSem
    * rows. Nothing here is corpus-quadratic.
    */
  def hybridSearch(
      docs: org.apache.spark.sql.DataFrame,
      emb: org.apache.spark.sql.DataFrame,
      terms: Seq[String],
      queryVecId: Long,
      kLex: Int = 20,
      kSem: Int = 5,
      rrfK: Int = 60,
      probe1: Boolean = false): org.apache.spark.sql.DataFrame = {
    val lex = bm25(docs, terms, topN = kLex)
      // ranking the kLex survivors: a single-partition window over a
      // limit-k frame, NOT a global window over the corpus
      .withColumn("bm25_rank",
        row_number().over(Window.orderBy(col("score_r").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("bm25_rank"))
    val sem = graft.ann.Knn.lshTopK(emb, k = kSem, probe1 = probe1,
        queryPred = col("vec_id") === queryVecId)
      .select(col("nid").as("doc_id"), col("rank").as("ann_rank"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("fused",
        coalesce(lit(1.0) / (lit(rrfK) + col("bm25_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("ann_rank")), lit(0.0)))
      .orderBy(col("fused").desc, col("doc_id"))
  }

  /** q8g entry pins `probe1 = true` — the q71 operating point where
    * the LSH leg's top-k is measured recall 1.0 vs brute force, so
    * the oracle's semantic leg can be the exhaustive scan.
    */
  private val q8g = Qdef(
    "q8g_hybrid_search",
    (s, d) => hybridSearch(Tables.documents(s, d), Tables.embeddings(s, d),
      bm25Terms, queryVecId = 0L, probe1 = true),
    Some(
      s"""WITH ${bm25Ctes(bm25Terms)},
          lex AS (SELECT doc_id, bm25_rank FROM
                    (SELECT doc_id, row_number() OVER (ORDER BY score_r DESC, doc_id) AS bm25_rank FROM sc)
                  WHERE bm25_rank <= 20),
          e AS (SELECT vec_id, embedding,
                  sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
                FROM embeddings),
          q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM e WHERE vec_id = 0),
          p AS (SELECT e.vec_id AS nid,
                  list_sum(list_transform(list_zip(q.qe, e.embedding),
                    pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))) / (q.qn * e.nrm) AS cos
                FROM e, q WHERE e.vec_id <> q.qid),
          sem AS (SELECT nid AS doc_id, ann_rank FROM
                    (SELECT nid, row_number() OVER (ORDER BY cos DESC, nid) AS ann_rank FROM p)
                  WHERE ann_rank <= 5)
          SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id, bm25_rank, ann_rank,
                 COALESCE(CAST(1.0 AS DOUBLE) / (60 + bm25_rank), CAST(0.0 AS DOUBLE))
                   + COALESCE(CAST(1.0 AS DOUBLE) / (60 + ann_rank), CAST(0.0 AS DOUBLE)) AS fused
          FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
          ORDER BY fused DESC, doc_id"""))

  val all: Seq[Qdef] =
    Seq(q80, q81, q82, q83, q84, q85, q86, q87, q88, q8a, q89, q8b, q8c, q8d, q8e, q8f, q8g, q8h)
}
