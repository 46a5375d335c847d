package graft.operators

import graft.{Qdef, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed corpus-curation pipeline — the query a training-data
  * user actually runs, end to end: quality scoring (q82's exact
  * expressions) → language filter (q81's stopword-signature argmax) →
  * exact-normalized dedup (q61's min-id-per-digest) → deterministic
  * split assignment (q86's hash buckets), finishing in a per-split
  * manifest. Every stage is the already-oracle-checked building
  * block, composed declaratively so Catalyst sees ONE plan:
  *
  *  - annotation + both filters fuse into a single codegen'd scan
  *    stage (no shuffle until dedup — predicate order is the
  *    optimizer's problem, not ours);
  *  - dedup is ONE aggregate: groupBy(16-byte digest) with
  *    min_by(whole-row, doc_id) — map-side partial aggregation
  *    absorbs hot boilerplate texts (the q68 lesson: never a window
  *    over a skewable content key), and carrying the survivor row
  *    through the agg means the scan runs ONCE (a min-id + join-back
  *    formulation would plan the annotated scan as two independent
  *    subtrees and read the corpus twice);
  *  - the split column is a pure narrow map, and the final manifest
  *    is one partial-agg shuffle on (split, source).
  *
  * At 100 TB: scan → two exchanges (digest, manifest key) → done;
  * survivors of the filters bound the dedup shuffle (its payload is
  * the kept rows — the same bytes the join-back variant ships to its
  * own join), and the curated corpus (the [[curated]] API) comes
  * back un-aggregated for the writer to shard (q8b's
  * `shardedShuffleWrite`).
  */
object Curate {

  /** q82's quality + q81's language scores in one annotation pass. */
  private[graft] def annotated(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs
      .select(col("doc_id"), col("source"), col("text"),
        // the SHARED count definitions (TextFunctions.nWsTokens &co) —
        // the packing mass and quality inputs are exactly the
        // oracle-pinned q80/q82 counts, not a local copy that drifts
        nWsTokens(col("text")).as("n_tokens"),
        nBpeTokens(col("text")).as("n_bpe_tokens"),
        nCharsM(col("text")).as("n_chars_m"),
        nPunctChars(col("text")).as("n_punct_chars"),
        distinctHits(toks, stopEn).cast("long").as("s_en"),
        distinctHits(toks, stopDe).cast("long").as("s_de"),
        distinctHits(toks, stopFr).cast("long").as("s_fr"),
        distinctHits(toks, stopEs).cast("long").as("s_es"),
        distinctHits(toks, stopZh).cast("long").as("s_zh"))
      // the SHARED q81/q82 definitions (TextFunctions.predLang /
      // qualityScore) — the curation pipeline must pack under exactly
      // the rules the oracle-pinned building blocks verify
      .withColumn("pred_lang",
        predLang(col("s_en"), col("s_de"), col("s_fr"), col("s_es"), col("s_zh")))
      .withColumn("quality",
        qualityScore(col("n_tokens"), col("n_chars_m"), col("n_punct_chars"), col("s_en")))
  }

  /** The curated corpus: quality- and language-filtered, exactly
    * deduplicated on normalized text (min doc_id survives), each
    * survivor tagged with its deterministic train/val/test split.
    * Returns one row per kept document — feed it to the shard writer.
    */
  def curated(
      docs: DataFrame,
      minQuality: Double = 0.12,
      lang: String = "en"): DataFrame = {
    // NOT spread (r14, measured twice): parallelizing the annotation
    // costs more than it saves here — the round-robin exchange ships
    // the text payload and splits the fused scan+partial-agg stage;
    // qa0/qa2/qa3 each regressed 0.1-0.8 s with a spread input.
    val kept = annotated(docs)
      .filter(col("quality") >= minQuality && col("pred_lang") === lang)
    // q61's survivor rule (min doc_id per normalized digest) in one
    // partial-agg pass: min_by carries the whole survivor row through
    // the digest shuffle, so the annotated scan is never re-read
    val cols = kept.columns
    val surv = kept
      .groupBy(md5(normText(col("text")).cast("binary")).as("h"))
      .agg(min_by(struct(cols.map(col): _*), col("doc_id")).as("r"))
      .select(col("r.*"))
    surv.withColumn("split", hashSplit(col("doc_id")))
  }

  private val qa0 = Qdef(
    "qa0_curate",
    (s, d) =>
      curated(Tables.documents(s, d))
        .groupBy("split", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_bpe_tokens").as("sum_tokens"),
          Tables.dsum(col("quality"), 6).as("sum_q"))
        .orderBy("split", "source"),
    Some(s"""WITH $curatedCtes
             SELECT split, source, COUNT(*) AS n_docs,
                    CAST(SUM(n_bpe_tokens) AS BIGINT) AS sum_tokens,
                    ${Qdef.DSUM("quality", 6)} AS sum_q
             FROM sp GROUP BY split, source ORDER BY split, source"""))

  /** The oracle CTE chain producing [[curated]]'s row set as `sp`
    * (one row per kept document, with quality/lang/token columns and
    * the split tag) — shared verbatim by qa0's manifest oracle and by
    * downstream compositions ([[TrainingRun]]'s qa3) so the two
    * engines' curation stage can never drift apart.
    */
  private[graft] def curatedCtes: String =
    s"""m AS (SELECT doc_id, source, text,
                    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
                    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)) AS BIGINT) AS n_bpe_tokens,
                    CAST(length(text) AS BIGINT) AS n_chars_m,
                    CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct_chars,
                    CAST(len(list_intersect(string_split_regex(trim(lower(text)), '\\s+'), ${inList(stopEn)})) AS BIGINT) AS s_en,
                    CAST(len(list_intersect(string_split_regex(trim(lower(text)), '\\s+'), ${inList(stopDe)})) AS BIGINT) AS s_de,
                    CAST(len(list_intersect(string_split_regex(trim(lower(text)), '\\s+'), ${inList(stopFr)})) AS BIGINT) AS s_fr,
                    CAST(len(list_intersect(string_split_regex(trim(lower(text)), '\\s+'), ${inList(stopEs)})) AS BIGINT) AS s_es,
                    CAST(len(list_intersect(string_split_regex(trim(lower(text)), '\\s+'), ${inList(stopZh)})) AS BIGINT) AS s_zh
                  FROM documents),
             sc AS (SELECT *,
                    CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
                         WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
                         WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
                         WHEN s_es >= s_zh THEN 'es'
                         ELSE 'zh' END AS pred_lang,
                    least(1.0, CAST(n_tokens AS DOUBLE) / 200.0) *
                      (1.0 - CASE WHEN n_chars_m > 0
                                  THEN CAST(n_punct_chars AS DOUBLE) / CAST(n_chars_m AS DOUBLE)
                                  ELSE 0.0 END) *
                      (0.5 + 0.5 * CAST(s_en AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS quality
                  FROM m),
             k AS (SELECT * FROM sc WHERE quality >= 0.12 AND pred_lang = 'en'),
             d AS (SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h,
                    MIN(doc_id) AS doc_id
                  FROM k GROUP BY 1),
             kept AS (SELECT k.* FROM k JOIN d USING (doc_id)),
             sp AS (SELECT *,
                    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
                         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                         ELSE 'test' END AS split
                  FROM kept)"""

  /** The full multi-stage curation: [[curated]]'s text pipeline
    * (quality → langid → exact-norm dedup → split) followed by a
    * SEMANTIC near-dup prune over the SURVIVORS' embeddings
    * ([[graft.dedup.Dedup.semanticDedup]] — k-means cells as the
    * blocking key, greedy min-id drop). Ordering is deliberate: the
    * cheap narrow text filters and the exact-dedup aggregate shrink
    * the corpus BEFORE any embedding ships anywhere, so the semantic
    * stage's cell shuffle — the only wide-payload exchange in the
    * whole pipeline — carries survivors only. The embedding fetch is
    * a co-keyed join on the id (at warehouse scale both sides bucket
    * on it; here AQE broadcasts the survivor side), never a crossJoin.
    *
    * Returns [[curated]]'s row shape plus (cell, dup_of) — kept rows
    * only; a text survivor with NO embedding row is kept with null
    * cell/dup_of (it cannot be semantically deduped; missing
    * auxiliary data must not silently delete curated data). The
    * epoched mixture ([[Mix.mixEpochs]], with
    * `massCol = "n_bpe_tokens"` — [[curated]] carries token counts,
    * not the raw table's n_chars) composes on top.
    */
  def curatedSemantic(
      docs: DataFrame,
      emb: DataFrame,
      minQuality: Double = 0.12,
      lang: String = "en",
      tau: Double = 0.4,
      cells: Int = 0,
      maxCell: Int = 0,
      iters: Int = 2,
      md5Seed: Boolean = false): DataFrame = {
    // materialize the text pipeline ONCE: semanticDedup consumes the
    // survivors (through the semi join below) at construction time,
    // and the final verdict join reads `c` again — without this the
    // regex-heavy annotation scan and the digest dedup would run
    // twice (the module's single-scan promise). Stage, not
    // localCheckpoint: the curated corpus survives executor loss
    // (lineage-preserving persist, or a reliable checkpoint when
    // graft.checkpointDir is set) instead of living unreplicated in
    // executor storage. `lazily`: semanticDedup's first probe job
    // aggregates over the survivors' semi-join, reading (and thereby
    // caching) every curated partition — an eager count here would be
    // a SECOND full pass over the annotation+dedup pipeline.
    val c = graft.Stage.lazily(curated(docs, minQuality, lang))
    val survivors = emb.select(col("vec_id"), col("embedding"))
      .join(c.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    val verdicts = graft.dedup.Dedup
      .semanticDedup(survivors, tau, cells, iters = iters, maxCell = maxCell, md5Seed = md5Seed)
      .select(col("vec_id").as("doc_id"), col("cell"), col("dup_of"), col("keep"))
    // left join + keep-if-no-verdict: a text survivor WITHOUT an
    // embedding row cannot be semantically deduped — it stays in the
    // corpus (cell/dup_of null), it is not silently deleted
    c.join(verdicts, Seq("doc_id"), "left")
      .filter(col("keep").isNull || col("keep"))
      .drop("keep")
  }

  /** qa2: the composed text+semantic curation manifest, hash-checked
    * end to end — [[curatedCtes]]' text pipeline composed with
    * [[graft.dedup.Dedup.semanticTwinCtes]] over the survivors'
    * embeddings, exactly mirroring [[curatedSemantic]]'s semi-join +
    * verdict-left-join shape. The entry pins the semantic stage's
    * engine-portable operating point (iters = 0, md5-top-k seeds —
    * the q6g convention); the library default keeps Lloyd training.
    */
  private val qa2 = Qdef(
    "qa2_curate_semantic",
    (s, d) =>
      curatedSemantic(Tables.documents(s, d), Tables.embeddings(s, d),
          iters = 0, md5Seed = true)
        .groupBy("split", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_bpe_tokens").as("sum_tokens"),
          Tables.dsum(col("quality"), 6).as("sum_q"))
        .orderBy("split", "source"),
    Some(s"""WITH $curatedCtes,
             surv AS (SELECT e.vec_id, e.embedding
                      FROM embeddings e JOIN sp ON e.vec_id = sp.doc_id),
             ${graft.dedup.Dedup.semanticTwinCtes("surv")},
             semkept AS (SELECT sp.* FROM sp
                         LEFT JOIN semv ON sp.doc_id = semv.vec_id
                         WHERE semv.keep IS NULL OR semv.keep)
             SELECT split, source, COUNT(*) AS n_docs,
                    CAST(SUM(n_bpe_tokens) AS BIGINT) AS sum_tokens,
                    ${Qdef.DSUM("quality", 6)} AS sum_q
             FROM semkept GROUP BY split, source ORDER BY split, source"""))

  /** Per-source dataset card: the one-page corpus report a training
    * run ships with (docs / chars / whitespace tokens per q80's
    * definition, language spread + dominant language, exact-duplicate
    * mass within the source, and docs whose exact text also appears in
    * ANOTHER source — the cross-source contamination a mixture builder
    * needs to know about before weighting). ONE corpus scan (the
    * md5+token annotation, staged text-free via [[graft.Stage]]) then
    * three exchanges: the per-source partial agg, the (source, lang)
    * top-lang agg (both on low-cardinality keys), and one groupBy on
    * the 16-byte text digest for the sharing census — the q61
    * exact-dedup shuffle, which is the only corpus-sized one and is
    * the same work an exact-dedup pass does anyway. `n_exact_dups`
    * counts per-source
    * duplicate rows (docs minus distinct digests), `n_shared_docs`
    * counts this source's rows whose digest occurs in ≥2 sources.
    */
  def datasetCard(docs: DataFrame): DataFrame = {
    // ONE pass computes the digest and token count, staged WITHOUT the
    // text payload (graft.Stage.cut — the qa3 staging convention):
    // the three aggregates below would otherwise each re-scan the
    // corpus and re-hash every document's text
    val withDigest = graft.Stage.cut(docs
      .select(col("source"), col("lang"), col("n_chars"),
        md5(col("text")).as("digest"), nWsTokens(col("text")).as("n_ws_tokens")))
    val base = withDigest
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        sum("n_ws_tokens").as("sum_ws_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        (count(lit(1)) - countDistinct(col("digest"))).as("n_exact_dups"))
    val topLang = withDigest.groupBy("source", "lang").agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("n").desc, col("lang"))))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"))
    val sharing = withDigest.groupBy("digest")
      .agg(countDistinct(col("source")).as("n_sources"))
    val shared = withDigest.join(sharing, "digest")
      .filter(col("n_sources") >= 2)
      .groupBy("source").agg(count(lit(1)).as("n_shared_docs"))
    base.join(topLang, "source")
      .join(shared, Seq("source"), "left")
      .withColumn("n_shared_docs", coalesce(col("n_shared_docs"), lit(0L)))
      .orderBy("source")
  }

  private val qa4 = Qdef(
    "qa4_dataset_card",
    (s, d) => datasetCard(Tables.documents(s, d)),
    Some("""WITH base AS (SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS sum_ws_tokens,
                   COUNT(DISTINCT lang) AS n_langs,
                   COUNT(*) - COUNT(DISTINCT md5(text)) AS n_exact_dups
                 FROM documents GROUP BY source),
            lc AS (SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2),
            top AS (SELECT source, lang AS top_lang FROM (
                    SELECT source, lang,
                           row_number() OVER (PARTITION BY source ORDER BY n DESC, lang) AS rn
                    FROM lc) WHERE rn = 1),
            sh AS (SELECT md5(text) AS digest, COUNT(DISTINCT source) AS n_sources
                   FROM documents GROUP BY 1),
            shared AS (SELECT d.source, COUNT(*) AS n_shared_docs
                       FROM documents d JOIN sh ON md5(d.text) = sh.digest
                       WHERE sh.n_sources >= 2 GROUP BY d.source)
            SELECT b.source, b.n_docs, b.sum_chars, b.sum_ws_tokens, b.n_langs,
                   b.n_exact_dups, t.top_lang,
                   coalesce(s.n_shared_docs, 0) AS n_shared_docs
            FROM base b JOIN top t USING (source)
            LEFT JOIN shared s USING (source)
            ORDER BY source"""))

  /** qa6: split-leakage audit — which TRAIN documents share a word
    * 5-gram with ANY test-split document under the shipped q86
    * hash-split assignment. q67 decontaminates against an EXTERNAL
    * benchmark; this audits the pipeline's OWN split: near-identical
    * train/test rows inflate eval scores silently, and the audit must
    * run on the exact split rule the pipeline ships
    * ([[graft.functions.TextFunctions.hashSplit]]), never a
    * re-derivation that can drift from it. Output: one row per
    * leaking train doc with its count of 5-gram types shared with
    * the test side (the q67 contract).
    *
    * Scale: the test side is the SMALL side by construction (~10% of
    * the corpus) — its distinct shingle set broadcasts, exactly
    * [[graft.dedup.Dedup.contaminated]]'s shape; one narrow shingle
    * scan per side, nothing pairwise anywhere.
    */
  private val qa6 = Qdef(
    "qa6_split_leakage",
    (s, d) => {
      val docs = Tables.documents(s, d).withColumn("split", hashSplit(col("doc_id")))
      graft.dedup.Dedup.contaminated(
        docs.filter(col("split") === "train"),
        docs.filter(col("split") === "test"))
        .orderBy("doc_id")
    },
    // q86's split rule verbatim feeding q67's leakage SQL verbatim —
    // both already hash-green on their own rows
    Some("""WITH a AS (SELECT doc_id, text,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
                        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                        ELSE 'test' END AS split
                 FROM documents),
            t AS (SELECT doc_id, split, string_split_regex(trim(lower(text)), '\s+') AS toks FROM a),
            g AS (SELECT doc_id, split,
                    list_distinct(list_transform(generate_series(1, len(toks) - 4),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                           toks[i+3] || ' ' || toks[i+4])) AS sh
                  FROM t WHERE len(toks) >= 5),
            b AS (SELECT DISTINCT unnest(sh) AS s FROM g WHERE split = 'test'),
            c AS (SELECT doc_id, unnest(sh) AS s FROM g WHERE split = 'train')
            SELECT doc_id, COUNT(*) AS n_shared
            FROM c JOIN b USING (s)
            GROUP BY doc_id ORDER BY doc_id"""))

  val all: Seq[Qdef] = Seq(qa0, qa2, qa4, qa6)
}
