package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** q85 repetition metrics + q86 hash split (SURVEY §2.9). The DuckDB
  * oracle is the primary check; these specs pin the pieces the oracle
  * can't see: the codegen max-run expression against a brute-force
  * twin, split determinism, and the narrow-map plan shape.
  */
class TextQualitySpec extends SparkSpec {

  test("q8h: chunk cover laws — aligned starts, exact lengths, ceil(sz/stride) chunks per doc") {
    val docs = Tables.documents(spark, sf)
    val sz = docs.select(col("doc_id"),
      size(graft.functions.TextFunctions.tokens(col("text"))).as("sz"))
    val ch = TextAnalysis.chunkOverlap(docs, 64, 48).join(sz, "doc_id")
      .select("doc_id", "chunk_id", "start_tok", "n_tokens", "sz").collect()
    assert(ch.nonEmpty)
    ch.foreach { r =>
      val (cid, start, n, s) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))
      assert(start === 48L * cid, s"chunk start not stride-aligned: $r")
      // exact length: width-full until the tail, which takes what's left
      assert(n === math.min(64L, s - start), s"chunk length drifted: $r")
      assert(start < s, s"chunk starts past the doc: $r")
    }
    // every token covered, no phantom chunks: count = ceil(sz / stride)
    val counts = TextAnalysis.chunkOverlap(docs, 64, 48)
      .groupBy("doc_id").count().join(sz, "doc_id").collect()
    counts.foreach { r =>
      assert(r.getLong(1) === (r.getInt(2) + 47L) / 48L, s"chunk count drifted: $r")
    }
    // stride > width would leave token gaps — refused, not silently lossy
    intercept[IllegalArgumentException](TextAnalysis.chunkOverlap(docs, 10, 20))
    intercept[IllegalArgumentException](TextAnalysis.chunkOverlap(docs, 0, 0))
  }

  test("graft_max_run equals the explode+groupBy mode count on every doc") {
    val docs = Tables.documents(spark, sf)
    val narrow = docs
      .select(col("doc_id"),
        call_function("graft_max_run",
          sort_array(split(trim(lower(col("text"))), "\\s+"))).as("m"))
    val brute = docs
      .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("t"))
      .groupBy("doc_id", "t").count()
      .groupBy("doc_id").agg(max("count").as("m"))
    // collect and compare null-safely: a =!= filter drops NULL results
    // silently, so a regression returning NULL (or losing rows) would
    // pass an isEmpty check — bind row count and every value instead
    val nDocs = docs.count()
    val joined = narrow.join(brute, Seq("doc_id")).collect()
    assert(joined.length === nDocs, s"join covers ${joined.length} of $nDocs docs")
    joined.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2) && r.getInt(1) === r.getLong(2).toInt,
        s"doc ${r.getLong(0)}: max-run ${r.get(1)} vs brute mode count ${r.get(2)}")
    }
  }

  test("graft_max_run edge cases: empty, single, all-equal, runs, null elements") {
    val df = spark.sql(
      """SELECT graft_max_run(array()) AS e,
               graft_max_run(array('a')) AS one,
               graft_max_run(array('a','a','a')) AS all3,
               graft_max_run(array('a','a','b','b','b','c')) AS mixed,
               graft_max_run(array(CAST(NULL AS STRING), 'a', 'a', NULL, 'b')) AS withnull,
               graft_max_run(array(CAST(NULL AS STRING), NULL)) AS allnull""")
    val r = df.collect().head
    assert(r.getInt(0) === 0 && r.getInt(1) === 1 && r.getInt(2) === 3 && r.getInt(3) === 3)
    // nulls are ignored and break runs
    assert(r.getInt(4) === 2 && r.getInt(5) === 0)
  }

  test("q85: fractions bounded, bigram count consistent with token count") {
    val rows = SparkEntry.queries("q85_repetition")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nTok = r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("n_bigrams") === math.max(nTok - 1, 0L))
      Seq("dup_token_frac", "top_token_frac", "top_bigram_frac").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c out of range: $v")
      }
      assert(r.getAs[Long]("top_token_count") >= 1L)
    }
  }

  test("q85: one narrow codegen'd scan - only the final sort shuffles") {
    val p = SparkEntry.queries("q85_repetition")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("graft_max_run"), s"native expression missing:\n$p")
    val shuffles = "Exchange".r.findAllIn(p).length
    assert(shuffles === 1, s"expected only the ORDER BY exchange, got $shuffles:\n$p")
  }

  test("q87: mixture rates order as configured; sampling independent of the split hash") {
    val docs = Tables.documents(spark, sf)
    val perSource = docs.groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    val kept = SparkEntry.queries("q87_source_mix")(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_kept")).toMap
    // full-rate sources keep everything; sampled sources keep a subset
    def rateOf(src: String): Double = src.drop(3).toInt % 4 match {
      case 0 => 1.0; case 1 => 0.5; case 2 => 0.25; case _ => 0.1
    }
    perSource.foreach { case (src, total) =>
      val k = kept.getOrElse(src, 0L)
      if (rateOf(src) >= 1.0) assert(k === total, s"$src should keep all")
      else assert(k <= total, s"$src kept more than its population")
    }
    // each sampled tier's aggregate keep-rate sits in a window around
    // its configured rate (the hash cut is a fixed-seed binomial draw;
    // +-0.2 absolute survives testdata regens while still failing a
    // keep-everything or keep-nothing sampler), and tiers order
    def tierRate(r: Double): Double = {
      // toSeq first: mapping over the key SET dedups equal per-source
      // counts and corrupts both sums (uniform sources collapse to one)
      val srcs = perSource.keys.toSeq.filter(s => rateOf(s) == r)
      srcs.map(s => kept.getOrElse(s, 0L)).sum.toDouble / srcs.map(perSource).sum
    }
    Seq(0.5, 0.25, 0.1).foreach { r =>
      assert(math.abs(tierRate(r) - r) < 0.2,
        s"tier $r keeps at rate ${tierRate(r)} — not sampling at the configured rate")
    }
    assert(tierRate(0.1) < tierRate(0.5), "rate tiers out of order")
    // independence from the q86 split hash: q87 salts with ':mix', so
    // sampled-tier survivors must span all three splits. A sampler
    // reusing the unsalted md5(doc_id) would keep only bucket-prefix
    // rows, i.e. a pure subset of 'train' — zero val/test survivors.
    val sampledSrcs = perSource.keys.filter(s => rateOf(s) < 1.0).toSeq
    val survivorSplits = TextAnalysis.sampleByRates(
        docs, sampledSrcs.map(s => s -> rateOf(s)).toMap)
      .filter(col("source").isin(sampledSrcs: _*))
      .withColumn("b", substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2))
      .withColumn("split",
        when(col("b") < "cd", "train").when(col("b") < "e6", "val").otherwise("test"))
      .select("split").distinct().collect().map(_.getString(0)).toSet
    assert(survivorSplits === Set("train", "val", "test"),
      s"sampled survivors cover splits $survivorSplits — the mix hash is correlated with the split hash")
  }

  test("q88: every non-final chunk holds exactly the token budget") {
    val rows = SparkEntry.queries("q88_pack_chunks")(spark, sf).collect()
    val byWorker = rows.groupBy(r => (r.getAs[String]("source"), r.getAs[Long]("shard")))
    assert(byWorker.keys.map(_._2).toSet === Set(0L, 1L), "expected 2 shards per source")
    byWorker.foreach { case ((src, shard), chunks) =>
      val maxChunk = chunks.map(_.getAs[Long]("chunk")).max
      chunks.filter(_.getAs[Long]("chunk") < maxChunk).foreach { c =>
        assert(c.getAs[Long]("n_tokens") === 256L,
          s"$src/$shard chunk ${c.getAs[Long]("chunk")} not full")
      }
      // chunk ids are contiguous from 0 (concat-and-chunk leaves no gaps)
      assert(chunks.map(_.getAs[Long]("chunk")).sorted.toSeq === (0L to maxChunk))
    }
    // token conservation: chunk totals equal the corpus token count
    val total = Tables.documents(spark, sf)
      .select(sum(size(split(trim(col("text")), "\\s+")).cast("long"))).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum === total)
  }

  test("q86: splits partition the corpus deterministically at ~80/10/10") {
    val docs = Tables.documents(spark, sf)
    val total = docs.count()
    val agg = SparkEntry.queries("q86_hash_split")(spark, sf).collect()
    assert(agg.map(_.getAs[Long]("n_docs")).sum === total, "splits lose or duplicate docs")
    val bySplit = agg.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(Set("train", "val", "test").subsetOf(bySplit.keySet))
    val trainFrac = bySplit("train").toDouble / total
    // 205/256 ≈ 0.80 expected; 500 docs → ±4 binomial sigmas ≈ ±0.072
    assert(trainFrac > 0.72 && trainFrac < 0.88, s"train fraction $trainFrac")
    // determinism: same assignment on a second run (hash, not rand())
    val again = SparkEntry.queries("q86_hash_split")(spark, sf).collect()
    assert(agg.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("q89/scrubPatterns: PII patterns redact synthetic emails, IPs, phones") {
    import spark.implicits._
    val rows = Seq(
      (1L, "contact john.doe+x@example.com or jane@sub.domain.org today"),
      (2L, "server at 192.168.1.254 and 10.0.0.1 responded"),
      (3L, "call +1 (555) 123-4567 now"),  // digit-run phone shape
      (4L, "nothing sensitive here at all"),
      (5L, "")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .scrubPatterns(rows, "text", graft.operators.TextAnalysis.piiPatterns)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("n_redactions")).toSeq === Seq(2L, 2L, 1L, 0L, 0L))
    out.take(3).foreach { r =>
      val t = r.getAs[String]("text")
      assert(t.contains("[REDACTED]"), s"no redaction in: $t")
      assert(!t.contains("@") && !t.contains("192.168") && !t.contains("555"),
        s"sensitive content survived: $t")
    }
    assert(out(3).getAs[String]("text") === "nothing sensitive here at all")
  }

  test("q8c: bigram-LM scores are log-probs (<= 0); short docs score 0 with 0 bigrams") {
    val rows = SparkEntry.queries("q8c_lm_score")(spark, sf).collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val (n, s) = (r.getLong(1), r.getDouble(2))
      if (n > 0) assert(s <= 0.0, s"doc ${r.getLong(0)}: positive log-prob $s")
      else assert(s === 0.0)
    }
    // the model assigns P(w2|w1) <= 1 with equality only for deterministic
    // continuations; a word-soup corpus must have SOME entropy
    assert(rows.exists(r => r.getDouble(2) < -0.5), "implausibly confident model")
  }

  test("q8d: BPE merges match a hand-computed example and the brute-force first pair") {
    import spark.implicits._
    // "abab"x3 + "abc"x2: pair counts a-b:8, b-a:3, b-c:2 → merge 1 = (a,b).
    // After it: ab-ab:3, ab-c:2 → merge 2 = (ab,ab).
    val tiny = Seq((1L, "abab abab abab abc abc")).toDF("doc_id", "text")
    val m = graft.operators.TextAnalysis.bpeMerges(tiny, 2)
    assert(m === Seq(("a", "b", 8L), ("ab", "ab", 3L)))

    // real corpus: the first learned merge must be the true most
    // frequent character pair (brute-forced independently here)
    val docs = Tables.documents(spark, sf)
    val first = graft.operators.TextAnalysis.bpeMerges(docs, 1).head
    val brute = docs.select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").count().collect()
      .flatMap(r => r.getString(0).sliding(2).filter(_.length == 2)
        .map(p => (p(0).toString, p(1).toString) -> r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .minBy { case ((a, b), n) => (-n, a, b) }
    assert((first._1, first._2) === brute._1)
    assert(first._3 === brute._2)

    // query form: 20 ranked rows, counts positive
    val rows = SparkEntry.queries("q8d_bpe_merges")(spark, sf).collect()
    assert(rows.length === 20)
    assert(rows.map(_.getLong(0)).toSeq === (1L to 20L))
    assert(rows.forall(_.getLong(3) > 0))
  }

  test("q8a: bm25 scores are positive, monotone in tf at equal length, top-k ordered") {
    val rows = SparkEntry.queries("q8a_bm25")(spark, sf).collect()
    assert(rows.length === 20)
    val scores = rows.map(_.getAs[Double]("score_r"))
    assert(scores.forall(_ > 0.0))
    assert(scores.toSeq === scores.sorted.reverse.toSeq, "not score-descending")
    // every returned doc contains at least one query term
    rows.foreach { r =>
      val tfSum = r.getAs[Long]("tf_merge") + r.getAs[Long]("tf_filter") + r.getAs[Long]("tf_stream")
      assert(tfSum > 0, s"doc ${r.getAs[Long]("doc_id")} scored with zero term hits")
    }
  }

  test("q8g: RRF fuses exactly the two legs' own ranks; output is fused-desc ordered") {
    import graft.operators.TextAnalysis
    val terms = Seq("merge", "filter", "stream")
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    // the legs, recomputed independently of the operator under test
    val lexRank = TextAnalysis.bm25(docs, terms, topN = 20).collect()
      .zipWithIndex.map { case (r, i) => r.getAs[Long]("doc_id") -> (i + 1L) }.toMap
    val semRank = graft.ann.Knn.lshTopK(emb, k = 5, probe1 = true,
        queryPred = org.apache.spark.sql.functions.col("vec_id") === 0L)
      .collect().map(r => r.getAs[Long]("nid") -> r.getAs[Long]("rank")).toMap
    val fused = SparkEntry.queries("q8g_hybrid_search")(spark, sf).collect()
    assert(fused.length === (lexRank.keySet ++ semRank.keySet).size,
      "fusion must return the union of the legs' candidates, once each")
    fused.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(Option(r.getAs[Any]("bm25_rank")).map(_.asInstanceOf[Long]) === lexRank.get(id))
      assert(Option(r.getAs[Any]("ann_rank")).map(_.asInstanceOf[Long]) === semRank.get(id))
      val expect = lexRank.get(id).map(ra => 1.0 / (60 + ra)).getOrElse(0.0) +
        semRank.get(id).map(rb => 1.0 / (60 + rb)).getOrElse(0.0)
      assert(r.getAs[Double]("fused") === expect, s"doc $id fused score drifted")
    }
    // ordering law: fused desc, doc_id asc on ties
    val key = fused.map(r => (-r.getAs[Double]("fused"), r.getAs[Long]("doc_id"))).toSeq
    assert(key === key.sorted, "output not (fused desc, doc_id) ordered")
    // a doc retrieved by BOTH legs outranks one retrieved by a single
    // leg at any deeper rank — the boost RRF exists to give
    val both = fused.filter(r => r.getAs[Any]("bm25_rank") != null && r.getAs[Any]("ann_rank") != null)
    both.foreach { b =>
      assert(b.getAs[Double]("fused") >
        math.max(1.0 / (60 + b.getAs[Long]("bm25_rank")), 1.0 / (60 + b.getAs[Long]("ann_rank"))))
    }
  }

  test("qa0: curated corpus — filters bite, dedup is total, splits are the q86 buckets") {
    import graft.functions.TextFunctions.normText
    val docs = Tables.documents(spark, sf)
    val cur = operators.Curate.curated(docs)
    val n = cur.count()
    val total = docs.count()
    // the DuckDB oracle checks the exact per-split manifest; here we
    // pin the library-API contract the aggregate can't show
    assert(n > 0, "curation dropped the whole corpus")
    assert(n < total, "curation kept everything — filters are vacuous")
    // dedup is total: one survivor per normalized text
    assert(cur.select(md5(normText(col("text")).cast("binary"))).distinct().count() === n)
    // survivor rule: the kept id is the group MINIMUM. Planted check:
    // curate the corpus unioned with an id-shifted copy of itself —
    // both members of every duplicated text pass or fail the filters
    // together (same text), so every survivor must come from the
    // low-id originals and the survivor set must be unchanged
    val stride = docs.agg(max("doc_id")).head().getLong(0) + 1L
    val doubled = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + lit(stride)))
    val idsDoubled = operators.Curate.curated(doubled)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(idsDoubled.forall(_ < stride), "a shifted copy out-survived its lower-id original")
    val splits = cur.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.contains("train"))
    // determinism: running the pipeline twice yields identical ids
    val ids1 = cur.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = operators.Curate.curated(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
    // and the doubled corpus dedups back to exactly the same survivors
    assert(idsDoubled === ids1)
  }

  test("qa0/q82: empty and whitespace-only documents score finite quality and are rejected") {
    import spark.implicits._
    // n_chars_m = 0 makes the punct ratio 0/0 without the guard —
    // NaN quality would PASS Spark's NaN-greatest >= filter (keeping
    // garbage docs) and diverge from the DuckDB twin
    // doc 3: 200 tokens, 10 distinct EN stopwords -> quality
    // 1.0 * 1.0 * (0.5 + 0.5*10/200) = 0.525, comfortably kept
    val docs = Seq(
      (1L, "web", ""),
      (2L, "web", "   "),
      (3L, "web", Seq.fill(20)("the a an of and to in is it that").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val cur = operators.Curate.curated(docs)
    val kept = cur.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(1L) && !kept.contains(2L),
      s"empty/whitespace docs survived curation: $kept")
    assert(kept.contains(3L), "a real document was rejected")
    // and the q82 surface itself: finite, non-NaN scores everywhere
    val saved = s"${tmpDir("q82-empty")}/documents.parquet"
    docs.write.parquet(saved)
    val q = SparkEntry.queries("q82_quality_score")(
      spark, new java.io.File(saved).getParent)
    val rows = q.select("doc_id", "mean_tok_len", "punct_ratio", "stop_ratio", "quality")
      .collect()
    rows.foreach { r =>
      (1 to 4).foreach { i =>
        val v = r.getDouble(i)
        assert(!v.isNaN && !v.isInfinite,
          s"non-finite score (col $i = $v) for doc ${r.getLong(0)}")
      }
    }
    assert(rows.length === 3)
  }

  test("qa2: semantic stage prunes within text survivors; planted embedding copies always drop") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val textIds = operators.Curate.curated(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // geometry-independent invariants only: k-means training is
    // FP-order sensitive, so two independent semanticDedup runs are
    // not guaranteed bit-identical cell sets — the exact-verdict
    // equality lives in q6g's injected-centroid spec. Here: the
    // composition can only PRUNE the text survivors...
    val out = operators.Curate.curatedSemantic(docs, emb)
    val gotIds = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gotIds.subsetOf(textIds), "semantic stage resurrected a text-filtered doc")
    assert(gotIds.nonEmpty, "composition dropped the whole corpus")
    assert(out.columns.contains("cell") && out.columns.contains("dup_of"),
      "verdict lineage columns lost in the composition")
    // ...and an exact embedding copy planted between two survivors
    // can NEVER escape a cell-scoped dedup (identical vectors share a
    // cell under any trained geometry): overwrite the 20 largest
    // survivors' embeddings with the 20 smallest survivors' ones
    val low = textIds.toSeq.sorted.take(20)
    val high = textIds.toSeq.sorted.takeRight(20)
    val spark0 = spark
    import spark0.implicits._
    val remap = high.zip(low).toDF("vec_id", "src_id")
    val planted = emb.join(remap, Seq("vec_id"), "left")
      .join(emb.select(col("vec_id").as("src_id"), col("embedding").as("src_emb")),
        Seq("src_id"), "left")
      .select(col("vec_id"), coalesce(col("src_emb"), col("embedding")).as("embedding"))
    val prunedIds = operators.Curate.curatedSemantic(docs, planted)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    high.foreach(id => assert(!prunedIds.contains(id), s"planted copy $id survived"))

    // a text survivor with NO embedding row is kept (null lineage),
    // not silently deleted by the semantic stage
    val someIds = textIds.toSeq.sorted.take(10)
    val embPartial = emb.filter(!col("vec_id").isInCollection(someIds))
    val outPartial = operators.Curate.curatedSemantic(docs, embPartial)
    val keptNoEmb = outPartial.filter(col("doc_id").isInCollection(someIds))
    assert(keptNoEmb.count() === someIds.size.toLong,
      "survivors without embeddings were dropped")
    assert(keptNoEmb.filter(col("cell").isNotNull).count() === 0L,
      "no-embedding survivors must carry null semantic lineage")
  }
}
