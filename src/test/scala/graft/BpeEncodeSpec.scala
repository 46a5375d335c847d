package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** q8e: BPE encode against the q8d-learned merge table.
  *
  * The independent oracle is REPLAY: apply the merges in rank order
  * (the learner's own procedure) with a from-scratch implementation.
  * The expression instead runs a greedy lowest-rank priority loop —
  * the two agree iff the learned table is rank-consistent (a merge's
  * output symbol only appears in later-ranked pairs), so equality
  * checks both the encoder and the learner's ordering invariant.
  */
class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  /** Learner-canon word list of a document (lowercase, trim, ws split). */
  private def canonWords(text: String): Seq[String] =
    text.toLowerCase.trim.split("\\s+").toSeq.filter(_.nonEmpty)

  private def codepoints(word: String): Seq[String] =
    word.codePoints().toArray.toSeq.map(cp => new String(Character.toChars(cp)))

  /** Replay the merge list in rank order over one word. */
  private def replayEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = codepoints(word)
    merges.foreach { case (l, r) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          out += l + r; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toSeq
    }
    syms
  }

  private def replayDoc(text: String, merges: Seq[(String, String)]): Seq[String] =
    canonWords(text).flatMap(replayEncode(_, merges))

  test("hand-computed example: merges segment exactly as learned") {
    functions.VectorExpressions.register(spark) // no Tables.load in this test
    val docs = Seq((1L, "low low low lower lower lowest"))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(docs, 4).map { case (l, r, _) => (l, r) }
    // corpus pair counts: (l,o)=6, (o,w)=6 -> tie broken lexicographic:
    // merge1 (l,o); then (lo,w)=6 -> merge2; then (low)x3 standalone,
    // (low,e)=3 -> merge3 ties with (e,r)=2? no: (low,e)=3 wins; then
    // (lowe,r)=2 vs (e,s)/(s,t)=1 -> merge4 (lowe,r)
    assert(merges === Seq(("l", "o"), ("lo", "w"), ("low", "e"), ("lowe", "r")))
    val toks = TextAnalysis.bpeTokens(docs, merges)
      .select("tokens").as[Seq[String]].head()
    // lowest: l|o|w|e|s|t -> lo|w|e|s|t -> low|e|s|t -> lowe|s|t
    assert(toks === Seq("low", "low", "low", "lower", "lower", "lowe", "s", "t"))
  }

  test("replay oracle: expression encode equals rank-order replay on the real corpus") {
    val docs = Tables.documents(spark, sf)
    val merges = TextAnalysis.bpeMerges(docs, 40).map { case (l, r, _) => (l, r) }
    val got = TextAnalysis.bpeTokens(docs, merges)
      .select("doc_id", "tokens").as[(Long, Seq[String])].collect().toMap
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect()
    assert(texts.nonEmpty && got.size === texts.length)
    texts.foreach { case (id, text) =>
      assert(got(id) === replayDoc(text, merges), s"doc $id segmentation diverged")
    }
  }

  test("losslessness + monotonicity: tokens concatenate back; more merges never add tokens") {
    val docs = Tables.documents(spark, sf)
    val merges = TextAnalysis.bpeMerges(docs, 40).map { case (l, r, _) => (l, r) }
    val rows = docs
      .select(col("doc_id"), col("text"),
        functions.TextFunctions.bpeEncode(col("text"), merges).as("t40"),
        functions.TextFunctions.bpeEncode(col("text"), merges.take(5)).as("t5"),
        functions.TextFunctions.bpeEncode(col("text"), Seq.empty).as("t0"))
      .as[(Long, String, Seq[String], Seq[String], Seq[String])].collect()
    rows.foreach { case (id, text, t40, t5, t0) =>
      val canon = canonWords(text).mkString
      assert(t40.mkString === canon, s"doc $id: 40-merge tokens do not concat back")
      assert(t0.mkString === canon, s"doc $id: 0-merge tokens do not concat back")
      assert(t0.length === canonWords(text).map(codepoints(_).length).sum,
        s"doc $id: empty merge table must yield the code-point split")
      assert(t40.length <= t5.length && t5.length <= t0.length,
        s"doc $id: token count must be monotone non-increasing in merges")
    }
  }

  /** From-scratch local merge learner over an explicit word-count
    * table — the independent truth for the pruning tests below.
    */
  private def bruteMerges(wordCounts: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    var words: Seq[(Seq[String], Long)] = wordCounts.toSeq.map { case (w, c) => (codepoints(w), c) }
    val out = Seq.newBuilder[(String, String, Long)]
    for (_ <- 0 until n) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => pc((a, b)) = pc.getOrElse((a, b), 0L) + c
          case _         => ()
        }
      }
      if (pc.nonEmpty) {
        val ((l, r), c) = pc.minBy { case ((a, b), m) => (-m, a, b) }
        out += ((l, r, c))
        words = words.map { case (syms, wc) =>
          val o = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) { o += l + r; i += 2 }
            else { o += syms(i); i += 1 }
          }
          (o.toSeq, wc)
        }
      }
    }
    out.result()
  }

  test("vocab pruning: heavy-tail corpus - driver table bounded by the cap, not the corpus") {
    functions.VectorExpressions.register(spark)
    // 3 hot words carry every winning pair; 2000 distinct hapax words are
    // the heavy tail a web corpus would flood the driver with.
    val hot   = Seq.fill(50)("alpha beta alpha beta gamma").mkString(" ") // alpha=100 beta=100 gamma=50
    val rares = (1 to 2000).map(i => s"rare$i").mkString(" ")
    val docs  = Seq((1L, hot), (2L, rares)).toDF("doc_id", "text").repartition(4)

    val localCounts: Map[String, Long] =
      (canonWords(hot) ++ canonWords(rares)).groupBy(identity).map { case (w, g) => (w, g.size.toLong) }

    // Defaults (minCount=1, maxVocab=2^22) are behavior-identical to unpruned.
    val full = TextAnalysis.bpeMerges(docs, 6)
    assert(full === bruteMerges(localCounts, 6))
    assert(full === TextAnalysis.bpeMerges(docs, 6, minCount = 1L, maxVocab = Int.MaxValue))

    // minCount prunes the hapax tail in the distributed aggregate.
    val byMinCount = TextAnalysis.bpeMerges(docs, 6, minCount = 2L)
    assert(byMinCount === bruteMerges(localCounts.filter(_._2 >= 2L), 6))

    // maxVocab caps the collected table at the top-V words by
    // (count desc, word asc): the learned merges equal the brute truth
    // computed from ONLY those V rows, so the driver table was exactly
    // that cap — 3 rows here against a 2003-word corpus.
    val topV = localCounts.toSeq.sortBy { case (w, c) => (-c, w) }.take(3).toMap
    assert(topV.keySet === Set("alpha", "beta", "gamma"))
    val byCap = TextAnalysis.bpeMerges(docs, 6, maxVocab = 3)
    assert(byCap === bruteMerges(topV, 6))
    // and the hapax tail changed nothing hot-side: pair counts differ
    // from the unpruned run only where rare words contributed.
    assert(byCap.map { case (l, r, _) => (l, r) } === byMinCount.map { case (l, r, _) => (l, r) })
  }

  test("plan lock: encode is a pure narrow codegen map - no exchange") {
    val docs = Tables.documents(spark, sf)
    val merges = Seq(("t", "h"), ("th", "e"))
    val p = TextAnalysis.bpeTokens(docs, merges)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"BPE encode shuffles:\n$p")
    // `*(n)` is the whole-stage-codegen marker in the plan's toString
    assert(p.contains("*(1) Project"), s"BPE encode fell out of codegen:\n$p")
  }
}
