package graft

import org.apache.spark.sql.functions._

/** Law tests for the r12 pipeline operators: q5b sliding windows,
  * q8f balanced stratified sampling, qa4 dataset card, q9e MinHash
  * corpus overlap. The DuckDB hash gate pins their exact outputs;
  * these lock the algebraic laws a refactor could silently break
  * while still producing SOME deterministic output.
  */
class PipelineOpsSpec extends SparkSpec {

  test("q5b: every event lands in exactly window/slide = 3 hopping windows") {
    val events = Tables.events(spark, sf)
    val nEvents = events.count()
    val totals = SparkEntry.queries("q5b_sliding_window")(spark, sf)
      .agg(sum("n").as("n"), Tables.dsum(col("sum_value")).as("sv")).collect().head
    assert(totals.getLong(0) === 3 * nEvents,
      s"window multiplicity drifted: ${totals.getLong(0)} != 3 * $nEvents")
    val direct = events.agg(Tables.dsum(col("value"))).collect().head.getDouble(0)
    assert(math.abs(totals.getDouble(1) - 3 * direct) < 1e-6)
  }

  test("q5b: window starts are slide-aligned and cover their events") {
    val rows = SparkEntry.queries("q5b_sliding_window")(spark, sf)
      .select(unix_micros(col("window_start")).as("us")).distinct().collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) % 300000000L === 0L,
      s"window start ${r.getLong(0)}us is not 5-minute aligned"))
    // each event's ts sits inside [start, start + 15 min) of every
    // window instance it was counted in — checked via the min/max
    // event per (window, type) against the window bounds
    val w = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "15 minutes", "5 minutes").as("w"))
      .agg(min(unix_micros(col("ts"))).as("lo"), max(unix_micros(col("ts"))).as("hi"))
      .select(unix_micros(col("w.start")).as("s"), col("lo"), col("hi"))
      .collect()
    w.foreach { r =>
      assert(r.getLong(1) >= r.getLong(0) && r.getLong(2) < r.getLong(0) + 900000000L,
        s"event outside its window: start=${r.getLong(0)} lo=${r.getLong(1)} hi=${r.getLong(2)}")
    }
  }

  test("q8f: strata at or under the cap keep everything; others land near the cap") {
    val docs = Tables.documents(spark, sf)
    val total = docs.count()
    // cap far above every stratum: the sample IS the corpus
    val all = operators.TextAnalysis.balancedSample(docs, "lang", cap = 1000000)
    assert(all.count() === total)
    // the spec corpus has 5 langs of 70–200 docs: cap 50 bites everywhere
    val rows = SparkEntry.queries("q8f_stratified_sample")(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val (n, kept) = (r.getLong(1), r.getLong(2))
      assert(kept <= n)
      if (n <= 50) assert(kept === n)
      // binomial(n, 50/n): mean 50, sd < 7.1 — 3.5σ keeps the
      // deterministic md5 draw comfortably inside
      else assert(math.abs(kept - 50) <= 25, s"${r.getString(0)}: kept $kept of $n at cap 50")
    }
  }

  test("q8f: the sample is a subset and the decision is salt-independent of q86/q87") {
    val docs = Tables.documents(spark, sf)
    val kept = operators.TextAnalysis.balancedSample(docs, "lang", cap = 50)
    assert(kept.join(docs, Seq("doc_id"), "left_anti").count() === 0)
    // all original columns survive (plus the stratum size annotation)
    assert(docs.columns.toSet.subsetOf(kept.columns.toSet))
    // the ":bal" salt must give a keep-set different from the ":mix"
    // hash at the same threshold — identical sets would mean the salt
    // is not reaching the hash and low-rate mixture survivors would
    // correlate with the balanced sample (the q87 independence rule)
    val mixBucket = substring(
      md5(concat(col("doc_id").cast("string"), lit(":mix")).cast("binary")), 1, 4)
    val balBucket = substring(
      md5(concat(col("doc_id").cast("string"), lit(":bal")).cast("binary")), 1, 4)
    val differ = docs.select(col("doc_id"))
      .filter(mixBucket =!= balBucket).count()
    assert(differ > 0)
  }

  test("qa4: totals add up and top_lang is the tie-broken argmax") {
    val docs = Tables.documents(spark, sf)
    val card = SparkEntry.queries("qa4_dataset_card")(spark, sf).collect()
    assert(card.map(_.getLong(1)).sum === docs.count())
    // independently recompute each source's argmax lang (count desc,
    // lang asc tie-break) driver-side from the 100-row group census
    val census = docs.groupBy("source", "lang").count().collect()
      .groupBy(_.getString(0))
      .map { case (src, rows) =>
        src -> rows.map(r => (r.getString(1), r.getLong(2)))
          .sortBy { case (lang, n) => (-n, lang) }.head._1
      }
    card.foreach { r =>
      assert(r.getString(6) === census(r.getString(0)),
        s"${r.getString(0)}: top_lang ${r.getString(6)} != ${census(r.getString(0))}")
      assert(r.getLong(5) >= 0 && r.getLong(7) >= 0)
    }
  }

  test("qa4: a planted cross-source copy shows up in n_shared_docs on both sides") {
    val docs = Tables.documents(spark, sf).limit(0)
    val spark2 = spark
    import spark2.implicits._
    val planted = Seq(
      (1L, "the same text twice", "en", "sA", 19L),
      (2L, "the same text twice", "en", "sB", 19L),
      (3L, "a text all of its own", "en", "sA", 21L),
      (4L, "another singleton", "en", "sC", 17L),
      (5L, "another singleton", "en", "sC", 17L) // within-source dup, NOT shared
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val card = operators.Curate.datasetCard(docs.unionByName(planted)).collect()
      .map(r => r.getString(0) -> ((r.getLong(5), r.getLong(7)))).toMap
    assert(card("sA") === ((0L, 1L)), s"sA: ${card("sA")}")
    assert(card("sB") === ((0L, 1L)), s"sB: ${card("sB")}")
    assert(card("sC") === ((1L, 0L)), s"sC: ${card("sC")}")
  }

  test("q9h: profile counts reconcile; the approx form tracks exact within HLL tolerance") {
    val orders = Tables.orders(spark, sf)
    val n = orders.count()
    val exact = SparkEntry.queries("q9h_data_profile")(spark, sf).collect()
    assert(exact.length === 6)
    exact.foreach { r =>
      assert(r.getLong(1) === n)
      assert(r.getLong(2) >= 0 && r.getLong(3) <= n - r.getLong(2))
    }
    val approx = operators.Warehouse.profile(orders,
      Seq("o_orderkey", "o_orderstatus"), exact = false)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val exactMap = exact.map(r => r.getString(0) -> r.getLong(3)).toMap
    approx.foreach { case (c, nd) =>
      assert(math.abs(nd - exactMap(c)).toDouble / math.max(1L, exactMap(c)) <= 0.05,
        s"$c: approx $nd vs exact ${exactMap(c)}")
    }
    intercept[IllegalArgumentException](operators.Warehouse.profile(orders, Seq("nope")))
    intercept[IllegalArgumentException](operators.Warehouse.profile(orders, Nil))
  }

  test("q9e: all 190 source pairs, every sketch within tolerance, set laws hold") {
    val rows = SparkEntry.queries("q9e_minhash_overlap")(spark, sf).collect()
    assert(rows.length === 190) // C(20,2)
    rows.foreach { r =>
      val (na, nb, inter, union) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val (kEff, estNum) = (r.getLong(6), r.getLong(7))
      assert(inter <= math.min(na, nb) && union >= math.max(na, nb))
      assert(union === na + nb - inter)
      assert(kEff <= 64 && estNum <= kEff)
      assert(r.getBoolean(8),
        s"${r.getString(0)}x${r.getString(1)}: est $estNum/$kEff vs exact $inter/$union")
    }
  }

  test("qa5: band discipline — positives above posTau, negatives capped in [negLo, posTau)") {
    val rows = SparkEntry.queries("qa5_contrastive_pairs")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byQidKind = rows.groupBy(r => (r.getLong(0), r.getString(1)))
    byQidKind.foreach { case ((qid, kind), rs) =>
      val ranks = rs.map(_.getLong(3)).sorted.toSeq
      assert(ranks === (1L to ranks.length), s"q$qid/$kind ranks not contiguous: $ranks")
      // ranks descend in cosine
      val byRank = rs.sortBy(_.getLong(3)).map(_.getDouble(4)).toSeq
      assert(byRank === byRank.sorted.reverse)
      if (kind == "neg") {
        assert(rs.length <= 3)
        rs.foreach(r => assert(r.getDouble(4) >= 0.25 && r.getDouble(4) < 0.4))
      } else rs.foreach(r => assert(r.getDouble(4) >= 0.4))
    }
    // a positive can never appear again as a negative of the same query
    byQidKind.collect { case ((qid, "pos"), rs) => qid -> rs.map(_.getLong(2)).toSet }
      .foreach { case (qid, posIds) =>
        val negIds = byQidKind.getOrElse((qid, "neg"), Array.empty).map(_.getLong(2)).toSet
        assert(posIds.intersect(negIds).isEmpty)
      }
    // misconfigured bands are refused loudly
    import org.apache.spark.sql.functions.lit
    val e = Tables.embeddings(spark, sf).limit(1)
      .select(col("vec_id"), col("embedding"), lit(1.0).as("nrm"))
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
    intercept[IllegalArgumentException](ann.Knn.contrastivePairs(e, q, 0.4, 0.5, 3))
    intercept[IllegalArgumentException](ann.Knn.contrastivePairs(e, q, 0.4, 0.25, 0))
  }

  test("q9e: the sketch-only production path agrees with the checked query's sketch columns") {
    // estimatedOverlap never touches the exact side — its estimator
    // integers must be IDENTICAL to the oracle-checked query's, pair
    // for pair (same signatures, same merge, same intersect)
    val full = SparkEntry.queries("q9e_minhash_overlap")(spark, sf)
      .select("source_a", "source_b", "k_eff", "est_num")
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val est = operators.Sketches.estimatedOverlap(Tables.documents(spark, sf)).collect()
    assert(est.length === full.size)
    est.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert((r.getLong(4), r.getLong(5)) === full(key), s"sketch drift at $key")
      val ej = r.getDouble(6)
      assert(ej >= 0.0 && ej <= 1.0)
    }
    // and no plan node anywhere joins shingles against shingles — the
    // corpus-quadratic risk the sketch path exists to avoid (the sort
    // keys of the h-on-h join would be the 32-char md5 column)
    val p = operators.Sketches.estimatedOverlap(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!"SortMergeJoin \\[h".r.findFirstIn(p).isDefined &&
      !p.contains("Join Inner, (h#"), s"shingle self-join leaked into the sketch path:\n$p")
  }

  test("q9e: the hash-bound prefilter is exact while every source keeps >= k survivors") {
    // md5 is uniform: bound "8" keeps ~half the distinct shingles, far
    // more than k=64 per source on this corpus, so the bottom-k — and
    // therefore every output row — must be IDENTICAL. This is the
    // 100 TB path's correctness condition, locked at gate scale.
    val docs = Tables.documents(spark, sf)
    val full = operators.Sketches.corpusMinhashOverlap(docs).collect().toSeq
    val pre = operators.Sketches.corpusMinhashOverlap(docs, hashBound = Some("8"))
      .collect().toSeq
    assert(pre === full)
  }

  test("q9e: a hash bound that starves a source is a loud refusal, not silent pair loss") {
    // bound "0" sorts below every md5 hex digit, so EVERY source loses
    // all its shingle hashes — the inner joins downstream would emit
    // an empty matrix with no hint of why. Both overlap paths refuse,
    // naming the sources and the remedy.
    val docs = Tables.documents(spark, sf)
    val e1 = intercept[IllegalArgumentException](
      operators.Sketches.corpusMinhashOverlap(docs, hashBound = Some("0")).collect())
    assert(e1.getMessage.contains("hashBound") && e1.getMessage.contains("Raise"))
    val e2 = intercept[IllegalArgumentException](
      operators.Sketches.estimatedOverlap(docs, hashBound = Some("0")).collect())
    assert(e2.getMessage.contains("hashBound"))
    // a permissive bound passes the guard untouched
    assert(operators.Sketches.estimatedOverlap(docs, hashBound = Some("g")).count() > 0)
  }

  test("q9o: a dimension amendment reflects at present with ZERO state maintenance") {
    import spark.implicits._
    // fact: three rows over two join keys; batch re-prices k=2 and
    // retracts k=3 (emptying join key 20 — its state row nets to 0)
    val base = Seq((1L, 10L, 100.0), (2L, 10L, 50.0), (3L, 20L, 70.0))
      .toDF("k", "fk", "v")
    val batch = Seq((2L, 10L, 60.0, false), (3L, 20L, 70.0, true))
      .toDF("k", "fk", "v", "_deleted")
    val state = operators.Warehouse.applyBatchToAgg(
      operators.Warehouse.aggState(base, "fk", "v"), base, batch, Seq("k"), "fk", "v")
    val dim = Seq((10L, "alpha"), (20L, "beta")).toDF("dk", "name")
    val out1 = operators.Warehouse
      .presentAggVia(state, dim, "dk", col("name"), "g", "n", "s")
      .collect()
    // alpha: k1 (100) + re-priced k2 (60); beta: emptied, filtered out
    assert(out1.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ===
      Seq(("alpha", 2L, 160.0)))
    // amend ONLY the dim (rename) — the SAME state object presents the
    // new name with identical partials: no fact scan, no state rebuild
    val renamed = Seq((10L, "alpha-renamed"), (20L, "beta")).toDF("dk", "name")
    val out2 = operators.Warehouse
      .presentAggVia(state, renamed, "dk", col("name"), "g", "n", "s")
      .collect()
    assert(out2.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ===
      Seq(("alpha-renamed", 2L, 160.0)))
  }

  test("q8f: a cap outside the 32-bit threshold domain is refused, not a silent drop cliff") {
    val docs = Tables.documents(spark, sf)
    // cap * 2^32 overflows Long at cap = 2^31: would floor thresholds
    // to 1 and drop ~everything from any stratum above the cap
    val e = intercept[IllegalArgumentException](
      operators.TextAnalysis.balancedSample(docs, "lang", cap = 1L << 31))
    assert(e.getMessage.contains("2^31"))
    // the largest legal cap keeps every stratum whole (rate >= 1)
    assert(operators.TextAnalysis.balancedSample(docs, "lang", cap = (1L << 31) - 1)
      .count() === docs.count())
  }
}
