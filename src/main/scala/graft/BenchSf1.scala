package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf≈1 bench profile: fan the sf0.1 tables 10× into a temp sf-dir
  * and time the most expensive inventory queries there — the scale
  * probe between the committed sf0.1 bench and the 100-TB design
  * claims. (The driver ships no sf1 parquet; this builds one.)
  *
  * Scaling rule is TPC-H's: FACT tables fan by `copies` with every
  * primary AND foreign key shifted by a per-copy stride of its own
  * domain (join fan-outs per copy stay exactly sf0.1's, so a query's
  * work should scale ~linearly in copies); the DIMENSION tables
  * (region, nation) stay fixed, as in TPC-H.
  *
  * Two content modes (`SPARK_GRAFT_SF1_MODE`), because the dedup
  * family's cost is shaped by the CORPUS, not only the plan:
  *
  *  - `clone` (default): document text gets a per-copy suffix token
  *    (realistic NEAR-dup growth — every copy is a true near-dup of
  *    its 9 siblings, so pair-output-bound operators legitimately
  *    grow ~C(copies,2)×); embeddings fan with identical vectors —
  *    deliberately the adversarial exact-direction case the r6 soak
  *    proved the collapse/distinct-vector plans absorb. Writes
  *    BENCH_SF1.json.
  *  - `distinct`: per-copy bijective perturbation — a Caesar letter
  *    rotation of the text and a per-COPY embedding sign-flip — so
  *    each copy is an ISOMORPHIC corpus over disjoint content:
  *    within-copy shingle/edit/cosine relations preserved exactly,
  *    cross-copy jaccard ~0, edit similarity ≪ 0.8 and cosine
  *    ~N(0, 1/√dims) ≪ τ. The TRUE pair count stays linear in
  *    copies. This is the
  *    control: an operator that grows superlinearly HERE has a plan
  *    problem; one that grows only under `clone` is output-bound on
  *    an adversarial corpus. Writes BENCH_SF1_DISTINCT.json.
  *
  * Not part of `sbt test` (minutes): `sbt "runMain graft.BenchSf1"`;
  * prints one JSON line. Findings go to PLANS.md.
  */
object BenchSf1 {

  /** Distinct-mode text perturbation for copy `i`: a per-copy Caesar
    * rotation of the letters (`translate`, a bijective character
    * map). Each copy becomes an ISOMORPHIC corpus over disjoint
    * content — exactly what "10x genuinely distinct data" means:
    *
    *  - WITHIN a copy every pairwise relation is preserved exactly
    *    (a bijection preserves string equality, shingle equality,
    *    Levenshtein distance, and the q6a blocking-prefix
    *    distribution), so the true pair count per copy equals the
    *    base corpus's and the total stays linear in copies;
    *  - ACROSS copies every letter differs, so 3-gram jaccard
    *    collapses to ~0 and edit similarity lands far under the 0.8
    *    operating point.
    *
    * Two rejected constructions, both measured on the 10x profile:
    * a token spliced between words leaves copies sharing the base's
    * first words — every doc with a long first-two-words puts all 10
    * copies in ONE q6a blocking prefix, manufacturing cross-copy
    * Levenshtein work the threshold then rejects (17x); a shared
    * per-copy PREFIX is worse — it merges every within-copy blocking
    * prefix into one hot block (25x). The rotation has neither
    * artifact. Copies must stay ≤ 26 or rotations repeat (exact
    * cross-copy dups — absorbed by the collapse family, but no
    * longer the distinct control).
    */
  private[graft] def distinctText(i: Int): org.apache.spark.sql.Column = {
    val lo = "abcdefghijklmnopqrstuvwxyz"
    val s = 1 + (i - 1) % 25
    val rl = lo.drop(s) + lo.take(s)
    translate(col("text"), lo + lo.toUpperCase, rl + rl.toUpperCase)
  }

  /** Distinct-mode embedding jitter for copy `i`: a per-COPY
    * deterministic sign-flip pattern. One pattern per copy, NOT per
    * row: within a copy both members of a genuine base-corpus
    * near-dup pair flip identically, so their cosine is preserved
    * EXACTLY (s_j² = 1 term-by-term) and the true pair count stays
    * linear in copies — a per-row pattern would decorrelate
    * within-copy pairs too and flatten output-bound vector operators
    * artificially. Across copies the patterns differ in ~half the
    * dimensions, so cross-copy cosine lands at ~N(0, 1/√dims) ≪ τ;
    * norms (and the row count/width profile) are preserved exactly.
    */
  private[graft] def jitterEmbedding(i: Int): org.apache.spark.sql.Column = expr(
    s"transform(embedding, (x, j) -> CASE WHEN pmod(hash($i, j), 2) = 0 THEN x ELSE -x END)")

  /** Key DOMAINS → the (table, column) members that must shift by ONE
    * shared per-copy stride. Per-column strides would misalign every
    * cross-table join for copies > 0 — e.g. documents (max doc_id
    * 4999) and embeddings (max vec_id 1999) fan apart, breaking the
    * `emb.vec_id == documents.doc_id` linkage qa2/curatedSemantic
    * join on, and an FK whose max sits below its PK's max (sparse
    * reference) would point copy-i rows at copy-(i-1) parents. The
    * stride is max over ALL of a domain's columns + 1. Non-key
    * references to dimension keys (c_nationkey, s_nationkey) stay
    * untouched — dimensions don't fan.
    */
  private val domains: Seq[Seq[(String, String)]] = Seq(
    Seq("orders" -> "o_orderkey", "lineitem" -> "l_orderkey"),
    Seq("customer" -> "c_custkey", "orders" -> "o_custkey"),
    Seq("part" -> "p_partkey", "lineitem" -> "l_partkey"),
    Seq("supplier" -> "s_suppkey", "lineitem" -> "l_suppkey"),
    Seq("documents" -> "doc_id", "embeddings" -> "vec_id"),
    Seq("events" -> "event_id"),
    Seq("events" -> "user_id"))

  /** The queries worth profiling at 10×: the most expensive rows of
    * the sf0.1 record (per-query min-of-trials), covering every heavy
    * family — curation, embedding/text dedup, persisted indexes,
    * joins, stats, sessionization.
    */
  private val Profiled = Seq(
    "qa2_curate_semantic", "q65_dedup_embedding", "q6f_dedup_adaptive",
    "q6e_dedup_collapsed", "q6g_semantic_dedup", "q6d_vec_index_ingest",
    "q6b_band_index_ingest", "q6c_incremental_vec_dedup", "q67_decontaminate",
    "q6a_dedup_blocked_edit", "q62_dedup_minhash_lsh", "q52_sessionize",
    "q57_funnel", "q45_item_stats", "q10_join_inner", "q11_join_multiway",
    "q15_join_full", "q8c_lm_score",
    // r12 additions: the shingle-census overlap matrix (its exact
    // side is the one corpus-quadratic-risk shape), the digest-
    // shuffle dataset card, and the Expand-multiplied sliding window
    "q9e_minhash_overlap", "qa4_dataset_card", "q5b_sliding_window")

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SF1_COPIES", "10").toInt
    val trials = sys.env.getOrElse("SPARK_GRAFT_BENCH_TRIALS", "2").toInt
    val mode = sys.env.getOrElse("SPARK_GRAFT_SF1_MODE", "clone")
    require(mode == "clone" || mode == "distinct",
      s"SPARK_GRAFT_SF1_MODE must be clone|distinct, got '$mode'")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("graft-bench-sf1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR",
      java.nio.file.Files.createTempDirectory("graft-sf1").toString)

    // one shared stride per domain, from the max over every member
    val loaded = scala.collection.mutable.Map.empty[String, DataFrame]
    def tbl(name: String): DataFrame =
      loaded.getOrElseUpdate(name, Tables.load(spark, srcDir, name))
    val strideOf: Map[(String, String), Long] = domains.flatMap { members =>
      val s = members.map { case (t, c) => tbl(t).agg(max(col(c))).head().getLong(0) }.max + 1L
      members.map(_ -> s)
    }.toMap

    def fanned(name: String): DataFrame = {
      val base = tbl(name)
      val keys = strideOf.keys.collect { case (t, c) if t == name => c }.toSeq
      if (keys.isEmpty) base // dimension: fixed, as in TPC-H
      else (0 until copies).map { i =>
        val shifted = keys.foldLeft(base) { (df, k) =>
          df.withColumn(k, col(k) + lit(i * strideOf((name, k))))
        }
        if (name == "documents" && i > 0) {
          if (mode == "clone")
            // near-dup (not only exact-dup) text growth: a per-copy
            // suffix token keeps long docs above jaccard 0.8 against
            // their siblings while breaking exact equality
            shifted.withColumn("text", concat(col("text"), lit(s" c$i")))
          else shifted.withColumn("text", distinctText(i))
        } else if (name == "embeddings" && i > 0 && mode == "distinct")
          shifted.withColumn("embedding", jitterEmbedding(i))
        else shifted
      }.reduce(_ unionByName _)
    }

    println(s"[sf1] building ${copies}x fan-out of $srcDir under $sf1")
    val tAll0 = System.nanoTime()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      fanned(t).write.mode("overwrite").parquet(s"$sf1/$t.parquet")
    }
    println(f"[sf1] built in ${(System.nanoTime() - tAll0) / 1e9}%.1f s")

    def exec(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    // same untimed warm-up contract as graft.Bench
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try exec(Tables.load(spark, sf1, t)) catch { case _: Throwable => () }
    }
    try operators.Warehouse.warm(spark, sf1) catch { case _: Throwable => () }

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val results = Profiled.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val times = (0 until trials).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          try exec(fn(spark, sf1)) catch {
            case e: Throwable => println(s"[sf1] $name FAILED: $e")
          }
          (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"[sf1] $name%-28s min=${times.head}%7.2f s  trials=${times.map(fmt).mkString(",")}")
        name -> times
      }
    }
    val qmins = results.map { case (k, ts) => s"\"$k\":${fmt(ts.head)}" }
      .mkString("{", ",", "}")
    val raw = results.map { case (k, ts) => s"\"$k\":[${ts.map(fmt).mkString(",")}]" }
      .mkString("{", ",", "}")
    val total = results.map(_._2.head).sum
    // each mode keeps its own record: the clone profile's numbers are
    // the adversarial-corpus datapoint, the distinct profile's the
    // plan-shape control — overwriting one with the other would erase
    // exactly the contrast the two runs exist to draw
    val outFile = if (mode == "clone") "BENCH_SF1.json" else "BENCH_SF1_DISTINCT.json"
    val line =
      s"""{"metric":"sf1_profile_total","value":${fmt(total)},"unit":"sec","mode":"$mode","copies":$copies,"trials":$trials,"queries_min":$qmins,"trial_times":$raw,"src":"$srcDir"}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outFile), (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(line)
    // the fan-out is corpus-sized scratch — reclaim unless pinned
    if (!sys.env.contains("SPARK_GRAFT_SF1_DIR")) {
      val p = new org.apache.hadoop.fs.Path(sf1)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      ()
    }
    spark.stop()
  }
}
