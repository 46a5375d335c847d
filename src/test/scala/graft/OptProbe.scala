package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r14 stage-isolation probe (TEST scope — never ships): times the
  * pieces of the bench's most expensive composites so optimization
  * targets the measured cost, not the guessed one. Run with
  * `sbt "Test/runMain graft.OptProbe <mode> [names...]"`.
  */
object OptProbe {
  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  private def noop(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()
  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = session()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // warm like Bench: table scans only
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { tn =>
      try noop(Tables.load(spark, d, tn)) catch { case _: Throwable => () }
    }
    try operators.Warehouse.warm(spark, d) catch { case _: Throwable => () }
    args.headOption.getOrElse("query") match {
      case "query" =>
        for (n <- args.drop(1); r <- 1 to 3) {
          spark.catalog.clearCache()
          val df = t(s"$n r$r construct")(SparkEntry.queries(n)(spark, d))
          t(s"$n r$r optimize")(df.queryExecution.optimizedPlan)
          t(s"$n r$r exec")(noop(df))
        }
      case "qa2" =>
        for (r <- 1 to 3) {
          spark.catalog.clearCache()
          val docs = Tables.documents(spark, d)
          val emb = Tables.embeddings(spark, d)
          val c = t(s"qa2 r$r stage(curated)")(graft.Stage(operators.Curate.curated(docs)))
          val survivors = emb.select(col("vec_id"), col("embedding"))
            .join(c.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
          val verdicts = t(s"qa2 r$r semanticDedup construct+actions") {
            dedup.Dedup.semanticDedup(survivors, 0.4, 0, iters = 0, maxCell = 0, md5Seed = true)
              .select(col("vec_id").as("doc_id"), col("cell"), col("dup_of"), col("keep"))
          }
          val out = c.join(verdicts, Seq("doc_id"), "left")
            .filter(col("keep").isNull || col("keep")).drop("keep")
            .groupBy("split", "source")
            .agg(count(lit(1)).as("n_docs"), sum("n_bpe_tokens").as("sum_tokens"),
              Tables.dsum(col("quality"), 6).as("sum_q"))
            .orderBy("split", "source")
          t(s"qa2 r$r final exec")(noop(out))
        }
      case "q6d" =>
        for (r <- 1 to 3) {
          spark.catalog.clearCache()
          val (corpus, b1, b2) = dedup.Dedup.q6dSplit(Tables.embeddings(spark, d))
          val tmp = java.nio.file.Files.createTempDirectory("graft-probe-vecidx")
          val root = s"$tmp/idx"
          try {
            t(s"q6d r$r build")(dedup.Dedup.commitVecIndex(corpus, root, probe1 = true))
            val v1 = t(s"q6d r$r ingest1+commit")(
              dedup.Dedup.ingestAndCommitVec(b1, corpus, root))
            val corpus2 = corpus.unionByName(
              b1.join(v1.filter(col("keep")).select("vec_id"), Seq("vec_id"), "left_semi"))
            val out = t(s"q6d r$r ingest2 construct")(
              dedup.Dedup.ingestAgainstVecIndex(b2, corpus2, root).orderBy("vec_id"))
            t(s"q6d r$r ingest2 exec+cut")(graft.Stage.cut(out))
          } finally {
            val p = new org.apache.hadoop.fs.Path(tmp.toString)
            p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
            ()
          }
        }
      case "qa3" =>
        for (r <- 1 to 3) {
          spark.catalog.clearCache()
          val cur = operators.Curate.curated(Tables.documents(spark, d))
          t(s"qa3 r$r curated alone exec")(noop(cur))
          spark.catalog.clearCache()
          val full = SparkEntry.queries("qa3_training_run")(spark, d)
          t(s"qa3 r$r full exec")(noop(full))
        }
      case "micro" =>
        for (r <- 1 to 3) {
          spark.catalog.clearCache()
          val li = Tables.lineitem(spark, d)
          t(s"micro r$r q03 as-is") {
            noop(li.filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
              .groupBy("l_returnflag", "l_linestatus")
              .agg(Tables.dsum(col("l_quantity")).as("sum_qty"),
                Tables.dsum(col("l_extendedprice")).as("s2"),
                Tables.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("s3"),
                Tables.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("s4"),
                Tables.davg(col("l_quantity")).as("a1"),
                Tables.davg(col("l_extendedprice")).as("a2"),
                Tables.davg(col("l_discount"), 6).as("a3"),
                count(lit(1)).as("n")))
          }
          t(s"micro r$r q03 spread") {
            noop(Tables.spread(li).filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
              .groupBy("l_returnflag", "l_linestatus")
              .agg(Tables.dsum(col("l_quantity")).as("sum_qty"),
                Tables.dsum(col("l_extendedprice")).as("s2"),
                Tables.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("s3"),
                Tables.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("s4"),
                Tables.davg(col("l_quantity")).as("a1"),
                Tables.davg(col("l_extendedprice")).as("a2"),
                Tables.davg(col("l_discount"), 6).as("a3"),
                count(lit(1)).as("n")))
          }
          val docs = Tables.documents(spark, d)
          t(s"micro r$r docs scan only")(noop(docs))
          t(s"micro r$r curated as-is")(noop(operators.Curate.curated(docs)))
          t(s"micro r$r curated spread")(noop(operators.Curate.curated(Tables.spread(docs))))
          t(s"micro r$r q8e as-is")(noop(SparkEntry.queries("q8e_bpe_encode")(spark, d)))
        }
      case "micro2" =>
        for (r <- 1 to 3) {
          spark.catalog.clearCache()
          val docs = Tables.documents(spark, d)
          val li = Tables.lineitem(spark, d)
          t(s"micro2 r$r annotated as-is")(noop(operators.Curate.annotated(docs)))
          t(s"micro2 r$r annotated spread")(noop(operators.Curate.annotated(Tables.spread(docs))))
          t(s"micro2 r$r minhash as-is")(noop(dedup.Dedup.minhashSignatures(docs)))
          t(s"micro2 r$r minhash spread")(noop(dedup.Dedup.minhashSignatures(Tables.spread(docs))))
          t(s"micro2 r$r q34 as-is") {
            noop(li.cube("l_returnflag", "l_linestatus")
              .agg(count(lit(1)).as("n"), Tables.dsum(col("l_quantity")).as("sum_qty")))
          }
          t(s"micro2 r$r q34 spread") {
            noop(Tables.spread(li).cube("l_returnflag", "l_linestatus")
              .agg(count(lit(1)).as("n"), Tables.dsum(col("l_quantity")).as("sum_qty")))
          }
          t(s"micro2 r$r q9e h-subtree") {
            noop(docs.select(col("source"),
              explode_outer(call_function("graft_shingle_strings", col("text"), lit(3))).as("g"))
              .filter(col("g").isNotNull)
              .select(col("source"), md5(col("g")).as("h")).distinct())
          }
          t(s"micro2 r$r q9e h spread") {
            noop(Tables.spread(docs).select(col("source"),
              explode_outer(call_function("graft_shingle_strings", col("text"), lit(3))).as("g"))
              .filter(col("g").isNotNull)
              .select(col("source"), md5(col("g")).as("h")).distinct())
          }
        }
      case "micro3" =>
        for (r <- 1 to 3) {
          spark.catalog.clearCache()
          val docs = Tables.documents(spark, d)
          val orders = Tables.orders(spark, d)
          val merges = operators.TextAnalysis.bpeMerges(docs, 30).map { case (l, rr, _) => (l, rr) }
          t(s"micro3 r$r q8e-enc as-is") {
            noop(operators.TextAnalysis.bpeTokens(docs, merges)
              .select(col("doc_id"), size(col("tokens")).cast("long").as("n"),
                size(array_distinct(col("tokens"))).cast("long").as("nd"))
              .orderBy("doc_id"))
          }
          t(s"micro3 r$r q8e-enc spread") {
            noop(operators.TextAnalysis.bpeTokens(Tables.spread(docs), merges)
              .select(col("doc_id"), size(col("tokens")).cast("long").as("n"),
                size(array_distinct(col("tokens"))).cast("long").as("nd"))
              .orderBy("doc_id"))
          }
          t(s"micro3 r$r q9h as-is")(noop(operators.Warehouse.profile(
            orders, Seq("o_orderkey", "o_custkey", "o_orderstatus",
              "o_totalprice", "o_orderdate", "o_orderpriority"))))
          t(s"micro3 r$r q9h spread")(noop(operators.Warehouse.profile(
            Tables.spread(orders), Seq("o_orderkey", "o_custkey", "o_orderstatus",
              "o_totalprice", "o_orderdate", "o_orderpriority"))))
          t(s"micro3 r$r q63 as-is")(noop(SparkEntry.queries("q63_dedup_simhash")(spark, d)))
          t(s"micro3 r$r q8c as-is")(noop(SparkEntry.queries("q8c_lm_score")(spark, d)))
        }
      case "q6dingest" =>
        val (corpus, b1, _) = dedup.Dedup.q6dSplit(Tables.embeddings(spark, d))
        val tmp = java.nio.file.Files.createTempDirectory("graft-probe-vecidx2")
        val root = s"$tmp/idx"
        try {
          dedup.Dedup.commitVecIndex(corpus, root, probe1 = true)
          for (r <- 1 to 3) {
            spark.catalog.clearCache()
            val g = t(s"q6di r$r geometry read")(dedup.Dedup.vecIndexGeometry(spark, root))
            t(s"q6di r$r index scan")(noop(dedup.Dedup.readVecIndex(spark, root)))
            t(s"q6di r$r full ingest")(noop(dedup.Dedup.ingestAgainstVecIndex(b1, corpus, root)))
            println(s"geometry: $g")
          }
        } finally {
          val p = new org.apache.hadoop.fs.Path(tmp.toString)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
          ()
        }
      case "sortcost" =>
        for (r <- 1 to 3) {
          spark.catalog.clearCache()
          t(s"sc r$r q6f nosort")(noop(dedup.Dedup.adaptiveNearDups(
            Tables.embeddings(spark, d), maxBucket = 64, probe1 = true, probeSub2 = true)))
          spark.catalog.clearCache()
          t(s"sc r$r q6f sorted")(noop(SparkEntry.queries("q6f_dedup_adaptive")(spark, d)))
          spark.catalog.clearCache()
          t(s"sc r$r q6f cutsort")(noop(graft.Stage.cut(dedup.Dedup.adaptiveNearDups(
            Tables.embeddings(spark, d), maxBucket = 64, probe1 = true, probeSub2 = true))
            .orderBy("id_a", "id_b")))
          spark.catalog.clearCache()
          val sc8c = SparkEntry.queries("q8c_lm_score")(spark, d)
          t(s"sc r$r q8c sorted")(noop(sc8c))
        }
      case other => sys.error(s"unknown probe mode $other")
    }
    spark.stop()
  }
}
