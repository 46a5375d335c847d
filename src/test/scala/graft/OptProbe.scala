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
      case other => sys.error(s"unknown probe mode $other")
    }
    spark.stop()
  }
}
