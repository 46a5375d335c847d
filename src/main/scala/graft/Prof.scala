package graft
import org.apache.spark.sql.SparkSession

/** Dev profiling harness: time named SparkEntry queries against an SF
  * dir, optionally dumping the executed plan (post-AQE) after the run.
  *
  *   sbt "runMain graft.Prof [--explain] [sfDir] q65_dedup_embedding ..."
  *
  * Each query runs twice — cold then warm — so JIT/IO noise is visible
  * rather than folded into the number.
  */
object Prof {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val explain = args.contains("--explain")
    val rest = args.filterNot(_ == "--explain")
    val d = rest.find(_.startsWith("/")).getOrElse("/root/testdata/sf0.1")
    val names = rest.filterNot(_.startsWith("/")) match {
      case Array() => Array("q65_dedup_embedding")
      case qs      => qs
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    t("warmup")(Tables.documents(spark, d).count())
    names.foreach { n =>
      t(s"$n cold")(SparkEntry.queries(n)(spark, d).count())
      t(s"$n warm")(SparkEntry.queries(n)(spark, d).count())
      if (explain) {
        // collect() drives THIS DataFrame's own QueryExecution, so the
        // printed plan is the final AQE plan (count() would execute a
        // derived query and leave this one isFinalPlan=false)
        val df = SparkEntry.queries(n)(spark, d)
        t(s"$n explain-run")(df.collect())
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
