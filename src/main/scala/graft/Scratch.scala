package graft
import org.apache.spark.sql.SparkSession

// Temporary stage-isolation harness for the optimization round.
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.documents(spark, d).count()
    for (n <- Seq("q65_dedup_embedding", "q6f_dedup_adaptive", "q71_knn_lsh",
        "q72_knn_ivf", "q74_knn_quantized", "q03_agg_group", "q6g_semantic_dedup")) {
      for (round <- 1 to 3) {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, d)
        val t1 = System.nanoTime()
        val _ = df.queryExecution.optimizedPlan // force analysis+optimization
        val t2 = System.nanoTime()
        println(f"SCRATCH $n r$round construct ${(t1 - t0) / 1e9}%.2f s  optimize ${(t2 - t1) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
