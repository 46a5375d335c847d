package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    t("warmup")(docs.count())
    val sig = dedup.Dedup.minhashSignatures(docs)
    t("q62a_signatures")(sig.count())
    val cand = dedup.Dedup.lshCandidates(sig)
    t("q62b_sign+cand")(cand.count())
    t("q62_full")(SparkEntry.queries("q62_dedup_minhash_lsh")(spark, d).count())
    t("q64_full")(SparkEntry.queries("q64_dedup_ngram_jaccard")(spark, d).count())
    t("q72_full")(SparkEntry.queries("q72_knn_ivf")(spark, d).count())
    t("q65_full")(SparkEntry.queries("q65_dedup_embedding")(spark, d).count())
    spark.stop()
  }
}
