package graft.ann

import graft.{Qdef, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table —
  * SURVEY §2.8.
  *
  * Brute force (q70) is the correctness baseline: corpus × broadcast
  * query set, cosine in sequential-fold double math that the DuckDB
  * oracle reproduces bit-for-bit, top-k by window rank. The scale
  * paths avoid the full cross product: q71 buckets by random-
  * hyperplane signs (shuffle on an 8-bit key), q72 partitions the
  * corpus into IVF cells around broadcast centroids and probes the
  * query's 2 nearest cells. Norms are computed once per row, never
  * per pair.
  */
object Knn {

  private val K = 5

  /** Corpus with per-row norm; queries are the vec_id < 10 slice. */
  private def corpus(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), norm2(col("embedding")).as("nrm"))

  private def queriesOf(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))

  private def topK(pairs: DataFrame): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    pairs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select("qid", "nid", "rank", "cos")
      .orderBy("qid", "rank")
  }

  private val q70 = Qdef(
    "q70_knn_brute",
    (s, d) => {
      val e = corpus(s, d)
      val q = queriesOf(e)
      topK(
        e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid"),
            cosine(col("qe"), col("embedding"), col("qn"), col("nrm")).as("cos")))
    },
    Some("""WITH e AS (SELECT vec_id, embedding,
                    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
                  FROM embeddings),
            q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM e WHERE vec_id < 10),
            p AS (SELECT q.qid, e.vec_id AS nid,
                    list_sum(list_transform(list_zip(q.qe, e.embedding),
                      pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))) / (q.qn * e.nrm) AS cos
                  FROM e, q WHERE e.vec_id <> q.qid),
            r AS (SELECT qid, nid, cos,
                    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
                  FROM p)
            SELECT qid, nid, rank, cos FROM r WHERE rank <= 5 ORDER BY qid, rank"""))

  /** Random-hyperplane bucket signature shared by q71. */
  def lshBuckets(e: DataFrame, planes: Int = 8): DataFrame = {
    val rnd = new scala.util.Random(11)
    val hp: Seq[Seq[Double]] = Seq.fill(planes)(Seq.fill(64)(rnd.nextGaussian()))
    val bucket = (0 until planes)
      .map(j => when(dotD(col("embedding"), typedLit(hp(j))) > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    e.withColumn("bucket", bucket)
  }

  /** LSH ANN: each query probes its own bucket plus every 1-bit
    * neighbor bucket (multiprobe), so candidates arrive via a shuffle
    * on the small bucket key instead of a cross join.
    */
  private val q71 = Qdef(
    "q71_knn_lsh",
    (s, d) => {
      val e = lshBuckets(corpus(s, d))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("nrm").as("qn"), col("bucket").as("qb"))
        .select(col("qid"), col("qe"), col("qn"),
          explode(array(
            col("qb") +: (0 until 8).map(j => col("qb").bitwiseXOR(lit(1L << j))): _*)).as("probe"))
      topK(
        q.join(e, q("probe") === e("bucket") && col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid"),
            cosine(col("qe"), col("embedding"), col("qn"), col("nrm")).as("cos"))
          .distinct())
    },
    None)

  /** IVF ANN: deterministic seed centroids (every 31st vector), corpus
    * assigned to its nearest cell via broadcast-centroid argmin, each
    * query probes its 2 nearest cells (nprobe=2).
    */
  private val q72 = Qdef(
    "q72_knn_ivf",
    (s, d) => {
      val e = corpus(s, d)
      val cents = e.filter(pmod(col("vec_id"), lit(31)) === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"))
      def nearestCells(rows: DataFrame, n: Int): DataFrame = {
        val w = Window.partitionBy("vec_id").orderBy(col("dist"), col("cid"))
        rows.crossJoin(broadcast(cents))
          .withColumn("dist", distSq(col("embedding"), col("ce")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= n)
          .drop("ce", "dist", "rn")
      }
      val assigned = nearestCells(e, 1).withColumnRenamed("cid", "cell")
      val qCells = nearestCells(e.filter(col("vec_id") < 10), 2)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("nrm").as("qn"), col("cid").as("cell"))
      topK(
        qCells.join(assigned, Seq("cell"))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid"),
            cosine(col("qe"), col("embedding"), col("qn"), col("nrm")).as("cos"))
          .distinct())
    },
    None)

  val all: Seq[Qdef] = Seq(q70, q71, q72)
}
