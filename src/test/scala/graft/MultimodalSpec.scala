package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** mm01–mm03 — multimodal binary-column plumbing (SURVEY §2.10). */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.syntheticMedia(spark, sf)

  test("mm01: media schema is binary payload + typed metadata, metadata queries never touch payload") {
    assert(media.schema.map(f => (f.name, f.dataType)) ===
      Multimodal.mediaSchema.map(f => (f.name, f.dataType)))
    val byKind = media.toDF().groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind.keySet === Set("image", "audio", "video"))
    assert(byKind.values.sum === media.count())
    // metadata-only plan must prune the payload column at the scan
    val plan = media.toDF().select("media_id", "kind", "width").queryExecution
      .executedPlan.toString
    assert(!plan.contains("payload"), "payload column not pruned from metadata-only scan")
  }

  test("mm02: stubbed per-partition decode yields deterministic fixed-size features") {
    val feats = Multimodal.decodeFeatures(media, dim = 16)
    val rows = feats.collect()
    assert(rows.length === media.count())
    assert(rows.forall(_.feature.length === 16))
    // deterministic: same input → bit-identical features
    val again = Multimodal.decodeFeatures(media, dim = 16).collect()
    val a = rows.sortBy(_.media_id).map(_.feature.toSeq)
    val b = again.sortBy(_.media_id).map(_.feature.toSeq)
    assert(a.toSeq === b.toSeq)
    // distributed: runs as one decode pass per partition, no repartition
    assert(feats.rdd.getNumPartitions === media.rdd.getNumPartitions)
  }

  test("mm04: decoded features feed the ANN path end-to-end") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions._
    // media → stub decode → featureEmbeddings bridge → cosine top-3 of
    // one image + LSH bucketing: the full multimodal-similarity
    // composition on the §2.8 schema contract
    // zero-norm rows are dropped by the bridge itself (NaN-cosine guard)
    val feats = Multimodal.featureEmbeddings(Multimodal.decodeFeatures(media, dim = 16))
    val q = feats.filter(col("vec_id") === 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qf"), col("nrm").as("qn"))
    val top = feats.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("vec_id"), cosine(col("qf"), col("embedding"), col("qn"), col("nrm")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(3)
      .collect()
    assert(top.length === 3)
    assert(top.forall(r => r.getDouble(1) <= 1.0 + 1e-9 && r.getDouble(1) >= -1.0 - 1e-9))
    // and the same frame drops into the LSH index unchanged: every
    // vector lands in exactly `tables` buckets
    val buckets = graft.ann.Knn.lshTables(feats, tables = 4, planes = 3)
    assert(buckets.count() === feats.count() * 4)
  }

  test("mm03: frame sampling fans out ceil(n_frames/stride) rows per video, payload sliced") {
    val stride = 10
    val frames = Multimodal.sampleFrames(media, stride)
    val perVideo = frames.toDF().groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = media.filter(_.kind == "video").collect()
      .map(r => r.media_id -> ((math.max(r.n_frames, 1) + stride - 1) / stride).toLong).toMap
    assert(perVideo === expected)
    // frame bytes must come from within the payload
    val m0 = media.filter(_.kind == "video").orderBy("media_id").head()
    val f0 = frames.filter(_.media_id == m0.media_id).orderBy("frame_index").head()
    assert(f0.frame_index === 0)
    // byte-level compare: a UTF-8 decode would break spuriously if a
    // slice boundary ever split a multi-byte character
    assert(java.util.Arrays.equals(
      m0.payload.slice(0, f0.frame_bytes.length), f0.frame_bytes))
  }
}
