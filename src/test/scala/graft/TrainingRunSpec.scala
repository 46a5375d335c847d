package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curate, Mix, TrainingRun}

/** Semantic laws of the qa3 training-run materialization that the
  * composed hash oracle can't express: token-mass conservation across
  * the pack, the full-chunks invariant, and the writer's shard files
  * tiling the query's chunks.
  */
class TrainingRunSpec extends SparkSpec {

  private val chunkTokens = 512L
  private lazy val corpus =
    Curate.curated(Tables.documents(spark, sf))
      .filter(col("split") === "train").cache()
  private lazy val run =
    TrainingRun.packedRun(corpus, Mix.mixTargets, seed = "qa3").cache()

  test("qa3: packing conserves the mixture's token mass exactly") {
    val packed = run.agg(sum("n_tokens")).collect()(0).getLong(0)
    val mixed = Mix.mixEpochs(corpus, Mix.mixTargets, massCol = "n_bpe_tokens")
      .agg(sum("n_bpe_tokens")).collect()(0).getLong(0)
    assert(packed === mixed, "chunk tokens != mixed-instance tokens")
    assert(packed > 0L)
  }

  test("qa3: per shard, chunks are contiguous from 0 and all but the last hold exactly `chunkTokens`") {
    val byShard = run.collect().groupBy(_.getAs[Int]("shard"))
    assert(byShard.size === 8, s"expected all 8 shards populated, got ${byShard.keySet}")
    byShard.foreach { case (shard, rows) =>
      val chunks = rows.map(_.getAs[Long]("chunk")).sorted
      assert(chunks.head === 0L, s"shard $shard starts at chunk ${chunks.head}")
      assert(chunks.last === chunks.length - 1L, s"shard $shard has chunk gaps")
      rows.filter(_.getAs[Long]("chunk") < chunks.last).foreach { r =>
        assert(r.getAs[Long]("n_tokens") === chunkTokens,
          s"non-final chunk not full in shard $shard: $r")
      }
    }
  }

  test("qa3: deterministic across runs; zero-share sources never appear") {
    val again = TrainingRun.packedRun(corpus, Mix.mixTargets, seed = "qa3")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val first = run.collect().map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(again === first)
    // a one-source target mixes nothing else: its packed mass is its
    // own mixed mass, not the corpus'
    val solo = Map("src3" -> 1.0)
    val soloPacked = TrainingRun.packedRun(corpus, solo, seed = "qa3")
      .agg(sum("n_tokens")).collect()(0).getLong(0)
    val soloMixed = Mix.mixEpochs(corpus, solo, massCol = "n_bpe_tokens")
      .agg(sum("n_bpe_tokens")).collect()(0).getLong(0)
    assert(soloPacked === soloMixed)
    val src3Mass = corpus.filter(col("source") === "src3")
      .agg(sum("n_bpe_tokens")).collect()(0).getLong(0)
    // rate capped at maxEpochs=3 → at most 3 copies of src3, nothing else
    assert(soloPacked <= 3L * src3Mass && soloPacked > 0L)
  }

  test("qa3: mixBudget scales the run — half the budget packs strictly less, conservation still exact") {
    val full = run.agg(sum("n_tokens")).collect()(0).getLong(0)
    val totalMass = corpus.agg(sum("n_bpe_tokens")).collect()(0).getLong(0)
    val half = TrainingRun.packedRun(corpus, Mix.mixTargets, seed = "qa3",
      mixBudget = totalMass / 2)
    val halfPacked = half.agg(sum("n_tokens")).collect()(0).getLong(0)
    val halfMixed = Mix.mixEpochs(corpus, Mix.mixTargets, budget = totalMass / 2,
      massCol = "n_bpe_tokens").agg(sum("n_bpe_tokens")).collect()(0).getLong(0)
    assert(halfPacked === halfMixed, "budgeted pack loses mixture mass")
    assert(halfPacked < full, "halving the mixture budget did not shrink the run")
    assert(halfPacked > 0L)
  }

  test("writeRun: shard files are in pack order and tile the manifest's chunks") {
    val dir = tmpDir("graft-run")
    val manifest = TrainingRun.writeRun(corpus, Mix.mixTargets, dir, seed = "qa3")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val written = spark.read.parquet(dir)
    // partition layout: one directory per shard
    val shardDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shardDirs.toSeq === (0 until 8).map(i => s"shard=$i"))
    // every span row reappears, in ikey order within its shard, and
    // re-aggregating spans reproduces the returned manifest exactly
    val rows = written.collect()
    rows.groupBy(_.getAs[Int]("shard")).foreach { case (shard, rs) =>
      val ordered = rs.sortBy(r => (r.getAs[String]("ikey"), r.getAs[Long]("chunk")))
      // spans tile [0, shardTotal): consecutive spans meet at chunk
      // boundaries or doc boundaries with no gaps
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          val aEnd = math.min(a.getAs[Long]("cum_after"), (a.getAs[Long]("chunk") + 1) * chunkTokens)
          val bStart = math.max(b.getAs[Long]("cum_before"), b.getAs[Long]("chunk") * chunkTokens)
          assert(aEnd === bStart, s"gap in shard $shard between $a and $b")
        case _ => ()
      }
      val total = rs.map(_.getAs[Long]("toks_in_chunk")).sum
      val manifestTotal = manifest.collect { case ((s, _), (_, t)) if s == shard => t }.sum
      assert(total === manifestTotal, s"shard $shard token mass != manifest")
    }
    val reagg = rows.groupBy(r => (r.getAs[Int]("shard"), r.getAs[Long]("chunk")))
      .map { case (k, rs) => k -> ((rs.length.toLong, rs.map(_.getAs[Long]("toks_in_chunk")).sum)) }
    assert(reagg === manifest)
    // the written artifact matches the INDEPENDENT declarative twin:
    // writeRun's manifest comes from the files on disk, packedRun's
    // from the live plan — same corpus, same seed, same chunking
    val declared = run.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(manifest === declared)
  }
}
