package graft

import org.apache.spark.sql.functions._
import graft.operators.Mix

/** Semantic invariants of the derived-rate mixture (qa1). The oracle
  * already pins the exact output; these assert the properties a user
  * relies on that a hash can't express.
  */
class MixSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf).cache()

  test("mixturePlan: rates respect the cap and hit the target mass within one cap") {
    val plan = Mix.mixturePlan(docs, Mix.mixTargets).collect()
    assert(plan.length === 20)
    plan.foreach { r =>
      val rate = r.getAs[Double]("rate")
      assert(rate > 0.0 && rate <= 3.0, s"rate out of range: $r")
      val avail = r.getAs[Long]("avail")
      val share = r.getAs[Double]("share")
      val total = plan.map(_.getAs[Long]("avail")).sum
      // uncapped sources meet their target mass exactly
      if (rate < 3.0)
        assert(math.abs(rate * avail - share * total) < 1e-6 * total,
          s"uncapped source misses target mass: $r")
    }
  }

  test("mixEpochs: full epochs are complete copies; the partial epoch is their hash-prefix subset") {
    val e = Mix.mixEpochs(docs, Mix.mixTargets)
      .groupBy("source", "epoch").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val perSource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val plan = Mix.mixturePlan(docs, Mix.mixTargets).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("rate")).toMap
    var windowed = 0
    perSource.foreach { case (src, nDocs) =>
      val rate = plan(src)
      val nFull = math.floor(rate).toLong
      (0L until nFull).foreach { ep =>
        assert(e.get(src -> ep).contains(nDocs), s"epoch $ep of $src not a complete copy")
      }
      // partial epoch: when the fractional mass is non-negligible it
      // must EXIST (a foreach-on-Option alone is vacuously green if a
      // bug drops the fractional epoch entirely) and hold ~frac*nDocs
      // docs — the hash cut is a fixed binomial draw, so a 4-sigma
      // window binds the size without regen fragility
      val frac = rate - nFull
      if (frac * nDocs >= 8.0) {
        windowed += 1
        assert(e.contains(src -> nFull),
          s"partial epoch missing for $src (rate $rate, expected ~${frac * nDocs} docs)")
        val n = e(src -> nFull).toDouble
        val sigma = math.sqrt(nDocs * frac * (1 - frac))
        assert(math.abs(n - frac * nDocs) <= 4 * sigma + 1,
          s"partial epoch of $src holds $n docs, want ${frac * nDocs} +- ${4 * sigma + 1}")
      }
      e.get(src -> nFull).foreach { n =>
        assert(n < nDocs, s"partial epoch of $src is a full copy")
        assert(rate - nFull > 0.0, s"partial epoch exists for integral rate: $src")
      }
      assert(!e.contains(src -> (nFull + 1)), s"epoch past ceil(rate) for $src")
    }
    assert(windowed > 0,
      "no source exercised the partial-epoch size window — the mixture plan has no fractional mass to check")
  }

  test("mixEpochs: deterministic across runs and independent of the q86 split hash") {
    val a = Mix.mixEpochs(docs, Mix.mixTargets).select("doc_id", "epoch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Mix.mixEpochs(docs, Mix.mixTargets).select("doc_id", "epoch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
    // the partial-epoch draw must not be the raw md5(doc_id) prefix
    // (sharing q86's hash would funnel survivors into one split): the
    // kept set differs from the same-size draw under the split hash
    val plan = Mix.mixturePlan(docs, Mix.mixTargets).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("rate")).toMap
    val fracSrc = plan.collectFirst { case (s, r) if r < 1.0 => s }.get
    val kept = Mix.mixEpochs(docs, Mix.mixTargets)
      .filter(col("source") === fracSrc).select("doc_id").collect().map(_.getLong(0)).toSet
    val splitDraw = docs.filter(col("source") === fracSrc)
      .withColumn("b", substring(md5(col("doc_id").cast("string").cast("binary")), 1, 4))
      .orderBy("b").limit(kept.size).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept !== splitDraw, "partial-epoch draw correlates with the split hash")
  }

  test("mixEpochs: a source absent from the targets is dropped") {
    val partial = Mix.mixTargets - "src0"
    val out = Mix.mixEpochs(docs, partial)
    assert(out.filter(col("source") === "src0").count() === 0L)
  }

  test("mixturePlan: zero-mass source gets rate 0 instead of a divide-by-zero crash") {
    val zeroed = docs.withColumn("n_chars",
      when(col("source") === "src0", lit(0L)).otherwise(col("n_chars")))
    val plan = Mix.mixturePlan(zeroed, Mix.mixTargets).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("rate")).toMap
    assert(plan("src0") === 0.0, "zero-mass source should resolve to rate 0")
    assert(plan.count(_._2 > 0.0) === 19, "other sources unaffected")
    assert(Mix.mixEpochs(zeroed, Mix.mixTargets)
      .filter(col("source") === "src0").count() === 0L)
  }

  test("massCol: the README composition — mixture over curatedSemantic by token mass") {
    val kept = operators.Curate.curatedSemantic(docs, Tables.embeddings(spark, sf))
    val targets = kept.select("source").distinct().collect().map(_.getString(0))
      .map(_ -> 1.0 / 20).toMap
    val epochs = Mix.mixEpochs(kept, targets, massCol = "n_bpe_tokens")
    assert(epochs.count() > 0, "composition produced no epoch rows")
    // plan rates derive from token mass, not the (absent) n_chars
    val plan = Mix.mixturePlan(kept, targets, massCol = "n_bpe_tokens").collect()
    assert(plan.forall(_.getAs[Double]("rate") > 0.0))
  }
}
