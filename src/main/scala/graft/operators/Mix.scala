package graft.operators

import graft.{Qdef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mixture construction with DERIVED rates — the step upstream of
  * [[TextAnalysis.sampleByRates]]'s fixed-rate filter: given a target
  * share per source and a character budget, compute each source's
  * repetition rate (epochs) from the corpus' own measured mass, then
  * materialize the epoched sample (the Pile/Dolma/LLaMA-style
  * "weights × epochs" table, but computed inside the engine instead
  * of hand-maintained in a config file).
  *
  * rate_s = min(maxEpochs, share_s · budget / avail_s): a source
  * holding less mass than its target share is REPEATED (rate > 1,
  * up-sampling capped at maxEpochs — past that the mixture accepts
  * the shortfall rather than overfit a tiny source), an
  * over-represented one is DOWN-sampled (rate < 1). The fractional
  * part of the rate becomes one partial epoch drawn by the same
  * deterministic md5-threshold recipe as q86/q87 (':mixep' salt —
  * independent of both the split hash and q87's ':mix' sample hash):
  * retries and re-runs reproduce the exact sample, and the drawn
  * subset of a source is IDENTICAL across its epochs (the partial
  * epoch is a prefix-by-hash of the full ones), which is what you
  * want for epoch-boundary bookkeeping.
  *
  * Scale shape: the plan is a ~|sources|-row aggregate (one partial-agg
  * shuffle), broadcast back onto the corpus; the epoch fan-out is a
  * narrow explode of an at-most-ceil(maxEpochs)-element sequence.
  * Nothing else shuffles — at 100 TB the cost is the one scan plus
  * rate × corpus output rows, and the output inherits the scan's
  * partitioning (feed it straight to the shard writer).
  */
object Mix {

  /** Per-source plan: measured mass, target share, resolved rate.
    * `budget` ≤ 0 means "use the corpus' own total mass" (pure
    * re-mixing at constant size).
    */
  def mixturePlan(
      docs: DataFrame,
      targets: Map[String, Double],
      budget: Long = 0L,
      maxEpochs: Double = 3.0,
      massCol: String = "n_chars"): DataFrame = {
    val stats = docs.groupBy("source").agg(sum(massCol).cast("long").as("avail"))
    val total = stats.agg(sum("avail").cast("long").as("total"))
    val share = targets.foldLeft(lit(0.0)) { case (acc, (src, w)) =>
      when(col("source") === src, lit(w)).otherwise(acc)
    }
    val b =
      if (budget > 0L) lit(budget.toDouble)
      else col("total").cast("double")
    // zero-mass guard: a source whose documents total zero mass gets
    // rate 0 (dropped) instead of an ANSI DIVIDE_BY_ZERO that kills
    // the whole mixture query
    stats.crossJoin(broadcast(total))
      .select(col("source"), col("avail"), share.as("share"),
        least(lit(maxEpochs),
          when(col("avail") > 0L, share * b / col("avail").cast("double"))
            .otherwise(lit(0.0))).as("rate"))
  }

  /** The materialized mixture: one row per (document, epoch). Full
    * epochs 0..floor(rate)-1 take every document of the source; the
    * final partial epoch (when rate has a fractional part) keeps the
    * deterministic hash-prefix subset. Documents of sources absent
    * from `targets` get share 0 → rate 0 → dropped.
    */
  def mixEpochs(
      docs: DataFrame,
      targets: Map[String, Double],
      budget: Long = 0L,
      maxEpochs: Double = 3.0,
      massCol: String = "n_chars"): DataFrame = {
    val plan = mixturePlan(docs, targets, budget, maxEpochs, massCol)
      .select(col("source"), col("rate"), floor(col("rate")).as("nfull"),
        // 16-bit threshold for the partial epoch, as a lowercase hex
        // string comparable against the md5 prefix (q87's recipe, but
        // computed from the derived rate instead of a literal)
        lower(lpad(hex(floor((col("rate") - floor(col("rate")).cast("double")) * 65536.0)), 4, "0"))
          .as("thresh"))
    val nEpochs = ceil(col("rate"))
    val bucket = substring(
      md5(concat(col("doc_id").cast("string"), lit(":mixep")).cast("binary")), 1, 4)
    docs.join(broadcast(plan), "source")
      .withColumn("epoch",
        explode(when(nEpochs > 0, sequence(lit(0L), nEpochs - 1))
          .otherwise(array().cast("array<bigint>"))))
      .filter(col("epoch") < col("nfull") || bucket < col("thresh"))
      .drop("rate", "nfull", "thresh")
  }

  /** Non-uniform target mixture over the 20 synthetic sources:
    * residue class i%5 gets weight (i%5+1)/60 — classes sum to
    * 4·(1+2+3+4+5)/60 = 1. Against near-uniform measured mass this
    * yields down-sampled, fractional, and repeated sources in one
    * query.
    */
  private[graft] val mixTargets: Map[String, Double] =
    (0 until 20).map(i => s"src$i" -> (i % 5 + 1) / 60.0).toMap

  private[graft] def caseShare: String =
    (0 until 20).map(i => s"WHEN source = 'src$i' THEN CAST(${i % 5 + 1} AS DOUBLE) / 60.0")
      .mkString("CASE ", " ", " ELSE 0.0 END")

  /** The oracle's epoch fan-out is a VALUES (0),(1),(2) cross join —
    * exactly ceil(maxEpochs)=3 candidate epochs at qa1's default cap
    * — because DuckDB's unnest(range(...)) inside a chained CTE hits
    * an internal binder error; the WHERE epoch < ceil(rate) bound
    * keeps it semantically identical to the Spark side's sequence
    * explode.
    */
  private val qa1 = Qdef(
    "qa1_mix",
    (s, d) =>
      mixEpochs(Tables.documents(s, d), mixTargets)
        .groupBy("source", "epoch")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").cast("long").as("sum_chars"))
        .orderBy("source", "epoch"),
    Some(s"""WITH stats AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS avail
                   FROM documents GROUP BY source),
            tot AS (SELECT CAST(SUM(avail) AS BIGINT) AS total FROM stats),
            plan AS (SELECT source, avail,
                   LEAST(3.0, CASE WHEN avail > 0
                     THEN ($caseShare) * CAST(total AS DOUBLE) / CAST(avail AS DOUBLE)
                     ELSE 0.0 END) AS rate
                   FROM stats, tot),
            p2 AS (SELECT source, rate, CAST(FLOOR(rate) AS BIGINT) AS nfull,
                   lower(lpad(hex(CAST(FLOOR((rate - FLOOR(rate)) * 65536.0) AS BIGINT)), 4, '0')) AS thresh
                   FROM plan),
            e AS (SELECT d.doc_id, d.source, d.n_chars, p2.nfull, p2.thresh, t.epoch
                   FROM documents d JOIN p2 USING (source)
                   CROSS JOIN (SELECT CAST(x AS BIGINT) AS epoch FROM (VALUES (0),(1),(2)) v(x)) t
                   WHERE t.epoch < CAST(CEIL(p2.rate) AS BIGINT)),
            k AS (SELECT * FROM e WHERE epoch < nfull
                   OR substr(md5(CAST(doc_id AS VARCHAR) || ':mixep'), 1, 4) < thresh)
            SELECT source, epoch, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM k GROUP BY source, epoch ORDER BY source, epoch"""))

  val all: Seq[Qdef] = Seq(qa1)
}
