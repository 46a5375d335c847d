package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Production entry point for graft's native expressions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects `graft_dot`, `graft_norm2`, `graft_distsq`,
  * `graft_shingle_hashes`, `graft_minhash`, `graft_band_hashes` into
  * every session of the application (SQL and DataFrame API alike).
  * Library code that cannot assume the extension is configured also
  * registers the same functions per session via
  * [[graft.functions.VectorExpressions.register]] (idempotent).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression): Int = e.eval().asInstanceOf[Number].intValue()

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "_FUNC_(a, b) - sequential-fold double dot product"),
      es => DotProductD(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("graft_distsq"),
      info("graft_distsq", "_FUNC_(a, b) - squared euclidean distance"),
      es => DistSqD(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("graft_norm2"),
      info("graft_norm2", "_FUNC_(a) - L2 norm"),
      es => NormL2(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes", "_FUNC_(text, k) - distinct xxhash64 word k-shingles"),
      es => ShingleHashes64(es(0), litInt(es(1)))))
    ext.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "_FUNC_(shingles, perms) - MinHash signature"),
      es => MinHashSig(es(0), litInt(es(1)))))
    ext.injectFunction((FunctionIdentifier("graft_band_hashes"),
      info("graft_band_hashes", "_FUNC_(sig, bands, rows) - LSH band hashes"),
      es => BandHashes(es(0), litInt(es(1)), litInt(es(2)))))
    ext.injectFunction((FunctionIdentifier("graft_shingle_strings"),
      info("graft_shingle_strings", "_FUNC_(text, k) - word k-shingles as strings"),
      es => ShingleStrings(es(0), litInt(es(1)))))
    ext.injectFunction((FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg", "_FUNC_(hash, nitems, nbits) - bloom filter aggregate"),
      es => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        es(0), es(1), es(2))))
    ext.injectFunction((FunctionIdentifier("graft_might_contain"),
      info("graft_might_contain", "_FUNC_(bloom, hash) - bloom membership probe"),
      es => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(es(0), es(1))))
  }
}
