package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink helpers — SURVEY §2.11 (io01–io03).
  *
  * Thin, typed wrappers over the DataFrameReader/Writer API so every
  * read keeps Catalyst's pushdown path (parquet filters + column
  * pruning reach the scan) and every write is cluster-shaped by
  * default: explicit partition columns for parquet, explicit schemas
  * for csv/json (schema inference is a full extra pass over 100 TB —
  * never rely on it in production paths).
  */
object Sources {

  // --------------------------------------------------------- parquet

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Order-independent freshness signature of a file tree: per-file
    * (path-relative-to-root × mtime × length) mixes folded with BOTH
    * XOR and SUM, so an unchanged tree re-listed in another order
    * yields the same stamp. The relative path (not just the leaf
    * name) means moving a file between subdirectories changes the
    * stamp, and the xor+sum pair is duplicate-sensitive: two files
    * with identical (name, mtime, length) no longer cancel under a
    * pure XOR fold (adding/removing such a pair changes the sum
    * lane). One recursive listing, NO Spark job — cheap enough to
    * consult per request/call. Used by the ANN serving index's
    * rebuild detection and the derived-store staleness checks; a
    * missing path stamps as the empty tree.
    */
  def listingSignature(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootPrefix = f.makeQualified(p).toUri.getPath
    var hx = 0L
    var hs = 0L
    if (f.exists(p)) {
      val it = f.listFiles(p, true)
      while (it.hasNext) {
        val s = it.next()
        val full = s.getPath.toUri.getPath
        val rel = if (full.startsWith(rootPrefix)) full.substring(rootPrefix.length) else full
        var m = 1125899906842597L
        var i = 0
        while (i < rel.length) { m = m * 6364136223846793005L + rel.charAt(i); i += 1 }
        m = m * 6364136223846793005L + s.getModificationTime
        m = m * 6364136223846793005L + s.getLen
        hx ^= m
        hs += m
      }
    }
    s"f${java.lang.Long.toHexString(hx)}-${java.lang.Long.toHexString(hs)}"
  }

  /** Hive-style partitioned parquet write; `partitionBy` columns become
    * directories, so downstream filters on them prune whole files.
    */
  def writeParquet(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  // ------------------------------------------------------------- csv

  /** Schema-explicit csv read (no inference pass, no surprise types). */
  def readCsv(spark: SparkSession, path: String, schema: StructType, header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  // ------------------------------------------------------------- orc

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).orc(path)
  }

  // ------------------------------------------------------ json lines

  /** Schema-explicit json-lines read. */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  // --------------------------------------------- z-order layout (io06)

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Morton (Z-order) key over ≥2 numeric columns, each linearly
    * scaled to `bits` bits between the column's min and max and then
    * bit-interleaved. Rows close in EVERY dimension get close z
    * values, so a range-partitioned, z-sorted layout co-locates them
    * in the same files — multi-column data skipping from one sort
    * order, which single-column sorting cannot give.
    */
  def zorderKey(scaled: Seq[Column], bits: Int): Column = {
    // nonEmpty first: an empty column list would otherwise surface as
    // an opaque "head of empty list" from the reduce (and from
    // zorderWrite's stats row) instead of naming the misuse
    require(scaled.nonEmpty, "z-order needs at least one column (>=2 for it to beat a plain sort)")
    require(scaled.size * bits <= 63, s"z key ${scaled.size}x$bits bits exceeds a long")
    val n = scaled.size
    (0 until bits).flatMap { i =>
      scaled.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` z-ordered on `cols` into `numFiles` range-partitioned
    * parquet files. Column min/max for the scaling come from one tiny
    * global aggregate (2×|cols| doubles on the driver — bounded at
    * any corpus size, the same stats any layout optimizer collects).
    * Degenerate columns (min == max) scale to 0. Linear scaling keeps
    * the whole key a narrow map; rank-based scaling would resist skew
    * better but costs a per-column sort — the public Delta/Iceberg
    * z-order implementations make the same trade by default.
    */
  def zorderWrite(df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int = 16, bits: Int = 12): Unit = {
    require(cols.nonEmpty, "zorderWrite needs at least one z column")
    // stats exclude non-finite cells: Spark's max() orders NaN above
    // every double (one NaN cell would poison mx and send EVERY row of
    // that column to bucket 0), and a single ±Infinity cell is the
    // same bug through the other door — mx = +Inf makes (x-mn)/(mx-mn)
    // collapse every finite row to bucket 0 (mn = -Inf to the top
    // bucket) with no crash and no empty-input fallback, silently
    // destroying the layout. Excluded cells themselves degrade to
    // bucket 0 via the coalesce below.
    def clean(c: String): Column = {
      // try_cast, not cast: under ANSI (the Spark 4 default) a plain
      // cast on a non-numeric column THROWS mid-stats-job with a raw
      // CAST_INVALID_INPUT — the statless guard below turns the same
      // condition into an actionable error naming the column
      val d = expr(s"try_cast(`$c` AS DOUBLE)")
      when(isnan(d) || !d.between(Double.MinValue, Double.MaxValue), lit(null)).otherwise(d)
    }
    val mins = cols.map(c => min(clean(c)).as(s"mn_$c"))
    val maxs = cols.map(c => max(clean(c)).as(s"mx_$c"))
    val st = df.agg((mins ++ maxs).head, (mins ++ maxs).tail: _*).head()
    val statless = cols.filter(c => st.isNullAt(st.fieldIndex(s"mn_$c")) ||
      st.isNullAt(st.fieldIndex(s"mx_$c")))
    if (statless.nonEmpty) {
      // EMPTY input has no min/max anywhere — write the empty frame
      // as-is (nothing to cluster). But a non-empty frame with a
      // statless z column is a caller error (non-numeric type, or all
      // null/NaN/Inf cells): silently writing an UN-z-ordered layout
      // would defeat the function's whole purpose and only surface as
      // mysterious scan degradation much later — fail loudly instead.
      if (df.isEmpty) {
        df.write.mode("overwrite").parquet(path)
        return
      }
      throw new IllegalArgumentException(
        s"zorderWrite: z column(s) ${statless.mkString(", ")} have no finite numeric " +
          "values (non-numeric type, or every cell null/NaN/Infinity) — an unordered " +
          "write would silently defeat the layout; drop them from cols or clean the data")
    }
    val top = (1L << bits) - 1
    val scaled = cols.map { c =>
      val (mn, mx) = (st.getAs[Double](s"mn_$c"), st.getAs[Double](s"mx_$c"))
      if (mx <= mn) lit(0L)
      // NULL/NaN/±Inf cells scale to bucket 0 rather than nulling the
      // whole interleaved key (stranding those rows in one
      // un-clustered _z=null range) — and the per-row value goes
      // through the same clean() as the stats, or a NaN cell would
      // reach the ANSI double→long cast and fail the whole write
      else coalesce(
        least(lit(top), floor((clean(c) - mn) / (mx - mn) * top)).cast("long"),
        lit(0L))
    }
    df.withColumn("_z", zorderKey(scaled, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  // ------------------------------- sharded shuffle write (q8b artifact)

  /** The training-pipeline artifact of q8b's deterministic shuffle:
    * the FULL corpus written as `numShards` range-partitioned parquet
    * files in one global order keyed by
    * [[graft.operators.TextAnalysis.shuffleKey]] — shard i's keys all
    * sort strictly before shard i+1's, rows sorted within each shard,
    * so a trainer streaming part-00000, part-00001, … reads exactly
    * the seed's permutation. `repartitionByRange` samples the key
    * distribution, so shards stay balanced for any seed and corpus
    * size; no task ever holds more than one shard — this scales out
    * where the q8b query form's TakeOrdered sample (top-50 probe)
    * deliberately does not write anything.
    */
  def shardedShuffleWrite(
      docs: DataFrame, seed: String, path: String, numShards: Int = 64): Unit =
    docs
      .withColumn("shuffle_key", graft.operators.TextAnalysis.shuffleKey(seed))
      .repartitionByRange(numShards, col("shuffle_key"))
      .sortWithinPartitions("shuffle_key")
      // the key is derivable (md5 of seed:doc_id) — leaving it in the
      // artifact would add 32 redundant bytes per row at corpus scale
      // and make the shard schema diverge from the corpus schema a
      // schema-strict trainer expects (zorderWrite drops its _z helper
      // for the same reason)
      .drop("shuffle_key")
      .write.mode("overwrite").parquet(path)
}
