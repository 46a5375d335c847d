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
}
