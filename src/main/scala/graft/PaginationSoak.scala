package graft

import graft.serve.WarehouseServer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deep-pagination soak (SURVEY §2.14 srv08): measures that a keyset
  * page's cost stays FLAT in the page's depth, while the naive
  * offset alternative (read-and-discard everything before the page)
  * grows linearly — the difference between "walkable at warehouse
  * scale" and "export-only past maxRows".
  *
  * The keyset path is exactly what the server runs for `?after=`:
  * [[WarehouseServer.cursorOf]] on the boundary row →
  * [[WarehouseServer.afterPredicate]] → limit(pageSize). The cursor
  * predicate pushes into the parquet scan (PlanShapeSpec locks that),
  * so depth only moves WHERE the page starts, not how much is read.
  *
  * Not part of `sbt test` (tens of seconds at sf0.1): run manually
  * with `sbt "runMain graft.PaginationSoak"`; findings go to PLANS.md.
  */
object PaginationSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("graft-pagination-soak")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // a warehouse-shaped ordered result: every lineitem row, totally
    // ordered by its natural key — the frame a client would actually
    // page through
    val df = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
    val keys = WarehouseServer.keysetCols(df)
      .getOrElse(sys.error("soak frame lost its ascending keyset"))
    val total = df.count()
    val pageSize = 500
    // the depth schedule below needs at least 3 pages, and limit()
    // takes an Int — guard both, with a message naming the knob,
    // instead of a negative-offset or wrapped-Int Spark error
    require(total >= 3L * pageSize,
      s"corpus too small to soak pagination depth: $total rows < ${3 * pageSize} (pageSize=$pageSize)")
    require(total <= Int.MaxValue - pageSize,
      s"offset-read baseline would overflow Int at $total rows — shrink the corpus or drop the baseline")
    println(s"[pagesoak] rows=$total pageSize=$pageSize keys=${keys.mkString(",")}")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // probe pages at geometrically deeper offsets; the last sits near
    // the end of the corpus
    val depths = Seq(1L, 10L, 50L, 200L, (total / pageSize) - 2)
    depths.foreach { page =>
      val offset = (page - 1) * pageSize
      // boundary row for the cursor — setup cost, not part of either
      // measurement (a real client got it from the previous page);
      // page 1 has no predecessor, so no cursor and no filter
      val cursor: Option[String] =
        if (offset == 0) None
        else Some(WarehouseServer.cursorOf(df.limit(offset.toInt).collect().last, keys))
      // three trials each, report the median, cold cache per trial
      def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
      val kTimes = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val paged = cursor.fold(df)(c =>
          df.filter(WarehouseServer.afterPredicate(df, keys, c)))
        val (rows, s) = timed(paged.limit(pageSize).collect())
        require(rows.length == pageSize, s"keyset page $page short: ${rows.length}")
        s
      }
      val oTimes = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val (rows, s) = timed(df.limit((offset + pageSize).toInt).collect())
        require(rows.length == offset + pageSize, "offset read short")
        s
      }
      println(f"[pagesoak] page=$page%5d offset=$offset%8d " +
        f"keyset=${median(kTimes)}%6.2f s  offset_read=${median(oTimes)}%6.2f s")
    }
    spark.stop()
  }
}
