package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operations for long-lived parquet datasets — the
  * table-maintenance half of a 100 TB pipeline that query-side operators
  * rely on but never show: bounded file counts and scan-friendly
  * row ordering.
  */
object Layout {

  /** Compact a parquet dataset to ~`targetRowsPerFile` rows per file.
    *
    * Streaming appends, per-batch writes, and over-parallel jobs leave
    * datasets with thousands of KB-sized files; at 100 TB the NameNode/
    * listing cost and per-file open overhead dominate scans long before
    * data volume does. Compaction = read → repartition to
    * ceil(rows/target) → rewrite. The repartition is a round-robin
    * shuffle, so output files are uniformly sized regardless of input
    * skew. Row count comes from a cheap `count()` over footers-only
    * parquet metadata, not a data scan.
    */
  def compact(
      spark: SparkSession,
      path: String,
      outPath: String,
      targetRowsPerFile: Long,
  ): Long = {
    val df = spark.read.parquet(path)
    val rows = df.count()
    val files = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile)
    df.repartition(files.toInt)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    files
  }

  /** Write with rows globally clustered on `sortCols`: range-partition
    * on the sort key, then sort inside each task.
    *
    * Parquet keeps min/max statistics per row group; the range partition
    * gives each FILE a disjoint key range and the local sort narrows
    * every row group inside it, so selective filters skip whole
    * files/row groups at scan time (the poor man's Z-order — exact for
    * single-column predicates, still effective for the leading column of
    * a composite sort). `sortWithinPartitions` alone would NOT do this:
    * after a round-robin repartition every partition spans the full key
    * range and the min/max stats prune nothing. With `partitionCols` the
    * hive layout takes over file placement and the range shuffle applies
    * within the written directories.
    */
  def writeSorted(
      df: DataFrame,
      path: String,
      sortCols: Seq[String],
      partitionCols: Seq[String] = Nil,
      numFiles: Option[Int] = None, // unpartitioned path only; explicit → AQE keeps the count
  ): Unit = {
    val arranged =
      if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*)
      else numFiles match {
        case Some(n) => df.repartitionByRange(n, sortCols.map(col): _*)
        case None => df.repartitionByRange(sortCols.map(col): _*)
      }
    // hive-partitioned writes require partitionCols-leading order: if the
    // local sort doesn't provide it, FileFormatWriter inserts its OWN
    // sort by partitionCols only, destroying the sortCols clustering
    // (Spark's sort is not stable) — so sort (partitionCols ++ sortCols)
    val localOrder = (partitionCols ++ sortCols).map(col)
    val sorted = arranged.sortWithinPartitions(localOrder: _*)
    val w = sorted.write.mode(SaveMode.Overwrite)
    (if (partitionCols.isEmpty) w else w.partitionBy(partitionCols: _*))
      .parquet(path)
  }
}
