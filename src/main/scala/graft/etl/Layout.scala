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

  /** Morton (Z-order) key: bit-interleave two non-negative integer
    * dimensions, x in the even bit positions, y in the odd. Sorting by
    * the result clusters rows so that BOTH dimensions' min/max file
    * statistics stay narrow — linear sort keys prune only their leading
    * column; the Z-curve is how a 100 TB table serves selective filters
    * on two independent columns from one layout. Pure bit arithmetic
    * (`>> & <<` fold), codegen-friendly, identical spelling in DuckDB.
    * Callers bin real values into `[0, 2^bits)` first (e.g. value %
    * 2^bits, or a quantile bin).
    */
  def zValue(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
      bits: Int = 16): org.apache.spark.sql.Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x.cast("long"), b).bitwiseAND(lit(1L)), 2 * b))
        .bitwiseOR(shiftleft(shiftright(y.cast("long"), b).bitwiseAND(lit(1L)), 2 * b + 1))
    }

  /** Write clustered on the Z-curve of (xCol, yCol): compute the Morton
    * key, range-partition + locally sort on it ([[writeSorted]]), drop
    * the key from the files. Both dimensions then prune at scan time.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      xCol: String,
      yCol: String,
      bits: Int = 16,
      numFiles: Option[Int] = None,
  ): Unit = {
    val keyed = df.withColumn("_z", zValue(col(xCol), col(yCol), bits))
    val arranged = numFiles match {
      case Some(n) => keyed.repartitionByRange(n, col("_z"))
      case None => keyed.repartitionByRange(col("_z"))
    }
    arranged.sortWithinPartitions("_z").drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** MERGE / upsert semantics over plain parquet (no table format):
    * rows of `updates` replace base rows with the same key; unmatched
    * update rows are inserts; everything else survives unchanged.
    * Spelled as updates ∪ (base ⟕anti updates) — equivalent to
    * `MERGE WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT` for
    * whole-row updates, with one shuffle (or none: the anti join
    * broadcasts whenever the update batch is small, the overwhelmingly
    * common case for CDC/late-data batches against a 100 TB base).
    *
    * Callers rewrite only the partitions the updates touch (join the
    * update keys to partition values first) — rewriting the full base
    * is the fallback, not the pattern. `updates` must be key-unique
    * (enforced: duplicate update keys would make the result
    * nondeterministic).
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val dupes = updates.groupBy(keys.map(col): _*).count().filter(col("count") > 1)
    require(dupes.isEmpty, s"updates must be unique on ${keys.mkString(",")}")
    updates.unionByName(base.join(updates.select(keys.map(col): _*), keys, "left_anti"))
  }

  /** Apply a CDC change batch — the full MERGE triple: `changes` carries
    * the base's columns plus `change_type` ∈ {inserted, updated,
    * deleted} (exactly what [[snapshotDiff]] emits, plus payload), and
    * the result is the base with deletes removed and inserts/updates
    * applied whole-row. `applyChanges(before, diff-with-payload)`
    * reproduces `after` exactly — the identity the q_cdc_apply gate
    * hash-checks.
    *
    * Scale shape is [[upsert]]'s: one anti-join of the base against ALL
    * change keys (upserts and deletes alike drop the base row; upserts
    * then re-add the new version), broadcast whenever the batch is
    * small. Key-uniqueness of the batch is enforced for the same
    * nondeterminism reason.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keys: Seq[String]): DataFrame = {
    val dupes = changes.groupBy(keys.map(col): _*).count().filter(col("count") > 1)
    require(dupes.isEmpty, s"changes must be unique on ${keys.mkString(",")}")
    val upserts = changes.filter(col("change_type") =!= "deleted").drop("change_type")
    upserts.unionByName(
      base.join(changes.select(keys.map(col): _*), keys, "left_anti"))
  }

  /** Snapshot diff — derive the CDC stream two table versions imply:
    * one row per key that was `inserted` (new key), `deleted` (key
    * gone), or `updated` (key present in both, any compared column
    * changed). Unchanged keys are dropped. The inverse of [[upsert]]:
    * `upsert` applies a change batch; this recovers one by comparing
    * snapshots — the shape every incremental corpus/warehouse pipeline
    * needs when upstream republishes full dumps without a changelog.
    *
    * Scale shape: ONE full-outer sort-merge join on the key (both
    * sides shuffle once, co-partitioned; AQE handles skew), then a
    * narrow struct inequality over `compareCols` — null-safe (`<=>`),
    * so NULL→value and value→NULL both count as changes. No collects,
    * no per-column joins.
    */
  def snapshotDiff(
      before: DataFrame,
      after: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val bTag = before.select(
      keys.map(col) :+ struct(compareCols.map(col): _*).as("_b"): _*)
    val aTag = after.select(
      keys.map(col) :+ struct(compareCols.map(col): _*).as("_a"): _*)
    bTag.join(aTag, keys, "full_outer")
      .withColumn("change_type",
        when(col("_b").isNull, lit("inserted"))
          .when(col("_a").isNull, lit("deleted"))
          .when(!(col("_a") <=> col("_b")), lit("updated")))
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) :+ col("change_type"): _*)
  }

  /** Write `df` as a bucketed+sorted catalog table: rows hash-placed
    * into `nBuckets` files by `key`, each file sorted on it.
    *
    * Bucketing is the pre-paid shuffle: two tables bucketed the same
    * way join with NO exchange and (being sorted) no sort — the
    * sort-merge join reads co-bucketed files directly. At 100 TB this
    * converts every recurring join/aggregation on the bucket key from
    * a per-query corpus shuffle into a one-time layout decision —
    * exactly how warehouse fact tables are stored. Requires the
    * session catalog (bucket metadata lives there, not in parquet),
    * hence `saveAsTable`; `path` keeps the data external so the
    * catalog entry is metadata only. PlanSpec asserts the no-exchange
    * plan; the q_bucket_join gate checks result equality to the plain
    * join.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      key: String,
      nBuckets: Int,
  ): Unit = writeBucketed(df, table, path, Seq(key), nBuckets)

  /** Composite-key form: bucket (and sort) by several columns — needed
    * when the recurring join's equi-keys are composite (e.g. the dedup
    * band index on (band_idx, band_hash)): Spark requires ALL join keys
    * in the bucket spec for co-partitioning
    * (`spark.sql.requireAllClusterKeysForCoPartition`), so bucketing on
    * a key subset reads as a plain table and reshuffles.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      keys: Seq[String],
      nBuckets: Int,
  ): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // align write tasks with buckets first: otherwise every task writes
    // a file per bucket it sees (tasks × buckets small files), and a
    // multi-file bucket forces the reader to re-sort. One shuffle here
    // buys one file per bucket, hence sort-free bucketed scans forever.
    df.repartition(nBuckets, keys.map(col): _*)
      .write
      .format("parquet")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)
  }
}
