package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Sessions

/** Readers for the driver's synthetic tables (TESTDATA.md) and generic
  * parquet/CSV sources (SURVEY.md §2.1 S1-S3).
  *
  * All readers are plain `spark.read` scans so Catalyst keeps format-level
  * pushdown (parquet filter pushdown, column pruning, partition pruning)
  * — nothing here materializes or collects.
  */
object Tables {

  /** S2/S3: parquet scan of a named testdata table. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The `events` table, with its `ts` column normalized to Spark's
    * session-zoned microsecond TimestampType regardless of how the
    * parquet writer encoded it.
    *
    * Three on-disk shapes are handled:
    *   - TIMESTAMP(NANOS): Spark 4 cannot read parquet NANOS natively;
    *     with `spark.sql.legacy.parquet.nanosAsLong` the column arrives
    *     as raw nanos (long) and `ts div 1000` truncates to microseconds
    *     — the same truncation DuckDB applies, so oracles agree exactly.
    *   - timestamp[us] with isAdjustedToUTC=false: Spark 4 reads this as
    *     TIMESTAMP_NTZ. The session timezone is pinned to UTC
    *     ([[Sessions.tune]]), so the NTZ→TZ cast is an exact relabeling
    *     (no wall-clock shift) and matches DuckDB's naive reading.
    *   - timestamp[us] UTC-adjusted: already TimestampType, pass through.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    Sessions.tune(spark)
    val raw = table(spark, dir, "events")
    normalizeTs(raw)
  }

  /** Normalize a `ts` column to TimestampType (see [[events]]). Applied
    * by the [[events]] parquet scan; callers of the typed CSV/JSON/XML
    * readers that supply their own ts-bearing schema must apply it
    * themselves — a TIMESTAMP_NTZ field in a caller schema passes
    * through those readers untouched, and downstream `cast("long")` /
    * epoch arithmetic on NTZ was the round-4 failure mode.
    */
  def normalizeTs(df: DataFrame, col: String = "ts"): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    if (!df.columns.contains(col)) df
    else df.schema(col).dataType match {
      case LongType =>
        df.withColumn(col, expr(s"timestamp_micros($col div 1000)"))
      case TimestampNTZType =>
        df.withColumn(col, org.apache.spark.sql.functions.col(col).cast(TimestampType))
      case _ => df
    }
  }

  /** S1: CSV scan with header + schema inference (two-pass read), the
    * reference's raw-layer entry point
    * (`/root/reference/src/pipeline/main_etl.py:47-52`).
    *
    * Write format is explicit so timestamps round-trip CSV at full
    * microsecond precision; the read format makes the fraction optional
    * so plain `HH:mm:ss` data (the reference's taxi CSV shape) still
    * infers as timestamp.
    */
  val CsvTimestampFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  val CsvTimestampReadFormat = "yyyy-MM-dd HH:mm:ss[.SSSSSS]"

  def csvInfer(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("timestampFormat", CsvTimestampReadFormat)
      .csv(path)

  /** S1 production overload: explicit-schema CSV read — one pass instead
    * of inference's two (the reference's dominant read cost, SURVEY.md
    * §6/§7.3). Same parsing options as [[csvInfer]], so the two read
    * paths yield identical rows whenever the supplied schema equals the
    * inferred one (asserted in SourcesSpec).
    */
  def csvTyped(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("timestampFormat", CsvTimestampReadFormat)
      .schema(schema)
      .csv(path)

  /** Production data hygiene: explicit-schema CSV read that QUARANTINES
    * malformed rows instead of dropping or failing — PERMISSIVE mode
    * with a `_corrupt_record` column carrying the raw line. At 100 TB a
    * fraction of bad rows is a certainty; the caller splits the frame
    * on `_corrupt_record IS NULL` and routes rejects to a quarantine
    * sink rather than poisoning the curated layer.
    */
  def csvPermissive(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    spark.read
      .option("header", "true")
      .option("timestampFormat", CsvTimestampReadFormat)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(path)
  }

  /** CSV export used by tests/bench to exercise S1 end-to-end: writes
    * `df` as headered CSV (lossless doubles, microsecond timestamps) and
    * returns the written path.
    */
  def exportCsv(df: DataFrame, path: String): String = {
    df.write
      .mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", CsvTimestampFormat)
      .csv(path)
    path
  }

  /** JSON-lines sink/source pair. JSON is schemaless on disk, so the
    * production read takes an explicit schema (one pass, no inference,
    * exactly like [[csvTyped]]); timestamps are pinned to the same
    * microsecond format as the CSV pair so round-trips are lossless.
    * JSON scans split by line, so a large export stays as parallel to
    * read as it was to write.
    */
  def exportJson(df: DataFrame, path: String): String = {
    df.write
      .mode("overwrite")
      .option("timestampFormat", CsvTimestampFormat)
      .json(path)
    path
  }

  def jsonTyped(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .option("timestampFormat", CsvTimestampReadFormat)
      .schema(schema)
      .json(path)

  /** ORC sink/source pair — the other columnar format Spark ships
    * natively. Same pushdown/pruning properties as parquet (predicate
    * pushdown, column pruning, stripe-level skipping), so it is a
    * drop-in for parquet-shaped pipelines in ORC-standardized shops.
    */
  def exportOrc(df: DataFrame, path: String): String = {
    df.write.mode("overwrite").orc(path)
    path
  }

  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** XML sink/source pair — Spark 4 ships the XML data source natively
    * (the spark-xml integration absorbed into core). Row-per-`rowTag`
    * layout; the reader takes an explicit schema (one pass, the same
    * production discipline as [[csvTyped]]/[[jsonTyped]]) — feed-shaped
    * upstream data (sitemaps, product feeds, legacy exports) lands
    * without a preprocessing hop.
    */
  def exportXml(df: DataFrame, path: String, rowTag: String = "row"): String = {
    df.write.mode("overwrite")
      .option("rowTag", rowTag)
      .option("timestampFormat", CsvTimestampFormat)
      .xml(path)
    path
  }

  def xmlTyped(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType,
      rowTag: String = "row"): DataFrame =
    spark.read
      .option("rowTag", rowTag)
      .option("timestampFormat", CsvTimestampReadFormat)
      .schema(schema)
      .xml(path)
}
