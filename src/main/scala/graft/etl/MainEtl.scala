package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables
import graft.util.Sessions

/** Batch-ETL entry point mirroring
  * `/root/reference/src/pipeline/main_etl.py:43-101`: CSV read (header +
  * inferSchema) → clean_and_transform → count → curated write → agg
  * write → read-back verification, with the reference's per-stage
  * wall-clock report. The verification stage is the notebook's
  * post-write re-read of both layers (`etl.ipynb` cell 14, lines
  * 508-516) promoted to an assertion: the curated layer must read back
  * with the cleaned row count and the cleaned column SET (parquet
  * partition columns reorder to the end — the read-back schema contract
  * EtlWriterSpec pins), and the agg layer must be non-empty.
  *
  * Stage attribution follows the reference convention (SURVEY.md §7.5-1):
  * transformations are lazy, so "clean" measures plan construction and
  * the execution cost lands in the count/write actions.
  *
  * Divergence (documented, SURVEY.md §4.1): we `cache()` the cleaned
  * frame before the count + two writes, as the reference's notebook run
  * does (`etl.ipynb` cell 15) but its script path forgets — the script
  * otherwise recomputes the full clean plan per action.
  */
object MainEtl {

  final case class EtlReport(
      rows: Long,
      readSec: Double,
      cleanSec: Double,
      writeSec: Double,
      verifySec: Double,
      aggRows: Long,
      totalSec: Double,
  )

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def run(spark: SparkSession, paths: EnginePaths, sampleFraction: Double = 0.05,
      show: Boolean = true): EtlReport = {
    val t0 = System.nanoTime()

    val (raw, readSec) = timed {
      val df = Tables.csvInfer(spark, paths.raw)
      if (show) { df.show(5, truncate = false); df.printSchema() }
      df
    }

    val (clean, cleanSec) = timed(Transformations.cleanAndTransform(raw))

    val (_, writeSec) = timed {
      clean.cache()
      val n = clean.count()
      if (show) println(s"Rows after cleaning: $n")
      EtlWriter.writeCurated(clean, paths.curated)
      EtlWriter.writeAggregates(clean, paths.aggTripsByHour, sampleFraction, show)
    }

    val rows = clean.count()

    val ((aggRows, _), verifySec) = timed {
      val curatedBack = spark.read.parquet(paths.curated)
      val aggBack = spark.read.parquet(paths.aggTripsByHour)
      val backRows = curatedBack.count()
      require(backRows == rows,
        s"curated read-back row count $backRows != cleaned $rows")
      val missing = clean.columns.toSet -- curatedBack.columns.toSet
      require(missing.isEmpty,
        s"curated read-back lost columns: ${missing.mkString(", ")}")
      val nAgg = aggBack.count()
      require(nAgg > 0, "agg layer read back empty")
      if (show) { curatedBack.show(5, truncate = false); aggBack.show(5) }
      (nAgg, backRows)
    }

    clean.unpersist()
    val total = (System.nanoTime() - t0) / 1e9
    val report = EtlReport(rows, readSec, cleanSec, writeSec, verifySec,
      aggRows, total)
    if (show) {
      println(f"ETL read:   ${report.readSec}%.2f s")
      println(f"ETL clean:  ${report.cleanSec}%.2f s")
      println(f"ETL write:  ${report.writeSec}%.2f s")
      println(f"ETL verify: ${report.verifySec}%.2f s")
      println(f"ETL total:  ${report.totalSec}%.2f s")
    }
    report
  }

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(s"${System.getProperty("java.io.tmpdir")}/graft_etl")
    val rawPath = if (args.length > 1) args(1) else EnginePaths.under(root).raw
    val spark = Sessions.get("nyc-taxi-etl")
    try run(spark, EnginePaths.under(root).copy(raw = rawPath))
    finally spark.stop()
  }
}
